"""KMV cardinality sketch: accuracy, duplicate-insensitivity, determinism."""

from __future__ import annotations

import pytest

from code_graph_rag_spark.operators.sketches import approx_distinct_kmv


@pytest.fixture(scope="module")
def events_df(spark):
    rows = (
        [("big", i) for i in range(500)]
        + [("mid", i * 7) for i in range(50)]
        + [("tiny", 42)] * 30  # one distinct value, many rows
    )
    return spark.createDataFrame(rows, ["event_type", "user_id"])


def test_kmv_accuracy_and_rowcounts(events_df):
    got = {
        r["event_type"]: r
        for r in approx_distinct_kmv(events_df, "event_type", "user_id").collect()
    }
    assert got["big"]["n_rows"] == 500
    assert got["tiny"]["n_rows"] == 30
    for grp, truth in [("big", 500), ("mid", 50)]:
        est = got[grp]["approx_distinct"]
        assert abs(est - truth) / truth < 0.35, (grp, est)
    # a single distinct value: every register but one empty
    assert 0.0 < got["tiny"]["approx_distinct"] < 10.0


def test_kmv_duplicate_insensitive(events_df):
    doubled = events_df.unionAll(events_df)
    a = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_kmv(events_df, "event_type", "user_id").collect()
    }
    b = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_kmv(doubled, "event_type", "user_id").collect()
    }
    assert a == b  # register minimums cannot move under duplication


def test_kmv_partitioning_invariant(events_df):
    a = approx_distinct_kmv(events_df, "event_type", "user_id").collect()
    b = approx_distinct_kmv(
        events_df.repartition(13), "event_type", "user_id"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
