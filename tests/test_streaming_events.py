"""Structured Streaming event operators + SimHash near-dup pairs.

Driver-oracle parity at sf scale is the CORRECTNESS gate
(``events_stream_*`` / ``dedup_simhash_pairs`` rows); these tests cover
the semantics the oracles can't see: late-data drops, the exact
session-gap boundary, and pigeonhole recall vs brute force.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

T0 = datetime.datetime(2024, 1, 1, 6, 0, 0)


def _ev(eid, sec, uid, etype="click", value=1.0):
    return {
        "event_id": eid,
        "ts": T0 + datetime.timedelta(seconds=sec),
        "user_id": uid,
        "event_type": etype,
        "value": float(value),
        "props": "{}",
    }


EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def events_dir(spark):
    # user 100: gap of exactly 1800 s (merges — session end is inclusive)
    # user 200: gap of 1801 s (two sessions)
    # plus a spread of clicks across three hours for the window tests
    rows = [
        _ev(1, 0, 100),
        _ev(2, 1800, 100),
        _ev(3, 0, 200),
        _ev(4, 1801, 200),
        _ev(5, 3600, 300, "view", 2.5),
        _ev(6, 7200, 300, "view", 3.5),
        _ev(7, 7260, 300),
    ]
    d = tempfile.mkdtemp(prefix="cgr_evtest_")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_hourly_matches_batch_and_drops_late(spark, events_dir):
    from code_graph_rag_spark.streaming import events as EV

    batch = spark.read.parquet(events_dir)
    expected = sorted(
        (str(r.hour), r.event_type, r.n, r.total_value)
        for r in batch.withColumn("hour", F.date_trunc("hour", "ts"))
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    )
    # a row 5 h older than the stream's max event time arrives in a later
    # micro-batch: the 2 h watermark has passed its window — must be dropped
    late = dict(_ev(99, -18000, 100))
    out = EV.run_bounded(
        spark, events_dir, EV.hourly_events, extra_drops=[[late]]
    )
    got = sorted(
        (str(r.hour), r.event_type, r.n, r.total_value)
        for r in out.filter(
            F.col("event_type") != EV.SENTINEL_TYPE
        ).collect()
    )
    assert got == expected  # late row contributed nothing


def test_pin_preserves_nullable_bigint_without_arrow(spark):
    """The r5 driver-red regression: pinning a frame whose nullable bigint
    column went through toPandas() coerces it to float64, and a non-Arrow
    session (the driver's) then rejects 60.0 for LongType. Both pin sites
    (streaming.events.run_bounded, __spark_entry__._pin) now rebuild from
    collect()ed Rows — exercise that under the driver's Arrow-off config."""
    import __spark_entry__ as entry

    arrow_key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(arrow_key)
    spark.conf.set(arrow_key, "false")
    try:
        df = spark.createDataFrame(
            [(1, 60), (2, None)], "k long, sum_k long"
        )
        pinned = entry._pin(df)
        rows = {r.k: r.sum_k for r in pinned.collect()}
        assert rows == {1: 60, 2: None}
        assert isinstance(rows[1], int)
        assert pinned.schema["sum_k"].dataType.typeName() == "long"
    finally:
        spark.conf.set(arrow_key, prev)


def test_stream_session_gap_boundary(spark, events_dir):
    from code_graph_rag_spark.streaming import events as EV

    out = EV.run_bounded(spark, events_dir, EV.session_events)
    sess = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in out.filter(F.col("user_id") >= 0).collect()
    }
    by_user = {}
    for (uid, _), n in sess.items():
        by_user.setdefault(uid, []).append(n)
    assert sorted(by_user[100]) == [2]  # gap == 1800 s → merged (inclusive)
    assert sorted(by_user[200]) == [1, 1]  # gap 1801 s → split
    assert sorted(by_user[300]) == [1, 2]


def test_stream_stateful_user_counts(spark, events_dir):
    from code_graph_rag_spark.streaming import events as EV

    out = EV.run_bounded(spark, events_dir, EV.user_counts_stateful)
    got = {
        r.user_id: r.n_events
        for r in out.filter(F.col("user_id") >= 0).collect()
    }
    assert got == {100: 2, 200: 2, 300: 3}


def test_simhash_near_dups_equal_brute_force(spark):
    """Pigeonhole banding is EXACT for hamming <= max_hamming: the banded
    pair set must equal the all-pairs brute-force answer (no cap hit)."""
    from code_graph_rag_spark.operators.dedup import (
        simhash,
        simhash_near_dups,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(1, base), (2, base), (3, base.replace("lazy", "sleepy"))]
    rows += [
        (10 + i, f"unrelated document number {i} about spark {'x ' * i}")
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ids = sorted(fps)
    expected = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dups(docs).collect()
    }
    assert got == expected
    assert (1, 2, 0) in got  # exact dup pair survives


def test_simhash_near_dups_bucket_cap(spark):
    """Docs identical in every band beyond the cap emit no pairs (they are
    exact-dedup's job); smaller buckets still pair."""
    from code_graph_rag_spark.operators.dedup import simhash_near_dups

    rows = [(i, "common boilerplate text body") for i in range(6)]
    rows += [(100, "another unique pair of words"), (101, "another unique pair of words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dups(docs, max_bucket=4).collect()
    }
    assert (100, 101) in got
    assert not any(a < 6 and b < 6 for a, b in got)
