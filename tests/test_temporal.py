"""As-of join / banded range join vs brute-force pure-Python twins, and
label propagation vs a hand-traced expectation."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from code_graph_rag_spark.operators.temporal import asof_join, range_join_count
from code_graph_rag_spark.plans.graph_algos import label_propagation

T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    rng = random.Random(7)
    quotes = [
        (k, _ts(rng.uniform(0, 1000)), round(rng.uniform(1, 9), 2), i)
        for i, k in enumerate(k for k in "ab" for _ in range(40))
    ]
    trades = [
        (k, _ts(rng.uniform(-5, 1005)), i)
        for i, k in enumerate(k for k in "abc" for _ in range(30))
    ]
    qdf = spark.createDataFrame(quotes, ["sym", "ts", "px", "qid"])
    tdf = spark.createDataFrame(trades, ["sym", "ts", "tid"])
    return tdf, qdf, trades, quotes


def test_asof_join_matches_bruteforce(trades_quotes):
    tdf, qdf, trades, quotes = trades_quotes
    got = {
        r["tid"]: (r["asof_ts"], r["asof_px"])
        for r in asof_join(tdf, qdf, "sym", "ts", ["px"]).collect()
    }
    assert len(got) == len(trades)
    for sym, ts, tid in trades:
        cand = [(qts, px) for qsym, qts, px, _ in quotes if qsym == sym and qts <= ts]
        want = max(cand) if cand else (None, None)
        assert got[tid] == want, tid


def test_asof_join_inclusive_and_tie_dedup(spark):
    # two reference rows at the SAME (key, ts): tie column keeps max qid
    q = spark.createDataFrame(
        [("a", _ts(10), 1.0, 1), ("a", _ts(10), 2.0, 2)],
        ["sym", "ts", "px", "qid"],
    )
    t = spark.createDataFrame([("a", _ts(10), 0)], ["sym", "ts", "tid"])
    rows = asof_join(t, q, "sym", "ts", ["px"], tie="qid").collect()
    assert rows[0]["asof_px"] == 2.0  # inclusive (<=) AND deterministic tie


def test_range_join_count_matches_bruteforce(spark):
    rng = random.Random(11)
    evs = [
        (i, rng.randrange(4), _ts(rng.uniform(0, 2000)))
        for i in range(300)
    ]
    df = spark.createDataFrame(evs, ["event_id", "user_id", "ts"])
    got = {
        r["event_id"]: r["n_in_range"]
        for r in range_join_count(df, df, "user_id", "ts", 300).collect()
    }
    for eid, uid, ts in evs:
        want = sum(
            1
            for _, u2, t2 in evs
            if u2 == uid and ts < t2 <= ts + dt.timedelta(seconds=300)
        )
        assert got[eid] == want, eid


def test_range_join_band_boundaries(spark):
    # matches exactly at +window and just-after-probe; non-match at probe ts
    # and at +window+1µs, across a band boundary
    left = spark.createDataFrame([(0, 1, _ts(299.999999))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [
            (1, _ts(299.999999)),  # equal → excluded (strict >)
            (1, _ts(300.0)),       # next band, inside → counted
            (1, _ts(599.999999)),  # exactly +window → counted (inclusive)
            (1, _ts(600.0)),       # +window + 1µs → excluded
            (2, _ts(300.0)),       # other key → excluded
        ],
        ["k", "ts"],
    )
    rows = range_join_count(left, right, "k", "ts", 300).collect()
    assert rows[0]["n_in_range"] == 2


def test_label_propagation_hand_traced(spark):
    edges = [
        ("a", "CALLS", "b"),
        ("a", "DEFINES", "b"),
        ("b", "CALLS", "c"),
        ("c", "CALLS", "a"),
        ("d", "CALLS", "a"),
        ("e", "CALLS", "e"),
        ("f", "CALLS", "g"),
    ]
    df = spark.createDataFrame(edges, ["subj", "pred", "obj"])
    got1 = {r["node"]: r["label"] for r in label_propagation(df, iters=1).collect()}
    # iter 1: every node adopts its lexicographically-smallest neighbour label
    assert got1 == {"a": "b", "b": "a", "c": "a", "d": "a", "e": "e", "f": "g", "g": "f"}
    got3 = {r["node"]: r["label"] for r in label_propagation(df, iters=3).collect()}
    # the triangle+spoke community converges to 'a'; {f,g} oscillates (sync
    # LPA on a bipartite pair); the self-loop-only node keeps its own label
    assert got3 == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "g", "g": "f"}
