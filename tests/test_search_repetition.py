"""BM25 retrieval, repetition filter, and near-dup clustering operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.dedup import near_dup_clusters
from code_graph_rag_spark.operators.search import bm25_topk
from code_graph_rag_spark.operators.text import repetition_stats

DOCS = [
    (1, "spark joins tables fast and spark scales"),
    (2, "the cat sat on the mat"),
    (3, "spark spark spark spark"),
    (4, "tables of data and tables of rows"),
    (5, "completely unrelated words here"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _bm25_twin(docs, terms, k1=1.2, b=0.75):
    """Pure-Python mirror of the documented scoring."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(terms))
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[d] = s
    return out


def test_bm25_matches_twin(docs_df):
    terms = ["spark", "tables"]
    expected = _bm25_twin(DOCS, terms)
    got = bm25_topk(docs_df, terms, k=10).collect()
    assert {r["doc_id"] for r in got} == set(expected)
    for r in got:
        assert r["bm25"] == pytest.approx(expected[r["doc_id"]], abs=2e-6)
    # rank follows raw score desc, doc_id asc
    order = sorted(expected, key=lambda d: (-expected[d], d))
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == order


def test_bm25_k_and_zero_filter(docs_df):
    got = bm25_topk(docs_df, ["spark"], k=2).collect()
    assert len(got) == 2 and {r["doc_id"] for r in got} <= {1, 3}
    none = bm25_topk(docs_df, ["zzzznotpresent"], k=5).collect()
    assert none == []


def test_repetition_stats(docs_df):
    rows = {r["doc_id"]: r for r in repetition_stats(docs_df).collect()}
    # doc 3 "spark spark spark spark": 3 bigrams all "spark spark"
    r3 = rows[3]
    assert r3["n_2grams"] == 3
    assert r3["dup_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert r3["top_2gram_frac"] == pytest.approx(1.0)
    assert r3["top_token_frac"] == pytest.approx(1.0)
    assert not r3["keep"]
    # doc 2 "the cat sat on the mat": 5 distinct bigrams, top token 'the' 2/6
    r2 = rows[2]
    assert r2["n_2grams"] == 5 and r2["dup_2gram_frac"] == 0.0
    assert r2["top_token_frac"] == pytest.approx(2 / 6, abs=1e-6)


def test_repetition_short_doc(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_2grams"] == 0 and rows[1]["keep"]
    assert rows[1]["top_token_frac"] == pytest.approx(1.0)
    assert rows[2]["n_2grams"] == 0 and rows[2]["top_token_frac"] == 0.0


def test_near_dup_clusters(spark):
    body = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen"
    )
    docs = [
        (10, body),
        (11, body),  # exact dup of 10
        (12, body + " phi"),  # near dup of 10/11
        (20, other),
        (21, other),  # exact dup of 20
        (30, "totally different text about nothing shared with others"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in near_dup_clusters(df).collect()}
    assert set(got) >= {10, 11, 20, 21}
    assert got[10]["cluster_rep"] == 10 and got[10]["is_keeper"]
    assert got[11]["cluster_rep"] == 10 and not got[11]["is_keeper"]
    assert got[20]["cluster_rep"] == 20 and got[21]["cluster_rep"] == 20
    assert got[20]["cluster_size"] == 2
    assert 30 not in got  # singleton never emitted
    if 12 in got:  # near (not exact) dup joins iff a band agrees
        assert got[12]["cluster_rep"] == 10 and got[10]["cluster_size"] == 3
