"""Operator tests: text analysis, dedup, similarity, multimodal plumbing.

These run on tiny in-memory frames (fast); the sf0.01 DuckDB-oracle parity
is the driver's CORRECTNESS gate via ``__spark_entry__``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat", "en", "a", 22),
        (2, "the cat sat on the mat", "en", "b", 22),  # exact dup of 1
        (3, "the cat sat on the red mat", "en", "c", 26),  # near dup
        (4, "le chat est sur le tapis et la table", "fr", "d", 37),
        (5, "completely different text about spark pipelines", "en", "e", 48),
        (6, "", "en", "f", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_token_stats(docs):
    from code_graph_rag_spark.operators.text import token_stats

    out = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    assert out[1] == 6
    assert out[6] == 0


def test_quality_and_langid(docs):
    from code_graph_rag_spark.operators.text import language_id, quality_score

    q = {r.doc_id: r for r in quality_score(docs).collect()}
    assert q[6].quality <= q[1].quality
    assert 0.0 <= q[1].stopword_ratio <= 1.0
    langs = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert langs[1] == "en"
    assert langs[4] == "fr"


def test_exact_duplicates(docs):
    from code_graph_rag_spark.operators.dedup import (
        dedup_keep_first,
        exact_duplicates,
    )

    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 2]
    assert groups[0].keeper == 1
    kept = {r.doc_id for r in dedup_keep_first(docs).collect()}
    assert kept == {1, 3, 4, 5, 6}


def test_ngram_jaccard(docs):
    from code_graph_rag_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup found
    assert all(a != 5 and b != 5 for a, b in pairs)


def test_minhash_lsh(docs):
    from code_graph_rag_spark.operators.dedup import lsh_candidate_pairs

    pairs = {
        (r.doc_a, r.doc_b): r.sig_agree
        for r in lsh_candidate_pairs(docs).collect()
    }
    assert pairs.get((1, 2)) == 1.0  # identical docs always collide


def test_simhash(docs):
    from code_graph_rag_spark.operators.dedup import simhash

    out = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert out[1] == out[2]  # identical text → identical fingerprint
    ham13 = bin(out[1] ^ out[3]).count("1")
    ham15 = bin(out[1] ^ out[5]).count("1")
    assert ham13 < ham15  # near dup closer than unrelated


def test_brute_force_topk(spark):
    from code_graph_rag_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "query_id long, q_embedding array<float>"
    )
    rows = brute_force_topk(corpus, queries, k=2).collect()
    assert rows[0].vec_id == 0 and abs(rows[0].cosine - 1.0) < 1e-6
    assert len(rows) == 2


def test_lsh_topk_matches_bruteforce_top1(spark):
    from code_graph_rag_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    import math

    corpus = spark.createDataFrame(
        [
            (i, [math.sin(i * 1.3 + j) for j in range(8)])
            for i in range(50)
        ],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    bf = {
        r.query_id: r.vec_id
        for r in brute_force_topk(corpus, queries, k=1).collect()
    }
    approx = {
        r.query_id: r.vec_id
        for r in lsh_topk(corpus, queries, dim=8, k=1).collect()
    }
    # a query vector is in its own bucket → top-1 must be itself
    assert approx == bf


def test_multimodal_plumbing(spark):
    from code_graph_rag_spark.fixtures import polyglot
    from code_graph_rag_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    media = media_from_documents(polyglot(spark))
    feats = sorted(extract_features(media).collect(), key=lambda r: r.media_id)
    assert len(feats) == 2
    f0 = feats[1]
    assert f0.media_id == "assets/shape-diagram.png"
    assert f0.n_bytes == len(b"assets/shape-diagram.png")
    assert len(f0.features) == 8
    # deterministic fake decoder
    again = sorted(
        extract_features(media).collect(), key=lambda r: r.media_id
    )[1]
    assert again.features == f0.features


def test_lsh_topk_recall_vs_bruteforce(spark):
    """Multi-probe LSH must reach recall@10 ≥ 0.8 vs brute force — an
    approximate operator with unmeasured recall is indistinguishable from a
    broken one (round-1 verdict)."""
    import math

    from code_graph_rag_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    corpus = spark.createDataFrame(
        [
            (i, [math.sin(i * 0.7 + j * 1.9) + math.cos(i * j * 0.13) for j in range(16)])
            for i in range(200)
        ],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.limit(5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(corpus, queries, k=10).collect()
    }
    ap = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(corpus, queries, dim=16, k=10).collect()
    }
    recall = len(bf & ap) / len(bf)
    assert recall >= 0.8, f"recall@10={recall:.2f}"


def test_hub_shingle_cap_bounds_pairs(spark):
    """Adversarial boilerplate corpus: every doc shares a boilerplate
    sentence. Uncapped, the inverted-index join pairs everything with
    everything; the DF cap drops the hub shingles and bounds the output."""
    from code_graph_rag_spark.operators.dedup import (
        hub_shingles,
        ngram_jaccard_pairs,
    )

    boiler = "this document is confidential and proprietary to the company"
    rows = [
        (i, f"{boiler} unique content piece number {i} with extra {i * 7}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(
        docs, threshold=0.0, max_df_frac=None
    ).count()
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_df_frac=0.5).count()
    assert uncapped == 40 * 39 / 2  # every pair shares the boilerplate
    assert capped == 0  # hub shingles dropped; unique tails never collide
    hubs = hub_shingles(docs, max_df_frac=0.5).collect()
    assert all(h.df == 40 for h in hubs) and len(hubs) >= 8


def test_lsh_band_bucket_cap(spark):
    """A boilerplate band bucket larger than max_bucket is dropped — and the
    cap is ON by default (the uncapped join needs an explicit opt-out)."""
    from code_graph_rag_spark.operators.dedup import lsh_candidate_pairs

    rows = [(i, "identical boilerplate text in every doc") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    unbounded = lsh_candidate_pairs(docs, max_bucket=None).count()
    default_cap = lsh_candidate_pairs(docs).count()  # 30 ≤ 1024 → kept
    bounded = lsh_candidate_pairs(docs, max_bucket=5).count()
    assert unbounded == 30 * 29 / 2
    assert default_cap == unbounded
    assert bounded == 0


def test_linking_band_bucket_cap(spark):
    """Entity-linking band self-join honors its (default-on) bucket cap."""
    from code_graph_rag_spark.linking import lsh_link_candidates

    # hub: many QNs sharing the same simple name and near-identical shape
    rows = [(f"pkg.mod{i:03d}.Handler",) for i in range(40)]
    ents = spark.createDataFrame(rows, "qualified_name string")
    uncapped = lsh_link_candidates(ents, max_bucket=None, min_agreement=0.0).count()
    capped = lsh_link_candidates(ents, max_bucket=3, min_agreement=0.0).count()
    assert uncapped > 0
    assert capped < uncapped


def test_embedding_near_dup_bucket_cap(spark):
    """Dense-bucket cap bounds the intra-bucket all-pairs join."""
    from code_graph_rag_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    # 30 identical vectors → one dense bucket
    rows = [(i, [1.0, 0.5, -0.25, 0.125]) for i in range(30)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = embedding_near_duplicates(corpus, max_bucket=None).count()
    capped = embedding_near_duplicates(corpus, max_bucket=5).count()
    assert uncapped == 30 * 29 / 2
    assert capped == 0
