"""Cross-corpus (new batch vs existing corpus) MinHash-LSH dedup."""

from __future__ import annotations

from code_graph_rag_spark.operators.dedup import cross_corpus_dups

LOREM = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions under a pale autumn moon near the river bend"
)
OTHER = (
    "completely unrelated legal boilerplate about warranty disclaimers "
    "and limitation of liability in all capital letters for many lines"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_cross_duplicate_flagged_with_full_agreement(spark):
    corpus = _docs(spark, [(10, LOREM), (11, OTHER)])
    new = _docs(
        spark,
        [
            (100, LOREM),  # verbatim copy of corpus doc 10
            (101, "totally fresh content with no shared trigrams anywhere"),
        ],
    )
    rows = {r["doc_id"]: r for r in cross_corpus_dups(new, corpus).collect()}
    assert set(rows) == {100}
    r = rows[100]
    assert r["corpus_doc_id"] == 10
    assert r["sig_agree"] == 1.0
    assert r["n_matches"] == 1


def test_best_match_tiebreak_and_match_count(spark):
    # two identical corpus docs: best match is the LOWEST corpus id,
    # n_matches counts both
    corpus = _docs(spark, [(20, LOREM), (21, LOREM)])
    new = _docs(spark, [(100, LOREM)])
    rows = cross_corpus_dups(new, corpus).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["corpus_doc_id"] == 20
    assert r["sig_agree"] == 1.0
    assert r["n_matches"] == 2


def test_min_agree_threshold_excludes_weak_matches(spark):
    # a small appended tail flips a few signature rows (measured 0.8125
    # agreement) but still collides on at least one full band, while a long
    # rewritten suffix flips some row in EVERY band and never becomes a
    # candidate at all — the two regimes that bracket LSH recall
    near = LOREM + " extra tail words"
    far = LOREM + " plus a long distinct suffix that rewrites many shingles"
    corpus = _docs(spark, [(30, LOREM)])
    new = _docs(spark, [(100, near), (101, far)])
    strict = cross_corpus_dups(new, corpus, min_agree=1.0).collect()
    assert strict == []
    loose = cross_corpus_dups(new, corpus, min_agree=0.0).collect()
    assert [r["doc_id"] for r in loose] == [100]
    assert 0.0 < loose[0]["sig_agree"] < 1.0


def test_combined_bucket_cap_drops_boilerplate_bands(spark):
    # cap=1: every (band, hash) bucket holding both the new copy and the
    # corpus original has combined size 2 > 1, so all candidate routes are
    # capped away and the result is empty — the skew guard is exercised
    corpus = _docs(spark, [(40, LOREM)])
    new = _docs(spark, [(100, LOREM)])
    assert cross_corpus_dups(new, corpus, max_bucket=1).count() == 0
