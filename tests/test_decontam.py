"""Benchmark decontamination: planted-overlap exactness + threshold edges."""

from __future__ import annotations

from code_graph_rag_spark.operators.decontam import decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_planted_ngram_overlap_flagged_exactly(spark):
    # eval doc carries a distinctive 8-token phrase; train doc 1 repeats it
    # verbatim (contaminated), train doc 2 shares only 7 consecutive tokens
    # (one token swapped inside the window — NOT contaminated at n=8),
    # train doc 3 is disjoint.
    phrase = "alpha bravo charlie delta echo foxtrot golf hotel"
    ev = _docs(spark, [(100, f"unrelated prefix {phrase} and a suffix")])
    tr = _docs(
        spark,
        [
            (1, f"some lead-in text {phrase} trailing words here"),
            (2, "alpha bravo charlie delta echo foxtrot golf INDIA x y z"),
            (3, "completely different tokens with zero overlap at all"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_eval_docs"], r["n_shared"])
        for r in decontaminate(tr, ev, n=8).collect()
    }
    assert set(got) == {1}
    n_eval_docs, n_shared = got[1]
    assert n_eval_docs == 1
    # exactly the one 8-gram is shared: the surrounding tokens differ
    assert n_shared == 1


def test_min_shared_threshold_and_multi_eval(spark):
    # train doc shares one 2-gram with each of two eval docs
    ev = _docs(spark, [(100, "red green"), (200, "blue white")])
    tr = _docs(spark, [(1, "red green blue white"), (2, "black pink")])
    rows = decontaminate(tr, ev, n=2).collect()
    assert len(rows) == 1
    r = rows[0]
    # "red green", "blue white" shared (and "green blue" matches nothing)
    assert r["doc_id"] == 1 and r["n_eval_docs"] == 2 and r["n_shared"] == 2
    # raising min_shared past the overlap empties the result
    assert decontaminate(tr, ev, n=2, min_shared=3).count() == 0


def test_short_docs_use_whole_text_shingle(spark):
    # docs shorter than n tokens contribute their whole token string —
    # an exact short-doc duplicate is still caught
    ev = _docs(spark, [(100, "tiny doc")])
    tr = _docs(spark, [(1, "tiny doc"), (2, "tiny dog")])
    got = [r["doc_id"] for r in decontaminate(tr, ev, n=8).collect()]
    assert got == [1]
