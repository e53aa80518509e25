"""Benchmark decontamination: flag training documents that share verbatim
word n-grams with an evaluation/benchmark set.

The reference repo has no decontamination operator; this belongs to the
training-data-pipeline family (dedup / sampling / corpus_filter) the engine
adds for LLM corpus work. Semantics follow the published GPT-3 appendix-C /
PaLM recipe: a training document is contaminated iff it shares at least
``min_shared`` distinct word n-grams with any eval document (the papers use
n=13 on web-scale text; the default here is 8 to suit the synthetic
corpus's shorter documents — callers pick n for their corpus).

Scale design (100 TB corpus vs MB-scale benchmark): the eval n-gram set is
SMALL by construction — benchmark suites are thousands of documents, i.e.
at most a few hundred MB of distinct n-grams — so the plan aggregates it
once and BROADCASTS it. The corpus side is then one scan feeding a
broadcast hash join plus one groupBy(doc_id) whose clustering is already
satisfied by the shingle frame's doc_id partitioning: no shuffle keyed on
shingle ever carries corpus-sized data, and no corpus-side frame is ever
the build side of a join. If a benchmark outgrew broadcast, the next rung
would be a bloom-filter semi-join pushdown — not a shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import doc_shingles


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """(doc_id, n_eval_docs, n_shared) for every training document sharing
    ≥ ``min_shared`` distinct word n-grams with the eval set.

    ``train`` / ``eval_docs``: frames with (doc_id, text). ``n_eval_docs``
    counts distinct eval documents hit; ``n_shared`` counts distinct
    n-grams shared with ANY eval document.
    """
    tsh = doc_shingles(train, n)
    esh = doc_shingles(eval_docs, n).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    hits = tsh.join(F.broadcast(esh), "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs"),
            F.countDistinct("shingle").alias("n_shared"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )
