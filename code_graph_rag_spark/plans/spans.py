"""Span-containment resolution: the "tightest containing span" range join.

Reference: a use site (macro expansion, C# location fact) is attributed to
the smallest definition span containing its line
(``graph_updater.py:499-549`` ``_tightest_containing_span``;
location joins ``graph_updater.py:465-497``). The reference scans linearly;
the Spark form is a per-document **range join** (equi-join on doc_id, theta
on the interval) followed by a ``min_by(span_len)`` window pick — the
as-of/interval-join analogue called out in SURVEY §2.4.

At scale the equi key (doc_id) bounds the theta join to one document's
definitions; AQE handles per-doc size variance. For corpora with huge
single documents, bucketize lines (``line // B``) and join on
(doc_id, bucket) ± 1 to cap the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tightest_containing_span(
    uses: DataFrame, defs: DataFrame
) -> DataFrame:
    """Attribute each use row to the smallest enclosing definition.

    ``uses``: (doc_id, use_id, line[, line_hi]); ``defs``: (doc_id, def_qn,
    start_line, end_line). Returns (use_id, def_qn) — one row per use that
    lands inside at least one definition; ties (same length) break by
    start_line desc (innermost), then def_qn. When ``line_hi`` is present
    the use is an INTERVAL (e.g. a media span straddling two lines) and the
    definition must contain all of it.
    """
    hi = F.col("line_hi") if "line_hi" in uses.columns else F.col("line")
    joined = uses.join(defs, "doc_id").filter(
        (F.col("line") >= F.col("start_line")) & (hi <= F.col("end_line"))
    )
    w = Window.partitionBy("use_id").orderBy(
        (F.col("end_line") - F.col("start_line")).asc(),
        F.col("start_line").desc(),
        F.col("def_qn"),
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("use_id", "def_qn")
    )


def location_join(
    facts: DataFrame, defs: DataFrame
) -> DataFrame:
    """Exact location join: facts keyed (doc_id, line, col) bind to the
    definition registered at that position (reference C#/Roslyn fact
    merging, ``graph_updater.py:465-497``)."""
    return facts.join(
        defs.select(
            "doc_id",
            F.col("start_line").alias("line"),
            F.col("start_col").alias("col"),
            "def_qn",
        ),
        ["doc_id", "line", "col"],
    )
