"""Duplicate-QN canonicalization: deterministic variant minting.

Reference semantics (``function_registry.py:69-90``,
``docs/architecture/graph-schema.md`` "Qualified Name Uniqueness"): the first
definition of a natural QN keeps the plain dotted name; each later definition
is suffixed ``@<start_line>`` (same line, different column → ``:<col>``).
Minting must be **idempotent across runs**, so the window is ordered by
stable source coordinates (doc_id, start_line, start_col), never by
partition/registration order (SURVEY.md §4 custom-work item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEF_KINDS = ("module", "function", "class", "method", "interface", "enum")

_KIND_TO_LABEL = {
    "module": "Module",
    "function": "Function",
    "class": "Class",
    "method": "Method",
    "interface": "Interface",
    "enum": "Enum",
}


def mint_entities(mentions: DataFrame) -> DataFrame:
    """Definition mentions → entity frame with variant qualified names.

    Output columns: label, qn (natural), qualified_name (variant),
    name, doc_id, module_qn, parent_qn, parent_kind, start_line, end_line,
    start_col, props.
    """
    label = F.create_map(
        *[F.lit(x) for kv in _KIND_TO_LABEL.items() for x in kv]
    )
    defs = mentions.filter(F.col("kind").isin(*_DEF_KINDS)).withColumn(
        "label", label[F.col("kind")]
    )

    w = Window.partitionBy("qn").orderBy("doc_id", "start_line", "start_col")
    first_line = F.first("start_line").over(
        Window.partitionBy("qn", "start_line").orderBy("start_col")
    )
    defs = defs.withColumn("rn", F.row_number().over(w)).withColumn(
        "line_rn",
        F.row_number().over(
            Window.partitionBy("qn", "start_line").orderBy("doc_id", "start_col")
        ),
    )
    _ = first_line  # first_line kept for clarity of the rule; rn drives minting
    qualified = (
        F.when(F.col("rn") == 1, F.col("qn"))
        .when(
            F.col("line_rn") == 1,
            F.concat_ws("@", F.col("qn"), F.col("start_line")),
        )
        .otherwise(
            F.concat(
                F.concat_ws("@", F.col("qn"), F.col("start_line")),
                F.lit(":"),
                F.col("start_col"),
            )
        )
    )
    return defs.select(
        "label",
        "qn",
        qualified.alias("qualified_name"),
        "name",
        "doc_id",
        "module_qn",
        "parent_qn",
        "parent_kind",
        "start_line",
        "end_line",
        "start_col",
        "props",
    )
