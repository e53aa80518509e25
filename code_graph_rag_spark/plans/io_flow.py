"""IO access + data-flow edges (the reference's ``io`` capture group).

Reference: ``parsers/io_access/processor.py`` walks each caller's AST
against a per-language sink registry (``io_access/registry.py``) and emits
``caller READS_FROM/WRITES_TO Resource`` with synthetic resource ids
``resource::<kind>::<identity>`` (``io_access/constants.py:57``);
``parsers/flow_access/processor.py`` emits ``FLOWS_TO`` value-flow edges
keyed by (via, kind) props (``constants/graph.py:471``).

Spark form: the kernel already extracted every call's literal arg0/arg1 and
its return-position flag; here the sink REGISTRY IS A BROADCAST TABLE and
sink matching is one equi-join on the import-expanded callee — no UDF, no
per-row Python. Like the reference, the ``io`` capture group is OFF in the
default group set (``constants/graph.py:250-257``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (normalized callee, resource kind, declared direction, has_target_arg,
# has_mode_arg) — the Python rows of the reference's io_access/registry.py
# sink table. Only ``open`` takes a mode string; other sinks keep their
# declared direction regardless of literal args.
IO_SINKS: list[tuple[str, str, str, bool, bool]] = [
    ("open", "file", "read", True, True),
    ("os.getenv", "env", "read", True, False),
    ("os.environ.get", "env", "read", True, False),
    ("print", "stdout", "write", False, False),
    ("json.load", "file", "read", False, False),
    ("json.dump", "file", "write", False, False),
    ("requests.get", "network", "read", True, False),
    ("requests.head", "network", "read", True, False),
    ("requests.post", "network", "write", True, False),
    ("requests.put", "network", "write", True, False),
    ("requests.patch", "network", "write", True, False),
    ("requests.delete", "network", "write", True, False),
    ("urllib.request.urlopen", "network", "read", True, False),
]

DYNAMIC_TARGET = "<dynamic>"


def io_edges(mentions: DataFrame, alias: DataFrame) -> DataFrame:
    """call mentions × sink registry → READS_FROM / WRITES_TO edges.

    The callee is normalized two ways — as written, and import-expanded
    through the alias frame (``from os import getenv`` → ``os.getenv``) —
    and each candidate equi-joins the broadcast sink table. ``open``-style
    mode strings refine the declared direction (``mode`` chars w/a/x →
    write, ``+`` → read AND write, io_access/constants.py:64-67).
    """
    spark = mentions.sparkSession
    sinks = F.broadcast(
        spark.createDataFrame(
            IO_SINKS,
            "sink string, res_kind string, direction string, "
            "has_target boolean, has_mode boolean",
        )
    )
    calls = mentions.filter(F.col("kind") == "call").select(
        "doc_id",
        "module_qn",
        F.col("parent_qn").alias("subj"),
        F.col("parent_kind").alias("subj_label"),
        "callee",
        "arg0_lit",
        "arg1_lit",
        F.split(F.col("callee"), "\\.").getItem(0).alias("first_seg"),
        F.when(
            F.instr(F.col("callee"), ".") > 0,
            F.expr("substring(callee, instr(callee, '.') + 1)"),
        ).alias("rest"),
    )
    # alias frame scales with the corpus — AQE decides broadcast at runtime
    balias = alias.select(
        F.col("module_qn").alias("a_mqn"),
        F.col("local_name").alias("a_local"),
        "full_qn",
    )
    expanded = calls.join(
        balias,
        (calls["module_qn"] == F.col("a_mqn"))
        & (calls["first_seg"] == F.col("a_local")),
    ).select(
        "doc_id",
        "subj",
        "subj_label",
        "arg0_lit",
        "arg1_lit",
        F.when(F.col("rest").isNotNull(), F.concat_ws(".", "full_qn", "rest"))
        .otherwise(F.col("full_qn"))
        .alias("norm"),
    )
    as_written = calls.select(
        "doc_id",
        "subj",
        "subj_label",
        "arg0_lit",
        "arg1_lit",
        F.col("callee").alias("norm"),
    )
    hits = as_written.unionByName(expanded).join(
        sinks, F.col("norm") == sinks["sink"]
    )

    # the mode-string refinement applies ONLY to sinks that take a mode
    # argument (open); e.g. print(x, "a+b") must stay a plain stdout write
    mode = F.when(F.col("has_mode"), F.coalesce(F.col("arg1_lit"), F.lit(""))).otherwise(
        F.lit("")
    )
    is_write = (
        (F.col("direction") == "write")
        | mode.rlike("[wax]")
        | mode.contains("+")
    )
    is_read = (
        (F.col("direction") == "read") & ~mode.rlike("[wax]")
    ) | mode.contains("+")
    identity = F.when(F.col("res_kind") == "stdout", F.lit("stdout")).otherwise(
        F.when(
            F.col("has_target") & F.col("arg0_lit").isNotNull(),
            F.col("arg0_lit"),
        ).otherwise(F.lit(DYNAMIC_TARGET))
    )
    base = hits.select(
        "subj",
        "subj_label",
        F.concat_ws("::", F.lit("resource"), "res_kind", identity).alias("obj"),
        F.lit("Resource").alias("obj_label"),
        F.create_map(F.lit("kind"), F.col("res_kind")).alias("props"),
        F.col("doc_id").alias("src_doc"),
        is_read.alias("r"),
        is_write.alias("w"),
    )
    reads = base.filter(F.col("r")).select(
        "subj", F.lit("READS_FROM").alias("pred"), "obj",
        "subj_label", "obj_label", "props", "src_doc",
    )
    writes = base.filter(F.col("w")).select(
        "subj", F.lit("WRITES_TO").alias("pred"), "obj",
        "subj_label", "obj_label", "props", "src_doc",
    )
    return reads.unionByName(writes).dropDuplicates(
        ["subj", "pred", "obj", "src_doc"]
    )


def flow_edges(resolved: DataFrame) -> DataFrame:
    """``return g(...)`` → ``g FLOWS_TO f`` (via=return, kind=call).

    The flow_access analogue for the return-value flow family: the callee's
    result flows into the caller's return value. (via, kind) are part of the
    edge identity (MERGE_KEY_PROPS_BY_REL).
    """
    return (
        resolved.filter(
            (F.col("kind") == "call")
            & F.col("is_ret")
            & F.col("target_label").isin("Function", "Method")
        )
        .select(
            F.col("target_variant").alias("subj"),
            F.lit("FLOWS_TO").alias("pred"),
            F.col("caller_qn").alias("obj"),
            F.col("target_label").alias("subj_label"),
            F.col("caller_label").alias("obj_label"),
            F.create_map(
                F.lit("via"), F.lit("return"), F.lit("kind"), F.lit("call")
            ).alias("props"),
            F.col("doc_id").alias("src_doc"),
        )
        .dropDuplicates(["subj", "pred", "obj", "src_doc"])
    )
