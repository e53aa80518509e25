"""Argument / keyword data-flow: FLOWS_TO (kind=arg | kind=resource).

Reference: ``parsers/flow_access/processor.py`` (2,065 LoC intra-procedural
taint walk) emits three FLOWS_TO shapes (``docs/architecture/
graph-schema.md:77-83``):

* callee → caller (kind=return, via=return) — already in
  ``plans/io_flow.flow_edges``;
* caller → callee (kind=arg, via=``arg:<i>``/``kw:<name>``) — a tainted
  local passed as an argument to a first-party callee;
* resource → resource (kind=resource) — a value read from one resource
  reaching a write sink in the same body.

Spark form (the reference's own "conservative phase" contract: assignment
taint, one-level argument hand-off, one-level return-taint composition):

* the kernels emit ``assign`` mentions (var = call(...)) and ``argflow``
  mentions (per call argument that is a bare identifier or a direct call);
* taint sources = assigns whose RHS call matches a read sink (broadcast
  registry join), plus params... no — params stay untainted (matches the
  reference's intra-procedural seed rule);
* one level of return-taint: a function whose ``returns`` fact names a
  read sink taints variables assigned from it;
* every edge is an equi-join; the sink registry and the per-doc taint
  frames are broadcast-sized relative to the corpus, and all joins key on
  (doc_id, scope, var) — co-partitioned with the mention frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from code_graph_rag_spark.plans.io_flow import IO_SINKS


def _sink_frame(spark):
    return F.broadcast(
        spark.createDataFrame(
            IO_SINKS,
            "sink string, res_kind string, direction string, "
            "has_target boolean, has_mode boolean",
        )
    )


def _normalize_callee(df: DataFrame, alias: DataFrame, col: str) -> DataFrame:
    """As-written ∪ import-expanded callee (the io_edges normalization),
    producing one `norm` column per candidate row."""
    first = F.split(F.col(col), "\\.").getItem(0)
    rest = F.when(
        F.instr(F.col(col), ".") > 0,
        F.expr(f"substring({col}, instr({col}, '.') + 1)"),
    )
    balias = alias.select(
        F.col("module_qn").alias("a_mqn"),
        F.col("local_name").alias("a_local"),
        "full_qn",
    )
    expanded = df.join(
        balias,
        (df["module_qn"] == F.col("a_mqn")) & (first == F.col("a_local")),
    ).withColumn(
        "norm",
        F.when(rest.isNotNull(), F.concat_ws(".", "full_qn", rest)).otherwise(
            F.col("full_qn")
        ),
    ).drop("a_mqn", "a_local", "full_qn")
    as_written = df.withColumn("norm", F.col(col))
    return as_written.unionByName(expanded)


def arg_flow_edges(
    mentions: DataFrame, resolved: DataFrame, alias: DataFrame
) -> DataFrame:
    """assign + argflow mentions → FLOWS_TO(kind=arg) and
    FLOWS_TO(kind=resource) edge rows."""
    spark = mentions.sparkSession
    sinks = _sink_frame(spark)

    # ---- taint sources: var = <read-sink>(...) ----
    assigns = mentions.filter(F.col("kind") == "assign").select(
        "doc_id",
        "module_qn",
        F.col("parent_qn").alias("scope"),
        F.col("name").alias("var"),
        F.col("callee").alias("rhs"),
        F.col("start_line").alias("assign_line"),
        "arg0_lit",
    )
    read_sinks = sinks.filter(F.col("direction") == "read")
    direct = (
        _normalize_callee(assigns, alias, "rhs")
        .join(read_sinks, F.col("norm") == F.col("sink"))
        .select(
            "doc_id",
            "scope",
            "var",
            "assign_line",
            F.concat_ws(
                "::",
                F.lit("resource"),
                "res_kind",
                F.when(
                    F.col("has_target") & F.col("arg0_lit").isNotNull(),
                    F.col("arg0_lit"),
                ).otherwise(F.lit("<dynamic>")),
            ).alias("origin"),
        )
    )
    # ---- one-level return taint: fn whose `returns` fact is a read sink;
    # vars assigned from a call resolving to such a fn inherit its origin ----
    rets = mentions.filter(F.col("kind") == "returns").select(
        "doc_id",
        "module_qn",
        F.col("parent_qn").alias("fn_qn"),
        F.col("callee").alias("ret_expr"),
    )
    tainted_fns = (
        _normalize_callee(rets, alias, "ret_expr")
        .join(read_sinks, F.col("norm") == F.col("sink"))
        .select(
            F.col("fn_qn"),
            F.concat_ws(
                "::", F.lit("resource"), "res_kind", F.lit("<dynamic>")
            ).alias("origin"),
        )
        .dropDuplicates(["fn_qn"])
    )
    # var = f() where f (resolved through the call ladder) is
    # taint-returning: the RHS call has its own resolved call mention on the
    # same (doc, scope, line, callee) — its line is embedded in mention_id
    rcalls = resolved.filter(F.col("kind") == "call").select(
        F.col("doc_id").alias("r_doc"),
        F.col("caller_qn").alias("r_scope"),
        F.col("callee").alias("r_callee"),
        F.split(F.col("mention_id"), "#").getItem(1).cast("int").alias("r_line"),
        F.col("target_variant"),
    )
    via_ret = (
        assigns.join(
            rcalls,
            (assigns["doc_id"] == F.col("r_doc"))
            & (assigns["scope"] == F.col("r_scope"))
            & (assigns["rhs"] == F.col("r_callee"))
            & (assigns["assign_line"] == F.col("r_line")),
        )
        .join(tainted_fns, F.col("target_variant") == tainted_fns["fn_qn"])
        .select("doc_id", "scope", "var", "assign_line", "origin")
    )
    tainted = direct.unionByName(via_ret).dropDuplicates(
        ["doc_id", "scope", "var", "assign_line", "origin"]
    )

    # ---- argflow rows: per-call args that are identifiers or calls ----
    af = mentions.filter(F.col("kind") == "argflow").select(
        "doc_id",
        "module_qn",
        F.col("parent_qn").alias("caller_qn"),
        F.col("parent_kind").alias("caller_label"),
        F.col("callee"),
        F.col("start_line"),
        F.col("start_col"),
        F.col("target").alias("via"),
        F.col("name").alias("src_expr"),
        F.col("local_name").alias("src_kind"),  # var | call
        "arg0_lit",
    )
    # taint on the arg source
    var_taint = af.filter(F.col("src_kind") == "var").join(
        tainted.select(
            F.col("doc_id").alias("t_doc"),
            F.col("scope").alias("t_scope"),
            F.col("var").alias("t_var"),
            F.col("assign_line"),
            "origin",
        ),
        (F.col("doc_id") == F.col("t_doc"))
        & (F.col("caller_qn") == F.col("t_scope"))
        & (F.col("src_expr") == F.col("t_var"))
        & (F.col("assign_line") <= F.col("start_line")),
    ).drop("t_doc", "t_scope", "t_var", "assign_line")
    # direct call args: g(...) where g is a read sink (origin = that sink)
    call_args = af.filter(F.col("src_kind") == "call")
    call_sink_taint = (
        _normalize_callee(call_args, alias, "src_expr")
        .join(read_sinks, F.col("norm") == F.col("sink"))
        .select(
            *af.columns,
            F.concat_ws(
                "::", F.lit("resource"), "res_kind", F.lit("<dynamic>")
            ).alias("origin"),
        )
    )
    tainted_args = var_taint.select(*af.columns, "origin").unionByName(
        call_sink_taint
    )

    # ---- resolve the outer callee through the call ladder ----
    af_id = tainted_args.withColumn(
        "mention_id",
        F.concat_ws("#", "doc_id", "start_line", "start_col", "callee", F.lit("call")),
    )
    rcall_targets = resolved.filter(
        (F.col("kind") == "call")
        & F.col("target_label").isin("Function", "Method")
    ).select("mention_id", "target_variant", "target_label").dropDuplicates(
        ["mention_id", "target_variant"]
    )
    arg_edges = af_id.join(rcall_targets, "mention_id").select(
        F.col("caller_qn").alias("subj"),
        F.lit("FLOWS_TO").alias("pred"),
        F.col("target_variant").alias("obj"),
        F.col("caller_label").alias("subj_label"),
        F.col("target_label").alias("obj_label"),
        F.create_map(
            F.lit("via"), F.col("via"), F.lit("kind"), F.lit("arg")
        ).alias("props"),
        F.col("doc_id").alias("src_doc"),
    )

    # ---- resource → resource: tainted arg reaching a WRITE sink call ----
    write_sinks = sinks.filter(F.col("direction") == "write")
    res_edges = (
        _normalize_callee(tainted_args, alias, "callee")
        .join(write_sinks, F.col("norm") == F.col("sink"))
        .select(
            F.col("origin").alias("subj"),
            F.lit("FLOWS_TO").alias("pred"),
            F.concat_ws(
                "::",
                F.lit("resource"),
                "res_kind",
                F.when(F.col("res_kind") == "stdout", F.lit("stdout")).otherwise(
                    F.when(
                        F.col("has_target") & F.col("arg0_lit").isNotNull(),
                        F.col("arg0_lit"),
                    ).otherwise(F.lit("<dynamic>"))
                ),
            ).alias("obj"),
            F.lit("Resource").alias("subj_label"),
            F.lit("Resource").alias("obj_label"),
            F.create_map(
                F.lit("via"), F.col("via"), F.lit("kind"), F.lit("resource")
            ).alias("props"),
            F.col("doc_id").alias("src_doc"),
        )
    )
    return arg_edges.unionByName(res_edges).dropDuplicates(
        ["subj", "pred", "obj", "src_doc"]
    )
