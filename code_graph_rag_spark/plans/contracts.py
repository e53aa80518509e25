"""Contract linking: anchor generated artefacts to the operation their
contract declares (reference ``parsers/contract_linking.py`` +
``parsers/contracts.py``).

The artefacts already exist: an RPC resource where a generated client and
server meet, an endpoint resource where a server registers a route. This
pass adds one CONTRACT resource per declared operation and RESOLVES_TO
edges into it, so one node answers "who implements this operation" across
languages even when client and server share no symbol or URL literal.

Scoping (the reference's rules, kept exactly):

* A contract is declared by THIS project — attribution is the qn's FIRST
  segment; the CONTRACT qn is project-scoped
  (``resource::CONTRACT::<project>::<contract>.<op>``) while RPC
  resources stay unscoped.
* An RPC resource keyed ``<Service>.<Method>`` matches a contract by the
  bare service name (package dropped); an ambiguous key (two ops) claims
  nothing.
* An endpoint template with no literal segment is no evidence; a template
  matching more than one operation names none.

Scale: the ops frame is rows-per-declared-operation (tiny, broadcast);
resource frames are DISTINCT over already-deduped edge outputs. The
segment-wise template compare runs on the broadcast-joined
endpoint × same-project-ops pairs — a bounded cold-path frame, so the
``forall`` HOF is acceptable here (documented exception to the hot-path
HOF ban).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PARAM_SEG = r"^(\{[^/]+\}|<[^/]+>|:[^/]+)$"
_RPC_PREFIX = "resource::RPC::"


def _ops(mentions: DataFrame) -> DataFrame:
    ops = mentions.filter(F.col("kind") == "contract_op").select(
        F.col("local_name").alias("contract"),
        F.col("name").alias("op"),
        F.col("target").alias("method"),
        F.col("arg0_lit").alias("path"),
        F.col("doc_id").alias("src_doc"),
        F.element_at(F.split("doc_id", "/"), 1).alias("project"),
    )
    return ops.withColumn(
        "contract_qn",
        F.concat_ws(
            "::",
            F.lit("resource"),
            F.lit("CONTRACT"),
            F.col("project"),
            F.concat_ws(".", "contract", "op"),
        ),
    )


def contract_edges(
    mentions: DataFrame, endpoint_e: DataFrame, rpc_e: DataFrame
) -> DataFrame:
    ops = _ops(mentions).localCheckpoint(eager=False)

    # ---- the declaring file anchors each operation ----
    anchors = ops.select(
        F.col("src_doc").alias("subj"),
        F.lit("EXPOSES").alias("pred"),
        F.col("contract_qn").alias("obj"),
        F.lit("File").alias("subj_label"),
        F.lit("Resource").alias("obj_label"),
        F.create_map(F.lit("kind"), F.lit("CONTRACT")).alias("props"),
        "src_doc",
    )

    # ---- RPC resources → contract (bare <Service>.<Method> key) ----
    rpc_ops = (
        ops.filter(F.col("method").isNull())
        .withColumn(
            "rpc_key",
            F.concat_ws(
                ".", F.element_at(F.split("contract", "\\."), -1), "op"
            ),
        )
        .withColumn(
            "n_key",
            F.count("*").over(Window.partitionBy("project", "rpc_key")),
        )
        .filter(F.col("n_key") == 1)  # ambiguous key claims nothing
    )
    live_rpc = (
        rpc_e.filter(F.col("obj").startswith(_RPC_PREFIX))
        .select(
            F.col("obj").alias("res_qn"),
            F.expr(f"substring(obj, {len(_RPC_PREFIX) + 1})").alias("rpc_key"),
            F.element_at(F.split("subj", "\\."), 1).alias("project"),
        )
        .dropDuplicates(["res_qn", "project"])
    )
    rpc_links = live_rpc.join(
        F.broadcast(rpc_ops.select("project", "rpc_key", "contract_qn", "src_doc")),
        ["project", "rpc_key"],
    ).select(
        F.col("res_qn").alias("subj"),
        F.lit("RESOLVES_TO").alias("pred"),
        F.col("contract_qn").alias("obj"),
        F.lit("Resource").alias("subj_label"),
        F.lit("Resource").alias("obj_label"),
        F.create_map(F.lit("kind"), F.lit("CONTRACT")).alias("props"),
        "src_doc",
    )

    # ---- endpoint resources → contract (method + template match) ----
    # endpoint qn format: endpoint::<project>::<METHOD> <template>
    live_ep = (
        endpoint_e.filter(F.col("obj").startswith("endpoint::"))
        .select(
            F.col("obj").alias("res_qn"),
            F.split("obj", "::").getItem(1).alias("project"),
            F.split("obj", "::").getItem(2).alias("op_str"),
        )
        .dropDuplicates(["res_qn"])
        .withColumn("ep_method", F.split("op_str", " ").getItem(0))
        .withColumn(
            "template",
            F.expr("substring(op_str, length(split(op_str, ' ')[0]) + 2)"),
        )
        # COLD-PATH HOFs by cardinality: these array ops run once per
        # DISTINCT declared route/URL template (contract-bounded, not
        # corpus-bounded), so the interpreted-HOF rule's per-token ban does
        # not apply — at 100 TB this frame is still thousands of rows
        .withColumn(
            "t_segs",
            F.filter(F.split("template", "/"), lambda s: s != ""),
        )
        # a template with no literal segment says nothing about WHICH
        # operation it serves
        .filter(F.exists("t_segs", lambda s: ~s.rlike(_PARAM_SEG)))
    )
    http_ops = ops.filter(F.col("method").isNotNull()).withColumn(
        "p_segs", F.filter(F.split("path", "/"), lambda s: s != "")
    )
    pairs = live_ep.join(
        F.broadcast(
            http_ops.select(
                "project", "method", "p_segs", "contract_qn", "src_doc"
            )
        ),
        "project",
    ).filter(
        # a registration with no verb serves every method at that path
        F.col("ep_method").isin("ANY") | (F.col("ep_method") == F.col("method"))
    ).filter(
        (F.size("t_segs") == F.size("p_segs"))
        & F.forall(
            F.zip_with(
                "p_segs",
                "t_segs",
                lambda a, e: e.rlike(_PARAM_SEG) | (a == e),
            ),
            lambda x: x,
        )
    )
    ep_links = (
        pairs.withColumn(
            "n_match", F.count("*").over(Window.partitionBy("res_qn"))
        )
        .filter(F.col("n_match") == 1)  # >1 operation matched names none
        .select(
            F.col("res_qn").alias("subj"),
            F.lit("RESOLVES_TO").alias("pred"),
            F.col("contract_qn").alias("obj"),
            F.lit("Resource").alias("subj_label"),
            F.lit("Resource").alias("obj_label"),
            F.create_map(F.lit("kind"), F.lit("CONTRACT")).alias("props"),
            "src_doc",
        )
    )

    return (
        anchors.unionByName(rpc_links)
        .unionByName(ep_links)
        .dropDuplicates(["subj", "pred", "obj", "src_doc"])
    )
