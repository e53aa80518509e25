"""RPC exposure + client sinks: the connect-style generated-contract family.

Spark re-expression of the reference's ``parsers/rpc_exposure.py`` (server
side) and the RPC arm of ``parsers/io_access/processor.py:94-143,1593-1604``
(client side). Both sides meet on UNSCOPED ``resource::RPC::<Stem>.<Method>``
nodes, so caller and server join on one node without RESOLVES_TO:

* **Server**: a wiring call ``pkgconnect.New<Stem>Handler(impl)`` proves the
  impl type serves the generated contract. The kernel resolves the impl
  argument's type function-locally (the reference's ``_Binding`` walk,
  rpc_exposure.py:34-46) and emits one ``rpc_wire`` mention; this pass joins
  it to the impl class and fans out one EXPOSES edge per exported method.
  Delta vs the reference: the reference intersects with the generated
  contract's method set; without parsing generated code we take every
  exported (capitalized) method of the impl type.
* **Client**: a call through a ``New<Stem>Client`` binding — the kernel
  types the receiver via its assignment (``recv_expr``) — is I/O on the RPC
  resource: request AND response, so READS_FROM and WRITES_TO both emit
  (io_access/processor.py:1593-1604 READ_WRITE).

Scale: the wire frame is rows-per-wiring-call (tiny) and broadcast; the
class/method joins are equi-joins on (project, simple name) and parent qn —
shuffle-partitioned on corpus-scaling keys, no fan-out beyond methods-per-
impl-type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the generated package name ends in `connect` by codegen convention
_CLIENT_RE = r"(^|\.)\w*connect\.New([A-Z]\w*)Client$"


def rpc_edges(entities: DataFrame, mentions: DataFrame) -> DataFrame:
    """rpc_wire mentions + typed client calls → EXPOSES / READS_FROM /
    WRITES_TO edges on ``resource::RPC::<Stem>.<Method>`` nodes."""
    # ---- server: wiring → impl class → exported methods ----
    wires = mentions.filter(F.col("kind") == "rpc_wire").select(
        F.col("name").alias("stem"),
        F.element_at(F.split("callee", "\\."), -1).alias("impl_name"),
        F.element_at(F.split("parent_qn", "\\."), 1).alias("project"),
        F.col("module_qn").alias("wire_module"),
    )
    classes = entities.filter(F.col("label") == "Class").select(
        F.col("qualified_name").alias("cls_qn"),
        F.col("name").alias("impl_name"),
        F.element_at(F.split("qualified_name", "\\."), 1).alias("project"),
        F.col("module_qn").alias("cls_module"),
    )
    # same-module impl wins over a same-project name collision; rank for a
    # deterministic single binding per wiring row
    w = Window.partitionBy("stem", "impl_name", "project", "wire_module").orderBy(
        F.desc(F.col("cls_module") == F.col("wire_module")), F.asc("cls_qn")
    )
    impl = (
        F.broadcast(wires)
        .join(classes, ["impl_name", "project"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("stem", "cls_qn")
        .dropDuplicates(["stem", "cls_qn"])
    )
    methods = entities.filter(
        (F.col("label") == "Method") & F.col("name").rlike("^[A-Z]")
    ).select(
        F.col("parent_qn").alias("cls_qn"),
        F.col("qualified_name").alias("subj"),
        F.col("name").alias("method"),
        F.col("doc_id").alias("src_doc"),
    )
    exposes = methods.join(F.broadcast(impl), "cls_qn").select(
        "subj",
        F.lit("EXPOSES").alias("pred"),
        F.concat_ws(
            "::",
            F.lit("resource"),
            F.lit("RPC"),
            F.concat_ws(".", "stem", "method"),
        ).alias("obj"),
        F.lit("Method").alias("subj_label"),
        F.lit("Resource").alias("obj_label"),
        F.create_map(F.lit("kind"), F.lit("RPC")).alias("props"),
        "src_doc",
    )

    # ---- client: generated-client method calls → READ_WRITE sinks ----
    ccalls = mentions.filter(
        (F.col("kind") == "call")
        & F.col("recv_expr").rlike(_CLIENT_RE)
        & F.element_at(F.split("callee", "\\."), -1).rlike("^[A-Z]")
    ).select(
        F.col("parent_qn").alias("subj"),
        F.col("parent_kind").alias("subj_label"),
        F.concat_ws(
            "::",
            F.lit("resource"),
            F.lit("RPC"),
            F.concat_ws(
                ".",
                F.regexp_extract("recv_expr", _CLIENT_RE, 2),
                F.element_at(F.split("callee", "\\."), -1),
            ),
        ).alias("obj"),
        F.lit("Resource").alias("obj_label"),
        F.create_map(F.lit("kind"), F.lit("RPC")).alias("props"),
        F.col("doc_id").alias("src_doc"),
    )
    client = ccalls.select(
        "subj", F.lit("READS_FROM").alias("pred"), "obj",
        "subj_label", "obj_label", "props", "src_doc",
    ).unionByName(
        ccalls.select(
            "subj", F.lit("WRITES_TO").alias("pred"), "obj",
            "subj_label", "obj_label", "props", "src_doc",
        )
    )
    return exposes.unionByName(client).dropDuplicates(
        ["subj", "pred", "obj", "src_doc"]
    )
