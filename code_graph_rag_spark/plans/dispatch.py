"""String-keyed dispatch registries → DISPATCH resource edges.

Reference: ``parsers/dispatch_registry.py`` (issue #913). A handler
registered under a string key serves work scheduled elsewhere by that same
string, invisibly to call resolution; the two sides meet on a shared
``resource::DISPATCH::<key>`` node instead:

* registrations — module-level dict registries mapping string literals to
  module functions (``_process_dict_registry``: a dict is a registry ONLY
  when EVERY entry maps a plain string literal to an identifier resolving
  to a module-local or imported Function/Method — all-or-nothing), and
  ``@flow`` / ``@task`` registrar decorators (``_registrar_key``: explicit
  ``name="x"`` literal wins; a non-literal explicit name yields nothing;
  else the hyphenated function name; a same-module function named like a
  registrar is NOT the external registrar) — emit
  handler ``EXPOSES resource::DISPATCH::<key>``;
* producers — a ``workflow_name=`` keyword argument whose value is a plain
  string literal or a module-level string constant
  (``_process_producers`` + the deferred-constant resolution in
  ``finalize``) — emit enclosing Function/Method (else Module)
  ``WRITES_TO resource::DISPATCH::<key>``;
* deployment-suffix resolution — a produced ``name/deployment`` key that
  is itself unregistered while its head (before the first ``/``) is
  registered emits ``resource::DISPATCH::<key> RESOLVES_TO
  resource::DISPATCH::<head>`` with both resource nodes ensured
  (``finalize``, the issue-#652 dangling-endpoint defect class).

Kernel split (the Spark re-expression): everything decidable from ONE
document — key literals, module-constant resolution, enclosing scope,
decorator handler QNs, dict-entry shapes — is emitted by ``pylite`` as
``dispatch_reg`` / ``dispatch_prod`` facts; everything needing the global
symbol table — dict-handler verification against the entity table and the
all-entries-valid gate, produced-vs-registered key matching — runs here as
joins. Both edge families ride the io capture group like the reference
(gated on EXPOSES/WRITES_TO/RESOLVES_TO being enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESOURCE_FMT = "resource::DISPATCH::"  # reference RESOURCE_QN_FORMAT


def _resource(col: F.Column) -> F.Column:
    return F.concat(F.lit(_RESOURCE_FMT), col)


def dispatch_edges(
    mentions: DataFrame, entities: DataFrame, alias: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """dispatch facts → (EXPOSES rows, WRITES_TO rows).

    EXPOSES subj = the registered handler's minted qualified_name;
    WRITES_TO subj = the producing scope (Function/Method qualified_name,
    else the module). Objects are ``resource::DISPATCH::<key>`` with
    obj_label Resource — the pipeline's resource_nodes pass mints the node
    (name = the key, reference ``_ensure_resource``).
    """
    fm = entities.filter(F.col("label").isin("Function", "Method")).select(
        F.col("qn").alias("e_qn"),
        F.col("qualified_name").alias("e_variant"),
        F.col("label").alias("e_label"),
    )

    regs = mentions.filter(F.col("kind") == "dispatch_reg")
    # ---- decorator registrations: handler qn resolved kernel-side ----
    dec = (
        regs.filter(F.col("target").isNull())
        .select(
            F.col("qn").alias("handler_qn"),
            F.col("name").alias("key"),
            F.col("doc_id"),
        )
        .join(fm, F.col("handler_qn") == fm["e_qn"])
    )
    # ---- dict registrations: verify each entry's handler against the
    # entity table via same-module then import-alias (reference
    # _resolve_handler order), then the all-or-nothing gate ----
    dic = regs.filter(F.col("target").isNotNull()).select(
        F.col("doc_id"),
        F.col("module_qn"),
        F.col("name").alias("key"),
        F.col("callee").alias("handler"),
        F.col("target").alias("dict_id"),
        F.get_json_object("props", "$.n").cast("int").alias("n_entries"),
    )
    same = dic.withColumn(
        "cand", F.concat_ws(".", "module_qn", "handler")
    ).withColumn("prio", F.lit(1))
    via_alias = (
        dic.join(
            alias.select(
                F.col("module_qn").alias("a_mqn"),
                F.col("local_name").alias("a_local"),
                "full_qn",
                "is_external",
            ),
            (dic["module_qn"] == F.col("a_mqn"))
            & (dic["handler"] == F.col("a_local")),
        )
        .filter(~F.col("is_external"))
        .select(*dic.columns, F.col("full_qn").alias("cand"))
        .withColumn("prio", F.lit(2))
    )
    cands = (
        same.unionByName(via_alias)
        .join(fm, F.col("cand") == fm["e_qn"])
    )
    w = Window.partitionBy("doc_id", "dict_id", "key", "handler").orderBy(
        "prio", "cand"
    )
    per_entry = cands.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    # all-or-nothing: a dict is a registry only when EVERY entry verified
    # (one failed handler disqualifies the whole dict — config dicts out)
    wd = Window.partitionBy("doc_id", "dict_id")
    dic_ok = per_entry.withColumn(
        "n_ok", F.count("*").over(wd)
    ).filter(F.col("n_ok") == F.col("n_entries"))

    exposes = (
        dec.select(
            F.col("e_variant").alias("subj"),
            F.lit("EXPOSES").alias("pred"),
            _resource(F.col("key")).alias("obj"),
            F.col("e_label").alias("subj_label"),
            F.lit("Resource").alias("obj_label"),
            F.col("doc_id").alias("src_doc"),
        )
        .unionByName(
            dic_ok.select(
                F.col("e_variant").alias("subj"),
                F.lit("EXPOSES").alias("pred"),
                _resource(F.col("key")).alias("obj"),
                F.col("e_label").alias("subj_label"),
                F.lit("Resource").alias("obj_label"),
                F.col("doc_id").alias("src_doc"),
            )
        )
        .dropDuplicates(["subj", "obj", "src_doc"])
    )

    # ---- producers: enclosing scope resolved kernel-side; map the natural
    # qn to the minted variant, module fallback when no enclosing def ----
    prods = mentions.filter(F.col("kind") == "dispatch_prod").select(
        "doc_id",
        "module_qn",
        F.col("name").alias("key"),
        F.col("parent_qn"),
        F.col("parent_kind"),
    )
    prod_fn = prods.filter(F.col("parent_kind") != "Module").join(
        fm, prods["parent_qn"] == fm["e_qn"], "left"
    )
    writes = (
        prod_fn.select(
            # an enclosing def the entity table does not know falls back to
            # the module (reference _enclosing_caller_spec registry check)
            F.coalesce("e_variant", "module_qn").alias("subj"),
            F.lit("WRITES_TO").alias("pred"),
            _resource(F.col("key")).alias("obj"),
            F.coalesce("e_label", F.lit("Module")).alias("subj_label"),
            F.lit("Resource").alias("obj_label"),
            F.col("doc_id").alias("src_doc"),
        )
        .unionByName(
            prods.filter(F.col("parent_kind") == "Module").select(
                F.col("module_qn").alias("subj"),
                F.lit("WRITES_TO").alias("pred"),
                _resource(F.col("key")).alias("obj"),
                F.lit("Module").alias("subj_label"),
                F.lit("Resource").alias("obj_label"),
                F.col("doc_id").alias("src_doc"),
            )
        )
        .dropDuplicates(["subj", "obj", "src_doc"])
    )
    return exposes, writes


def dispatch_resolves(io_all: DataFrame, exposes_all: DataFrame) -> DataFrame:
    """Deployment-suffix links, recomputed GLOBALLY every run (scoped
    builds pass kept rows in, exactly like the URL→endpoint resolver):
    a produced ``x/dev`` key that is not itself registered RESOLVES_TO a
    registered ``x`` (reference ``finalize``). Global registered-key set =
    the EXPOSES rows' DISPATCH resources (the incremental analogue of
    ``_db_registered_keys``)."""
    registered = (
        exposes_all.filter(F.col("obj").startswith(_RESOURCE_FMT))
        .select(F.expr(f"substring(obj, {len(_RESOURCE_FMT) + 1})").alias("rkey"))
        .distinct()
    )
    produced = (
        io_all.filter(
            (F.col("pred") == "WRITES_TO")
            & F.col("obj").startswith(_RESOURCE_FMT)
        )
        .select(F.expr(f"substring(obj, {len(_RESOURCE_FMT) + 1})").alias("key"))
        .filter(F.instr("key", "/") > 0)
        .distinct()
        .withColumn("head", F.split("key", "/").getItem(0))
    )
    return (
        produced.join(registered, produced["key"] == registered["rkey"], "left_anti")
        .join(registered, produced["head"] == registered["rkey"], "left_semi")
        .select(
            _resource(F.col("key")).alias("subj"),
            F.lit("RESOLVES_TO").alias("pred"),
            _resource(F.col("head")).alias("obj"),
            F.lit("Resource").alias("subj_label"),
            F.lit("Resource").alias("obj_label"),
            F.lit(None).cast("string").alias("src_doc"),
        )
    )
