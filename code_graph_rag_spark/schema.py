"""Schemas: the documents input contract, the mention IR, and the output tables.

Mirrors the reference's data model (labels/keys: ``constants/graph.py:87-137``;
relationship types: ``constants/graph.py:147-172``; capture groups:
``constants/graph.py:175-257``) re-expressed as Spark StructTypes.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Node labels and their unique keys (reference constants/graph.py:112-137)
# ---------------------------------------------------------------------------

NODE_KEYS: dict[str, str] = {
    "Project": "name",
    "Package": "qualified_name",
    "Folder": "path",
    "File": "path",
    "Module": "qualified_name",
    "Class": "qualified_name",
    "Function": "qualified_name",
    "Method": "qualified_name",
    "Interface": "qualified_name",
    "Enum": "qualified_name",
    "ExternalModule": "qualified_name",
    "ModuleInterface": "qualified_name",
    "ModuleImplementation": "qualified_name",
    "ExternalPackage": "name",
    "MediaAsset": "name",
    "Resource": "qualified_name",
}

# Relationship types (reference constants/graph.py:147-172), grouped by
# capture group (constants/graph.py:175-237). Defaults exclude io/findings
# (graph.py:250-257).
CAPTURE_GROUPS: dict[str, set[str]] = {
    "structure": {
        "CONTAINS_PACKAGE",
        "CONTAINS_FOLDER",
        "CONTAINS_FILE",
        "CONTAINS_MODULE",
        "DEFINES",
        "DEFINES_METHOD",
    },
    "imports": {"IMPORTS", "EXPORTS", "EXPORTS_MODULE", "DEPENDS_ON_EXTERNAL"},
    "types": {"INHERITS", "IMPLEMENTS", "IMPLEMENTS_MODULE", "OVERRIDES"},
    "calls": {"CALLS", "REFERENCES", "INSTANTIATES"},
    "io": {"READS_FROM", "WRITES_TO", "FLOWS_TO", "EXPOSES", "RESOLVES_TO"},
    "findings": {"IMPLEMENTS_PATTERN", "HAS_SMELL", "HAS_VULNERABILITY"},
    # engine extension for the interleaved-span input contract: media spans
    # attributed to their tightest enclosing definition (plans/spans.py)
    "media": {"HAS_MEDIA"},
    # transform-only group (no predicates of its own): annotates
    # ExternalModule nodes with is_stdlib / module_path via the static-table
    # fold (plans/stdlib.py, reference parsers/stdlib_extractor.py) — opt-in
    # like the reference's toolchain probes
    "stdlib": set(),
}
DEFAULT_GROUPS = ("structure", "imports", "types", "calls", "media")


def enabled_rels(groups: tuple[str, ...] = DEFAULT_GROUPS) -> set[str]:
    """The rel-type whitelist for a capture-group selection — applied as one
    ``filter(col('pred').isin(...))`` on the triple frame (the Spark analogue
    of the reference's FilteringIngestor choke point, graph_updater.py:236-242).
    """
    out: set[str] = set()
    for g in groups:
        out |= CAPTURE_GROUPS[g]
    return out


# ---------------------------------------------------------------------------
# Input: interleaved-span documents (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), False),
    ]
)

# ---------------------------------------------------------------------------
# Mention IR: the single output row type of the extraction UDF.
# One input document yields N mention rows (UDTF-style flatMap inside
# mapInPandas). Everything downstream is DataFrame joins over this frame.
# ---------------------------------------------------------------------------

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("module_qn", T.StringType(), False),
        # kind: module | function | class | interface | enum | method
        #     | import | call | ref | inherit | export | dependency | returns
        #     | media | assign (var = call(), taint source) | argflow (one
        #     call argument that names a local or a call result) | mount
        #     (router mount registration, endpoint prefixes)
        T.StructField("kind", T.StringType(), False),
        # natural qualified name (pre variant-minting) for definitions;
        # null for call/import/inherit mentions
        T.StructField("qn", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        # enclosing-scope QN: module/class/function the mention sits inside
        T.StructField("parent_qn", T.StringType(), True),
        # 'Module' | 'Class' | 'Function' | 'Method' for parent label
        T.StructField("parent_kind", T.StringType(), True),
        T.StructField("start_line", T.IntegerType(), True),
        T.StructField("end_line", T.IntegerType(), True),
        T.StructField("start_col", T.IntegerType(), True),
        # imports: local_name + target (full dotted path as written)
        T.StructField("local_name", T.StringType(), True),
        T.StructField("target", T.StringType(), True),
        # calls/refs: callee name exactly as written (may be dotted)
        T.StructField("callee", T.StringType(), True),
        # in-UDF caller-sensitive resolution hints (SURVEY §7.3 hard part a):
        # nested enclosing-scope hit (ladder rung 2) and class-context hit
        # (rung 10) are decidable from the single document, so they are
        # computed inside the UDF and arbitrated later by priority rank.
        T.StructField("enclosing_hint", T.StringType(), True),
        T.StructField("class_ctx_hint", T.StringType(), True),
        # super() dispatch: the class whose ancestor chain provides the
        # method (resolved by a closure join, reference rung 6)
        T.StructField("super_hint", T.StringType(), True),
        # io-sink literal args (open('path', 'mode') → path/mode; url; env
        # key) read from the literal-preserving line; the io pass joins the
        # alias-expanded callee against the sink registry downstream
        T.StructField("arg0_lit", T.StringType(), True),
        T.StructField("arg1_lit", T.StringType(), True),
        # outermost call of a `return f(...)` statement → FLOWS_TO source
        T.StructField("is_ret", T.BooleanType(), True),
        # receiver-type source expression, as written (v = Circle() →
        # 'Circle'; chained make().m() → 'make'): the class it names is
        # resolved downstream by the type-inference rung joins
        # (reference parsers/type_inference.py; SURVEY §2.12)
        T.StructField("recv_expr", T.StringType(), True),
        # inherits: 0-based position in the base list (semantic: first-match
        # -wins method resolution; reference keeps base_index on the edge)
        T.StructField("base_index", T.IntegerType(), True),
        # definition properties (JSON: decorators, docstring, is_exported...)
        T.StructField("props", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Output tables
# ---------------------------------------------------------------------------

NODES_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType(), False),
        T.StructField("qualified_name", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("start_line", T.IntegerType(), True),
        T.StructField("end_line", T.IntegerType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("subj_label", T.StringType(), True),
        T.StructField("obj_label", T.StringType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Edge-dedup keys: (subj,pred,obj) except rel types whose provenance props
# are part of identity (reference MERGE_KEY_PROPS_BY_REL,
# constants/graph.py:470-472).
MERGE_KEY_PROPS_BY_REL: dict[str, list[str]] = {"FLOWS_TO": ["via", "kind"]}
