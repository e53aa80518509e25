"""Declarative pattern-driven language tier.

Reference parity: ``parsers/ast_grep_tier.py:1-278`` + its
``ast_grep_patterns/*.yaml`` configs (issue #414) let a contributor add
BASIC structural support for a language with a config file instead of a
hand-written tree-sitter traversal: per-language pattern lists whose
matches become Module/Function/Class nodes plus DEFINES/IMPORTS edges,
``$NAME``/``$PATH`` metavars, flat names, no call-graph, and a
first-pattern-to-match-claims-the-line rule (README.md convention:
specific patterns before general ones).

DOCUMENTED DIVERGENCE: the reference claims lines PER LABEL (a class
pattern and a function pattern can both claim one line); this
implementation is globally first-match-wins across the whole compiled
rule chain, so a line matching rules of two kinds emits only the first
kind's mention. The DuckDB oracle implements the same global rule, so
both sides of the certification agree on the chosen semantics.

Spark-first re-expression: instead of running an external matcher per
file, a config COMPILES to one whole-stage-codegen projection —
``posexplode(split(text, '\\n'))`` then a single chained ``CASE WHEN line
RLIKE pattern_i`` that implements first-match-wins declaratively. No
Python in the hot path, no UDF: adding a language is a config, and the
extraction cost is one scan + one generate, pushdown-friendly and
partition-parallel at any corpus size. Patterns stay in the regex subset
shared by Java's engine and RE2 (explicit character classes, ``\\s``),
so the DuckDB oracle can apply the SAME config with its own regex engine
— a dual implementation of rule application, not a replay.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NAME_RE = "([A-Za-z_][A-Za-z0-9_]*)"
_PATH_RE = "([A-Za-z0-9_./'\"-]+)"

# Demo config for a language with no hand-written kernel in this repo,
# following the reference's ruby.yaml conventions (specific before
# general; $NAME for definitions, $PATH for imports).
SCALA_CONFIG = {
    "language": "scala",
    "extensions": [".scala", ".sc"],
    "functions": ["def $NAME"],
    "classes": [
        "case class $NAME",
        "class $NAME",
        "object $NAME",
        "trait $NAME",
    ],
    "imports": ["import $PATH"],
}

_KIND_LABEL = {
    "function": "Function",
    "class": "Class",
    "import": None,  # imports become IMPORTS edges, not defined nodes
}


def compile_pattern(pattern: str) -> str:
    """One config pattern → an anchored regex with a single capture.

    Literal tokens are escaped, inter-token whitespace becomes ``\\s+``,
    ``$NAME`` captures an identifier and ``$PATH`` an import path. The
    match is anchored to the (indentation-stripped) start of the line,
    mirroring the reference tier's statement-level patterns.
    """
    parts = []
    for tok in pattern.split(" "):
        if tok == "$NAME":
            parts.append(_NAME_RE)
        elif tok == "$PATH":
            parts.append(_PATH_RE)
        else:
            # $NAME may be embedded, e.g. "def self.$NAME"
            sub = re.escape(tok).replace(re.escape("$NAME"), _NAME_RE)
            sub = sub.replace(re.escape("$PATH"), _PATH_RE)
            parts.append(sub)
    return "^\\s*" + "\\s+".join(parts)


def compile_config(cfg: dict) -> list[tuple[str, str]]:
    """Config → ordered (kind, regex) list; order IS the claim priority."""
    out: list[tuple[str, str]] = []
    for key, kind in (
        ("functions", "function"),
        ("classes", "class"),
        ("imports", "import"),
    ):
        for p in cfg.get(key, ()):
            out.append((kind, compile_pattern(p)))
    return out


def pattern_mentions(docs: DataFrame, cfg: dict) -> DataFrame:
    """(doc_id, line_no, kind, name) — one row per claimed line.

    ``docs`` needs (doc_id, text). The whole tier is one generate + one
    chained conditional projection; first matching pattern claims the
    line (reference README rule).
    """
    rules = compile_config(cfg)
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "line"),
    ).select("doc_id", (F.col("idx") + 1).alias("line_no"), "line")
    kind_expr = F.lit(None).cast("string")
    name_expr = F.lit(None).cast("string")
    # build the WHEN chain in REVERSE so the first rule wins at the top
    for kind, rx in reversed(rules):
        hit = F.col("line").rlike(rx)
        kind_expr = F.when(hit, F.lit(kind)).otherwise(kind_expr)
        name_expr = F.when(
            hit, F.regexp_extract(F.col("line"), rx, 1)
        ).otherwise(name_expr)
    return (
        lines.select(
            "doc_id",
            "line_no",
            kind_expr.alias("kind"),
            name_expr.alias("name"),
        )
        .filter(F.col("kind").isNotNull())
    )


def pattern_edges(docs: DataFrame, cfg: dict) -> DataFrame:
    """Basic structural triples from a pattern config: the document is the
    Module; definitions become ``Module -DEFINES-> <module>.<name>`` and
    imports ``Module -IMPORTS-> <path>`` (flat names, no nesting — the
    reference tier's documented contract)."""
    m = pattern_mentions(docs, cfg)
    defs = m.filter(F.col("kind") != "import").select(
        F.col("doc_id").alias("subj"),
        F.lit("DEFINES").alias("pred"),
        F.concat(F.col("doc_id"), F.lit("."), F.col("name")).alias("obj"),
        F.lit("Module").alias("subj_label"),
        F.when(F.col("kind") == "class", "Class")
        .otherwise("Function")
        .alias("obj_label"),
    )
    imps = m.filter(F.col("kind") == "import").select(
        F.col("doc_id").alias("subj"),
        F.lit("IMPORTS").alias("pred"),
        F.col("name").alias("obj"),
        F.lit("Module").alias("subj_label"),
        F.lit("ExternalModule").alias("obj_label"),
    )
    return defs.unionByName(imps).distinct()
