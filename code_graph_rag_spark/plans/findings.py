"""Findings analyzers: declarative line-rule pass → Pattern / CodeSmell /
SecurityIssue nodes + IMPLEMENTS_PATTERN / HAS_SMELL / HAS_VULNERABILITY
edges (reference ``analyzers/ast_grep_analyzer.py`` +
``analyzers/ast_grep_rules/{patterns,smells,security}/<lang>.yaml``;
labels/relationships ``constants/graph.py:147-172``).

Spark-first shape: the rules run INSIDE the extraction scan
(``extract/mentions.py`` calls :func:`finding_mentions` per document when
the ``findings`` capture group is enabled), so findings cost zero extra
corpus passes — at 100 TB a post-pass re-scan of every file would double
the dominant IO. A new rule is one table row, no code (the reference's
"a new rule is a YAML entry" contract). Rules here are LINE-scoped regex
approximations of the reference's AST rules; each finding links to the
file's Module and carries its line, matching the reference's module-level
linkage ("symbol-level linkage is a follow-up").

Finding node qualified name: ``module_qn.line.col.rule_id`` — the
reference's scheme (``ast_grep_analyzer.py:178-180``), so two matches of
one rule on one line stay distinct while re-indexing merges the site.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SNIPPET_MAX = 200

# (rule_id, node_label, relationship, extensions, regex, message)
# Categories mirror the reference's rule directories: patterns → Pattern /
# IMPLEMENTS_PATTERN, smells → CodeSmell / HAS_SMELL, security →
# SecurityIssue / HAS_VULNERABILITY.
FINDING_RULES: list[tuple[str, str, str, frozenset, re.Pattern, str]] = [
    # ---- smells (ast_grep_rules/smells/python.yaml) ----
    (
        "bare_except",
        "CodeSmell",
        "HAS_SMELL",
        frozenset({"py"}),
        re.compile(r"^\s*except\s*:"),
        "Bare except swallows every exception",
    ),
    (
        "broad_except",
        "CodeSmell",
        "HAS_SMELL",
        frozenset({"py"}),
        re.compile(r"^\s*except\s+Exception\b"),
        "Broad except Exception catches too much",
    ),
    (
        "mutable_default_arg",
        "CodeSmell",
        "HAS_SMELL",
        frozenset({"py"}),
        re.compile(r"^\s*def\s+\w+\s*\([^)]*=\s*(\[|\{)"),
        "Mutable default argument is shared across calls",
    ),
    (
        "wildcard_import",
        "CodeSmell",
        "HAS_SMELL",
        frozenset({"py"}),
        re.compile(r"^\s*from\s+[\w.]+\s+import\s+\*"),
        "Wildcard import pollutes the namespace",
    ),
    (
        "global_statement",
        "CodeSmell",
        "HAS_SMELL",
        frozenset({"py"}),
        re.compile(r"^\s*global\s+\w"),
        "global statement couples the function to module state",
    ),
    (
        "var_declaration",
        "CodeSmell",
        "HAS_SMELL",
        frozenset({"js", "jsx", "ts", "tsx", "mjs", "cjs"}),
        re.compile(r"^\s*var\s+\w"),
        "var declaration: prefer let/const block scoping",
    ),
    # ---- security (ast_grep_rules/security/python.yaml) ----
    (
        "eval_call",
        "SecurityIssue",
        "HAS_VULNERABILITY",
        frozenset({"py", "js", "jsx", "ts", "tsx", "mjs", "cjs"}),
        re.compile(r"(?<![\w.])eval\s*\("),
        "eval() executes arbitrary code",
    ),
    (
        "exec_call",
        "SecurityIssue",
        "HAS_VULNERABILITY",
        frozenset({"py"}),
        re.compile(r"(?<![\w.])exec\s*\("),
        "exec() executes arbitrary code",
    ),
    (
        "sqli_fstring",
        "SecurityIssue",
        "HAS_VULNERABILITY",
        frozenset({"py"}),
        re.compile(r"\.execute\s*\(\s*f['\"]"),
        "Possible SQL injection: execute() called with an f-string",
    ),
    (
        "hardcoded_secret",
        "SecurityIssue",
        "HAS_VULNERABILITY",
        frozenset({"py", "js", "jsx", "ts", "tsx", "mjs", "cjs", "java", "rs", "go"}),
        re.compile(
            r"(?i)(password|secret|api_key|token)\w*\s*=\s*['\"][^'\"]{8,}['\"]"
        ),
        "Hardcoded secret assigned to a credential-named variable",
    ),
    (
        "subprocess_shell",
        "SecurityIssue",
        "HAS_VULNERABILITY",
        frozenset({"py"}),
        re.compile(r"\bshell\s*=\s*True"),
        "subprocess with shell=True invites command injection",
    ),
    # ---- patterns (ast_grep_rules/patterns/python.yaml) ----
    (
        "factory_function",
        "Pattern",
        "IMPLEMENTS_PATTERN",
        frozenset({"py"}),
        re.compile(r"^\s*def\s+(make|create|build)_\w+"),
        "Factory function: name starts with make_/create_/build_",
    ),
    (
        "abstract_base",
        "Pattern",
        "IMPLEMENTS_PATTERN",
        frozenset({"py"}),
        re.compile(r"^\s*class\s+\w+\s*\([^)]*\bABC\b"),
        "Abstract base class: inherits ABC",
    ),
    (
        "singleton",
        "Pattern",
        "IMPLEMENTS_PATTERN",
        frozenset({"py"}),
        re.compile(r"^\s+_instance\s*=\s*None\b"),
        "Singleton: class holds a private _instance",
    ),
]


def finding_mentions(doc_id: str, text: str) -> list[dict]:
    """Run the extension-matched line rules over one document's code text,
    emitting ``finding`` mention rows (pure Python — called from the
    extraction ``mapInPandas``, so this runs Arrow-batched on executors)."""
    from code_graph_rag_spark.extract.pylite import doc_extension

    ext = doc_extension(doc_id)
    rules = [r for r in FINDING_RULES if ext in r[3]]
    if not rules:
        return []
    out: list[dict] = []
    for idx, line in enumerate(text.split("\n")):
        if not line or len(line) > 2000:
            continue
        for rule_id, label, pred, _exts, rx, message in rules:
            m = rx.search(line)
            if m:
                snippet = line.strip()[:_SNIPPET_MAX]
                out.append(
                    {
                        "kind": "finding",
                        "name": rule_id,
                        "target": label,
                        "local_name": pred,
                        "parent_kind": "Module",
                        "start_line": idx + 1,
                        "start_col": m.start(),
                        "props": json.dumps(
                            {"message": message, "snippet": snippet},
                            sort_keys=True,
                        ),
                    }
                )
    return out


def finding_nodes_edges(
    mentions: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """``finding`` mentions → (nodes, edges) for the findings capture
    group. Pure projection — no joins, no shuffle; the finding's module
    linkage is the mention's own ``module_qn``."""
    f = mentions.filter(F.col("kind") == "finding")
    qn = F.concat_ws(
        ".", "module_qn", "start_line", "start_col", "name"
    )
    nodes = f.select(
        F.col("target").alias("label"),
        qn.alias("id"),
        F.col("name"),
        F.col("doc_id").alias("path"),
        F.col("start_line"),
        F.col("start_line").alias("end_line"),
        "props",
    ).dropDuplicates(["label", "id"])
    edges = f.select(
        F.col("module_qn").alias("subj"),
        F.col("local_name").alias("pred"),
        qn.alias("obj"),
        F.lit("Module").alias("subj_label"),
        F.col("target").alias("obj_label"),
        F.col("doc_id").alias("src_doc"),
    ).dropDuplicates(["subj", "pred", "obj", "src_doc"])
    return nodes, edges
