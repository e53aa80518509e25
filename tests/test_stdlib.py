"""Stdlib symbol folding (plans/stdlib.py) — per-language fold rules.

Mirrors reference parsers/stdlib_extractor.py:145-699 semantics as a
deterministic static table (see the module docstring for the probe-vs-table
mapping). These tests pin the branch outcomes the probe corpus exercises so
a rule regression fails here before it reaches the driver oracle.
"""

import json

import pytest

from code_graph_rag_spark.plans.stdlib import (
    STDLIB_FIXTURE_EXPECTED,
    STDLIB_PROBES,
    fold_external,
    stdlib_fixture_docs,
    stdlib_probe_df,
)

# (qn, language) -> (expected module_path, expected is_stdlib)
EXPECTED = {
    # python: longest known prefix wins; Capitalized-leaf fallback elsewhere
    ("os.path.join", "python"): ("os.path", 1),
    ("os.path", "python"): ("os.path", 1),
    ("os", "python"): ("os", 1),
    ("xml.etree.ElementTree.parse", "python"): ("xml.etree.ElementTree", 1),
    ("collections.abc.Mapping", "python"): ("collections.abc", 1),
    ("requests.Session", "python"): ("requests", 0),
    ("requests.get", "python"): ("requests.get", 0),
    # js: builtin dotted submodules kept whole; everything else folds
    ("fs.promises", "js"): ("fs.promises", 1),
    ("fs.readFileSync", "js"): ("fs", 1),
    ("node:path.join", "js"): ("node:path", 1),
    ("lodash.merge", "js"): ("lodash", 0),
    ("JSON.parse", "js"): ("JSON", 1),
    # go: exported (Capitalized) leaf folds
    ("net/http.Get", "go"): ("net/http", 1),
    ("net/http", "go"): ("net/http", 1),
    ("github.com/acme/pkg.New", "go"): ("github.com/acme/pkg", 0),
    ("strings.builder", "go"): ("strings.builder", 1),
    # rust: Type / CONST / plain-lowercase free fn fold; snake_case keeps
    ("std::vec::Vec", "rust"): ("std::vec", 1),
    ("std::mem::swap", "rust"): ("std::mem", 1),
    ("std::f64::MAX", "rust"): ("std::f64", 1),
    ("std::collections::hash_map", "rust"): ("std::collections::hash_map", 1),
    ("serde::Deserialize", "rust"): ("serde", 0),
    # cpp: std-gated entity table
    ("std::vector", "cpp"): ("std", 1),
    ("std::is_same", "cpp"): ("std", 1),
    ("std::chrono", "cpp"): ("std::chrono", 1),
    ("boost::asio::io_context", "cpp"): ("boost::asio::io_context", 0),
    # java: class-ish leaf folds; prefix table marks stdlib
    ("java.util.ArrayList", "java"): ("java.util", 1),
    ("java.util.stream", "java"): ("java.util.stream", 1),
    ("com.acme.widgets.WidgetBuilder", "java"): ("com.acme.widgets", 0),
    # csharp: ONLY known BCL types under stdlib prefixes fold
    ("System.Collections.Generic.List", "csharp"): (
        "System.Collections.Generic", 1),
    ("Microsoft.Extensions.Logging", "csharp"): (
        "Microsoft.Extensions.Logging", 1),
    ("Acme.Billing.Invoice", "csharp"): ("Acme.Billing.Invoice", 0),
    # lua: stdlib-root folds even for lowercase leaves
    ("string.format", "lua"): ("string", 1),
    ("cjson.decode", "lua"): ("cjson.decode", 0),
    # generic tier: dart scheme, ruby case rule
    ("dart:core.List", "dart"): ("dart:core", 1),
    ("dart:async", "dart"): ("dart:async", 1),
    ("json.JSON", "ruby"): ("json", 0),
    ("active_record.base", "ruby"): ("active_record.base", 0),
}


def test_expected_subset_of_probe_corpus():
    assert set(EXPECTED) <= set(STDLIB_PROBES)


def test_fold_outcomes(spark):
    rows = fold_external(stdlib_probe_df(spark)).collect()
    got = {(r.qn, r.language): (r.module_path, r.is_stdlib) for r in rows}
    assert len(got) == len(STDLIB_PROBES)
    mismatches = {
        k: (got[k], v) for k, v in EXPECTED.items() if got[k] != v
    }
    assert not mismatches, mismatches


def test_fold_plan_is_join_free(spark):
    # the fold must stay a pure expression tree — no shuffle, no join, no
    # python eval — so it adds zero cost when applied inside a build
    plan = fold_external(
        stdlib_probe_df(spark)
    )._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"{bad} in fold plan:\n{plan}"


def test_idempotent_on_folded_paths(spark):
    # folding an already-folded module path must be a fixpoint for the
    # module-shaped probes (entity-shaped inputs fold at most once)
    module_paths = {
        (v[0], k[1]) for k, v in EXPECTED.items()
    }
    df = spark.createDataFrame(
        sorted(module_paths), "qn string, language string"
    )
    refolded = {
        (r.qn, r.language): r.module_path for r in fold_external(df).collect()
    }
    # paths that are pure module paths (per the tables) must not fold again
    # (rust is deliberately absent: a plain-lowercase leaf like std::mem's
    # "mem" is indistinguishable from a free fn under the reference's own
    # no-tool heuristic at stdlib_extractor.py:499-517, so rust module
    # paths are not fixpoints — matching the reference's fallback behavior)
    stable = [
        ("os.path", "python"), ("xml.etree.ElementTree", "python"),
        ("fs.promises", "js"), ("net/http", "go"),
        ("std::chrono", "cpp"), ("java.util", "java"),
        ("System.Collections.Generic", "csharp"), ("string", "lua"),
        ("dart:core", "dart"),
    ]
    wrong = {k: refolded[k] for k in stable if refolded[k] != k[0]}
    assert not wrong, wrong


def test_pipeline_annotation(spark):
    # full build with the opt-in 'stdlib' group: every ExternalModule node
    # carries is_stdlib/module_path props matching the hand-derived set
    # (normalized-QN rules — the kernels pre-split symbols and dot-join
    # separators, so the pipeline shape differs from the as-written probes)
    from code_graph_rag_spark.pipeline import build_graph
    from code_graph_rag_spark.schema import DEFAULT_GROUPS

    g = build_graph(
        stdlib_fixture_docs(spark), groups=DEFAULT_GROUPS + ("stdlib",)
    )
    rows = g.nodes.filter("label = 'ExternalModule'").collect()
    got = {}
    for r in rows:
        p = json.loads(r.props) if r.props else {}
        got[r.id] = (r.name, p.get("is_stdlib"), p.get("module_path"))
    assert got == STDLIB_FIXTURE_EXPECTED, {
        k: (got.get(k), STDLIB_FIXTURE_EXPECTED.get(k))
        for k in set(got) ^ set(STDLIB_FIXTURE_EXPECTED)
        | {
            k
            for k in set(got) & set(STDLIB_FIXTURE_EXPECTED)
            if got[k] != STDLIB_FIXTURE_EXPECTED[k]
        }
    }
    g.unpersist()


def test_default_build_unannotated(spark):
    # without the group, the node surface is unchanged: ExternalModule
    # props stays null (the annotation is strictly opt-in)
    from code_graph_rag_spark.pipeline import build_graph

    g = build_graph(stdlib_fixture_docs(spark))
    rows = g.nodes.filter("label = 'ExternalModule'").collect()
    assert rows and all(r.props is None for r in rows)
    g.unpersist()
