"""Engine ≡ analytic model on the synth corpus (the kg_* driver oracle).

``synth_model.synth_expected_graph`` is an independent pure-Python twin of
the whole pipeline for the deterministic synthetic corpus; the driver's
DuckDB kg_* oracles read its parquet materialization. This test pins the
equivalence EXACTLY (every edge, every node, labels included) so any engine
regression breaks here before it breaks the driver's correctness gate.
"""

from __future__ import annotations

from code_graph_rag_spark.fixtures import synth_corpus
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.synth_model import (
    synth_expected_dead_code,
    synth_expected_graph,
)


def test_engine_matches_analytic_model(spark):
    n, fp, pf = 12, 3, 4
    g = build_graph(synth_corpus(spark, n, funcs_per_doc=fp, pkg_fanout=pf))
    exp_nodes, exp_edges = synth_expected_graph(n, fp, pf)

    got_edges = sorted(
        (r.subj, r.pred, r.obj, r.subj_label, r.obj_label)
        for r in g.edges.select(
            "subj", "pred", "obj", "subj_label", "obj_label"
        ).collect()
    )
    want_edges = sorted(exp_edges)
    assert got_edges == want_edges, (
        f"only-engine={set(got_edges) - set(want_edges)} "
        f"only-model={set(want_edges) - set(got_edges)}"
    )

    got_nodes = sorted(
        (r.label, r.id, r.name)
        for r in g.nodes.select("label", "id", "name").collect()
    )
    want_nodes = sorted((l, i, nm) for l, i, nm, _p in exp_nodes)
    assert got_nodes == want_nodes

    # dead-code twin: BFS over the model graph ≡ engine frontier BFS
    from code_graph_rag_spark.queries import dead_code

    got_dead = sorted(
        (r.label, r.id, r.name, r.path)
        for r in dead_code(g.nodes, g.edges).collect()
    )
    assert got_dead == synth_expected_dead_code(n, fp, pf)
    g.unpersist()
