"""The concurrent-stage-submission path (pipeline._materialize_all + the
3-way closure/recv_cls/media overlap) vs the CGR_SEQUENTIAL_STAGES=1
fallback: both orderings must assemble the identical graph.

The default suite exercises the concurrent path everywhere; this module
guards the serial fallback knob (the A/B + escape hatch documented in
BASELINE.md round-5) against drifting out of equivalence — e.g. a future
edit feeding one path a differently-scoped frame (the recv_cls source
bug class caught in review: it must come from resolve_mentions, not
mentions)."""

from __future__ import annotations

import os

from code_graph_rag_spark.fixtures import polyglot
from code_graph_rag_spark.pipeline import build_graph


def _graph_tuples(g):
    edges = {
        (r.subj, r.pred, r.obj)
        for r in g.edges.select("subj", "pred", "obj").collect()
    }
    nodes = {(r.label, r.id) for r in g.nodes.select("label", "id").collect()}
    return nodes, edges


def test_sequential_fallback_equivalence(spark):
    docs = polyglot(spark)
    g_conc = build_graph(docs)
    conc = _graph_tuples(g_conc)
    g_conc.unpersist()

    os.environ["CGR_SEQUENTIAL_STAGES"] = "1"
    try:
        g_seq = build_graph(docs)
        seq = _graph_tuples(g_seq)
        g_seq.unpersist()
    finally:
        del os.environ["CGR_SEQUENTIAL_STAGES"]

    assert conc[0] == seq[0], "node sets diverge between submission modes"
    assert conc[1] == seq[1], "edge sets diverge between submission modes"
