"""Read-path (dead-code reachability) and streaming watch mode."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest


def test_dead_code(spark):
    """Reachability roots mirror the reference's selection (module-level
    call origins + ROOT decorators + runtime-invoked names) — NOT every
    decorated or test symbol (dead_code.py:470-620)."""
    from code_graph_rag_spark.pipeline import build_graph
    from code_graph_rag_spark.queries import dead_code
    from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

    src = (
        "def main():\n    work()\n\n"
        "def work():\n    helper()\n\n"
        "def helper():\n    pass\n\n"
        "def unused():\n    also_unused()\n\n"
        "def also_unused():\n    pass\n\n"
        "@app.route('/x')\ndef decorated_root():\n    pass\n\n"
        "@entrypoint\ndef decorated_not_root():\n    pass\n\n"
        "main()\n"  # module-level call → main is reachable from the Module
    )
    test_src = (
        "def test_widget():\n    prod_helper()\n\n"
        "def prod_helper():\n    pass\n"
    )
    # __all__-exported symbols are roots: a public API with no internal
    # caller is alive (dead_code.py exported-symbol roots)
    pub_src = (
        "__all__ = ['api']\n\n"
        "def api():\n    pass\n\n"
        "def internal_unused():\n    pass\n"
    )
    docs = spark.createDataFrame(
        [
            {
                "doc_id": "dc/app.py",
                "spans": [
                    {"kind": "code", "text": src, "media_ref": "", "offset": 0}
                ],
            },
            {
                "doc_id": "dc/tests/test_app.py",
                "spans": [
                    {
                        "kind": "code",
                        "text": test_src,
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
            },
            {
                "doc_id": "dc/lib.py",
                "spans": [
                    {
                        "kind": "code",
                        "text": pub_src,
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
            },
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs)
    dead = {r.id for r in dead_code(g.nodes, g.edges).collect()}
    assert "dc.app.main" not in dead  # module-level call roots it
    assert "dc.app.work" not in dead
    assert "dc.app.helper" not in dead  # transitively alive
    assert "dc.app.decorated_root" not in dead  # ROOT-list decorator
    # a non-root decorator does NOT root (the reference's root_decorators
    # list, not "any decorator" — the tightened rule this test pins)
    assert "dc.app.decorated_not_root" in dead
    assert "dc.app.unused" in dead
    assert "dc.app.also_unused" in dead  # only called from dead code
    # test symbols are excluded from the REPORT, not rooted
    assert not any(i.startswith("dc.tests.") for i in dead)
    # __all__-exported public API is alive without an internal caller
    assert "dc.lib.api" not in dead
    assert "dc.lib.internal_unused" in dead
    dead_with_tests = {
        r.id
        for r in dead_code(g.nodes, g.edges, include_tests=True).collect()
    }
    # with tests included, the test module's top-level... has no top-level
    # call, so the un-called test fn reports dead; its callee stays alive
    # only through it — both report nothing only if a runner roots them
    assert "dc.tests.test_app.test_widget" in dead_with_tests
    g.unpersist()


def test_reachable_frontier(spark):
    from code_graph_rag_spark.queries import reachable

    edges = spark.createDataFrame(
        [
            ("a", "CALLS", "b"),
            ("b", "CALLS", "c"),
            ("x", "CALLS", "y"),
            ("c", "OVERRIDES", "base_c"),
        ],
        "subj string, pred string, obj string",
    )
    roots = spark.createDataFrame([("a",)], "id string")
    got = {r.id for r in reachable(edges, roots).collect()}
    assert got == {"a", "b", "c", "base_c"}  # overrides revive targets


@pytest.mark.slow
def test_watch_mode_micro_batches(spark):
    from code_graph_rag_spark.incremental import StageStore
    from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA
    from code_graph_rag_spark.streaming.watch import watch_documents

    in_dir = tempfile.mkdtemp(prefix="cgr_stream_in_")
    store_dir = tempfile.mkdtemp(prefix="cgr_stream_store_")
    results = []

    def on_batch(graph, stats, epoch):
        results.append(
            (stats["mode"], {(r.subj, r.pred, r.obj) for r in graph.edges.collect()})
        )

    def drop(doc_id, text, name):
        df = spark.createDataFrame(
            [
                {
                    "doc_id": doc_id,
                    "spans": [
                        {"kind": "code", "text": text, "media_ref": "", "offset": 0}
                    ],
                }
            ],
            schema=DOCUMENTS_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(in_dir)
        _ = name

    from code_graph_rag_spark.schema import DEFAULT_GROUPS

    drop("w/a.py", "def fa():\n    pass\n", "first")
    # io group ON: watch mode must run the endpoint/flow/url passes per
    # micro-batch, not just the default-group join phase
    q = watch_documents(
        spark,
        in_dir,
        StageStore(store_dir),
        trigger_seconds=1,
        on_batch=on_batch,
        groups=DEFAULT_GROUPS + ("io",),
    )
    try:
        q.processAllAvailable()
        drop(
            "w/b.py",
            "from a import fa\n\n"
            "def fb():\n    fa()\n\n"
            "@app.get('/ping')\ndef ping():\n    pass\n",
            "second",
        )
        q.processAllAvailable()
        deadline = time.time() + 60
        while len(results) < 2 and time.time() < deadline:
            time.sleep(1)
    finally:
        q.stop()
    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(store_dir, ignore_errors=True)

    assert len(results) >= 2
    final_triples = results[-1][1]
    assert ("w.b.fb", "CALLS", "w.a.fa") in final_triples
    # the io pass ran inside the micro-batch (EXPOSES is io-gated)
    assert ("w.b.ping", "EXPOSES", "endpoint::w::GET /ping") in final_triples
