"""IO capture group (READS_FROM/WRITES_TO + Resource nodes) and FLOWS_TO."""

from __future__ import annotations

from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA

IO_SRC = (
    "import os\n"
    "import json\n"
    "from os import getenv\n\n"
    "def load_config():\n"
    "    key = getenv('API_KEY')\n"
    "    with open('config.json') as fh:\n"
    "        return json.load(fh)\n\n"
    "def save_report(data):\n"
    "    out = open('report.txt', 'w')\n"
    "    print('saved')\n\n"
    "def top():\n"
    "    return load_config()\n"
)


def _graph(spark):
    from code_graph_rag_spark.pipeline import build_graph

    docs = spark.createDataFrame(
        [{"doc_id": "io/app.py",
          "spans": [{"kind": "code", "text": IO_SRC, "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS_SCHEMA,
    )
    return build_graph(docs, groups=DEFAULT_GROUPS + ("io",))


def test_io_and_flow_edges(spark):
    g = _graph(spark)
    triples = {(r.subj, r.pred, r.obj) for r in g.edges.collect()}
    # sink registry hits: builtin, alias-expanded (from os import getenv),
    # mode-refined write, target-less sink, stdout
    assert ("io.app.load_config", "READS_FROM", "resource::env::API_KEY") in triples
    assert ("io.app.load_config", "READS_FROM", "resource::file::config.json") in triples
    assert ("io.app.load_config", "READS_FROM", "resource::file::<dynamic>") in triples
    assert ("io.app.save_report", "WRITES_TO", "resource::file::report.txt") in triples
    assert ("io.app.save_report", "WRITES_TO", "resource::stdout::stdout") in triples
    # mode 'w' means the report handle is NOT a read
    assert ("io.app.save_report", "READS_FROM", "resource::file::report.txt") not in triples
    # return-value flow: load_config's result flows into top's return
    assert ("io.app.load_config", "FLOWS_TO", "io.app.top") in triples
    # external callees (json.load) never produce FLOWS_TO
    assert not any(p == "FLOWS_TO" and "json" in s for s, p, _ in triples)
    # Resource nodes exist and the audit holds with the io group enabled
    from code_graph_rag_spark.audit import audit

    resources = {r.id for r in g.nodes.filter("label = 'Resource'").collect()}
    assert "resource::file::config.json" in resources
    rep = audit(g.nodes, g.edges)
    assert rep.ok, rep
    g.unpersist()


def test_io_group_off_by_default(spark):
    from code_graph_rag_spark.pipeline import build_graph

    docs = spark.createDataFrame(
        [{"doc_id": "io/app.py",
          "spans": [{"kind": "code", "text": IO_SRC, "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs)
    preds = {r.pred for r in g.edges.select("pred").distinct().collect()}
    assert not preds & {"READS_FROM", "WRITES_TO", "FLOWS_TO"}
    g.unpersist()


def test_io_sinks_multi_language(spark):
    """The sink registry is language-merged (reference io_access/registry.py
    unions per-language tables): JS fs/console, Go os/fmt, C++ fopen and
    Lua io.open all emit READS_FROM/WRITES_TO through the ONE equi-join."""
    from pyspark.sql import functions as F

    from code_graph_rag_spark.pipeline import build_graph
    from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA

    def doc(doc_id, text):
        return {
            "doc_id": doc_id,
            "spans": [
                {"kind": "code", "text": text, "media_ref": "", "offset": 0}
            ],
        }

    docs = spark.createDataFrame(
        [
            doc(
                "mio/app.js",
                "function run() {\n"
                "  fs.readFileSync('cfg.json');\n"
                "  console.log('hi');\n"
                "}\n",
            ),
            doc(
                "mio/tool/tool.go",
                "package tool\n\n"
                "func Run() {\n"
                '\tos.Getenv("HOME")\n'
                '\tfmt.Println("hi")\n'
                "}\n",
            ),
            doc(
                "mio/native.cpp",
                "void run() {\n"
                '    fopen("data.bin", "rb");\n'
                "}\n",
            ),
            doc(
                "mio/script.lua",
                "local function run()\n"
                "    io.open('notes.txt')\n"
                "end\n",
            ),
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs, groups=DEFAULT_GROUPS + ("io",))
    try:
        got = {
            (r.subj, r.pred, r.obj)
            for r in g.edges.filter(
                F.col("pred").isin("READS_FROM", "WRITES_TO")
            ).collect()
        }
        assert ("mio.app.run", "READS_FROM", "resource::file::cfg.json") in got or (
            "mio.app.run",
            "READS_FROM",
            "resource::file::<dynamic>",
        ) in got
        assert ("mio.app.run", "WRITES_TO", "resource::stdout::stdout") in got
        assert any(
            s == "mio.tool.Run" and o.startswith("resource::env::") for s, _p, o in got
        )
        assert ("mio.tool.Run", "WRITES_TO", "resource::stdout::stdout") in got
        assert any(
            s == "mio.native.run" and o.startswith("resource::file::")
            for s, p, o in got
            if p == "READS_FROM"
        )
        assert any(
            s == "mio.script.run" and o.startswith("resource::file::")
            for s, p, o in got
            if p == "READS_FROM"
        )
    finally:
        g.unpersist()
