"""Endpoint exposure (EXPOSES) + arg/kw data-flow (FLOWS_TO kind=arg) tests.

Reference coverage mirrored: ``tests/test_endpoint_extraction.py`` (route
decorators incl. methods kwarg and mount prefixes) and the flow_access
arg-taint family (``parsers/flow_access/processor.py``,
``docs/architecture/graph-schema.md:77-83``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA


def _build(spark, doc_id, src, groups=DEFAULT_GROUPS + ("io",)):
    from code_graph_rag_spark.pipeline import build_graph

    docs = spark.createDataFrame(
        [
            {
                "doc_id": doc_id,
                "spans": [
                    {"kind": "code", "text": src, "media_ref": "", "offset": 0}
                ],
            }
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    return build_graph(docs, groups=groups)


@pytest.fixture(scope="module")
def endpoints_graph(spark):
    src = (
        "from fastapi import FastAPI, APIRouter\n\n"
        "app = FastAPI()\n"
        "router = APIRouter()\n\n"
        "@app.get('/users/{id}')\n"
        "def get_user(id):\n"
        "    return id\n\n"
        "@router.route('/items', methods=['POST', 'PUT'])\n"
        "def change_item():\n"
        "    pass\n\n"
        "@app.on_event('startup')\n"
        "def not_a_route():\n"
        "    pass\n\n"
        "app.include_router(router, prefix='/api')\n"
    )
    g = _build(spark, "svc/api.py", src)
    yield g
    g.unpersist()


def test_exposes_edges(endpoints_graph):
    exposes = {
        (r.subj, r.obj)
        for r in endpoints_graph.edges.filter(
            F.col("pred") == "EXPOSES"
        ).collect()
    }
    assert ("svc.api.get_user", "endpoint::svc::GET /users/{id}") in exposes
    # methods kwarg fans out; mount prefix prepends
    assert ("svc.api.change_item", "endpoint::svc::POST /api/items") in exposes
    assert ("svc.api.change_item", "endpoint::svc::PUT /api/items") in exposes
    # non-route decorator (on_event takes a non-path literal) excluded
    assert not any("not_a_route" in s for s, _o in exposes)


def test_endpoint_resource_nodes(endpoints_graph):
    res = {
        r.id
        for r in endpoints_graph.nodes.filter(
            F.col("label") == "Resource"
        ).collect()
    }
    assert "endpoint::svc::GET /users/{id}" in res


def test_exposes_gated_behind_io_group(spark):
    src = "@app.get('/ping')\ndef ping():\n    pass\n"
    g = _build(spark, "svc2/m.py", src, groups=DEFAULT_GROUPS)
    try:
        assert g.edges.filter(F.col("pred") == "EXPOSES").count() == 0
    finally:
        g.unpersist()


@pytest.fixture(scope="module")
def flow_graph(spark):
    src = (
        "import os, json\n\n"
        "def consume(v):\n"
        "    return v\n\n"
        "def fetch_key():\n"
        "    return os.getenv('API_KEY')\n\n"
        "def pipeline():\n"
        "    key = os.getenv('TOKEN')\n"
        "    consume(key)\n"
        "    use_kw(data=key)\n"
        "    print(key)\n\n"
        "def use_kw(data):\n"
        "    return data\n\n"
        "def chained():\n"
        "    k = fetch_key()\n"
        "    consume(k)\n\n"
        "def clean():\n"
        "    x = 1\n"
        "    consume(x)\n"
    )
    g = _build(spark, "taint/app.py", src)
    yield g
    g.unpersist()


def _flows(g):
    return {
        (r.subj, r.obj, r.props["via"], r.props["kind"])
        for r in g.edges.filter(F.col("pred") == "FLOWS_TO").collect()
    }


def test_arg_flow_tainted_local(flow_graph):
    flows = _flows(flow_graph)
    # key = os.getenv(...); consume(key) → caller -FLOWS_TO-> callee via arg:0
    assert ("taint.app.pipeline", "taint.app.consume", "arg:0", "arg") in flows


def test_kw_flow(flow_graph):
    flows = _flows(flow_graph)
    assert ("taint.app.pipeline", "taint.app.use_kw", "kw:data", "arg") in flows


def test_resource_to_resource_flow(flow_graph):
    flows = _flows(flow_graph)
    # env read reaches the stdout write sink
    assert (
        "resource::env::TOKEN",
        "resource::stdout::stdout",
        "arg:0",
        "resource",
    ) in flows


def test_return_taint_one_level(flow_graph):
    flows = _flows(flow_graph)
    # k = fetch_key() where fetch_key returns a sink read → arg edge
    assert ("taint.app.chained", "taint.app.consume", "arg:0", "arg") in flows


def test_untainted_arg_no_edge(flow_graph):
    flows = _flows(flow_graph)
    assert not any(
        s == "taint.app.clean" and k == "arg" for s, _o, _v, k in flows
    )


# ---- route-call registrations (endpoint_routes.py shapes) ----


@pytest.fixture(scope="module")
def route_call_graph(spark):
    py_src = (
        "def show_user(id):\n"
        "    return id\n\n"
        "def wire(app, router):\n"
        "    app.add_url_rule('/users/<id>', view_func=show_user)\n"
        "    router.add_api_route('/items', change_item, methods=['POST'])\n"
    )
    js_src = (
        "const app = express();\n"
        "function getUser(req, res) { return res; }\n"
        "function setup() {\n"
        "  app.get('/users/:id', getUser);\n"
        "  app.post('/orders', (req, res) => { return 1; });\n"
        "  apiClient.get('/external');\n"
        "  axios.get('/cfg', {timeout: 5});\n"
        "}\n"
    )
    go_src = (
        "package main\n\n"
        'import "net/http"\n\n'
        "func HandleRoot(w int, r int) {}\n\n"
        "func Setup() {\n"
        '\thttp.HandleFunc("/root", HandleRoot)\n'
        '\thttp.HandleFunc("GET /v2", HandleRoot)\n'
        "}\n"
    )
    from code_graph_rag_spark.pipeline import build_graph

    docs = spark.createDataFrame(
        [
            {"doc_id": "rsvc/reg.py", "spans": [{"kind": "code", "text": py_src, "media_ref": "", "offset": 0}]},
            {"doc_id": "rsvc/web.js", "spans": [{"kind": "code", "text": js_src, "media_ref": "", "offset": 0}]},
            {"doc_id": "rsvc/gw/main.go", "spans": [{"kind": "code", "text": go_src, "media_ref": "", "offset": 0}]},
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs, groups=DEFAULT_GROUPS + ("io",))
    yield g
    g.unpersist()


def _exposes(g):
    return {
        (r.subj, r.obj)
        for r in g.edges.filter(F.col("pred") == "EXPOSES").collect()
    }


def test_route_call_named_handler(route_call_graph):
    got = _exposes(route_call_graph)
    assert ("rsvc.reg.show_user", "endpoint::rsvc::GET /users/<id>") in got
    assert ("rsvc.web.getUser", "endpoint::rsvc::GET /users/:id") in got


def test_route_call_inline_handler_falls_to_enclosing(route_call_graph):
    got = _exposes(route_call_graph)
    assert ("rsvc.web.setup", "endpoint::rsvc::POST /orders") in got


def test_route_call_evidence_gate(route_call_graph):
    """Client requests and unresolvable handlers register nothing:
    apiClient.get has no handler arg, axios.get('/cfg', {..}) has a config
    object, and change_item is not defined in the module."""
    got = _exposes(route_call_graph)
    objs = {o for _s, o in got}
    assert "endpoint::rsvc::GET /external" not in objs
    assert "endpoint::rsvc::GET /cfg" not in objs
    assert not any("/items" in o for o in objs)


def test_route_call_go_handlefunc(route_call_graph):
    got = _exposes(route_call_graph)
    assert (
        "rsvc.gw.main.HandleRoot",
        "endpoint::rsvc::ANY /root",
    ) in got
    # Go 1.22 "GET /v2" pattern carries its own verb
    assert ("rsvc.gw.main.HandleRoot", "endpoint::rsvc::GET /v2") in got
