"""Contract linking: .proto + OpenAPI operations become CONTRACT
resources; live RPC/endpoint artefacts RESOLVES_TO into them
(reference parsers/contracts.py + parsers/contract_linking.py)."""

from pyspark.sql import functions as F

from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA
from tests.test_rpc import CLIENT_GO, SERVER_GO, _doc

GREET_PROTO = (
    'syntax = "proto3";\n'
    "package greet.v1;\n\n"
    "service GreetService {\n"
    "  rpc Greet(GreetRequest) returns (GreetResponse);\n"
    "  rpc Farewell(FarewellRequest) returns (FarewellResponse);\n"
    "}\n\n"
    "message GreetRequest {}\n"
)

OPENAPI_JSON = (
    "{\n"
    '  "openapi": "3.0.0",\n'
    '  "paths": {\n'
    '    "/users/{id}": {"get": {"operationId": "getUser"}},\n'
    '    "/users": {"post": {"operationId": "createUser"}}\n'
    "  }\n"
    "}\n"
)

WEB_PY = (
    '@app.get("/users/{id}")\n'
    "def get_user(user_id):\n"
    "    return user_id\n\n"
    '@app.post("/users")\n'
    "def create_user():\n"
    "    return 1\n"
)


def test_contract_linking(spark):
    docs = spark.createDataFrame(
        [
            _doc("rpcproj/server/server.go", SERVER_GO),
            _doc("rpcproj/cli/cli.go", CLIENT_GO),
            _doc("rpcproj/api/greet.proto", GREET_PROTO),
            _doc("websvc/app.py", WEB_PY),
            _doc("websvc/openapi.json", OPENAPI_JSON),
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs, groups=DEFAULT_GROUPS + ("io",))
    try:
        got = {
            (r.subj, r.pred, r.obj)
            for r in g.edges.filter(
                F.col("obj").contains("::CONTRACT::")
            ).collect()
        }
        c_greet = "resource::CONTRACT::rpcproj::greet.v1.GreetService.Greet"
        # the declaring file anchors each operation
        assert ("rpcproj/api/greet.proto", "EXPOSES", c_greet) in got
        # RPC resources resolve by the bare <Service>.<Method> key
        assert (
            "resource::RPC::GreetService.Greet",
            "RESOLVES_TO",
            c_greet,
        ) in got
        assert (
            "resource::RPC::GreetService.Farewell",
            "RESOLVES_TO",
            "resource::CONTRACT::rpcproj::greet.v1.GreetService.Farewell",
        ) in got
        # endpoint resources resolve by method + template match
        assert (
            "endpoint::websvc::GET /users/{id}",
            "RESOLVES_TO",
            "resource::CONTRACT::websvc::websvc/openapi.getUser",
        ) in got
        assert (
            "endpoint::websvc::POST /users",
            "RESOLVES_TO",
            "resource::CONTRACT::websvc::websvc/openapi.createUser",
        ) in got
        # contracts are project-scoped: nothing crosses rpcproj <-> websvc
        assert not any(
            "websvc" in o and s.startswith("resource::RPC::")
            for s, _p, o in got
        )
    finally:
        g.unpersist()
