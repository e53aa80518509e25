"""RPC exposure pass: connect-style handler wiring + generated-client sinks.

Server and client meet on one UNSCOPED resource::RPC::<Stem>.<Method> node
(reference parsers/rpc_exposure.py header; io_access/processor.py RPC arm).
"""

from pyspark.sql import functions as F

from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA


def _doc(doc_id, text):
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "code", "text": text, "media_ref": "", "offset": 0}],
    }


SERVER_GO = (
    "package server\n\n"
    "type GreetServer struct{}\n\n"
    "func (s *GreetServer) Greet(req string) string {\n"
    '\treturn "hi"\n'
    "}\n\n"
    "func (s *GreetServer) Farewell(req string) string {\n"
    '\treturn "bye"\n'
    "}\n\n"
    "func (s *GreetServer) helper() {}\n\n"
    "func Wire() {\n"
    "\timpl := &GreetServer{}\n"
    "\tpath, handler := greetconnect.NewGreetServiceHandler(impl)\n"
    "\t_ = path\n"
    "\t_ = handler\n"
    "}\n"
)

CLIENT_GO = (
    "package cli\n\n"
    "func Run() {\n"
    "\tc := greetconnect.NewGreetServiceClient(nil)\n"
    '\tc.Greet("x")\n'
    "}\n"
)


def test_rpc_exposure_and_client_sinks(spark):
    docs = spark.createDataFrame(
        [_doc("rpcproj/server/server.go", SERVER_GO),
         _doc("rpcproj/cli/cli.go", CLIENT_GO)],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs, groups=DEFAULT_GROUPS + ("io",))
    try:
        got = {
            (r.subj, r.pred, r.obj)
            for r in g.edges.filter(
                F.col("obj").startswith("resource::RPC::")
            ).collect()
        }
        greet = "resource::RPC::GreetService.Greet"
        # server: exported methods of the wired impl type EXPOSE the
        # contract's RPC nodes; the unexported helper does not
        assert ("rpcproj.server.GreetServer.Greet", "EXPOSES", greet) in got
        assert (
            "rpcproj.server.GreetServer.Farewell",
            "EXPOSES",
            "resource::RPC::GreetService.Farewell",
        ) in got
        assert not any("helper" in s for s, _p, _o in got)
        # client: request AND response → both directions on the SAME node
        # the server exposes (no RESOLVES_TO hop needed)
        assert ("rpcproj.cli.Run", "READS_FROM", greet) in got
        assert ("rpcproj.cli.Run", "WRITES_TO", greet) in got
    finally:
        g.unpersist()


def test_rpc_off_without_io_group(spark):
    docs = spark.createDataFrame(
        [_doc("rpcproj/server/server.go", SERVER_GO)],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs)  # DEFAULT_GROUPS: io off
    try:
        n = g.edges.filter(F.col("obj").startswith("resource::RPC::")).count()
        assert n == 0
    finally:
        g.unpersist()
