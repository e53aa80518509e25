"""Protobuf graph sink: wire-format golden vectors + distributed
round-trip (export_pb.py mirrors codec/schema.proto field numbers)."""

import json
import tempfile
from pathlib import Path

from code_graph_rag_spark.export_pb import (
    _encode_node,
    _encode_rel,
    _ld,
    _s,
    _varint,
    export_protobuf_graph,
    import_protobuf_graph,
)
from code_graph_rag_spark.schema import EDGES_SCHEMA, NODES_SCHEMA

NODE_ROWS = [
    ("Project", "proj", "proj", None, None, None, None),
    ("Module", "proj.app", "app", "proj/app.py", None, None, None),
    ("Class", "proj.app.C", "C", None, 3, 9, '{"decorators": ["@dc"]}'),
    ("Function", "proj.app.run", "run", None, 11, 14, None),
    ("Method", "proj.app.C.m", "m", None, 5, 6, None),
    ("File", "proj/app.py", "app.py", "proj/app.py", None, None, None),
    ("Folder", "proj/sub", "sub", "proj/sub", None, None, None),
    ("ExternalPackage", "requests", "requests", None, None, None, None),
    ("Resource", "resource::env::HOME", "HOME", None, None, None,
     '{"kind": "env"}'),
]

EDGE_ROWS = [
    ("proj.app", "DEFINES", "proj.app.run", "Module", "Function", None),
    ("proj.app.C", "DEFINES_METHOD", "proj.app.C.m", "Class", "Method", None),
    ("proj.app.run", "READS_FROM", "resource::env::HOME", "Function",
     "Resource", {"kind": "env"}),
    # extension predicate: not in the schema enum — must round-trip via
    # the properties Struct (rel_type key)
    ("proj.app", "HAS_MEDIA", "img#1", "Module", "Media", None),
]


def test_wire_golden_vectors():
    # public-spec basics: varint LEB128 and len-delimited framing
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"
    assert _s(1, "A") == b"\x0a\x01A"
    assert _ld(2, b"hi") == b"\x12\x02hi"


def test_node_encoding_layout():
    row = {
        "label": "Function", "qualified_name": "p.f", "name": "f",
        "path": None, "start_line": 2, "end_line": 3, "props": None,
    }
    b = _encode_node(row)
    # GraphCodeIndex.nodes = 1 → tag 0x0a; Node.function = 6 → tag 0x32
    assert b[0] == 0x0A
    assert b[2] == 0x32
    # payload: qualified_name=1, name=2, start_line=4 varint, end_line=5
    payload = b[4:]
    assert payload.startswith(b"\x0a\x03p.f\x12\x01f")
    assert payload.endswith(b"\x20\x02\x28\x03")


def test_rel_encoding_enum_and_struct():
    row = {
        "subj": "a", "pred": "CALLS", "obj": "b",
        "subj_label": "Function", "obj_label": "Function", "props": None,
    }
    b = _encode_rel(row)
    # GraphCodeIndex.relationships = 2 → tag 0x12; type=1 varint CALLS=10
    assert b[0] == 0x12
    assert b[2:4] == b"\x08\x0a"


def test_round_trip_distributed(spark):
    nodes = spark.createDataFrame(NODE_ROWS, schema=NODES_SCHEMA)
    edges = spark.createDataFrame(EDGE_ROWS, schema=EDGES_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        meta = export_protobuf_graph(nodes, edges, d, merge=True)
        assert meta["node_count"] == len(NODE_ROWS)
        assert meta["relationship_count"] == len(EDGE_ROWS)
        # merged single-file layout exists and equals the parts stream
        merged = Path(d) / "graph_code_index.pb"
        parts = sorted((Path(d) / "parts").glob("*.pb"))
        assert merged.read_bytes() == b"".join(p.read_bytes() for p in parts)

        rn, re_ = import_protobuf_graph(spark, d)
        got_nodes = {
            (r.label, r.qualified_name, r.name)
            for r in rn.collect()
        }
        assert got_nodes == {
            (label, qn, name) for label, qn, name, *_ in NODE_ROWS
        }
        got_edges = {
            (r.subj, r.pred, r.obj, r.subj_label, r.obj_label)
            for r in re_.collect()
        }
        assert got_edges == {
            (s, p, o, sl, ol) for s, p, o, sl, ol, _pr in EDGE_ROWS
        }
        # line numbers + props fidelity
        cls = {r.qualified_name: r for r in rn.collect()}["proj.app.C"]
        assert (cls.start_line, cls.end_line) == (3, 9)
        assert json.loads(cls.props)["decorators"] == ["@dc"]
        rf = [r for r in re_.collect() if r.pred == "READS_FROM"][0]
        assert dict(rf.props) == {"kind": "env"}
