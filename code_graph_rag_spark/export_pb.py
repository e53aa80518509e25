"""Protobuf graph sink/source: the reference's ProtobufFileIngestor
(``services/protobuf_service.py:45-203``, message layout
``codec/schema.proto``) re-expressed as a DISTRIBUTED Spark writer.

The protobuf wire format (public spec) makes this embarrassingly
parallel: a ``GraphCodeIndex`` is only ``repeated Node nodes = 1`` +
``repeated Relationship relationships = 2``, and repeated message fields
are plain concatenated tagged records — so every partition can encode its
own rows into a standalone, valid ``GraphCodeIndex`` fragment, and the
byte-concatenation of all part files is itself a valid ``GraphCodeIndex``.
That is exactly the shape of Spark's own file sinks: N part files written
executor-side, an optional driver-side merge for single-file convenience.
The reference buffers the whole graph in one process dict and serializes
once (``_flush_joint``); at 100 TB that driver-side buffer is the
bottleneck this sink removes.

Encoding is per-record Python inside ``mapPartitions`` — an export sink
is a cold path, and variable-length message framing is inherently
per-record (the reference pays the same cost serially; ours is
partition-parallel).

The container has no protobuf package, so the writer hand-rolls the wire
bytes (varint + tag framing per the public encoding spec) and the reader
hand-rolls the mirror parse; field numbers follow ``codec/schema.proto``
verbatim so the output is byte-compatible with the reference's codec.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# wire primitives (public protobuf encoding: LEB128 varint,
# tag = field_number << 3 | wire_type; wire_type 0 = varint, 2 = len-delim)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _ld(field: int, payload: bytes) -> bytes:
    """length-delimited field (strings, bytes, nested messages)."""
    return _tag(field, 2) + _varint(len(payload)) + payload


def _s(field: int, value: str | None) -> bytes:
    if not value:
        return b""  # proto3 default-value omission
    return _ld(field, value.encode("utf-8"))


def _i(field: int, value) -> bytes:
    if value is None or int(value) == 0:
        return b""
    return _tag(field, 0) + _varint(int(value))


# ---------------------------------------------------------------------------
# schema.proto layout (field numbers mirrored verbatim)
# ---------------------------------------------------------------------------

# Node.payload oneof field number per label (schema.proto:91-110)
ONEOF_FIELD = {
    "Project": 1,
    "Package": 2,
    "Folder": 3,
    "Module": 4,
    "Class": 5,
    "Function": 6,
    "Method": 7,
    "File": 8,
    "ExternalPackage": 9,
    "ModuleImplementation": 10,
    "ModuleInterface": 11,
    "Interface": 12,
    "Enum": 13,
    "Type": 14,
    "Union": 15,
    "ExternalModule": 16,
    "Resource": 17,
}

# Relationship.RelationshipType enum (schema.proto:116-134); unknown rel
# types encode as 0 = RELATIONSHIP_TYPE_UNSPECIFIED with the name kept in
# the properties Struct, so engine-extension predicates (HAS_MEDIA,
# FLOWS_TO, EXPOSES, findings) round-trip losslessly
REL_ENUM = {
    "CONTAINS_PACKAGE": 1,
    "CONTAINS_FOLDER": 2,
    "CONTAINS_FILE": 3,
    "CONTAINS_MODULE": 4,
    "DEFINES": 5,
    "DEFINES_METHOD": 6,
    "IMPORTS": 7,
    "INHERITS": 8,
    "OVERRIDES": 9,
    "CALLS": 10,
    "DEPENDS_ON_EXTERNAL": 11,
    "IMPLEMENTS_MODULE": 12,
    "IMPLEMENTS": 13,
    "EXPORTS": 14,
    "EXPORTS_MODULE": 15,
    "READS_FROM": 16,
    "WRITES_TO": 17,
}
_REL_NAME = {v: k for k, v in REL_ENUM.items()}

# labels whose primary key is the path / bare name rather than the
# qualified name (protobuf_service.py PATH_BASED_LABELS/NAME_BASED_LABELS)
_PATH_PK = frozenset({"Folder", "File"})
_NAME_PK = frozenset({"Project", "ExternalPackage"})


def _encode_payload(row) -> bytes:
    """One node row → the oneof payload message bytes (schema.proto
    per-label messages; PK is always field 1)."""
    label = row["label"]
    qn = row["qualified_name"]
    name = row["name"]
    path = row["path"]
    if label in _NAME_PK:
        return _s(1, name or qn)
    if label in _PATH_PK:
        out = _s(1, path or qn) + _s(2, name)
        if label == "File" and name and "." in name:
            out += _s(3, name.rsplit(".", 1)[-1])  # File.extension
        return out
    out = _s(1, qn) + _s(2, name)
    if label in ("Function", "Method", "Class"):
        # docstring=3 (not tracked), start_line=4, end_line=5
        out += _i(4, row["start_line"]) + _i(5, row["end_line"])
        props = row["props"]
        if props:
            try:
                for dec in json.loads(props).get("decorators", []):
                    out += _s(6, dec)  # repeated string decorators
            except (ValueError, AttributeError):
                pass
    elif label == "Resource":
        props = row["props"]
        kind = ""
        if props:
            try:
                kind = json.loads(props).get("kind", "")
            except (ValueError, AttributeError):
                kind = ""
        out += _s(3, kind)
    elif label in ("Module", "ExternalModule", "Interface", "Enum", "Package"):
        out += _s(3, path)
    return out


def _encode_node(row) -> bytes:
    field = ONEOF_FIELD.get(row["label"])
    if field is None:
        return b""
    payload = _encode_payload(row)
    # GraphCodeIndex.nodes = 1, wrapping Node{oneof payload}
    return _ld(1, _ld(field, payload))


def _encode_struct(d: dict) -> bytes:
    """google.protobuf.Struct: map<string, Value> fields = 1; Value
    string_value = 3 (struct.proto public layout)."""
    out = b""
    for k in sorted(d):
        v = d[k]
        entry = _s(1, k) + _ld(2, _s(3, "" if v is None else str(v)))
        out += _ld(1, entry)
    return out


def _encode_rel(row) -> bytes:
    pred = row["pred"]
    enum = REL_ENUM.get(pred, 0)
    props = dict(row["props"]) if row["props"] else {}
    if enum == 0:
        props["rel_type"] = pred  # lossless round-trip for extensions
    msg = (
        _i(1, enum)
        + _s(2, row["subj"])
        + _s(3, row["obj"])
        + (_ld(4, _encode_struct(props)) if props else b"")
        + _s(5, row["subj_label"])
        + _s(6, row["obj_label"])
    )
    # GraphCodeIndex.relationships = 2
    return _ld(2, msg)


# ---------------------------------------------------------------------------
# distributed writer
# ---------------------------------------------------------------------------


def export_protobuf_graph(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    split_index: bool = False,
    merge: bool = True,
) -> dict:
    """Write the graph as protobuf part files, each a valid GraphCodeIndex.

    ``merge=True`` additionally concatenates the parts into the
    reference's single-file layout (``graph_code_index.pb``, or
    ``nodes.pb`` + ``relationships.pb`` with ``split_index`` — the
    ``_flush_joint`` / ``_flush_split`` modes). On a real cluster point
    ``out_dir`` at a DFS path and skip the merge — every consumer of the
    format accepts the concatenated parts stream.
    """
    out = Path(out_dir)
    (out / "parts").mkdir(parents=True, exist_ok=True)
    base = str(out / "parts")

    def write_nodes(idx, it):
        buf = bytearray()
        n = 0
        for row in it:
            buf += _encode_node(row)
            n += 1
        p = f"{base}/nodes-{idx:05d}.pb"
        with open(p, "wb") as f:
            f.write(buf)
        yield (p, n)

    def write_rels(idx, it):
        buf = bytearray()
        n = 0
        for row in it:
            buf += _encode_rel(row)
            n += 1
        p = f"{base}/rels-{idx:05d}.pb"
        with open(p, "wb") as f:
            f.write(buf)
        yield (p, n)

    node_cols = nodes.select(
        "label", "qualified_name", "name", "path",
        "start_line", "end_line", "props",
    )
    edge_cols = edges.select(
        "subj", "pred", "obj", "subj_label", "obj_label", "props"
    )
    node_parts = node_cols.rdd.mapPartitionsWithIndex(write_nodes).collect()
    rel_parts = edge_cols.rdd.mapPartitionsWithIndex(write_rels).collect()

    meta = {
        "node_count": sum(n for _, n in node_parts),
        "relationship_count": sum(n for _, n in rel_parts),
        "format": "graphcode.v1.GraphCodeIndex",
        "parts": len(node_parts) + len(rel_parts),
    }
    if merge:
        if split_index:
            _concat([p for p, _ in node_parts], out / "nodes.pb")
            _concat([p for p, _ in rel_parts], out / "relationships.pb")
        else:
            _concat(
                [p for p, _ in node_parts] + [p for p, _ in rel_parts],
                out / "graph_code_index.pb",
            )
    (out / "metadata.json").write_text(json.dumps(meta, indent=1))
    return meta


def _concat(parts: list[str], target: Path) -> None:
    with open(target, "wb") as f:
        for p in sorted(parts):
            f.write(Path(p).read_bytes())


# ---------------------------------------------------------------------------
# reader (mirror parse; each file decodes independently → distributed)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over one message's bytes."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        else:  # groups (3/4) never appear in this schema
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


_LABEL_BY_FIELD = {v: k for k, v in ONEOF_FIELD.items()}


def _decode_node(payload: bytes) -> dict | None:
    for field, _wt, v in _fields(payload):
        label = _LABEL_BY_FIELD.get(field)
        if label is None:
            continue
        row = {
            "label": label, "qualified_name": None, "name": None,
            "path": None, "start_line": None, "end_line": None,
            "props": None,
        }
        strs: dict[int, str] = {}
        decorators: list[str] = []
        for f2, _w2, v2 in _fields(v):
            if f2 in (1, 2, 3) and isinstance(v2, bytes):
                if f2 == 3 and label in ("Function", "Method", "Class"):
                    pass  # docstring — not tracked
                else:
                    strs[f2] = v2.decode("utf-8")
            elif f2 == 4 and label in ("Function", "Method", "Class"):
                row["start_line"] = v2
            elif f2 == 5 and label in ("Function", "Method", "Class"):
                row["end_line"] = v2
            elif f2 == 6 and isinstance(v2, bytes):
                decorators.append(v2.decode("utf-8"))
        pk = strs.get(1, "")
        if label in _NAME_PK:
            row["qualified_name"], row["name"] = pk, pk
        elif label in _PATH_PK:
            row["qualified_name"], row["path"] = pk, pk
            row["name"] = strs.get(2)
        else:
            row["qualified_name"] = pk
            row["name"] = strs.get(2)
            if label == "Resource":
                if 3 in strs:
                    row["props"] = json.dumps({"kind": strs[3]})
            elif label in (
                "Module", "ExternalModule", "Interface", "Enum", "Package"
            ):
                row["path"] = strs.get(3)
        if decorators:
            row["props"] = json.dumps({"decorators": decorators})
        return row
    return None


def _decode_struct(buf: bytes) -> dict:
    out = {}
    for f, _w, v in _fields(buf):
        if f != 1:
            continue
        k = None
        val = ""
        for f2, _w2, v2 in _fields(v):
            if f2 == 1:
                k = v2.decode("utf-8")
            elif f2 == 2:
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 3:
                        val = v3.decode("utf-8")
        if k is not None:
            out[k] = val
    return out


def _decode_rel(buf: bytes) -> dict:
    row = {
        "subj": None, "pred": "RELATIONSHIP_TYPE_UNSPECIFIED", "obj": None,
        "subj_label": None, "obj_label": None, "props": None,
    }
    props: dict = {}
    for f, _w, v in _fields(buf):
        if f == 1:
            row["pred"] = _REL_NAME.get(v, "RELATIONSHIP_TYPE_UNSPECIFIED")
        elif f == 2:
            row["subj"] = v.decode("utf-8")
        elif f == 3:
            row["obj"] = v.decode("utf-8")
        elif f == 4:
            props = _decode_struct(v)
        elif f == 5:
            row["subj_label"] = v.decode("utf-8")
        elif f == 6:
            row["obj_label"] = v.decode("utf-8")
    if "rel_type" in props:  # extension predicate round-trip
        row["pred"] = props.pop("rel_type")
    row["props"] = props or None
    return row


def import_protobuf_graph(
    spark: SparkSession, in_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Read part files (or a merged index) back into (nodes, edges)
    frames. ``binaryFile`` lists the files; each decodes independently in
    its task, so the read scales with the part count."""
    parts = Path(in_dir) / "parts"
    if parts.is_dir():
        pattern = str(parts / "*.pb")
    else:
        pattern = str(Path(in_dir) / "*.pb")
    blobs = spark.read.format("binaryFile").load(pattern)

    def decode(it):
        import pandas as pd

        for pdf in it:
            nrows, erows = [], []
            for blob in pdf["content"]:
                for f, _w, v in _fields(bytes(blob)):
                    if f == 1:
                        r = _decode_node(v)
                        if r:
                            nrows.append(r)
                    elif f == 2:
                        erows.append(_decode_rel(v))
            yield pd.DataFrame(
                {
                    "kind": ["n"] * len(nrows) + ["e"] * len(erows),
                    "payload": [json.dumps(r) for r in nrows + erows],
                }
            )

    decoded = blobs.select("content").mapInPandas(
        decode, "kind string, payload string"
    )
    from pyspark.sql import functions as F

    from code_graph_rag_spark.schema import EDGES_SCHEMA, NODES_SCHEMA

    node_t = F.from_json(
        "payload",
        "struct<label:string,qualified_name:string,name:string,path:string,"
        "start_line:int,end_line:int,props:string>",
    )
    edge_t = F.from_json(
        "payload",
        "struct<subj:string,pred:string,obj:string,subj_label:string,"
        "obj_label:string,props:map<string,string>>",
    )
    nodes = (
        decoded.filter(F.col("kind") == "n")
        .select(node_t.alias("r"))
        .select("r.*")
        .select([f.name for f in NODES_SCHEMA.fields])
    )
    edges = (
        decoded.filter(F.col("kind") == "e")
        .select(edge_t.alias("r"))
        .select("r.*")
        .select([f.name for f in EDGES_SCHEMA.fields])
    )
    return nodes, edges
