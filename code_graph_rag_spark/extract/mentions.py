"""documents → mentions: the vectorized extraction stage.

One ``mapInPandas`` over the documents frame (repartitioned by range on
``doc_id`` for deterministic, size-balanced partitions — the north rule's
explicit contract). Each Arrow batch is parsed with the pure-Python kernel in
``pylite.py``; one input row yields N mention rows (the reference's
"one file → many ensure_node/relationship calls" UDTF shape,
``codebase_rag/graph_updater.py:1841-1882``).

Only ``kind='code'`` spans contribute text; docstring/comment/media spans are
untouched (per-row span-sequence invariant). Span texts are concatenated in
``offset`` order — the extraction must never reorder them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from code_graph_rag_spark.extract.pylite import parse_document as _parse_py
from code_graph_rag_spark.schema import MENTIONS_SCHEMA

_COLS = [f.name for f in MENTIONS_SCHEMA.fields]


def parse_document(doc_id: str, text: str) -> list[dict]:
    """Language dispatch: extension → per-language kernel (the Spark analogue
    of the reference's ``language_spec.py`` registry). Both kernels emit the
    SAME mention IR, so everything downstream is language-agnostic."""
    from code_graph_rag_spark.extract.cpplite import CPP_EXTENSIONS
    from code_graph_rag_spark.extract.cpplite import parse_document as _parse_cpp
    from code_graph_rag_spark.extract.cslite import CSHARP_EXTENSIONS
    from code_graph_rag_spark.extract.cslite import parse_document as _parse_cs
    from code_graph_rag_spark.extract.dartlite import DART_EXTENSIONS
    from code_graph_rag_spark.extract.dartlite import parse_document as _parse_dart
    from code_graph_rag_spark.extract.golite import GO_EXTENSIONS
    from code_graph_rag_spark.extract.golite import parse_document as _parse_go
    from code_graph_rag_spark.extract.javalite import JAVA_EXTENSIONS
    from code_graph_rag_spark.extract.javalite import parse_document as _parse_java
    from code_graph_rag_spark.extract.jslite import JS_EXTENSIONS
    from code_graph_rag_spark.extract.jslite import parse_document as _parse_js
    from code_graph_rag_spark.extract.lualite import LUA_EXTENSIONS
    from code_graph_rag_spark.extract.lualite import parse_document as _parse_lua
    from code_graph_rag_spark.extract.pylite import doc_extension
    from code_graph_rag_spark.extract.rubylite import RUBY_EXTENSIONS
    from code_graph_rag_spark.extract.rubylite import parse_document as _parse_rb
    from code_graph_rag_spark.extract.rustlite import RUST_EXTENSIONS
    from code_graph_rag_spark.extract.rustlite import parse_document as _parse_rs

    from code_graph_rag_spark.extract.contracts import (
        CONTRACT_EXTENSIONS,
        SPEC_EXTENSIONS,
        is_spec_text,
        parse_proto,
        parse_spec,
    )

    ext = doc_extension(doc_id)
    if ext in CONTRACT_EXTENSIONS:
        return parse_proto(doc_id, text)
    if ext in SPEC_EXTENSIONS and is_spec_text(text):
        # narrow sniff (reference contracts.py _spec_document): manifests
        # like package.json/composer.json fall through to the manifest path
        rows = parse_spec(doc_id, text)
        if rows:
            return rows
    if ext in JS_EXTENSIONS:
        return _parse_js(doc_id, text)
    if ext in JAVA_EXTENSIONS:
        return _parse_java(doc_id, text)
    if ext in RUST_EXTENSIONS:
        return _parse_rs(doc_id, text)
    if ext in GO_EXTENSIONS:
        return _parse_go(doc_id, text)
    if ext in CSHARP_EXTENSIONS:
        return _parse_cs(doc_id, text)
    if ext in LUA_EXTENSIONS:
        return _parse_lua(doc_id, text)
    if ext in CPP_EXTENSIONS:
        return _parse_cpp(doc_id, text)
    if ext in DART_EXTENSIONS:
        return _parse_dart(doc_id, text)
    if ext in RUBY_EXTENSIONS:
        return _parse_rb(doc_id, text)
    return _parse_py(doc_id, text)

_INT_COLS = {"start_line", "end_line", "start_col", "base_index"}


def _code_text(spans: list) -> str:
    # spans arrive sorted by offset from the source contract; sort defensively
    # on the ordering key without mutating the row (invariant: never reorder
    # the stored spans — this sort is over a local copy).
    ordered = sorted(spans, key=lambda s: s["offset"])
    return "".join(s["text"] or "" for s in ordered if s["kind"] == "code")


def _media_rows(spans: list, module_qn: str) -> list[dict]:
    """media spans → ``media`` mentions carrying the concatenated-code line
    at the interleave point, so the span-containment range join
    (``plans/spans.py``) can attribute each asset to the tightest enclosing
    definition downstream."""
    ordered = sorted(spans, key=lambda s: s["offset"])
    out: list[dict] = []
    line = 1
    for s in ordered:
        if s["kind"] == "code":
            line += (s["text"] or "").count("\n")
        elif s["kind"] == "media" and s["media_ref"]:
            # the insertion point sits BETWEEN code lines (after line-1,
            # before line): a definition owns the asset only if it spans
            # both sides, so an asset between two top-level defs falls back
            # to the module instead of sticking to the next def's first line
            out.append(
                {
                    "kind": "media",
                    "name": s["media_ref"],
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": max(line - 1, 1),
                    "end_line": line,
                    "start_col": 0,
                }
            )
    return out


# mention kinds consumed ONLY by the io capture group (plans/flow.py
# assignment-taint / per-argument flow, plans/endpoints.py mount prefixes).
# `returns` is NOT here: the chained-return resolution rung (core) needs it.
_IO_ONLY_KINDS = frozenset(
    {
        "assign",
        "argflow",
        "mount",
        "route_call",
        "rpc_wire",
        "contract_op",
        "dispatch_reg",
        "dispatch_prod",
    }
)


def _extract_batches(
    drop_kinds: frozenset[str] = frozenset(),
    emit_findings: bool = False,
):
    from code_graph_rag_spark.extract.pylite import module_qn_for
    from code_graph_rag_spark.plans.findings import finding_mentions

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                module_qn, _ = module_qn_for(doc_id)
                text = _code_text(list(spans))
                doc_rows = parse_document(doc_id, text)  # language-dispatched
                if doc_rows and doc_rows[0].get("kind") == "module":
                    doc_rows.extend(_media_rows(list(spans), module_qn))
                    if emit_findings:
                        # findings run inside this same scan — a post-pass
                        # would re-read the whole corpus (plans/findings.py)
                        doc_rows.extend(finding_mentions(doc_id, text))
                for m in doc_rows:
                    if m["kind"] in drop_kinds:
                        continue
                    m["doc_id"] = doc_id
                    m["module_qn"] = module_qn
                    rows.append(m)
            out = pd.DataFrame(rows, columns=_COLS)
            for c in _INT_COLS:
                out[c] = out[c].astype("Int32")
            out["is_ret"] = out["is_ret"].map(
                lambda v: bool(v) if v is not None and v == v else False
            )
            yield out

    return run


def extract_mentions(
    documents: DataFrame,
    partitions: int | None = None,
    groups: tuple[str, ...] | None = None,
) -> DataFrame:
    """documents(doc_id, spans) → mentions frame (MENTIONS_SCHEMA).

    ``groups``: the build's capture groups. When given WITHOUT ``io``, the
    io-only fact rows (assign/argflow/mount) are dropped inside the Arrow
    batch before they ever hit the mentions checkpoint — a default build
    must not pay row volume for joins it will never run (measured: the
    always-on fact rows were the round-3 kg_build toy-scale regression).
    ``None`` keeps every row (the incremental stage store extracts once
    for ALL groups, so a later io build can reuse the stored stage).
    """
    n = partitions or documents.sparkSession.sparkContext.defaultParallelism
    docs = documents.repartitionByRange(n, F.col("doc_id"))
    drop = (
        _IO_ONLY_KINDS
        if groups is not None and "io" not in groups
        else frozenset()
    )
    emit_findings = groups is None or "findings" in groups
    return docs.mapInPandas(
        _extract_batches(drop, emit_findings), schema=MENTIONS_SCHEMA
    )
