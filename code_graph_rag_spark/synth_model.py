"""Analytic expected-graph model for the deterministic synth corpus.

``fixtures.synth_corpus_rows(n_docs, funcs_per_doc, pkg_fanout)`` is a pure
function of its parameters, so the graph the engine must produce is
derivable *analytically* — no Spark, no pylite, no engine code — from the
documented semantics alone:

* structure layer: root segment = Project, ``__init__.py`` dir = Package,
  dir CONTAINS_FILE / CONTAINS_MODULE (reference
  ``structure_processor.py:61-165``, ``graph_updater.py:604-632``);
* DEFINES / DEFINES_METHOD from the lexical nesting
  (``definition_processor.py``);
* IMPORTS: from-import and plain import of sibling modules resolve to
  internal Modules, ``import numpy`` to an ExternalModule
  (``import_processor.py`` verification ladder);
* the resolution ladder binds ``fn_0()`` to the **imported** sibling
  ``fn_0`` (import-map rung outranks same-module, SURVEY §2.4 rung order),
  ``fn_{f+1}()`` to the same-module definition, and ``self.step()`` inside
  ``C.run`` to the own class's method (class-context rung);
* ``numpy.zeros`` is externally suppressed (no CALLS edge);
* ``c = C()`` emits INSTANTIATES (``call_processor.py`` ctor rule);
* ``C(B)`` emits INHERITS; ``C.run``/``C.step`` OVERRIDE the nearest
  ancestor method (``method_override.py``);
* a top-level media span attaches to the module (tightest-containing-span
  fallback, plans/spans.py).

This is the **independent twin implementation** used as the hard DuckDB
oracle for the ``kg_*`` driver queries: ``tests/test_synth_model.py``
asserts engine ≡ model exactly on multiple corpus sizes.

Constraint: ``n_docs`` must not divide 6 and must exceed 7 (so the two
sibling imports are distinct and never self-referential), and
``n_docs % 5 != 4`` is NOT required — tail docs are modeled.
"""

from __future__ import annotations

from collections import deque


def _mod_qn(i: int, pkg_fanout: int) -> str:
    return f"synth.pkg{i % pkg_fanout:03d}.mod{i:05d}"


def synth_expected_graph(
    n_docs: int, funcs_per_doc: int = 8, pkg_fanout: int = 50
) -> tuple[list[tuple], list[tuple]]:
    """Expected (nodes, edges) for ``synth_corpus_rows`` with the same
    params.

    nodes: (label, id, name, path)  — path only for entity labels (the
    defining doc), None for structure/external/media rows except File.
    edges: (subj, pred, obj, subj_label, obj_label).
    """
    # n_docs > 7 ⇒ (i+1)%N, (i+7)%N, i are pairwise distinct for every i
    assert n_docs > 7, "sibling imports must be distinct non-self modules"
    npkg = min(pkg_fanout, n_docs)
    nodes: list[tuple] = []
    edges: list[tuple] = []

    # ---- structure layer ----
    nodes.append(("Project", "synth", "synth", None))
    nodes.append(("File", "synth/__init__.py", "__init__.py", "synth/__init__.py"))
    nodes.append(("Module", "synth", "synth", "synth/__init__.py"))
    edges.append(("synth", "CONTAINS_FILE", "synth/__init__.py", "Project", "File"))
    edges.append(("synth", "CONTAINS_MODULE", "synth", "Project", "Module"))
    for p in range(npkg):
        pkg = f"synth.pkg{p:03d}"
        pdir = f"synth/pkg{p:03d}"
        nodes.append(("Package", pkg, f"pkg{p:03d}", None))
        nodes.append(
            ("File", f"{pdir}/__init__.py", "__init__.py", f"{pdir}/__init__.py")
        )
        nodes.append(("Module", pkg, f"pkg{p:03d}", f"{pdir}/__init__.py"))
        edges.append(("synth", "CONTAINS_PACKAGE", pkg, "Project", "Package"))
        edges.append((pkg, "CONTAINS_FILE", f"{pdir}/__init__.py", "Package", "File"))
        edges.append((pkg, "CONTAINS_MODULE", pkg, "Package", "Module"))

    nodes.append(("ExternalModule", "numpy", "numpy", None))

    # ---- per-module entities + edges ----
    for i in range(n_docs):
        p = i % pkg_fanout
        pkg = f"synth.pkg{p:03d}"
        doc = f"synth/pkg{p:03d}/mod{i:05d}.py"
        m = _mod_qn(i, pkg_fanout)
        s1 = _mod_qn((i + 1) % n_docs, pkg_fanout)
        s2 = _mod_qn((i + 7) % n_docs, pkg_fanout)
        b = f"{m}.B{i % 7}"
        c = f"{m}.C{i % 97}"

        nodes.append(("File", doc, f"mod{i:05d}.py", doc))
        nodes.append(("Module", m, f"mod{i:05d}", doc))
        nodes.append(("Class", b, f"B{i % 7}", doc))
        nodes.append(("Class", c, f"C{i % 97}", doc))
        edges.append((pkg, "CONTAINS_FILE", doc, "Package", "File"))
        edges.append((pkg, "CONTAINS_MODULE", m, "Package", "Module"))
        edges.append((m, "DEFINES", b, "Module", "Class"))
        edges.append((m, "DEFINES", c, "Module", "Class"))
        for cls in (b, c):
            for meth in ("run", "step"):
                nodes.append(("Method", f"{cls}.{meth}", meth, doc))
                edges.append(
                    (cls, "DEFINES_METHOD", f"{cls}.{meth}", "Class", "Method")
                )
        edges.append((c, "INHERITS", b, "Class", "Class"))
        for meth in ("run", "step"):
            edges.append(
                (f"{c}.{meth}", "OVERRIDES", f"{b}.{meth}", "Method", "Method")
            )
        # self.step() inside C.run → own-class method (class-context rung)
        edges.append((f"{c}.run", "CALLS", f"{c}.step", "Method", "Method"))

        # imports (set semantics: engine dedups repeated targets)
        for tgt in sorted({s1, s2}):
            edges.append((m, "IMPORTS", tgt, "Module", "Module"))
        edges.append((m, "IMPORTS", "numpy", "Module", "ExternalModule"))

        # functions
        call_edges: set[tuple] = set()
        for f_i in range(funcs_per_doc):
            fn = f"{m}.fn_{f_i}"
            nodes.append(("Function", fn, f"fn_{f_i}", doc))
            edges.append((m, "DEFINES", fn, "Module", "Function"))
            callee_name = f"fn_{(f_i + 1) % funcs_per_doc}"
            # import-map rung binds fn_0 to the from-imported sibling;
            # other fn_* names bind same-module
            callee_qn = f"{s1}.fn_0" if callee_name == "fn_0" else f"{m}.{callee_name}"
            call_edges.add((fn, "CALLS", callee_qn, "Function", "Function"))
            call_edges.add((fn, "CALLS", f"{s1}.fn_0", "Function", "Function"))
            edges.append((fn, "INSTANTIATES", c, "Function", "Class"))
        edges.extend(sorted(call_edges))

        if i % 5 == 0:
            tail = f"{m}.tail_{i}"
            asset = f"assets/diagram_{i}.png"
            nodes.append(("Function", tail, f"tail_{i}", doc))
            nodes.append(("MediaAsset", asset, f"diagram_{i}.png", doc))
            edges.append((m, "DEFINES", tail, "Module", "Function"))
            edges.append((tail, "CALLS", f"{s1}.fn_0", "Function", "Function"))
            edges.append((m, "HAS_MEDIA", asset, "Module", "MediaAsset"))

    # engine output is (subj,pred,obj)-deduped; the model emits each edge
    # once by construction, but dedup defensively for odd parameterizations
    seen: set[tuple] = set()
    out_edges = []
    for e in edges:
        if e[:3] not in seen:
            seen.add(e[:3])
            out_edges.append(e)
    return nodes, out_edges


# ---------------------------------------------------------------------------
# Derived expectations for the read-path queries
# ---------------------------------------------------------------------------

REACH_PREDS = ("CALLS", "REFERENCES", "INSTANTIATES", "INHERITS")

MOD = 1_000_000_007
_PERMS = [
    (2000007, 7),
    (3999933, 912878),
    (606667, 1825749),
    (6222137, 2738620),
    (4866143, 3651491),
    (1213333, 4564362),
    (9333141, 5477233),
    (3111037, 6390104),
]


def _hash60(s: str) -> int:
    """Python twin of operators.text.hash60 (md5 first 15 hex digits)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def expected_canonicalization(
    entity_ids: list[str],
    k: int = 8,
    bands: int = 4,
    min_agreement: float = 0.95,
    max_bucket: int = 256,
) -> list[tuple[str, str]]:
    """Pure-Python twin of ``linking.canonicalize_entities`` (MinHash over
    QN shingles → hash60 banding → bucket-capped pair join → agreement +
    simple-name gate → connected components, min id canonical). Used as the
    hard driver oracle for ``kg_canonicalize``."""
    r = k // bands
    sigs: dict[str, list[int]] = {}
    for qn in set(entity_ids):
        padded = f"^{qn}$"
        hs = [
            _hash60(padded[i : i + 3]) % MOD
            for i in range(max(len(padded) - 2, 1))
        ]
        sigs[qn] = [min((h * a + b) % MOD for h in hs) for a, b in _PERMS[:k]]

    buckets: dict[tuple[int, int], list[str]] = {}
    for qn, sig in sigs.items():
        for b in range(bands):
            bh = _hash60(",".join(str(x) for x in sig[b * r : (b + 1) * r]))
            buckets.setdefault((b, bh), []).append(qn)

    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                agree = sum(
                    1 for x, y in zip(sigs[a], sigs[b]) if x == y
                ) / float(k)
                if agree >= min_agreement and a.rsplit(".", 1)[-1] == b.rsplit(
                    ".", 1
                )[-1]:
                    pairs.add((a, b))

    parent: dict[str, str] = {e: e for e in set(entity_ids)}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return sorted((e, find(e)) for e in set(entity_ids))


def synth_expected_dead_code(
    n_docs: int, funcs_per_doc: int = 8, pkg_fanout: int = 50
) -> list[tuple]:
    """Pure-Python twin of ``queries.dead_code``: multi-source BFS from the
    root set over REACH_PREDS with OVERRIDES revival, then unreachable
    Function/Method rows (label, id, name, path) sorted by id."""
    nodes, edges = synth_expected_graph(n_docs, funcs_per_doc, pkg_fanout)
    # roots (mirroring queries.dead_code's tightened reference-parity
    # selection): Module nodes; dunder METHODS / root decorators /
    # go-rust entry fns / exported symbols don't occur in the synth
    # corpus, but apply the dunder-method rule anyway
    roots = {
        nid
        for (label, nid, name, path) in nodes
        if label == "Module"
        or (
            label == "Method"
            and name.startswith("__")
            and name.endswith("__")
            and (path or "").endswith(".py")
        )
    }
    adj: dict[str, set[str]] = {}
    for subj, pred, obj, _sl, _ol in edges:
        if pred in REACH_PREDS:
            adj.setdefault(subj, set()).add(obj)
        elif pred == "OVERRIDES":
            adj.setdefault(subj, set()).add(obj)
            adj.setdefault(obj, set()).add(subj)
    visited = set(roots)
    q = deque(roots)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in visited:
                visited.add(v)
                q.append(v)
    return sorted(
        (label, nid, name, path)
        for (label, nid, name, path) in nodes
        if label in ("Function", "Method") and nid not in visited
    )


def expected_resolution_stats(
    n_docs: int, funcs_per_doc: int = 8, pkg_fanout: int = 50
) -> list[tuple]:
    """Analytic (kind, n_mentions, n_resolved, n_unresolved) for the synth
    corpus — the twin of ``queries.resolution_stats`` over a
    ``build_graph(synth_corpus(...))`` run.

    Counting from the corpus shape (one mention per distinct
    (doc, line, col, callee, kind) site, so repeated ``fn_0()`` lines in
    one function are distinct mentions):

    * each of the ``funcs_per_doc`` functions makes 4 calls —
      ``fn_{f+1}()`` (resolves: import/same-module rung), ``fn_0()``
      (resolves: import rung), ``numpy.zeros`` (external — SUPPRESSED, the
      ladder never binds external targets), ``C{i%97}()`` (resolves:
      same-module ctor → INSTANTIATES);
    * ``C.run``'s ``self.step()`` resolves via the class-context rung;
    * every 5th module has a ``tail_{i}`` function calling ``fn_0()``
      (resolves).

    The synth corpus emits no ``ref`` mentions, so the output is the
    single ``call`` row.
    """
    n_tail = (n_docs + 4) // 5  # i % 5 == 0 for i in [0, n_docs)
    n_mentions = n_docs * (4 * funcs_per_doc + 1) + n_tail
    n_resolved = n_docs * (3 * funcs_per_doc + 1) + n_tail
    return [("call", n_mentions, n_resolved, n_mentions - n_resolved)]


def _stub_embed_matrix(texts: list[str], dim: int = 64):
    """The documented stub-encoder contract (operators/embeddings.py
    ``embed_texts`` docstring): char-trigram crc32 fold with weight
    ``1 + (h >> 16) % 3``, L2-normalized, float32. Re-implemented here so
    the oracle side never imports engine code."""
    import zlib

    import numpy as np

    m = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        s = f"^{(t or '').lower()}$"
        for j in range(len(s) - 2):
            h = zlib.crc32(s[j : j + 3].encode("utf-8"))
            m[i, h % dim] += 1.0 + (h >> 16) % 3
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return (m / np.maximum(norms, 1e-300)).astype(np.float32)


def expected_semantic_search(
    n_docs: int,
    funcs_per_doc: int,
    pkg_fanout: int,
    query: str,
    k: int = 10,
    dim: int = 64,
) -> list[tuple]:
    """Driver-side twin of ``kg_semantic_search``: embed every embeddable
    entity of the analytic expected graph plus the query with the stub
    contract, exact cosine in float64 (matching the engine's
    float32-storage → float64-renormalize pipeline), top-k by
    (cosine desc, hash60(entity_id) asc) — the engine's exact order, fully
    replayable because the tie-break id is md5-based.
    Returns (entity_id, label, cosine_rounded_6, rank).
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    nodes, _edges = synth_expected_graph(n_docs, funcs_per_doc, pkg_fanout)
    embeddable = ("Function", "Method", "Class", "Module", "Interface", "Enum")
    ents = [
        (nid, label, name)
        for (label, nid, name, _p) in nodes
        if label in embeddable
    ]
    texts = [f"{nid} {name}" for (nid, _l, name) in ents]
    m32 = _stub_embed_matrix(texts, dim)
    q32 = _stub_embed_matrix([query], dim)
    # engine stores float32 and re-normalizes in float64 before the dot
    m64 = m32.astype(np.float64)
    m64 /= np.maximum(np.linalg.norm(m64, axis=1, keepdims=True), 1e-300)
    q64 = q32.astype(np.float64)[0]
    q64 /= max(np.linalg.norm(q64), 1e-300)
    cos = m64 @ q64
    tie = np.array([_hash60(nid) for (nid, _l, _n) in ents], dtype=np.int64)
    order = np.lexsort((tie, -cos))
    out = []
    for rank, idx in enumerate(order[:k], start=1):
        nid, label, _name = ents[idx]
        rounded = float(
            Decimal(repr(float(cos[idx]))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        out.append((nid, label, rounded, rank))
    return out
