"""Single-document mention extraction for C/C++.

The C++ sibling kernel (reference tier: ``parsers/cpp/`` 1,395 LoC +
``cpp_frontend/``, 81 ``test_cpp_*`` files) over the shared mention IR.
Shares jslite's stripper/brace machinery.

Semantics mirrored:

* module QN from the file path (``.h``/``.hpp``/``.cpp``/``.cc`` all
  module files — the reference registers headers and sources alike);
* ``#include "a/b.h"`` → import of internal module candidate ``a.b``
  (resolved by the project-prefixed/suffix ladder); ``#include <sys>``
  → ExternalModule;
* ``class``/``struct``/``enum class`` declarations with access-specifier
  base lists (``: public Base, private IFace`` — specifiers stripped,
  order → base_index); FORWARD declarations (``class X;``) mint nothing
  (the reference's keep-or-drop pass keeps only never-defined ones);
* in-class methods: bodied, ``;``-declared (the header-declaration
  shape — it IS the entity), ``= 0`` pure virtual, ctors;
* **out-of-class definitions** ``Ret Cls::name(args) {``: bound to a
  same-file class directly; otherwise emitted as a ``method_impl``
  mention that the DEFERRED JOIN PASS (``plans/cpp_impl.py``, the Spark
  form of ``graph_updater.py:661-667`` resolve_deferred_cpp_methods)
  binds to the class wherever it lives;
* typed receivers: ``Circle c;`` / ``Circle c(…)`` / ``Circle* c = new
  Circle`` / ``auto c = make()`` (fn-return hop); ``c.m()`` and
  ``c->m()`` both dispatch; ``Cls::m()`` → dotted callee;
* return types become ``returns`` facts; ``namespace X {`` recorded as
  a prop (the path already scopes the QN).
"""

from __future__ import annotations

import json
import re

from code_graph_rag_spark.extract.jslite import (
    _Scope,
    _matching_paren,
    _split_args,
    _strip_line,
)

CPP_EXTENSIONS = frozenset(
    {"h", "hh", "hpp", "hxx", "c", "cc", "cpp", "cxx", "cppm", "ixx"}
)

KEYWORDS = frozenset(
    """alignas alignof and asm auto bool break case catch char class
    concept const consteval constexpr constinit continue decltype default
    delete do double dynamic_cast else enum explicit export extern false
    float for friend goto if inline int long mutable namespace new
    noexcept not nullptr operator or private protected public register
    reinterpret_cast requires return short signed sizeof static
    static_assert static_cast struct switch template this thread_local
    throw true try typedef typeid typename union unsigned using virtual
    void volatile while final override std size_t int8_t int16_t int32_t
    int64_t uint8_t uint16_t uint32_t uint64_t""".split()
)

_ID = r"[A-Za-z_]\w*"
_CXX = rf"{_ID}(?:::{_ID})*"
_TYPE = rf"(?:const\s+)?{_CXX}(?:\s*<[^<>;(){{}}]*>)?(?:\s*[*&]+)?(?:\s+const)?"

_INCLUDE_RE = re.compile(r'^\s*#\s*include\s+(?:"([^"]+)"|<([^>]+)>)')
# C++20 module declarations (ref parsers/class_ingest/cpp_modules.py:29-52):
# `export module X;` = interface unit, `module X;` = implementation unit.
# Name must start with an identifier char, which excludes the global module
# fragment `module;` and the private fragment `module :private;` — the same
# two shapes the reference skips (CPP_MODULE_PRIVATE_PREFIX guard).
_MODULE_DECL_RE = re.compile(r"^\s*(export\s+)?module\s+([A-Za-z_][\w.:]*)\s*;")
_NAMESPACE_RE = re.compile(rf"^\s*namespace\s+({_CXX})?\s*\{{")
_CLASS_RE = re.compile(
    rf"(?:^|\b)(?:template\s*<[^<>]*>\s*)?(class|struct)\s+({_ID})"
    rf"(?:\s+final)?(?:\s*:\s*([\w:,<>\s]+?))?\s*(\{{|$)"
)
_ENUM_CLASS_RE = re.compile(rf"^\s*enum\s+(?:class|struct)\s+({_ID})")
_FORWARD_RE = re.compile(rf"^\s*(?:class|struct)\s+({_ID})\s*;")
_METHOD_RE = re.compile(
    rf"^\s*(?:(?:virtual|static|inline|explicit|constexpr|friend)\s+)*"
    rf"({_TYPE})\s+({_ID})\s*\(([^)]*)\)\s*"
    rf"(?:const\s*)?(?:noexcept\s*)?(?:override\s*)?(?:final\s*)?"
    rf"(\{{|;|=\s*0\s*;|=\s*default\s*;|$)"
)
_CTOR_RE = re.compile(
    rf"^\s*(?:(?:explicit|constexpr|inline)\s+)*({_ID})\s*\(([^)]*)\)\s*"
    rf"(?::\s*[^{{;]*)?(\{{|;|=\s*default\s*;|$)"
)
_OUTOFCLASS_RE = re.compile(
    rf"^\s*(?:(?:inline|static|constexpr)\s+)*({_TYPE})\s+"
    rf"({_ID})\s*::\s*({_ID})\s*\(([^)]*)\)\s*(?:const\s*)?(?:noexcept\s*)?(\{{|$)"
)
_CALL_RE = re.compile(rf"(?<![\w:.>])(new\s+)?({_CXX})\s*\(")
_ARROW_CALL_RE = re.compile(rf"(?<![\w:.])({_ID})\s*(?:->|\.)\s*({_ID})\s*\(")
_DECL_VAR_RE = re.compile(
    rf"^\s*(?:const\s+)?({_CXX})(?:\s*<[^<>;=]*>)?\s*[*&]*\s+({_ID})\s*[;=(]"
)
_AUTO_CALL_RE = re.compile(rf"^\s*auto\s+({_ID})\s*=\s*({_CXX})\s*\(")
_NEW_ASSIGN_RE = re.compile(
    rf"^\s*(?:{_CXX}\s*[*&]*\s+)?({_ID})\s*=\s*new\s+({_CXX})"
)
_PARAM_RE = re.compile(
    rf"^\s*(?:const\s+)?({_CXX})(?:\s*<[^<>]*>)?\s*[*&]*\s+({_ID})\s*$"
)
_RETURN_CALL_RE = re.compile(rf"^\s*return\s+(new\s+)?({_CXX})\s*\(")

_PRIMITIVES = frozenset(
    """void int long short char bool float double auto unsigned signed
    size_t std::string string int8_t int16_t int32_t int64_t uint8_t
    uint16_t uint32_t uint64_t""".split()
)


def _module_qn_for(doc_id: str) -> str:
    parts = doc_id.split("/")
    stem = parts[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    return ".".join(parts[:-1] + [base])


def _base_type(t: str) -> str:
    t = re.sub(r"<.*", "", t)
    t = t.replace("const", " ").replace("*", " ").replace("&", " ").strip()
    return t.replace("::", ".")


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one C/C++ document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    project = doc_id.split("/")[0]
    lines = code_text.split("\n")
    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    call_assigns: dict[str, list[tuple[int, str, str]]] = {}
    param_types: dict[str, dict[str, str]] = {}
    return_facts: set[tuple[str, str]] = set()
    namespace_name: str | None = None
    file_classes: set[str] = set()

    module_scope = _Scope("module", module_qn, module_qn.rsplit(".", 1)[-1], 0, 1)
    stack: list[_Scope] = [module_scope]
    pending: list[_Scope] = []
    state = {"block_comment": False, "template": False}
    depth = 0

    def push_def(kind, name, line_no, col, parent, props=None) -> _Scope:
        qn = f"{parent.qn}.{name}"
        pkind = (
            "Class"
            if parent.kind in ("class", "interface", "enum")
            else parent.kind.capitalize()
        )
        row = {
            "kind": kind,
            "qn": qn,
            "name": name,
            "parent_qn": parent.qn,
            "parent_kind": pkind,
            "start_line": line_no,
            "end_line": line_no,
            "start_col": col,
            "props": json.dumps(props, sort_keys=True) if props else None,
        }
        def_rows.append(row)
        parent.children.add(name)
        sc = _Scope(kind, qn, name, -1, line_no, row)
        return sc

    def _collect_params(qn: str, argtext: str) -> None:
        for _off, arg in _split_args(argtext):
            pm = _PARAM_RE.match(arg.strip()) if arg.strip() else None
            if pm and _base_type(pm.group(1)) not in _PRIMITIVES:
                param_types.setdefault(qn, {})[pm.group(2)] = _base_type(
                    pm.group(1)
                )

    for idx, raw in enumerate(lines):
        line_no = idx + 1
        line, lit_line = _strip_line(raw, state)
        stripped = line.strip()
        if not stripped:
            continue

        im = _INCLUDE_RE.match(lit_line)
        if im:
            if im.group(1):  # quoted: internal candidate
                # keep the extension as a qn segment: after a basename
                # collision the header's module IS `a.shapes.h`
                # (disambiguate_modules), so the extension-form ref
                # resolves exactly; the no-collision case strips it via
                # the import ladder's ext-strip strategy
                path = im.group(1)
                target = path.replace("/", ".")
                stem = path.rsplit("/", 1)[-1]
                stem = stem.rsplit(".", 1)[0] if "." in stem else stem
                _ = project
                mentions.append(
                    {
                        "kind": "import",
                        "name": None,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "local_name": stem,
                        "target": target,
                        "callee": target,
                    }
                )
            else:  # angle-bracket: system/external
                target = im.group(2).rsplit(".", 1)[0].replace("/", ".")
                mentions.append(
                    {
                        "kind": "import",
                        "name": None,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "local_name": target.rsplit(".", 1)[-1],
                        "target": f"external::{target}",
                        "callee": f"external::{target}",
                    }
                )
            continue
        if stripped.startswith("#"):
            continue

        # C++20 module declaration → module-system mention. Interface QN is
        # the declared module name verbatim (ref cpp_modules.py:91: the
        # reference prefixes project_name; our QN scheme has no project
        # root, so the declared dotted name IS the interface key). The
        # IMPLEMENTS link to the interface is deferred to the join phase
        # (cpp_modules.py:149-153: no phantom for an absent interface).
        mdm = _MODULE_DECL_RE.match(stripped)
        if mdm:
            mentions.append(
                {
                    "kind": (
                        "module_interface" if mdm.group(1) else "module_impl"
                    ),
                    "name": mdm.group(2),
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": 0,
                    "target": mdm.group(2),
                }
            )
            continue

        nm = _NAMESPACE_RE.match(line)
        if nm:
            namespace_name = nm.group(1) or namespace_name

        consumed: list[tuple[int, int]] = []
        decls: list[tuple[int, _Scope]] = []

        if _FORWARD_RE.match(line):
            # forward declaration: mint nothing (keep-or-drop,
            # graph_updater.py:689-699 — a defined class supersedes it)
            continue

        cm = _CLASS_RE.search(line)
        em = _ENUM_CLASS_RE.match(line) if not cm else None
        if cm:
            name = cm.group(2)
            props = {"namespace": namespace_name} if namespace_name else None
            parent = (
                stack[-1]
                if stack[-1].kind in ("class", "interface", "enum")
                else module_scope
            )
            sc = push_def("class", name, line_no, cm.start(2), parent, props)
            file_classes.add(name)
            bases = []
            if cm.group(3):
                for b in cm.group(3).split(","):
                    b = re.sub(
                        r"\b(public|private|protected|virtual)\b", "", b
                    )
                    b = _base_type(b)
                    if b and re.fullmatch(rf"{_ID}(?:\.{_ID})*", b):
                        bases.append(b)
            for bi, base in enumerate(bases):
                mentions.append(
                    {
                        "kind": "inherit",
                        "qn": sc.qn,
                        "name": name,
                        "parent_qn": sc.row["parent_qn"],
                        "parent_kind": sc.row["parent_kind"],
                        "start_line": line_no,
                        "start_col": cm.start(2),
                        "callee": base,
                        "base_index": bi,
                    }
                )
            decls.append(
                (line.rfind("{") if cm.group(4) == "{" else -1, sc)
            )
            consumed.append((cm.start(), cm.end()))
        elif em:
            sc = push_def("enum", em.group(1), line_no, em.start(1), module_scope)
            file_classes.add(em.group(1))
            decls.append((line.find("{", em.end(1)), sc))
            consumed.append((em.start(), em.end()))

        # out-of-class definition: Ret Cls::name(args) {
        om = None
        if not cm and not em:
            om = _OUTOFCLASS_RE.match(line)
        if om:
            ret_t, cls, name = om.group(1), om.group(2), om.group(3)
            if cls in file_classes:
                # same-file binding (the common single-file shape)
                parent = _Scope(
                    "class", f"{module_qn}.{cls}", cls, -1, line_no
                )
                sc = push_def("method", name, line_no, om.start(3), parent)
            else:
                # DEFERRED: the class lives elsewhere — plans/cpp_impl.py
                # re-parents this once the class index exists. Provisional
                # qn keeps body calls attributable; the join pass rewrites
                # both the def and its calls' parent_qn.
                qn = f"{module_qn}.{cls}.{name}"
                row = {
                    "kind": "method_impl",
                    "qn": qn,
                    "name": name,
                    "local_name": cls,
                    "parent_qn": f"{module_qn}.{cls}",
                    "parent_kind": "Class",
                    "start_line": line_no,
                    "end_line": line_no,
                    "start_col": om.start(3),
                }
                mentions.append(row)
                sc = _Scope("method", qn, name, -1, line_no, None)
            _collect_params(sc.qn, om.group(4) or "")
            base_ret = _base_type(ret_t)
            if base_ret not in _PRIMITIVES and base_ret not in KEYWORDS:
                return_facts.add((sc.qn, base_ret))
            if om.group(5) == "{":
                decls.append((line.rfind("{"), sc))
            else:
                decls.append((-1, sc))
            consumed.append((om.start(), om.end(3)))

        in_class = (
            stack[-1].kind in ("class", "interface", "enum")
            and depth == stack[-1].depth
        )
        # module-level (free) function definitions: `Ret name(args) {`.
        # Prototypes (`;`-terminated) mint nothing — the bodied definition
        # is the entity (the reference's prototype keep-or-drop,
        # graph_updater.py:710-717)
        if not cm and not em and not om and stack[-1] is module_scope:
            fm_ = _METHOD_RE.match(line)
            if (
                fm_
                and fm_.group(4) in ("{", "")
                and fm_.group(2) not in ("if", "for", "while", "switch", "catch", "return")
                and _base_type(fm_.group(1)) not in ("else",)
            ):
                sc = push_def(
                    "function", fm_.group(2), line_no, fm_.start(2), module_scope
                )
                _collect_params(sc.qn, fm_.group(3) or "")
                base_ret = _base_type(fm_.group(1))
                if base_ret not in _PRIMITIVES and base_ret not in KEYWORDS:
                    return_facts.add((sc.qn, base_ret))
                if fm_.group(4) == "{":
                    decls.append((line.rfind("{"), sc))
                else:
                    decls.append((-1, sc))
                consumed.append((fm_.start(2), fm_.end(2)))
        if not cm and not em and not om and in_class:
            mm = _METHOD_RE.match(line)
            ctm = _CTOR_RE.match(line) if not mm else None
            if mm and mm.group(2) not in (
                "if", "for", "while", "switch", "catch", "return",
            ) and _base_type(mm.group(1)) not in ("public", "private", "protected"):
                ret_t, name, body_tok = mm.group(1), mm.group(2), mm.group(4)
                sc = push_def("method", name, line_no, mm.start(2), stack[-1])
                _collect_params(sc.qn, mm.group(3) or "")
                base_ret = _base_type(ret_t)
                if base_ret not in _PRIMITIVES and base_ret not in KEYWORDS:
                    return_facts.add((sc.qn, base_ret))
                if body_tok == "{":
                    decls.append((line.rfind("{"), sc))
                elif body_tok == "":
                    decls.append((-1, sc))
                elif sc.row is not None:
                    sc.row["end_line"] = line_no  # declaration-only
                consumed.append((mm.start(2), mm.end(2)))
            elif ctm and ctm.group(1) == stack[-1].name:
                sc = push_def(
                    "method", ctm.group(1), line_no, ctm.start(1), stack[-1]
                )
                _collect_params(sc.qn, ctm.group(2) or "")
                if ctm.group(3) == "{":
                    decls.append((line.rfind("{"), sc))
                elif ctm.group(3) == "":
                    decls.append((-1, sc))
                elif sc.row is not None:
                    sc.row["end_line"] = line_no
                consumed.append((ctm.start(1), ctm.end(1)))

        # ---- brace walk (jslite model) ----
        line_start_stack = list(stack)
        events: list[tuple[int, str, _Scope]] = []
        decls.sort(key=lambda d: d[0] if d[0] != -1 else 1 << 30)
        di = 0
        for pos, ch in enumerate(line):
            if ch == "{":
                depth += 1
                attached = False
                while di < len(decls) and decls[di][0] == pos:
                    sc = decls[di][1]
                    sc.depth = depth
                    stack.append(sc)
                    events.append((pos, "push", sc))
                    di += 1
                    attached = True
                if not attached and pending:
                    sc = pending.pop(0)
                    sc.depth = depth
                    stack.append(sc)
                    events.append((pos, "push", sc))
            elif ch == "}":
                while len(stack) > 1 and stack[-1].depth == depth:
                    closed = stack.pop()
                    events.append((pos, "pop", closed))
                    if closed.row is not None:
                        closed.row["end_line"] = line_no
                depth = max(depth - 1, 0)
        for pos, sc in decls[di:]:
            if pos == -1:
                pending.append(sc)

        def _ctx_at(p: int):
            st = list(line_start_stack)
            for pos, act, sc in events:
                if pos >= p:
                    break
                if act == "push":
                    st.append(sc)
                elif len(st) > 1 and st[-1] is sc:
                    st.pop()
            caller = next(
                s
                for s in reversed(st)
                if s.kind not in ("class", "interface", "enum")
            )
            cls = next(
                (s.qn for s in reversed(st) if s.kind == "class"),
                None,
            )
            qns = [
                s.qn
                for s in st
                if s.kind not in ("class", "interface", "enum")
            ]
            return caller, cls, qns

        # ---- typed locals ----
        dv = _DECL_VAR_RE.match(stripped)
        if (
            dv
            and _base_type(dv.group(1)) not in _PRIMITIVES
            and dv.group(1) not in KEYWORDS
            and dv.group(2) not in KEYWORDS
        ):
            d_caller, _c, _q = _ctx_at(0)
            if d_caller is not module_scope:
                scope_assigns.setdefault(d_caller.qn, []).append(
                    (line_no, dv.group(2), _base_type(dv.group(1)))
                )
        nv = _NEW_ASSIGN_RE.match(stripped)
        if nv and nv.group(2) not in KEYWORDS:
            d_caller, _c, _q = _ctx_at(0)
            scope_assigns.setdefault(d_caller.qn, []).append(
                (line_no, nv.group(1), _base_type(nv.group(2)))
            )
        av = _AUTO_CALL_RE.match(stripped)
        if av and av.group(2).split("::")[0] not in KEYWORDS:
            d_caller, _c, _q = _ctx_at(0)
            # fn-return hop: the producing call types the var downstream
            call_assigns.setdefault(d_caller.qn, []).append(
                (line_no, av.group(1), av.group(2).replace("::", "."))
            )

        # ---- calls ----
        rm = _RETURN_CALL_RE.match(stripped)
        ret_callee = rm.group(2).replace("::", ".") if rm else None
        for cm2 in _CALL_RE.finditer(line):
            raw_callee = cm2.group(2)
            first = raw_callee.split("::")[0]
            if first in KEYWORDS or any(
                s <= cm2.start(2) < e for s, e in consumed
            ):
                continue
            c_caller, c_cls, c_qns = _ctx_at(cm2.start(2))
            if c_caller is module_scope and not cm2.group(1):
                continue
            callee = raw_callee.replace("::", ".")
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": c_caller.qn,
                    "parent_kind": c_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": cm2.start(2),
                    "callee": callee,
                    "is_ret": callee == ret_callee,
                    "_stack": list(c_qns),
                    "_cls": c_cls,
                }
            )
        for mm2 in _ARROW_CALL_RE.finditer(line):
            recv, meth = mm2.group(1), mm2.group(2)
            if recv in KEYWORDS and recv != "this":
                continue
            if any(s <= mm2.start(1) < e for s, e in consumed):
                continue
            c_caller, c_cls, c_qns = _ctx_at(mm2.start(1))
            if c_caller is module_scope:
                continue
            row = {
                "kind": "call",
                "parent_qn": c_caller.qn,
                "parent_kind": c_caller.kind.capitalize(),
                "start_line": line_no,
                "start_col": mm2.start(1),
                "callee": f"{recv}.{meth}",
                "is_ret": False,
                "_stack": list(c_qns),
                "_cls": c_cls,
            }
            if recv == "this":
                row["callee"] = f"this.{meth}"
                if c_cls:
                    row["class_ctx_hint"] = f"{c_cls}.{meth}"
                elif c_caller.kind == "method":
                    # out-of-class body: the provisional class prefix is
                    # the method qn minus its own name (remapped by
                    # plans/cpp_impl.py once the class resolves)
                    row["class_ctx_hint"] = (
                        f"{c_caller.qn.rsplit('.', 1)[0]}.{meth}"
                    )
            call_rows.append(row)

    mentions.insert(
        0,
        {
            "kind": "module",
            "qn": module_qn,
            "name": module_qn.rsplit(".", 1)[-1],
            "parent_qn": None,
            "parent_kind": None,
            "start_line": 1,
            "end_line": len(lines),
            "start_col": 0,
        },
    )
    mentions.extend(def_rows)

    for fqn, expr in sorted(return_facts):
        mentions.append(
            {
                "kind": "returns",
                "parent_qn": fqn,
                "parent_kind": "Function",
                "callee": expr,
                "start_line": 0,
                "start_col": 0,
            }
        )

    def _lookup_var_type(stack_qns, var, at_line):
        for sq in reversed(stack_qns):
            assigns = [a for a in scope_assigns.get(sq, ()) if a[1] == var]
            if assigns:
                before = [a for a in assigns if a[0] <= at_line]
                return before[-1][2] if before else None
            pt = param_types.get(sq, {}).get(var)
            if pt is not None:
                return pt
        return None

    for c in call_rows:
        callee = c["callee"]
        first = callee.split(".")[0]
        stack_qns = c.pop("_stack")
        _cls = c.pop("_cls")
        segs = callee.split(".")
        if (
            c["kind"] == "call"
            and len(segs) == 2
            and first != "this"
            and "recv_expr" not in c
        ):
            t = _lookup_var_type(stack_qns, first, c["start_line"])
            if t is None:
                for sq in reversed(stack_qns):
                    rows = [
                        a
                        for a in call_assigns.get(sq, ())
                        if a[1] == first and a[0] <= c["start_line"]
                    ]
                    if rows:
                        t = rows[-1][2]
                        break
            if t:
                c["recv_expr"] = t
        if "is_ret" not in c:
            c["is_ret"] = False
        mentions.append(c)

    return mentions
