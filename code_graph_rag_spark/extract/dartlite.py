"""Single-document mention extraction for Dart.

The Dart sibling kernel (reference tier: ``parsers/dart/`` 609 LoC, 7
``test_dart_*`` files) over the shared mention IR. Shares jslite's
stripper/brace machinery (Dart strings/comments are JS-shaped).

Semantics mirrored:

* module QN from the file path (``.dart`` stripped);
* ``import 'package:proj/shapes.dart';`` → ``proj.shapes`` (the package
  prefix is the project root); relative ``import 'shapes.dart'`` /
  ``import '../a/b.dart'`` anchor at the importing file's directory;
  ``as x`` records the alias, ``show``/``hide`` combinators are scoped
  filters the conservative binding ignores;
* ``class C extends B with M1 implements I1 {`` — extends, mixins and
  implements clauses fan out in order as inherit mentions; the
  INHERITS/IMPLEMENTS split happens downstream on the resolved label
  (Dart's ``implements`` can target a concrete class — the reference's
  label-resolution rule, ``class_ingest/mixin.py:513-521``);
* methods incl. ``=> expr;`` bodies; unnamed constructors; getters
  skipped; top-level functions;
* Dart 2+ instantiation has no ``new``: ``Circle()`` IS the ctor call —
  a Capitalized bare callee that resolves to a Class yields
  INSTANTIATES downstream, and ``final c = Circle()`` types ``c``;
* typed locals / params / return annotations → receiver typing and
  ``returns`` facts; ``this.m()`` / ``super.m()`` dispatch hints.
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

DART_EXTENSIONS = frozenset({"dart"})

KEYWORDS = frozenset(
    """abstract as assert async await base break case catch class const
    continue covariant default deferred do dynamic else enum export
    extends extension external factory final finally for get hide if
    implements import in interface is late library mixin new null on
    operator out part required rethrow return sealed set show static
    super switch sync this throw true false try typedef var void when
    while with yield int double num bool String List Map Set Future
    Stream Object print""".split()
)

_ID = r"[A-Za-z_$][\w$]*"
_DOTTED = rf"{_ID}(?:\.{_ID})*"
_TYPE = rf"{_DOTTED}(?:\s*<[^<>;(){{}}]*>)?\??"

_IMPORT_RE = re.compile(
    r"""^\s*import\s+['"]([^'"]+)['"]\s*(?:as\s+(\w+))?"""
)
_CLASS_RE = re.compile(
    rf"(?:^|\b)(?:abstract\s+|base\s+|final\s+|sealed\s+|interface\s+)*"
    rf"(class|mixin|enum)\s+({_ID})(?:\s*<[^<>{{]*>)?"
    rf"(?:\s+extends\s+([\w.<>\s]+?))?"
    rf"(?:\s+with\s+([\w.,<>\s]+?))?"
    rf"(?:\s+implements\s+([\w.,<>\s]+?))?\s*\{{"
)
_METHOD_RE = re.compile(
    rf"^\s*(?:(?:static|final|const|late|external)\s+)*"
    rf"({_TYPE})\s+({_ID})\s*\(([^)]*)\)\s*(?:async\s*\*?|sync\s*\*?)?\s*(\{{|=>)"
)
_CTOR_RE = re.compile(
    rf"^\s*(?:const\s+)?({_ID})\s*\(([^)]*)\)\s*(?::\s*[^{{;]*)?(\{{|;|=>)"
)
_CALL_RE = re.compile(rf"(?<![\w$.])({_DOTTED})\s*(?:<[^>()]*>)?\s*\(")
_SUPER_RE = re.compile(rf"(?<![\w$.])super\s*\.\s*({_ID})\s*\(")
_CHAIN_RE = re.compile(
    rf"(?<![\w$.])({_DOTTED})\s*\([^()]*\)\s*\.\s*({_ID})\s*\("
)
_DECL_VAR_RE = re.compile(
    rf"^\s*(?:final\s+|const\s+)?({_DOTTED})(?:\s*<[^<>;=]*>)?\??\s+({_ID})\s*="
)
_VAR_CTOR_RE = re.compile(
    rf"^\s*(?:var|final|const)\s+({_ID})\s*=\s*({_ID})\s*(?:<[^>()]*>)?\s*\("
)
_PARAM_RE = re.compile(
    rf"^\s*(?:required\s+|covariant\s+)?({_DOTTED})(?:\s*<[^<>]*>)?\??\s+({_ID})\s*$"
)
_RETURN_CALL_RE = re.compile(rf"^\s*return\s+({_DOTTED})\s*\(")
_ABSTRACT_RE = re.compile(
    rf"^\s*({_TYPE})\s+({_ID})\s*\(([^)]*)\)\s*;"
)
_FUNC_RE = re.compile(
    rf"^\s*({_TYPE})\s+({_ID})\s*\(([^)]*)\)\s*(?:async\s*\*?|sync\s*\*?)?\s*(\{{|=>)"
)

_PRIMITIVES = frozenset(
    """void int double num bool String var dynamic Object List Map Set
    Future FutureOr Stream Never Null""".split()
)


def _module_qn_for(doc_id: str) -> str:
    parts = doc_id.split("/")
    stem = parts[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    return ".".join(parts[:-1] + [base])


def _resolve_import(spec: str, doc_id: str) -> str:
    """Dart import URI → dotted module QN: ``package:proj/x.dart`` →
    ``proj.x`` (the package root IS the project root in our path-rooted
    scheme); ``dart:io`` → external; relative specs anchor at the doc's
    directory (the jslite rule)."""
    if spec.startswith("package:"):
        body = spec[len("package:") :]
        if body.endswith(".dart"):
            body = body[: -len(".dart")]
        return body.replace("/", ".")
    if spec.startswith("dart:"):
        return f"external::dart.{spec[5:]}"
    # relative
    dir_parts = doc_id.split("/")[:-1]
    for s in spec.split("/"):
        if s in (".", ""):
            continue
        if s == "..":
            if len(dir_parts) > 1:
                dir_parts = dir_parts[:-1]
        else:
            dir_parts = dir_parts + [s]
    if dir_parts and dir_parts[-1].endswith(".dart"):
        dir_parts[-1] = dir_parts[-1][: -len(".dart")]
    return ".".join(dir_parts)


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one Dart document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    lines = code_text.split("\n")
    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    param_types: dict[str, dict[str, str]] = {}
    return_facts: set[tuple[str, str]] = set()

    module_scope = _Scope("module", module_qn, module_qn.rsplit(".", 1)[-1], 0, 1)
    stack: list[_Scope] = [module_scope]
    pending: list[_Scope] = []
    state = {"block_comment": False, "template": False}
    depth = 0

    def push_def(kind, name, line_no, col, parent) -> _Scope:
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
            "props": None,
        }
        def_rows.append(row)
        parent.children.add(name)
        return _Scope(kind, qn, name, -1, line_no, row)

    def _collect_params(qn: str, argtext: str) -> None:
        argtext = argtext.strip().strip("{[]}")
        for _off, arg in _split_args(argtext):
            pm = _PARAM_RE.match(arg.strip()) if arg.strip() else None
            if pm and pm.group(1) not in _PRIMITIVES:
                param_types.setdefault(qn, {})[pm.group(2)] = pm.group(1)

    for idx, raw in enumerate(lines):
        line_no = idx + 1
        line, lit_line = _strip_line(raw, state)
        stripped = line.strip()
        if not stripped:
            continue

        im = _IMPORT_RE.match(lit_line)
        if im:
            target = _resolve_import(im.group(1), doc_id)
            alias = im.group(2)
            mentions.append(
                {
                    "kind": "import",
                    "name": None,
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": 0,
                    "local_name": alias or target.rsplit(".", 1)[-1],
                    "target": target,
                    "callee": target,
                }
            )
            continue

        consumed: list[tuple[int, int]] = []
        decls: list[tuple[int, _Scope]] = []

        cm = _CLASS_RE.search(line)
        if cm:
            kw, name = cm.group(1), cm.group(2)
            kind = {"class": "class", "mixin": "class", "enum": "enum"}[kw]
            parent = (
                stack[-1]
                if stack[-1].kind in ("class", "interface", "enum")
                else module_scope
            )
            sc = push_def(kind, name, line_no, cm.start(2), parent)
            bases: list[str] = []
            for grp in (3, 4, 5):  # extends, with, implements — in order
                if cm.group(grp):
                    bases += [
                        re.sub(r"<.*", "", b).strip()
                        for b in cm.group(grp).split(",")
                    ]
            for bi, base in enumerate(
                b for b in bases if b and re.fullmatch(_DOTTED, b)
            ):
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
            decls.append((line.rfind("{"), sc))
            consumed.append((cm.start(), cm.end()))

        in_class = (
            stack[-1].kind in ("class", "interface", "enum")
            and depth == stack[-1].depth
        )
        expr_bodied: _Scope | None = None
        if not cm and in_class:
            mm = _METHOD_RE.match(line)
            absm = _ABSTRACT_RE.match(line) if not mm else None
            ctm = _CTOR_RE.match(line) if not mm and not absm else None
            if absm and absm.group(2) not in KEYWORDS:
                sc = push_def(
                    "method", absm.group(2), line_no, absm.start(2), stack[-1]
                )
                _collect_params(sc.qn, absm.group(3) or "")
                base_ret = re.sub(r"<.*", "", absm.group(1)).strip().rstrip("?")
                if base_ret not in _PRIMITIVES and base_ret not in KEYWORDS:
                    return_facts.add((sc.qn, base_ret))
                if sc.row is not None:
                    sc.row["end_line"] = line_no
                consumed.append((absm.start(2), absm.end(2)))
            elif mm and mm.group(2) not in ("if", "for", "while", "switch", "catch"):
                ret_t, name, body_tok = mm.group(1), mm.group(2), mm.group(4)
                sc = push_def("method", name, line_no, mm.start(2), stack[-1])
                _collect_params(sc.qn, mm.group(3) or "")
                base_ret = re.sub(r"<.*", "", ret_t).strip().rstrip("?")
                if base_ret not in _PRIMITIVES and base_ret not in KEYWORDS:
                    return_facts.add((sc.qn, base_ret))
                if body_tok == "{":
                    decls.append((line.rfind("{"), sc))
                else:
                    expr_bodied = sc
                    if sc.row is not None:
                        sc.row["end_line"] = line_no
                consumed.append((mm.start(2), mm.end(2)))
            elif ctm and ctm.group(1) == stack[-1].name:
                sc = push_def(
                    "method", ctm.group(1), line_no, ctm.start(1), stack[-1]
                )
                _collect_params(sc.qn, ctm.group(2) or "")
                if ctm.group(3) == "{":
                    decls.append((line.rfind("{"), sc))
                elif ctm.group(3) == "=>":
                    expr_bodied = sc
                    if sc.row is not None:
                        sc.row["end_line"] = line_no
                consumed.append((ctm.start(1), ctm.end(1)))
        elif not cm and stack[-1] is module_scope:
            fm = _FUNC_RE.match(line)
            if fm and fm.group(2) not in ("if", "for", "while", "switch", "catch"):
                ret_t, name, body_tok = fm.group(1), fm.group(2), fm.group(4)
                sc = push_def("function", name, line_no, fm.start(2), module_scope)
                _collect_params(sc.qn, fm.group(3) or "")
                base_ret = re.sub(r"<.*", "", ret_t).strip().rstrip("?")
                if base_ret not in _PRIMITIVES and base_ret not in KEYWORDS:
                    return_facts.add((sc.qn, base_ret))
                if body_tok == "{":
                    decls.append((line.rfind("{"), sc))
                else:
                    expr_bodied = sc
                    if sc.row is not None:
                        sc.row["end_line"] = line_no
                consumed.append((fm.start(2), fm.end(2)))

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
            if expr_bodied is not None:
                caller = expr_bodied
            else:
                caller = next(
                    s
                    for s in reversed(st)
                    if s.kind not in ("class", "interface", "enum")
                )
            cls = next(
                (s.qn for s in reversed(st) if s.kind == "class"),
                None,
            )
            if expr_bodied is not None and cls is None and expr_bodied.kind == "method":
                cls = expr_bodied.qn.rsplit(".", 1)[0]
            qns = [
                s.qn
                for s in st
                if s.kind not in ("class", "interface", "enum")
            ]
            return caller, cls, qns

        # ---- typed locals ----
        vv = _VAR_CTOR_RE.match(stripped)
        dv = _DECL_VAR_RE.match(stripped) if not vv else None
        if vv and vv.group(2)[0].isupper() and vv.group(2) not in _PRIMITIVES:
            d_caller, _c, _q = _ctx_at(0)
            scope_assigns.setdefault(d_caller.qn, []).append(
                (line_no, vv.group(1), vv.group(2))
            )
        elif (
            dv
            and dv.group(1) not in _PRIMITIVES
            and dv.group(1) not in KEYWORDS
            and dv.group(2) not in KEYWORDS
        ):
            d_caller, _c, _q = _ctx_at(0)
            scope_assigns.setdefault(d_caller.qn, []).append(
                (line_no, dv.group(2), dv.group(1))
            )

        # ---- calls ----
        for sm in _SUPER_RE.finditer(line):
            s_caller, s_cls, s_qns = _ctx_at(sm.start())
            if s_cls:
                call_rows.append(
                    {
                        "kind": "call",
                        "parent_qn": s_caller.qn,
                        "parent_kind": s_caller.kind.capitalize(),
                        "start_line": line_no,
                        "start_col": sm.start(),
                        "callee": f"super().{sm.group(1)}",
                        "super_hint": s_cls,
                        "_stack": list(s_qns),
                    }
                )

        rm = _RETURN_CALL_RE.match(stripped)
        ret_callee = rm.group(1) if rm else None
        for cm2 in _CALL_RE.finditer(line):
            callee = cm2.group(1)
            first = callee.split(".")[0]
            if (first in KEYWORDS and first != "this") or any(
                s <= cm2.start(1) < e for s, e in consumed
            ):
                continue
            c_caller, c_cls, c_qns = _ctx_at(cm2.start(1))
            if c_caller is module_scope:
                continue
            row = {
                "kind": "call",
                "parent_qn": c_caller.qn,
                "parent_kind": c_caller.kind.capitalize(),
                "start_line": line_no,
                "start_col": cm2.start(1),
                "callee": callee,
                "is_ret": callee == ret_callee,
                "_stack": list(c_qns),
            }
            if first == "this" and c_cls:
                rest = callee.split(".", 1)[1] if "." in callee else None
                if rest and "." not in rest:
                    row["class_ctx_hint"] = f"{c_cls}.{rest}"
            call_rows.append(row)
        for chm in _CHAIN_RE.finditer(line):
            expr, meth = chm.group(1), chm.group(2)
            first = expr.split(".")[0]
            if first in KEYWORDS and first != "this":
                continue
            h_caller, h_cls, h_qns = _ctx_at(chm.start(1))
            if h_caller is module_scope:
                continue
            recv = expr
            if h_cls and h_cls.startswith(module_qn + ".") and "." not in recv:
                if recv[0].islower():
                    recv = f"{h_cls[len(module_qn) + 1:]}.{recv}"
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": h_caller.qn,
                    "parent_kind": h_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": chm.start(1),
                    "callee": f"{expr}().{meth}",
                    "recv_expr": recv,
                    "_stack": list(h_qns),
                }
            )

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

    def_names = {r["name"] for r in def_rows}

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
        segs = callee.split(".")
        if (
            c["kind"] == "call"
            and len(segs) == 2
            and first != "this"
            and "recv_expr" not in c
            and first not in def_names
        ):
            t = _lookup_var_type(stack_qns, first, c["start_line"])
            if t:
                c["recv_expr"] = t
        if "is_ret" not in c:
            c["is_ret"] = False
        mentions.append(c)

    return mentions
