"""Single-document mention extraction for C#.

The C# sibling kernel (reference tier: ``parsers/csharp/`` +
``csharp_frontend/`` — 24 ``test_csharp_*`` files) over the shared
mention IR. Shares jslite's stripper/brace machinery (C# strings and
``//``/``/* */`` comments are close enough; ``@"verbatim"`` strings are
treated as plain strings line-locally).

Semantics mirrored:

* module QN from the file path (C# files may hold many classes; the
  ``namespace`` declaration — block or file-scoped — is recorded as a
  prop, like javalite's ``package``);
* ``using A.B;`` imports the NAMESPACE (edge target = the dotted
  namespace, verified against the Package node when internal — the
  reference's ``using_directive`` handling,
  ``import_processor.py:2612-2640``); ``using static A.B.C`` binds C's
  members; ``using X = A.B.C;`` binds the alias X to the class;
* ``class|interface|struct|enum|record Name : Base, IFace {`` — the
  single ``:`` base list fans out as inherit mentions with base_index;
  INHERITS vs IMPLEMENTS is decided downstream by the resolved target's
  label (the reference's deferred split,
  ``class_ingest/mixin.py:482-551``);
* methods incl. modifiers (``override``/``virtual``/``async``/…),
  constructors, expression-bodied members (``=> expr;``); property
  blocks are skipped (accessors are runtime-invoked, not call sites);
* declared-type locals / ``var x = new T()`` / params type receivers;
  method return types become ``returns`` facts (chained-call rung);
* ``this.M()`` → class-context hint; ``base.M()`` → super hint;
  ``new T()`` → INSTANTIATES downstream.
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

CSHARP_EXTENSIONS = frozenset({"cs"})

KEYWORDS = frozenset(
    """abstract as base bool break byte case catch char checked class const
    continue decimal default delegate do double else enum event explicit
    extern false finally fixed float for foreach goto if implicit in int
    interface internal is lock long namespace new null object operator
    out override params private protected public readonly record ref
    return sbyte sealed short sizeof stackalloc static string struct
    switch this throw true try typeof uint ulong unchecked unsafe ushort
    using var virtual void volatile while async await when where yield
    get set init value nameof partial required String Object""".split()
)

_ID = r"[A-Za-z_@][\w]*"
_DOTTED = rf"{_ID}(?:\.{_ID})*"
_TYPE = rf"{_DOTTED}(?:\s*<[^<>;(){{}}]*>)?(?:\s*\[\s*,?\s*\])*\??"

_NAMESPACE_RE = re.compile(rf"^\s*namespace\s+({_DOTTED})\s*[;{{]")
_USING_RE = re.compile(
    rf"^\s*(?:global\s+)?using\s+(static\s+)?(?:({_ID})\s*=\s*)?({_DOTTED})\s*;"
)
_MODS = (
    r"(?:(?:public|private|protected|internal|static|sealed|abstract|"
    r"partial|virtual|override|async|readonly|unsafe|extern|new)\s+)*"
)
# Allman style is the C# norm: the `{` usually sits on the NEXT line,
# so declarations match to end-of-line and attach to the next brace via
# the pending queue
_CLASS_RE = re.compile(
    rf"(?:^|\b){_MODS}"
    rf"(class|interface|struct|enum|record(?:\s+struct|\s+class)?)\s+({_ID})"
    rf"(?:\s*<[^<>{{]*>)?(?:\s*\(([^)]*)\))?"
    rf"(?:\s*:\s*([\w.,<>\s\[\]]+?))?\s*(?:where[^{{]*)?(\{{|$)"
)
_METHOD_RE = re.compile(
    rf"^\s*{_MODS}(?:<[^<>]+>\s*)?({_TYPE})\s+({_ID})\s*\(([^)]*)\)"
    rf"\s*(?:where[^{{=>;]*)?\s*(\{{|=>|$)"
)
_CTOR_DEF_RE = re.compile(
    rf"^\s*{_MODS}({_ID})\s*\(([^)]*)\)\s*(?::\s*(?:base|this)\s*\([^)]*\)\s*)?(\{{|=>|$)"
)
_ABSTRACT_METHOD_RE = re.compile(
    rf"^\s*{_MODS}(?:<[^<>]+>\s*)?({_TYPE})\s+({_ID})\s*\(([^)]*)\)\s*;"
)
_ATTR_RE = re.compile(rf"^\s*\[({_DOTTED})")
_CALL_RE = re.compile(rf"(?<![\w$.])(new\s+)?({_DOTTED})\s*(?:<[^>()]*>)?\s*\(")
_BASE_RE = re.compile(rf"(?<![\w$.])base\s*\.\s*({_ID})\s*\(")
_CHAIN_RE = re.compile(rf"(?<![\w$.])({_DOTTED})\s*\([^()]*\)\s*\.\s*({_ID})\s*\(")
_DECL_VAR_RE = re.compile(
    rf"^\s*(?:readonly\s+)?({_DOTTED})(?:\s*<[^<>;=]*>)?(?:\s*\[\s*\])*\??\s+({_ID})\s*[=;]"
)
_VAR_NEW_RE = re.compile(rf"^\s*var\s+({_ID})\s*=\s*new\s+({_DOTTED})")
_PARAM_RE = re.compile(
    rf"^\s*(?:this\s+|ref\s+|out\s+|in\s+|params\s+)?({_DOTTED})"
    rf"(?:\s*<[^<>]*>)?(?:\s*\[\s*\])*\??\s+({_ID})\s*(?:=[^,]*)?$"
)
_RETURN_CALL_RE = re.compile(
    rf"^\s*return\s+(new\s+)?({_DOTTED})\s*(?:<[^>()]*>)?\s*\("
)
_VAR_ARG_RE = re.compile(rf"^\s*({_ID})\s*$")
_PROP_RE = re.compile(
    rf"^\s*{_MODS}({_TYPE})\s+({_ID})\s*(\{{\s*(?:get|set|init))"
)

_PRIMITIVES = frozenset(
    """void int uint long ulong short ushort byte sbyte char float double
    decimal bool object string var dynamic Task ValueTask String Object
    nint nuint""".split()
)


def _module_qn_for(doc_id: str) -> str:
    parts = doc_id.split("/")
    stem = parts[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    return ".".join(parts[:-1] + [base])


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one C# document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    lines = code_text.split("\n")
    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    param_types: dict[str, dict[str, str]] = {}
    return_facts: set[tuple[str, str]] = set()
    namespace_name: str | None = None

    module_scope = _Scope("module", module_qn, module_qn.rsplit(".", 1)[-1], 0, 1)
    stack: list[_Scope] = [module_scope]
    children: dict[str, set[str]] = {module_qn: module_scope.children}
    pending: list[_Scope] = []
    pending_attrs: list[str] = []
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
        children[qn] = sc.children
        return sc

    def _collect_params(qn: str, argtext: str) -> None:
        for _off, arg in _split_args(argtext):
            pm = _PARAM_RE.match(arg.strip()) if arg.strip() else None
            if pm and pm.group(1) not in _PRIMITIVES:
                param_types.setdefault(qn, {})[pm.group(2)] = pm.group(1)

    for idx, raw in enumerate(lines):
        line_no = idx + 1
        line, _lit = _strip_line(raw, state)
        stripped = line.strip()
        if not stripped:
            continue

        nm = _NAMESPACE_RE.match(line)
        if nm:
            namespace_name = nm.group(1)
            # file-scoped `namespace X;` opens no brace; the block form's
            # `{` pushes an anonymous frame via the brace walk (no scope
            # row — namespaces do not nest the QN, the path already does)
            if line.rstrip().endswith(";"):
                continue

        am = _ATTR_RE.match(line)
        if am and "(" not in line[: am.start(1)]:
            pending_attrs.append(line.strip())

        um = _USING_RE.match(line)
        if um:
            is_static, alias, target = um.group(1), um.group(2), um.group(3)
            if is_static or alias:
                # `using static A.B.C` / `using X = A.B.C`: the target
                # names a CLASS — bind it (full path), edge to its
                # containing namespace (the javalite class-import rule)
                sym = alias or target.rsplit(".", 1)[-1]
                container = (
                    target.rsplit(".", 1)[0] if "." in target else target
                )
                mentions.append(
                    {
                        "kind": "import",
                        "name": target.rsplit(".", 1)[-1],
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "local_name": sym,
                        "target": container,
                        "callee": target,
                    }
                )
            else:
                # namespace using: no per-name binding (wildcard-like);
                # the IMPORTS edge verifies against the internal Package
                mentions.append(
                    {
                        "kind": "import",
                        "name": None,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "local_name": target.rsplit(".", 1)[-1],
                        "target": target,
                        "callee": target,
                    }
                )
            continue

        consumed: list[tuple[int, int]] = []
        decls: list[tuple[int, _Scope]] = []

        cm = _CLASS_RE.search(line)
        if cm:
            kw = cm.group(1).split()[0]
            name = cm.group(2)
            kind = {
                "class": "class",
                "record": "class",
                "struct": "class",
                "interface": "interface",
                "enum": "enum",
            }[kw]
            props: dict = {}
            if pending_attrs:
                props["decorators"] = list(pending_attrs)
            if namespace_name:
                props["namespace"] = namespace_name
            parent = (
                stack[-1]
                if stack[-1].kind in ("class", "interface", "enum")
                else module_scope
            )
            sc = push_def(kind, name, line_no, cm.start(2), parent, props or None)
            pending_attrs = []
            bases = []
            if cm.group(4):
                bases = [
                    re.sub(r"<.*", "", b).strip()
                    for b in cm.group(4).split(",")
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
            decls.append(
                (line.rfind("{") if cm.group(5) == "{" else -1, sc)
            )
            consumed.append((cm.start(), cm.end()))

        in_class = (
            stack[-1].kind in ("class", "interface", "enum")
            and depth == stack[-1].depth
        )
        if not cm and in_class:
            pm_ = _PROP_RE.match(line)
            mm = _METHOD_RE.match(line) if not pm_ else None
            if mm and mm.group(2) not in (
                "if", "for", "foreach", "while", "switch", "catch", "using",
                "lock", "return",
            ):
                ret_type, name, body_tok = mm.group(1), mm.group(2), mm.group(4)
                props = (
                    {"decorators": list(pending_attrs)}
                    if pending_attrs
                    else None
                )
                sc = push_def("method", name, line_no, mm.start(2), stack[-1], props)
                pending_attrs = []
                _collect_params(sc.qn, mm.group(3) or "")
                base_ret = re.sub(r"<.*", "", ret_type).strip().rstrip("[]?").strip()
                if (
                    base_ret not in _PRIMITIVES
                    and base_ret not in KEYWORDS
                    and re.fullmatch(_DOTTED, base_ret)
                ):
                    return_facts.add((sc.qn, base_ret))
                if body_tok == "{":
                    decls.append((line.rfind("{"), sc))
                elif body_tok == "=>":
                    # expression-bodied: no scope push; calls on this line
                    # attribute via the pending-def shim below
                    if sc.row is not None:
                        sc.row["end_line"] = line_no
                    decls.append((-2, sc))
                else:  # Allman: brace on a later line
                    decls.append((-1, sc))
                consumed.append((mm.start(2), mm.end(2)))
            else:
                ctm = _CTOR_DEF_RE.match(line) if not pm_ else None
                absm = _ABSTRACT_METHOD_RE.match(line) if not pm_ else None
                if ctm and ctm.group(1) == stack[-1].name:
                    sc = push_def(
                        "method", ctm.group(1), line_no, ctm.start(1), stack[-1]
                    )
                    pending_attrs = []
                    _collect_params(sc.qn, ctm.group(2) or "")
                    if ctm.group(3) == "{":
                        decls.append((line.rfind("{"), sc))
                    elif ctm.group(3) == "=>":
                        if sc.row is not None:
                            sc.row["end_line"] = line_no
                        decls.append((-2, sc))
                    else:
                        decls.append((-1, sc))
                    consumed.append((ctm.start(1), ctm.end(1)))
                elif absm and absm.group(2) not in (
                    "if", "for", "foreach", "while", "switch", "catch",
                    "return", "new",
                ):
                    sc = push_def(
                        "method", absm.group(2), line_no, absm.start(2), stack[-1]
                    )
                    pending_attrs = []
                    _collect_params(sc.qn, absm.group(3) or "")
                    base_ret = (
                        re.sub(r"<.*", "", absm.group(1)).strip().rstrip("[]?").strip()
                    )
                    if (
                        base_ret not in _PRIMITIVES
                        and base_ret not in KEYWORDS
                        and re.fullmatch(_DOTTED, base_ret)
                    ):
                        return_facts.add((sc.qn, base_ret))
                    if sc.row is not None:
                        sc.row["end_line"] = line_no
                    consumed.append((absm.start(2), absm.end(2)))

        # expression-bodied defs on this line: calls attribute to them
        expr_bodied = next((sc for pos, sc in decls if pos == -2), None)
        decls = [(pos, sc) for pos, sc in decls if pos != -2]

        # ---- brace walk with positional events (jslite model) ----
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
                (s.qn for s in reversed(st) if s.kind in ("class", "interface")),
                None,
            )
            if expr_bodied is not None and cls is None:
                cls = expr_bodied.qn.rsplit(".", 1)[0]
            qns = [
                s.qn for s in st if s.kind not in ("class", "interface", "enum")
            ]
            return caller, cls, qns

        # ---- declared-type locals ----
        dv = _DECL_VAR_RE.match(stripped)
        if (
            dv
            and dv.group(1) not in _PRIMITIVES
            and dv.group(1) not in KEYWORDS
            and dv.group(2) not in KEYWORDS
        ):
            d_caller, _c, _q = _ctx_at(len(line) - len(line.lstrip()))
            scope_assigns.setdefault(d_caller.qn, []).append(
                (line_no, dv.group(2), dv.group(1))
            )
        vv = _VAR_NEW_RE.match(stripped)
        if vv:
            d_caller, _c, _q = _ctx_at(0)
            scope_assigns.setdefault(d_caller.qn, []).append(
                (line_no, vv.group(1), vv.group(2))
            )

        # ---- calls ----
        for sm in _BASE_RE.finditer(line):
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
                        "_cls": s_cls,
                    }
                )

        rm = _RETURN_CALL_RE.match(stripped)
        ret_callee = rm.group(2) if rm else None
        for cm2 in _CALL_RE.finditer(line):
            callee = cm2.group(2)
            first = callee.split(".")[0]
            if (first in KEYWORDS and first != "this") or any(
                s <= cm2.start(2) < e for s, e in consumed
            ):
                continue
            c_caller, c_cls, c_qns = _ctx_at(cm2.start(2))
            if c_caller is module_scope and not cm2.group(1):
                continue
            row = {
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
            if h_cls and h_cls.startswith(module_qn + "."):
                rel_cls = h_cls[len(module_qn) + 1 :]
                if recv.startswith("this."):
                    recv = f"{rel_cls}.{recv[5:]}"
                elif "." not in recv:
                    recv = f"{rel_cls}.{recv}"
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
                    "_cls": h_cls,
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
        _cls = c.pop("_cls")
        segs = callee.split(".")
        if "." not in callee:
            for sq in reversed(stack_qns[1:]):
                kids = children.get(sq)
                if kids and callee in kids:
                    c["enclosing_hint"] = f"{sq}.{callee}"
                    break
        elif (
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
