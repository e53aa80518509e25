"""Single-document mention extraction for Go.

The Go sibling kernel (reference tier: ``parsers/go/`` —
``type_inference.py`` receiver/param/local type maps,
``module_paths.py`` go.mod anchoring; deferred receiver-method pass
``graph_updater.py:674-676``) over the shared mention IR. Reuses jslite's
stripper (backtick raw strings are Go's multi-line string form, same
state machine as JS template literals) and brace machinery.

Semantics mirrored:

* Go's import unit is the DIRECTORY: ``<dir>/<dir>.go`` collapses to the
  directory QN (``module_qn_for``'s Go rule), so ``import "proj/shapes"``
  verifies to that Module; other dirs verify to their Package node;
* ``import alias "a/b"`` binds local ``alias`` (default: last path
  segment) to dotted ``a.b``; grouped ``import ( ... )`` fans out;
* ``type N struct`` → class, ``type N interface`` → interface with its
  signature lines as bodyless methods;
* ``func (r *T) M(...)`` attaches M as a METHOD of T (the reference's
  deferred Go receiver pass, resolved here at extraction time for
  same-file types) and types ``r`` as T inside the body;
* typed receivers: ``var c T`` / ``c := T{...}`` (composite literal →
  INSTANTIATES) / params ``(s *T)`` / ``c := NewT()`` (fn-return hop);
* ``func F(...) *T`` return annotations become ``returns`` facts
  (chained-call rung); multi-returns take the first non-error component;
* capitalized module-level definitions emit ``export`` mentions (Go's
  case-based visibility).
"""

from __future__ import annotations

import re

from code_graph_rag_spark.extract.jslite import (
    _Scope,
    _matching_paren,
    _strip_line,
)

GO_EXTENSIONS = frozenset({"go"})

KEYWORDS = frozenset(
    """break case chan const continue default defer else fallthrough for
    func go goto if import interface map package range return select
    struct switch type var make new len cap append copy delete close
    panic recover print println complex real imag min max clear true
    false nil iota error string bool byte rune any int int8 int16 int32
    int64 uint uint8 uint16 uint32 uint64 uintptr float32 float64
    complex64 complex128""".split()
)

_PRIMS = frozenset(
    """string bool byte rune error any int int8 int16 int32 int64 uint
    uint8 uint16 uint32 uint64 uintptr float32 float64 complex64
    complex128""".split()
)

_ID = r"[A-Za-z_]\w*"
_DOTTED = rf"{_ID}(?:\.{_ID})*"

_PACKAGE_RE = re.compile(r"^\s*package\s+(\w+)")
_IMPORT_ONE_RE = re.compile(r'^\s*import\s+(?:(\w+|\.|_)\s+)?"([^"]+)"')
_IMPORT_OPEN_RE = re.compile(r"^\s*import\s*\(")
_IMPORT_GROUP_RE = re.compile(r'^\s*(?:(\w+|\.|_)\s+)?"([^"]+)"')
_TYPE_RE = re.compile(rf"^\s*type\s+({_ID})(?:\[[^\]]*\])?\s+(struct|interface)\s*\{{")
_FUNC_RE = re.compile(rf"^\s*func\s+({_ID})(?:\[[^\]]*\])?\s*\(")
_METHOD_RE = re.compile(
    rf"^\s*func\s*\(\s*({_ID})\s+\*?({_ID})(?:\[[^\]]*\])?\s*\)\s*({_ID})\s*\("
)
_IFACE_SIG_RE = re.compile(rf"^\s*({_ID})\s*\(([^)]*)\)")
_VAR_DECL_RE = re.compile(rf"^\s*var\s+({_ID})\s+\*?({_DOTTED})\s*(?:=|$)")
_ASSIGN_CTOR_RE = re.compile(
    rf"^\s*(?:var\s+)?({_ID})\s*:?=\s*&?({_DOTTED})\s*\{{"
)
_ASSIGN_CALL_RE = re.compile(rf"^\s*({_ID})\s*:?=\s*({_DOTTED})\s*\(")
_CALL_RE = re.compile(rf"(?<![\w.&])({_DOTTED})\s*\(")
_CHAIN_RE = re.compile(
    rf"(?<![\w.&])({_DOTTED})\s*\([^()]*\)\s*\.\s*({_ID})\s*\("
)
_CTOR_LIT_RE = re.compile(rf"(?<![\w.&])&({_DOTTED})\s*\{{")
# connect-go handler wiring `pkgconnect.New<Stem>Handler(impl)`: the impl
# type's exported methods EXPOSE resource::RPC::<Stem>.<Method> nodes
# (reference parsers/rpc_exposure.py; the generated package name ends in
# `connect` by codegen convention — io_access/processor.py:104-126)
_RPC_HANDLER_RE = re.compile(r"(?:^|\.)\w*connect\.New([A-Z]\w*)Handler$")
_ARG0_ID_RE = re.compile(r"\s*&?(\w+)\s*[,)]")
_PARAM_RE = re.compile(rf"^\s*({_ID})\s+\.{{0,3}}\*?({_DOTTED})")
_RET_FIRST_RE = re.compile(rf"\*?({_DOTTED})")
# route-call registration (reference endpoint_routes.py Go shapes):
# http.HandleFunc("/p", h) incl. Go 1.22 "GET /p" patterns, and
# echo/gin/chi verb methods e.GET("/p", h); the handler may be an
# attribute expression (wrapper.GetMe — the generated oapi shape)
_ROUTE_CALL_RE = re.compile(
    rf"(?<![\w.])({_DOTTED})\.(HandleFunc|Handle|GET|POST|PUT|PATCH|DELETE"
    rf"|OPTIONS|HEAD|Get|Post|Put|Patch|Delete)\s*\(\s*"
    rf'"((?:[A-Z]+ )?/[^"]*)"\s*,\s*({_DOTTED})'
)


def _module_qn_for(doc_id: str) -> str:
    # must agree with pylite.module_qn_for's Go rule (the dispatcher stamps
    # module_qn from the shared helper)
    from code_graph_rag_spark.extract.pylite import module_qn_for

    return module_qn_for(doc_id)[0]


def _ret_expr(sig_tail: str) -> str | None:
    """Return annotation from the text between the params' ``)`` and the
    body ``{``: ``*Circle``, ``(Circle, error)``, ``shapes.Circle``.
    Multi-returns take the first non-error component."""
    t = sig_tail.strip()
    if not t:
        return None
    if t.startswith("("):
        end = t.find(")")
        t = t[1:end] if end != -1 else t[1:]
        parts = [p.strip() for p in t.split(",")]
        t = next((p for p in parts if p.lstrip("*") != "error"), "")
    m = _RET_FIRST_RE.match(t)
    if not m:
        return None
    base = m.group(1)
    last = base.split(".")[-1]
    if last in _PRIMS or base in KEYWORDS:
        return None
    return base


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one Go document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    lines = code_text.split("\n")
    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    call_assigns: dict[str, list[tuple[int, str, str]]] = {}
    param_types: dict[str, dict[str, str]] = {}
    return_facts: set[tuple[str, str]] = set()
    package_name: str | None = None
    in_import_group = False

    module_scope = _Scope("module", module_qn, module_qn.rsplit(".", 1)[-1], 0, 1)
    stack: list[_Scope] = [module_scope]
    pending: list[_Scope] = []
    state = {"block_comment": False, "template": False}
    depth = 0

    def push_def(kind, name, line_no, col, parent, parent_kind=None):
        import json as _json

        qn = f"{parent.qn}.{name}"
        pkind = parent_kind or (
            "Class"
            if parent.kind in ("class", "interface")
            else parent.kind.capitalize()
        )
        props = {"package": package_name} if package_name else None
        row = {
            "kind": kind,
            "qn": qn,
            "name": name,
            "parent_qn": parent.qn,
            "parent_kind": pkind,
            "start_line": line_no,
            "end_line": line_no,
            "start_col": col,
            "props": _json.dumps(props, sort_keys=True) if props else None,
        }
        def_rows.append(row)
        parent.children.add(name)
        if name[:1].isupper() and parent is module_scope:
            # Go case-based visibility: capitalized module-level defs are
            # the module's exported surface
            mentions.append(
                {
                    "kind": "export",
                    "name": name,
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": col,
                }
            )
        return _Scope(kind, qn, name, -1, line_no, row)

    def _import_mention(alias, path, line_no):
        if alias in (".", "_"):
            alias = None
        target = path.replace("/", ".")
        local = alias or path.rsplit("/", 1)[-1]
        mentions.append(
            {
                "kind": "import",
                "name": None,
                "parent_qn": module_qn,
                "parent_kind": "Module",
                "start_line": line_no,
                "start_col": 0,
                "local_name": local,
                "target": target,
                "callee": target,
            }
        )

    for idx, raw in enumerate(lines):
        line_no = idx + 1
        line, lit_line = _strip_line(raw, state)
        stripped = line.strip()
        if not stripped:
            continue

        pm = _PACKAGE_RE.match(line)
        if pm:
            package_name = pm.group(1)
            continue

        # import paths live INSIDE string literals — match against the
        # literal-preserving line, not the blanked one
        if in_import_group:
            if stripped.startswith(")"):
                in_import_group = False
                continue
            gm = _IMPORT_GROUP_RE.match(lit_line)
            if gm:
                _import_mention(gm.group(1), gm.group(2), line_no)
            continue
        if _IMPORT_OPEN_RE.match(line):
            in_import_group = True
            continue
        im = _IMPORT_ONE_RE.match(lit_line)
        if im:
            _import_mention(im.group(1), im.group(2), line_no)
            continue

        consumed: list[tuple[int, int]] = []
        decls: list[tuple[int, _Scope]] = []

        tm = _TYPE_RE.match(line)
        if tm:
            kind = "class" if tm.group(2) == "struct" else "interface"
            sc = push_def(kind, tm.group(1), line_no, tm.start(1), stack[-1])
            decls.append((line.index("{", tm.start()), sc))
            consumed.append((tm.start(), tm.end()))

        mm = _METHOD_RE.match(line) if not tm else None
        fm = _FUNC_RE.match(line) if not tm and not mm else None
        if mm:
            recv_var, recv_type, name = mm.group(1), mm.group(2), mm.group(3)
            # receiver method: attach to the type (the reference's deferred
            # Go pass; here the parent QN is minted directly — phantom-drop
            # suppresses the edge if the type never materializes)
            tparent = _Scope(
                "class", f"{module_qn}.{recv_type}", recv_type, -1, line_no
            )
            sc = push_def("method", name, line_no, mm.start(3), tparent)
            param_types.setdefault(sc.qn, {})[recv_var] = recv_type
            op = line.find("(", mm.end(3) - 1)
            cp = _matching_paren(line, op) if op != -1 else -1
            if cp != -1:
                for arg in line[op + 1 : cp].split(","):
                    pm2 = _PARAM_RE.match(arg.strip()) if arg.strip() else None
                    if pm2 and pm2.group(2).split(".")[-1] not in _PRIMS:
                        param_types.setdefault(sc.qn, {})[pm2.group(1)] = (
                            pm2.group(2)
                        )
                brace = line.find("{", cp)
                ret = _ret_expr(line[cp + 1 : brace if brace != -1 else None])
                if ret:
                    return_facts.add((sc.qn, ret))
            decls.append((line.rfind("{"), sc))
            consumed.append((mm.start(), mm.end(3)))
        elif fm and fm.group(1) not in KEYWORDS:
            sc = push_def("function", fm.group(1), line_no, fm.start(1), stack[-1])
            op = line.find("(", fm.end(1))
            cp = _matching_paren(line, op) if op != -1 else -1
            if cp != -1:
                for arg in line[op + 1 : cp].split(","):
                    pm2 = _PARAM_RE.match(arg.strip()) if arg.strip() else None
                    if pm2 and pm2.group(2).split(".")[-1] not in _PRIMS:
                        param_types.setdefault(sc.qn, {})[pm2.group(1)] = (
                            pm2.group(2)
                        )
                brace = line.find("{", cp)
                ret = _ret_expr(line[cp + 1 : brace if brace != -1 else None])
                if ret:
                    return_facts.add((sc.qn, ret))
            decls.append((line.rfind("{"), sc))
            consumed.append((fm.start(), fm.end(1)))

        # interface method signatures (bodyless)
        if (
            not tm
            and not mm
            and not fm
            and stack[-1].kind == "interface"
            and depth == stack[-1].depth
        ):
            sm = _IFACE_SIG_RE.match(line)
            if sm and sm.group(1) not in KEYWORDS:
                isc = push_def(
                    "method", sm.group(1), line_no, sm.start(1), stack[-1]
                )
                if isc.row is not None:
                    isc.row["end_line"] = line_no
                ret = _ret_expr(line[line.find(")", sm.end(1)) + 1 :])
                if ret:
                    return_facts.add((isc.qn, ret))
                consumed.append((sm.start(1), sm.end(1)))

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
            caller = next(
                s
                for s in reversed(st)
                if s.kind not in ("class", "interface")
            )
            qns = [s.qn for s in st if s.kind not in ("class", "interface")]
            return caller, qns

        # ---- typed locals ----
        vd = _VAR_DECL_RE.match(stripped)
        if vd and vd.group(2).split(".")[-1] not in _PRIMS:
            c_caller, _q = _ctx_at(0)
            scope_assigns.setdefault(c_caller.qn, []).append(
                (line_no, vd.group(1), vd.group(2))
            )
        ac = _ASSIGN_CTOR_RE.match(stripped)
        if ac and ac.group(2).split(".")[-1] not in _PRIMS and ac.group(2) not in KEYWORDS:
            c_caller, c_qns = _ctx_at(0)
            scope_assigns.setdefault(c_caller.qn, []).append(
                (line_no, ac.group(1), ac.group(2))
            )
            if c_caller is not module_scope:
                # composite-literal construction → INSTANTIATES downstream
                call_rows.append(
                    {
                        "kind": "call",
                        "parent_qn": c_caller.qn,
                        "parent_kind": c_caller.kind.capitalize(),
                        "start_line": line_no,
                        "start_col": 0,
                        "callee": ac.group(2),
                        "is_ret": False,
                        "_stack": list(c_qns),
                    }
                )
        acall = None
        if not ac:
            acall = _ASSIGN_CALL_RE.match(stripped)
            if (
                acall
                and acall.group(2) not in KEYWORDS
                and acall.group(2).split(".")[0] not in KEYWORDS
            ):
                c_caller, _q = _ctx_at(0)
                call_assigns.setdefault(c_caller.qn, []).append(
                    (line_no, acall.group(1), acall.group(2))
                )

        # ---- calls ----
        ret_stmt = stripped.startswith("return ")
        for cm in _CALL_RE.finditer(line):
            callee = cm.group(1)
            first = callee.split(".")[0]
            if first in KEYWORDS or any(
                s <= cm.start(1) < e for s, e in consumed
            ):
                continue
            c_caller, c_qns = _ctx_at(cm.start(1))
            if c_caller is module_scope:
                continue
            row = {
                "kind": "call",
                "parent_qn": c_caller.qn,
                "parent_kind": c_caller.kind.capitalize(),
                "start_line": line_no,
                "start_col": cm.start(1),
                "callee": callee,
                "is_ret": ret_stmt and line[: cm.start(1)].strip() == "return",
                "_stack": list(c_qns),
            }
            if _RPC_HANDLER_RE.search(callee):
                a0 = _ARG0_ID_RE.match(line, cm.end())
                if a0:
                    row["_arg0_id"] = a0.group(1)
            call_rows.append(row)
        for lm in _CTOR_LIT_RE.finditer(line):
            if any(s <= lm.start(1) < e for s, e in consumed):
                continue
            c_caller, c_qns = _ctx_at(lm.start(1))
            if c_caller is module_scope or _ASSIGN_CTOR_RE.match(stripped):
                continue
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": c_caller.qn,
                    "parent_kind": c_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": lm.start(1),
                    "callee": lm.group(1),
                    "is_ret": ret_stmt,
                    "_stack": list(c_qns),
                }
            )
        for rcm in _ROUTE_CALL_RE.finditer(lit_line):
            rc_caller, _q = _ctx_at(rcm.start())
            verb = rcm.group(2)
            call_rows.append(
                {
                    "kind": "route_call",
                    "name": rcm.group(4).split(".")[-1],
                    "local_name": (
                        "any"
                        if verb in ("HandleFunc", "Handle")
                        else verb.lower()
                    ),
                    "parent_qn": rc_caller.qn,
                    "parent_kind": rc_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": rcm.start(),
                    "callee": f"{rcm.group(1)}.{verb}",
                    "arg0_lit": rcm.group(3),
                    "is_ret": False,
                    "_stack": [],
                }
            )
        for chm in _CHAIN_RE.finditer(line):
            expr, meth = chm.group(1), chm.group(2)
            if expr.split(".")[0] in KEYWORDS:
                continue
            c_caller, c_qns = _ctx_at(chm.start(1))
            if c_caller is module_scope:
                continue
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": c_caller.qn,
                    "parent_kind": c_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": chm.start(1),
                    "callee": f"{expr}().{meth}",
                    "is_ret": False,
                    "recv_expr": expr,
                    "_stack": list(c_qns),
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

    def _lookup(table, stack_qns, var, at_line):
        for sq in reversed(stack_qns):
            rows = [a for a in table.get(sq, ()) if a[1] == var]
            if rows:
                before = [a for a in rows if a[0] <= at_line]
                return before[-1][2] if before else None
        return None

    for c in call_rows:
        callee = c["callee"]
        stack_qns = c.pop("_stack", [])
        arg0_id = c.pop("_arg0_id", None)
        if arg0_id is not None:
            # handler wiring → one rpc_wire mention (io capture group):
            # name = service stem, callee = the impl arg's locally-inferred
            # type (scope ctor/var-decl/param — the reference's function-
            # local _Binding walk, rpc_exposure.py:34-46)
            hm = _RPC_HANDLER_RE.search(callee)
            impl_t = _lookup(scope_assigns, stack_qns, arg0_id, c["start_line"])
            if impl_t is None:
                for sq in reversed(stack_qns):
                    pt = param_types.get(sq, {}).get(arg0_id)
                    if pt is not None:
                        impl_t = pt
                        break
            if hm is not None:
                mentions.append(
                    {
                        "kind": "rpc_wire",
                        "name": hm.group(1),
                        "callee": impl_t or arg0_id,
                        "parent_qn": c["parent_qn"],
                        "parent_kind": c["parent_kind"],
                        "start_line": c["start_line"],
                        "start_col": c["start_col"],
                    }
                )
        segs = callee.split(".")
        if (
            c["kind"] == "call"
            and len(segs) == 2
            and "recv_expr" not in c
        ):
            first = segs[0]
            t = _lookup(scope_assigns, stack_qns, first, c["start_line"])
            if t is None:
                for sq in reversed(stack_qns):
                    pt = param_types.get(sq, {}).get(first)
                    if pt is not None:
                        t = pt
                        break
            if t is not None:
                c["recv_expr"] = t
            else:
                # assigned from a call → the fn-return hop types it
                src = _lookup(call_assigns, stack_qns, first, c["start_line"])
                if src is not None:
                    c["recv_expr"] = src
        mentions.append(c)

    return mentions
