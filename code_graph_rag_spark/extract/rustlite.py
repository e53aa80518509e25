"""Single-document mention extraction for Rust.

The Rust sibling kernel (reference tier: ``parsers/rs/``, ~59
``test_rust_*`` files) over the shared mention IR. Reuses jslite's
stripper/brace machinery; Rust-specific semantics:

* module QN from the file path; ``mod.rs`` collapses to its directory
  (``module_qn_for``'s index rule, definition_processor.py:315-318);
* ``use crate::a::b::C;`` → from-import of symbol ``C`` from module
  ``<project>.a.b`` (``crate`` = the path root); ``super::`` pops one
  level; grouped ``use a::{B, C as D}`` fans out; ``::`` normalizes to
  the dotted QN scheme everywhere;
* ``fn`` / ``struct`` / ``enum`` / ``trait`` declarations (trait →
  interface kind, so IMPLEMENTS splits from INHERITS downstream);
* ``impl Name { … }`` attaches its fns as METHODS of ``Name``;
  ``impl Trait for Name { … }`` additionally emits an inherit mention
  (Name implements Trait) — the reference's rs impl handling;
* typed receivers: ``let c: Circle = …`` / ``let c = Circle::new()`` /
  fn params ``(s: &Shape)``; ``-> Circle`` and ``-> Self`` return facts
  (Self resolves to the impl type at extraction time);
* ``self.m()`` → class-context hint; ``Type::assoc()`` calls become
  dotted callees ``Type.assoc``.
"""

from __future__ import annotations

import json
import re

from code_graph_rag_spark.extract.jslite import (
    _Scope,
    _matching_paren,
    _split_args,
)

RUST_EXTENSIONS = frozenset({"rs"})

KEYWORDS = frozenset(
    """as async await break const continue crate dyn else enum extern false
    fn for if impl in let loop match mod move mut pub ref return self Self
    static struct super trait true type unsafe use where while union box
    Some None Ok Err String Vec Box Option Result""".split()
)

_ID = r"[A-Za-z_][\w]*"
_PATH = rf"{_ID}(?:::{_ID})*"

_FN_RE = re.compile(
    rf"(?:^|\b)(?:pub(?:\([^)]*\))?\s+)?(?:const\s+)?(?:async\s+)?(?:unsafe\s+)?"
    rf"fn\s+({_ID})\s*(?:<[^>()]*>)?\s*\("
)
_STRUCT_RE = re.compile(
    rf"(?:^|\b)(?:pub(?:\([^)]*\))?\s+)?(struct|enum|union)\s+({_ID})"
)
_TRAIT_RE = re.compile(rf"(?:^|\b)(?:pub(?:\([^)]*\))?\s+)?trait\s+({_ID})")
_IMPL_RE = re.compile(
    rf"(?:^|\b)impl(?:\s*<[^>]*>)?\s+(?:({_PATH})(?:\s*<[^>]*>)?\s+for\s+)?"
    rf"({_PATH})(?:\s*<[^>]*>)?\s*(?:where[^{{]*)?\{{"
)
_USE_RE = re.compile(r"^\s*(?:pub\s+)?use\s+([^;]+);")
_CALL_RE = re.compile(rf"(?<![\w:.])({_PATH})\s*(?:::<[^>]*>)?\s*\(")
_METHOD_CALL_RE = re.compile(rf"\.\s*({_ID})\s*(?:::<[^>]*>)?\s*\(")
_LET_TYPED_RE = re.compile(rf"^\s*let\s+(?:mut\s+)?({_ID})\s*:\s*&?({_PATH})")
_LET_CTOR_RE = re.compile(
    rf"^\s*let\s+(?:mut\s+)?({_ID})\s*=\s*({_PATH})::(?:new|default|from|with_capacity)\s*\("
)
_PARAM_RE = re.compile(rf"^\s*(?:mut\s+)?({_ID})\s*:\s*&?(?:mut\s+)?({_PATH})")
_RET_ANN_RE = re.compile(rf"->\s*&?({_PATH})")
_RETURN_CALL_RE = re.compile(rf"^\s*return\s+({_PATH})\s*\(")
_VAR_RECV_RE = re.compile(rf"(?<![\w:.])({_ID})\s*\.\s*({_ID})\s*\(")
_CHAIN_RE = re.compile(
    rf"(?<![\w:.])((?:self\.)?{_PATH})\s*\(\s*\)\s*\.\s*({_ID})\s*\("
)

_CHAR_LIT_RE = re.compile(r"'(?:\\.|[^'\\])'")


def _strip_line(line: str, state: dict) -> tuple[str, str]:
    """Rust-aware string/comment stripper (jslite's algorithm with Rust
    quote semantics). A single quote is a *char-literal* delimiter only
    when it closes within two chars (``'x'``, ``'\\n'``); otherwise it is
    a lifetime (``'a``, ``'static``, ``impl<'a>``) and passes through —
    jslite's stripper blanked the rest of such lines as "unterminated
    strings", losing every method inside lifetime-annotated impls."""
    out: list[str] = []
    lit: list[str] = []
    i, n = 0, len(line)
    while i < n:
        if state.get("block_comment"):
            end = line.find("*/", i)
            if end == -1:
                out.append(" " * (n - i))
                lit.append(" " * (n - i))
                break
            out.append(" " * (end + 2 - i))
            lit.append(" " * (end + 2 - i))
            i = end + 2
            state["block_comment"] = False
            continue
        ch = line[i]
        if ch == "/" and i + 1 < n and line[i + 1] == "/":
            break
        if ch == "/" and i + 1 < n and line[i + 1] == "*":
            state["block_comment"] = True
            out.append("  ")
            lit.append("  ")
            i += 2
            continue
        if ch == '"':
            j = i + 1
            while j < n:
                if line[j] == "\\":
                    j += 2
                    continue
                if line[j] == '"':
                    break
                j += 1
            if j >= n:
                out.append(" " * (n - i))
                lit.append(line[i:])
                break
            out.append('"' + " " * (j - i - 1) + '"')
            lit.append(line[i : j + 1])
            i = j + 1
            continue
        if ch == "'":
            m = _CHAR_LIT_RE.match(line, i)
            if m:
                span = m.end() - m.start()
                out.append("'" + " " * (span - 2) + "'")
                lit.append(m.group(0))
                i = m.end()
            else:
                out.append(ch)
                lit.append(ch)
                i += 1
            continue
        out.append(ch)
        lit.append(ch)
        i += 1
    return "".join(out), "".join(lit)


_PRIMS = frozenset(
    "i8 i16 i32 i64 i128 u8 u16 u32 u64 u128 usize isize f32 f64 bool char str".split()
)


def _module_qn_for(doc_id: str) -> str:
    # index-file collapse list matches pylite.module_qn_for exactly — the
    # extraction dispatcher stamps module_qn from the shared helper, so the
    # kernels must derive identical QNs
    parts = doc_id.split("/")
    stem = parts[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    if base in ("mod", "index", "__init__"):
        qn_parts = parts[:-1]
    else:
        qn_parts = parts[:-1] + [base]
    return ".".join(qn_parts)


def _resolve_use_path(path: str, module_qn: str, project: str) -> str:
    """A use-path prefix → dotted module QN (crate/super/self anchoring)."""
    segs = path.split("::")
    if segs and segs[0] == "crate":
        out = [project] + segs[1:]
    elif segs and segs[0] == "super":
        base = module_qn.split(".")
        out = base[:-1] + segs[1:]
    elif segs and segs[0] == "self":
        out = module_qn.split(".") + segs[1:]
    else:
        out = segs
    return ".".join(out)


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one Rust document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    project = doc_id.split("/")[0]
    lines = code_text.split("\n")
    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    param_types: dict[str, dict[str, str]] = {}
    return_facts: set[tuple[str, str]] = set()

    module_scope = _Scope("module", module_qn, module_qn.rsplit(".", 1)[-1], 0, 1)
    stack: list[_Scope] = [module_scope]
    children: dict[str, set[str]] = {module_qn: module_scope.children}
    pending: list[_Scope] = []
    state = {"block_comment": False, "template": False}
    depth = 0

    def innermost_callable() -> _Scope:
        return next(
            s for s in reversed(stack) if s.kind not in ("class", "interface", "enum")
        )

    def push_def(kind, name, line_no, col, parent, emit_row=True) -> _Scope:
        qn = f"{parent.qn}.{name}"
        # class-like parents all report "Class" (pylite's convention — the
        # DEFINES_METHOD split keys on it)
        pkind = (
            "Class"
            if parent.kind in ("class", "interface", "enum")
            else parent.kind.capitalize()
        )
        row = None
        if emit_row:
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
        sc = _Scope(kind, qn, name, -1, line_no, row)
        children.setdefault(qn, sc.children)
        return sc

    for idx, raw in enumerate(lines):
        line_no = idx + 1
        line, lit_line = _strip_line(raw, state)
        stripped = line.strip()
        if not stripped:
            continue

        um = _USE_RE.match(line)
        if um:
            body = um.group(1).strip()
            gm = re.match(rf"^({_PATH})::\{{([^}}]*)\}}$", body)
            items: list[tuple[str, str, str]] = []  # (module_path, symbol, local)
            if gm:
                prefix = gm.group(1)
                for part in gm.group(2).split(","):
                    part = part.strip()
                    if not part or part == "*" or part == "self":
                        continue
                    if " as " in part:
                        sym, local = (x.strip() for x in part.split(" as ", 1))
                    else:
                        sym = local = part
                    if re.fullmatch(_ID, sym):
                        items.append((prefix, sym, local))
            else:
                if " as " in body:
                    path, local = (x.strip() for x in body.split(" as ", 1))
                else:
                    path, local = body, body.split("::")[-1]
                if re.fullmatch(_PATH, path) and "::" in path:
                    mod, sym = path.rsplit("::", 1)
                    items.append((mod, sym, local))
                elif re.fullmatch(_ID, path):
                    items.append((path, path, local))
            for mod_path, sym, local in items:
                target = _resolve_use_path(mod_path, module_qn, project)
                mentions.append(
                    {
                        "kind": "import",
                        "name": sym if sym != target else None,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "local_name": local,
                        "target": target,
                        "callee": target,
                    }
                )
            continue

        consumed: list[tuple[int, int]] = []
        decls: list[tuple[int, _Scope]] = []

        im = _IMPL_RE.search(line)
        if im:
            trait, target = im.group(1), im.group(2)
            tname = target.split("::")[-1].split("<")[0]
            # the impl scope RESOLVES to the struct's qn (defined in this
            # module); methods inside attach to it as a class scope
            cls_qn = f"{module_qn}.{tname}"
            sc = _Scope("class", cls_qn, tname, -1, line_no)
            children.setdefault(cls_qn, sc.children)
            if trait:
                t = trait.split("::")[-1].split("<")[0]
                mentions.append(
                    {
                        "kind": "inherit",
                        "qn": cls_qn,
                        "name": tname,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": im.start(2),
                        "callee": t,
                        "base_index": 0,
                    }
                )
            decls.append((line.rfind("{"), sc))
            consumed.append((im.start(), im.end()))
        else:
            smatch = _STRUCT_RE.search(line)
            if smatch:
                kind = "enum" if smatch.group(1) == "enum" else "class"
                sc = push_def(
                    kind, smatch.group(2), line_no, smatch.start(2), innermost_callable()
                    if stack[-1].kind not in ("class", "interface", "enum")
                    else stack[-1],
                )
                body = line.find("{", smatch.end(2))
                if body != -1:
                    decls.append((body, sc))
                elif sc.row is not None:
                    sc.row["end_line"] = line_no  # unit struct `struct X;`
                consumed.append((smatch.start(), smatch.end(2)))
            tmatch = _TRAIT_RE.search(line)
            if tmatch and not any(
                s <= tmatch.start(1) < e for s, e in consumed
            ):
                sc = push_def(
                    "interface", tmatch.group(1), line_no, tmatch.start(1), stack[-1]
                    if stack[-1].kind == "module"
                    else innermost_callable(),
                )
                decls.append((line.find("{", tmatch.end(1)), sc))
                consumed.append((tmatch.start(), tmatch.end(1)))

        fm = _FN_RE.search(line)
        if fm and not any(s <= fm.start(1) < e for s, e in consumed):
            parent = stack[-1]
            kind = (
                "method"
                if parent.kind in ("class", "interface")
                else "function"
            )
            sc = push_def(kind, fm.group(1), line_no, fm.start(1), parent)
            # params + return annotation
            op = line.find("(", fm.end(1))
            cp = _matching_paren(line, op) if op != -1 else -1
            if cp != -1:
                for arg in line[op + 1 : cp].split(","):
                    pm = _PARAM_RE.match(arg.strip())
                    if pm and pm.group(2).split("::")[-1] not in _PRIMS:
                        t = pm.group(2).split("::")[-1]
                        if t not in KEYWORDS or t == "Self":
                            if t == "Self" and parent.kind == "class":
                                t = parent.name
                            param_types.setdefault(sc.qn, {})[pm.group(1)] = t
                rm = _RET_ANN_RE.search(line, cp)
                if rm:
                    t = rm.group(1).split("::")[-1]
                    if t == "Self" and parent.kind == "class":
                        t = parent.name
                    if t not in _PRIMS and (t not in KEYWORDS) and re.fullmatch(_ID, t):
                        return_facts.add((sc.qn, t))
            body = line.find("{", cp if cp != -1 else fm.end())
            # trait method signatures end with ';' — a method entity with
            # no body scope (a stale pending scope would mis-attach to the
            # next unrelated '{')
            if body == -1 and stripped.endswith(";"):
                if sc.row is not None:
                    sc.row["end_line"] = line_no
            else:
                decls.append((body, sc))
            consumed.append((fm.start(1), fm.end(1)))

        # ---- brace walk with positional events ----
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
                (s for s in reversed(st) if s.kind in ("class", "interface")),
                None,
            )
            qns = [
                s.qn for s in st if s.kind not in ("class", "interface", "enum")
            ]
            return caller, cls, qns

        # ---- typed lets ----
        lt = _LET_TYPED_RE.match(stripped)
        if lt and lt.group(2).split("::")[-1] not in _PRIMS:
            c_caller, c_cls, _q = _ctx_at(0)
            t = lt.group(2).split("::")[-1]
            if t == "Self" and c_cls is not None:
                t = c_cls.name
            if t not in KEYWORDS:
                scope_assigns.setdefault(c_caller.qn, []).append(
                    (line_no, lt.group(1), t)
                )
        lc = _LET_CTOR_RE.match(stripped)
        if lc:
            c_caller, c_cls, _q = _ctx_at(0)
            t = lc.group(2).split("::")[-1]
            if t == "Self" and c_cls is not None:
                t = c_cls.name
            if t not in KEYWORDS:
                scope_assigns.setdefault(c_caller.qn, []).append(
                    (line_no, lc.group(1), t)
                )

        # ---- calls ----
        ret_m = _RETURN_CALL_RE.match(stripped)
        ret_callee = (
            ret_m.group(1).replace("::", ".") if ret_m else None
        )
        seen: list[tuple[int, int]] = []
        for cm2 in _CALL_RE.finditer(line):
            raw_callee = cm2.group(1)
            first = raw_callee.split("::")[0]
            if first in KEYWORDS and first not in ("self", "Self"):
                continue
            if any(s <= cm2.start(1) < e for s, e in consumed):
                continue
            seen.append((cm2.start(1), cm2.end(1)))
            c_caller, c_cls, c_qns = _ctx_at(cm2.start(1))
            if c_caller is module_scope:
                continue  # item-position noise (derive args etc.)
            callee = raw_callee.replace("::", ".")
            if callee.startswith("Self.") and c_cls is not None:
                callee = f"{c_cls.name}{callee[4:]}"
            row = {
                "kind": "call",
                "parent_qn": c_caller.qn,
                "parent_kind": c_caller.kind.capitalize(),
                "start_line": line_no,
                "start_col": cm2.start(1),
                "callee": callee,
                "is_ret": callee == ret_callee,
                "_stack": list(c_qns),
                "_cls": c_cls.qn if c_cls else None,
            }
            call_rows.append(row)
        # method calls on receivers: v.m() / self.m()
        for mm in _VAR_RECV_RE.finditer(line):
            recv, meth = mm.group(1), mm.group(2)
            if any(s <= mm.start(1) < e for s, e in seen) or any(
                s <= mm.start(1) < e for s, e in consumed
            ):
                continue
            c_caller, c_cls, c_qns = _ctx_at(mm.start(1))
            if c_caller is module_scope:
                continue
            row = {
                "kind": "call",
                "parent_qn": c_caller.qn,
                "parent_kind": c_caller.kind.capitalize(),
                "start_line": line_no,
                "start_col": mm.start(1),
                "callee": f"{recv}.{meth}",
                "is_ret": False,
                "_stack": list(c_qns),
                "_cls": c_cls.qn if c_cls else None,
            }
            if recv == "self" and c_cls is not None:
                row["class_ctx_hint"] = f"{c_cls.qn}.{meth}"
            call_rows.append(row)
        # chained calls on a call result: make().area() — the receiver
        # expr is the producing fn; ``resolve_receiver_classes``'s fn hop
        # (reference call_resolver.py:833-850) turns its `-> Circle`
        # returns fact into the receiver class
        for chm in _CHAIN_RE.finditer(line):
            expr, meth = chm.group(1), chm.group(2)
            first = expr.split("::")[0].split(".")[0]
            if first in KEYWORDS and first not in ("self", "Self"):
                continue
            if any(s <= chm.start(1) < e for s, e in consumed):
                continue
            c_caller, c_cls, c_qns = _ctx_at(chm.start(1))
            if c_caller is module_scope:
                continue
            recv = expr.replace("::", ".")
            if c_cls is not None:
                rel_cls = (
                    c_cls.qn[len(module_qn) + 1 :]
                    if c_cls.qn.startswith(module_qn + ".")
                    else c_cls.name
                )
                if recv.startswith("self."):
                    recv = f"{rel_cls}.{recv[5:]}"
                elif recv.startswith("Self."):
                    recv = f"{rel_cls}.{recv[5:]}"
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": c_caller.qn,
                    "parent_kind": c_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": chm.start(1),
                    "callee": f"{recv}().{meth}",
                    "is_ret": False,
                    "recv_expr": recv,
                    "_stack": list(c_qns),
                    "_cls": c_cls.qn if c_cls else None,
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
            and first not in ("self", "Self")
            and "recv_expr" not in c
            and first not in def_names
            and first[0:1].islower()
        ):
            t = _lookup_var_type(stack_qns, first, c["start_line"])
            if t:
                c["recv_expr"] = t
        mentions.append(c)

    return mentions
