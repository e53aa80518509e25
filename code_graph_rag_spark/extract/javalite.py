"""Single-document mention extraction for Java.

The Java sibling of ``jslite.py`` (reference tier: ``parsers/java/``,
~60 ``test_java_*`` files): a brace-scope scanner emitting the shared
mention IR, so the language-agnostic join phase resolves everything
downstream. Reuses jslite's string/comment stripper and brace machinery.

Semantics mirrored (reference citations):

* module QN ``project.rel.path`` from the file path (consistent with the
  other tiers; the ``package`` declaration is recorded as a prop);
* ``import a.b.C;`` binds local ``C`` to module ``a.b`` symbol ``C``
  (``parsers/java`` import processor); ``import static a.b.C.m`` binds
  ``m``; ``import a.b.*`` is recorded with local ``*`` (wildcard — the
  alias rung skips it, same as the reference's conservative handling);
* class / interface / enum declarations with ``extends`` +
  ``implements`` lists (base order preserved as base_index);
* methods: ``[modifiers] ReturnType name(args) {``; constructors (name ==
  enclosing class) are methods named like the class; annotations (@...)
  become decorator props;
* DECLARED types drive the typed-receiver rungs: ``Circle c = new
  Circle();`` / parameter declarations ``(Shape s)`` / field declarations
  type the receiver of ``c.area()`` — Java's static types make this the
  primary resolution path (reference ``parsers/java`` type usage);
* method return types become ``returns`` facts (chained-call rung);
* ``this.m()`` → class-context hint; ``super.m()`` → super hint;
  ``new Ctor()`` resolves to a Class downstream → INSTANTIATES.
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

JAVA_EXTENSIONS = frozenset({"java"})

KEYWORDS = frozenset(
    """abstract assert boolean break byte case catch char class const
    continue default do double else enum extends final finally float for
    goto if implements import instanceof int interface long native new
    package private protected public return short static strictfp super
    switch synchronized this throw throws transient try void volatile
    while var record yield sealed permits true false null String""".split()
)

_ID = r"[A-Za-z_$][\w$]*"
_DOTTED = rf"{_ID}(?:\.{_ID})*"
_TYPE = rf"{_DOTTED}(?:\s*<[^<>;(){{}}]*>)?(?:\s*\[\s*\])*"

_PACKAGE_RE = re.compile(rf"^\s*package\s+({_DOTTED})\s*;")
_IMPORT_RE = re.compile(
    rf"^\s*import\s+(static\s+)?({_DOTTED})(\.\*)?\s*;"
)
_CLASS_RE = re.compile(
    rf"(?:^|\b)(?:(?:public|private|protected|static|final|abstract|sealed|strictfp)\s+)*"
    rf"(class|interface|enum|record)\s+({_ID})(?:\s*<[^<>{{]*>)?"
    rf"(?:\s*\(([^)]*)\))?"  # record components
    rf"(?:\s+extends\s+([\w.,<>\s\[\]]+?))?"
    rf"(?:\s+implements\s+([\w.,<>\s\[\]]+?))?\s*(?:permits\s+[\w.,\s]+)?\{{"
)
_MODS = r"(?:(?:public|private|protected|static|final|abstract|synchronized|native|default|strictfp)\s+)*"
_METHOD_RE = re.compile(
    rf"^\s*{_MODS}(?:<[^<>]+>\s*)?({_TYPE})\s+({_ID})\s*\(([^)]*)\)"
    rf"\s*(?:throws\s+[\w.,\s]+)?\s*\{{"
)
_CTOR_DEF_RE = re.compile(
    rf"^\s*{_MODS}({_ID})\s*\(([^)]*)\)\s*(?:throws\s+[\w.,\s]+)?\s*\{{"
)
_ABSTRACT_METHOD_RE = re.compile(
    rf"^\s*{_MODS}(?:<[^<>]+>\s*)?({_TYPE})\s+({_ID})\s*\(([^)]*)\)"
    rf"\s*(?:throws\s+[\w.,\s]+)?\s*;"
)
_ANNOT_RE = re.compile(rf"^\s*@({_DOTTED})")
_CALL_RE = re.compile(rf"(?<![\w$.])(new\s+)?({_DOTTED})\s*(?:<[^>()]*>)?\s*\(")
_SUPER_RE = re.compile(rf"(?<![\w$.])super\s*\.\s*({_ID})\s*\(")
_CHAIN_RE = re.compile(rf"(?<![\w$.])({_DOTTED})\s*\([^()]*\)\s*\.\s*({_ID})\s*\(")
# declared-type locals/fields: `Circle c = ...;` / `final Circle c;`
_DECL_VAR_RE = re.compile(
    rf"^\s*(?:final\s+)?({_DOTTED})(?:\s*<[^<>;=]*>)?(?:\s*\[\s*\])*\s+({_ID})\s*[=;]"
)
_PARAM_RE = re.compile(
    rf"^\s*(?:final\s+)?({_DOTTED})(?:\s*<[^<>]*>)?(?:\s*\[\s*\])*(?:\s*\.\.\.)?\s+({_ID})\s*$"
)
_RETURN_CALL_RE = re.compile(
    rf"^\s*return\s+(new\s+)?({_DOTTED})\s*(?:<[^>()]*>)?\s*\("
)
_VAR_ARG_RE = re.compile(rf"^\s*({_ID})\s*$")
_CALL_ARG_RE = re.compile(rf"^\s*(?:new\s+)?({_DOTTED})\s*\(")

_PRIMITIVES = frozenset(
    "void int long short byte char float double boolean var String Object".split()
)


def _module_qn_for(doc_id: str) -> str:
    parts = doc_id.split("/")
    stem = parts[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    return ".".join(parts[:-1] + [base])


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one Java document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    lines = code_text.split("\n")
    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    param_types: dict[str, dict[str, str]] = {}
    return_facts: set[tuple[str, str]] = set()
    package_name: str | None = None

    module_scope = _Scope("module", module_qn, module_qn.rsplit(".", 1)[-1], 0, 1)
    stack: list[_Scope] = [module_scope]
    children: dict[str, set[str]] = {module_qn: module_scope.children}
    pending: list[_Scope] = []
    pending_annotations: list[str] = []
    state = {"block_comment": False, "template": False}
    depth = 0

    def innermost_callable() -> _Scope:
        return next(
            s
            for s in reversed(stack)
            if s.kind not in ("class", "interface", "enum")
        )

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
        for arg in argtext.split(","):
            pm = _PARAM_RE.match(arg.strip()) if arg.strip() else None
            if pm and pm.group(1) not in _PRIMITIVES:
                param_types.setdefault(qn, {})[pm.group(2)] = pm.group(1)

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

        am = _ANNOT_RE.match(line)
        if am and "(" not in line[: am.start(1)]:
            pending_annotations.append(lit_line[am.start(1) - 1 :].rstrip())

        m = _IMPORT_RE.match(line)
        if m:
            is_static, target, star = m.group(1), m.group(2), m.group(3)
            if star:
                # wildcard import: record the module itself (conservative)
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
            else:
                # `import a.b.C` — in the path-derived QN scheme the class C
                # lives in module a.b.C (file C.java), so the BINDING target
                # (``callee``) is the FULL dotted path; the alias frame then
                # resolves full_qn = a.b.C + ".C" = the class entity. The
                # IMPORTS *edge* target is the class's containing package
                # a.b (reference import_processor.py:2576-2612 registers the
                # class path but the module-level dependency is on the
                # package) — it verifies against the Package node when the
                # package is internal.
                sym = target.rsplit(".", 1)[-1]
                if is_static and "." in target:
                    target, sym = target.rsplit(".", 1)
                container = (
                    target.rsplit(".", 1)[0] if "." in target else target
                )
                mentions.append(
                    {
                        "kind": "import",
                        "name": sym,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "local_name": sym,
                        "target": container,
                        "callee": target,
                    }
                )
            continue

        consumed: list[tuple[int, int]] = []
        decls: list[tuple[int, _Scope]] = []

        cm = _CLASS_RE.search(line)
        if cm:
            kw, name = cm.group(1), cm.group(2)
            kind = {"class": "class", "record": "class", "interface": "interface", "enum": "enum"}[kw]
            props = {}
            if pending_annotations:
                props["decorators"] = list(pending_annotations)
            if package_name:
                props["package"] = package_name
            parent = stack[-1] if stack[-1].kind in ("class", "interface", "enum") else innermost_callable()
            sc = push_def(kind, name, line_no, cm.start(2), parent, props or None)
            pending_annotations = []
            bases: list[str] = []
            if cm.group(4):  # extends
                bases += [
                    re.sub(r"<.*", "", b).strip()
                    for b in cm.group(4).split(",")
                ]
            if cm.group(5):  # implements
                bases += [
                    re.sub(r"<.*", "", b).strip()
                    for b in cm.group(5).split(",")
                ]
            for bi, base in enumerate(b for b in bases if b and re.fullmatch(_DOTTED, b)):
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

        in_class = stack[-1].kind in ("class", "interface", "enum") and depth == stack[-1].depth
        if not cm and in_class:
            mm = _METHOD_RE.match(line)
            if mm and mm.group(2) not in ("if", "for", "while", "switch", "catch"):
                ret_type, name = mm.group(1), mm.group(2)
                props = (
                    {"decorators": list(pending_annotations)}
                    if pending_annotations
                    else None
                )
                sc = push_def("method", name, line_no, mm.start(2), stack[-1], props)
                pending_annotations = []
                _collect_params(sc.qn, mm.group(3) or "")
                base_ret = re.sub(r"<.*", "", ret_type).strip().rstrip("[]").strip()
                if (
                    base_ret not in _PRIMITIVES
                    and base_ret not in KEYWORDS
                    and re.fullmatch(_DOTTED, base_ret)
                ):
                    return_facts.add((sc.qn, base_ret))
                decls.append((line.rfind("{"), sc))
                consumed.append((mm.start(2), mm.end(2)))
            else:
                ctm = _CTOR_DEF_RE.match(line)
                absm = _ABSTRACT_METHOD_RE.match(line)
                if ctm and ctm.group(1) == stack[-1].name:
                    sc = push_def(
                        "method", ctm.group(1), line_no, ctm.start(1), stack[-1]
                    )
                    pending_annotations = []
                    _collect_params(sc.qn, ctm.group(2) or "")
                    decls.append((line.rfind("{"), sc))
                    consumed.append((ctm.start(1), ctm.end(1)))
                elif absm and absm.group(2) not in (
                    "if", "for", "while", "switch", "catch", "return", "new",
                ):
                    # bodyless signature (interface / abstract method): a
                    # method entity with no body scope
                    sc = push_def(
                        "method", absm.group(2), line_no, absm.start(2), stack[-1]
                    )
                    pending_annotations = []
                    _collect_params(sc.qn, absm.group(3) or "")
                    base_ret = (
                        re.sub(r"<.*", "", absm.group(1)).strip().rstrip("[]").strip()
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

        # ---- brace walk with positional events (same model as jslite) ----
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
                (s.qn for s in reversed(st) if s.kind in ("class", "interface")),
                None,
            )
            qns = [
                s.qn for s in st if s.kind not in ("class", "interface", "enum")
            ]
            return caller, cls, qns

        # ---- declared-type locals (type facts) ----
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
        # `var c = new Circle();` — inferred local
        vv = re.match(
            rf"^\s*(?:final\s+)?var\s+({_ID})\s*=\s*new\s+({_DOTTED})", stripped
        )
        if vv:
            d_caller, _c, _q = _ctx_at(0)
            scope_assigns.setdefault(d_caller.qn, []).append(
                (line_no, vv.group(1), vv.group(2))
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
                continue  # header noise outside any callable
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
            # per-argument flow facts
            op = line.find("(", cm2.end(2))
            cp = _matching_paren(line, op) if op != -1 else -1
            if cp != -1:
                for ai, (_off, part) in enumerate(_split_args(line[op + 1 : cp])):
                    vm2 = _VAR_ARG_RE.match(part)
                    cm3 = _CALL_ARG_RE.match(part)
                    if vm2 and vm2.group(1) not in KEYWORDS:
                        src_kind, src = "var", vm2.group(1)
                    elif cm3 and cm3.group(1).split(".")[0] not in KEYWORDS:
                        src_kind, src = "call", cm3.group(1)
                    else:
                        continue
                    call_rows.append(
                        {
                            "kind": "argflow",
                            "parent_qn": c_caller.qn,
                            "parent_kind": c_caller.kind.capitalize(),
                            "start_line": line_no,
                            "start_col": cm2.start(2),
                            "callee": callee,
                            "target": f"arg:{ai}",
                            "name": src,
                            "local_name": src_kind,
                            "_stack": [],
                            "_cls": None,
                        }
                    )
        for chm in _CHAIN_RE.finditer(line):
            expr, meth = chm.group(1), chm.group(2)
            first = expr.split(".")[0]
            if first in KEYWORDS and first != "this":
                continue
            h_caller, h_cls, h_qns = _ctx_at(chm.start(1))
            if h_caller is module_scope:
                continue
            # implicit-this: a bare `make().x()` (or explicit `this.make()`)
            # inside class C is a call on C's own method — qualify the
            # receiver expr with the class's module-relative path so the
            # same-module rung of ``resolve_receiver_classes`` lands on the
            # method QN (Java has no free functions, reference
            # call_resolver.py:833-850 return-type chaining)
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
