"""Single-document mention extraction for Lua.

The Lua sibling kernel (reference tier: ``parsers/lua/`` — 27
``test_lua_*`` files; table-as-class model, require-binding imports) over
the shared mention IR.

Semantics mirrored:

* module QN from the file path; ``init.lua`` collapses to its directory
  (Lua's package init convention, mirroring ``__init__.py``);
* ``local x = require("a.b")`` binds local ``x`` to module ``a.b``
  (require paths are dotted already); ``require "a.b"`` without a
  binding still emits the IMPORTS edge;
* a table that receives function members is a CLASS:
  ``local M = {}`` + ``function M.f()`` / ``function M:m()`` →
  Class ``M`` with methods ``f``/``m`` (the reference's table-method
  model; ``:`` methods carry implicit self);
* ``local function f()`` / ``function f()`` → module functions;
* block structure is keyword-based (``function``/``if``/``for``/
  ``while``/``do``/``repeat`` … ``end``/``until``) — the scope stack
  tracks function frames for call attribution;
* ``setmetatable(Sub, {__index = Base})`` → Sub INHERITS Base (the Lua
  prototype-inheritance staple); ``return setmetatable(…, M)`` inside
  ``M.new`` is a returns fact (constructor pattern), so
  ``local c = Circle.new(); c:area()`` resolves via the fn-return hop;
* ``obj:m()`` / ``obj.m()`` calls emit dotted callees; ``return M`` at
  module scope exports the table.
"""

from __future__ import annotations

import re

LUA_EXTENSIONS = frozenset({"lua"})

KEYWORDS = frozenset(
    """and break do else elseif end false for function goto if in local
    nil not or repeat return then true until while require pcall xpcall
    error assert print type pairs ipairs next select tostring tonumber
    setmetatable getmetatable rawget rawset rawequal unpack table string
    math io os coroutine debug self""".split()
)

# stdlib tables whose dotted calls must survive the noise filter: they are
# keys of the IO sink registry (plans/io_flow.py — ref io_access registry)
_SINK_ROOTS = frozenset({"io", "os"})

_ID = r"[A-Za-z_]\w*"
_DOTTED = rf"{_ID}(?:\.{_ID})*"

_REQUIRE_RE = re.compile(
    rf"""(?:local\s+({_ID})\s*=\s*)?require\s*[\(\s]\s*['"]([\w./]+)['"]"""
)
_TABLE_DECL_RE = re.compile(rf"^\s*(?:local\s+)?({_ID})\s*=\s*\{{")
_FUNC_MEMBER_RE = re.compile(
    rf"^\s*(?:local\s+)?function\s+({_ID})\s*([.:])\s*({_ID})\s*\("
)
_FUNC_PLAIN_RE = re.compile(rf"^\s*(?:local\s+)?function\s+({_ID})\s*\(")
_FUNC_ANON_ASSIGN_RE = re.compile(
    rf"^\s*(?:local\s+)?({_DOTTED})\s*=\s*function\s*\("
)
_SETMETA_INHERIT_RE = re.compile(
    rf"setmetatable\s*\(\s*({_ID})\s*,\s*\{{\s*__index\s*=\s*({_ID})"
)
# assignment form: local Sub = setmetatable({}, {__index = Base})
_SETMETA_ASSIGN_RE = re.compile(
    rf"^\s*(?:local\s+)?({_ID})\s*=\s*setmetatable\s*\(.*"
    rf"\{{\s*__index\s*=\s*({_ID})"
)
_RETURN_SETMETA_RE = re.compile(
    rf"^\s*return\s+setmetatable\s*\([^,]*,\s*({_ID})\s*\)"
)
_RETURN_EXPORT_RE = re.compile(rf"^\s*return\s+({_ID})\s*$")
_CALL_RE = re.compile(rf"(?<![\w.:])({_DOTTED})\s*\(")
_COLON_CALL_RE = re.compile(rf"(?<![\w.:])({_ID})\s*:\s*({_ID})\s*\(")
_ASSIGN_CALL_RE = re.compile(
    rf"^\s*(?:local\s+)?({_ID})\s*=\s*({_DOTTED})\s*\("
)
# block keywords: what opens a scope that `end` closes
_OPENERS_RE = re.compile(
    r"\b(function|if|for|while|do|repeat)\b|\b(end|until)\b"
)


def _module_qn_for(doc_id: str) -> str:
    parts = doc_id.split("/")
    stem = parts[-1]
    base = stem[: stem.rfind(".")] if "." in stem else stem
    if base == "init":
        return ".".join(parts[:-1])
    return ".".join(parts[:-1] + [base])


def _strip_line(line: str, state: dict) -> tuple[str, str]:
    """Blank strings/comments: ``--`` line comments, ``--[[ ]]`` block
    comments, ``[[ ]]`` long strings (both multi-line), quoted strings.
    Returns (cleaned, literal_preserving) — the second keeps string
    CONTENTS (require paths live inside them) but still blanks comments."""
    out: list[str] = []
    lit: list[str] = []
    i, n = 0, len(line)
    while i < n:
        if state.get("long_comment") or state.get("long_string"):
            is_str = state.get("long_string")
            end = line.find("]]", i)
            if end == -1:
                out.append(" " * (n - i))
                lit.append(line[i:] if is_str else " " * (n - i))
                i = n
                break
            out.append(" " * (end + 2 - i))
            lit.append(
                line[i : end + 2] if is_str else " " * (end + 2 - i)
            )
            i = end + 2
            state["long_comment"] = state["long_string"] = False
            continue
        ch = line[i]
        if ch == "-" and line[i : i + 4] == "--[[":
            state["long_comment"] = True
            out.append("    ")
            lit.append("    ")
            i += 4
            continue
        if ch == "-" and line[i : i + 2] == "--":
            break
        if line[i : i + 2] == "[[":
            state["long_string"] = True
            out.append("  ")
            lit.append("  ")
            i += 2
            continue
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if line[j] == "\\":
                    j += 2
                    continue
                if line[j] == ch:
                    break
                j += 1
            if j >= n:
                out.append(" " * (n - i))
                lit.append(line[i:])
                break
            out.append(ch + " " * (j - i - 1) + ch)
            lit.append(line[i : j + 1])
            i = j + 1
            continue
        out.append(ch)
        lit.append(ch)
        i += 1
    return "".join(out), "".join(lit)


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one Lua document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    raw_lines = code_text.split("\n")
    state: dict = {}
    pairs = [_strip_line(raw, state) for raw in raw_lines]
    lines = [p[0] for p in pairs]
    lit_lines = [p[1] for p in pairs]

    # pass 1: table declarations (class candidates) — a table only becomes
    # a Class once a function member attaches to it
    tables: dict[str, int] = {}
    for idx, line in enumerate(lines):
        tm = _TABLE_DECL_RE.match(line)
        if tm and tm.group(1) not in KEYWORDS:
            tables.setdefault(tm.group(1), idx + 1)

    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    classes_minted: dict[str, dict] = {}
    return_facts: set[tuple[str, str]] = set()
    call_assigns: dict[str, list[tuple[int, str, str]]] = {}
    requires: dict[str, str] = {}

    # scope stack: (kind, qn, name, row) — "block" frames only balance ends
    stack: list[tuple[str, str, str, dict | None]] = [
        ("module", module_qn, module_qn.rsplit(".", 1)[-1], None)
    ]

    def caller():
        for k, qn, _n, _r in reversed(stack):
            if k in ("function", "method", "module"):
                return k, qn
        return "module", module_qn

    def mint_class(tname: str, line_no: int) -> dict:
        if tname not in classes_minted:
            row = {
                "kind": "class",
                "qn": f"{module_qn}.{tname}",
                "name": tname,
                "parent_qn": module_qn,
                "parent_kind": "Module",
                "start_line": tables.get(tname, line_no),
                "end_line": line_no,
                "start_col": 0,
            }
            def_rows.append(row)
            classes_minted[tname] = row
        return classes_minted[tname]

    for idx, line in enumerate(lines):
        line_no = idx + 1
        stripped = line.strip()
        if not stripped:
            continue

        # require paths live inside string literals — match the
        # literal-preserving line
        for rq in _REQUIRE_RE.finditer(lit_lines[idx]):
            local, target = rq.group(1), rq.group(2).replace("/", ".")
            local_name = local or target.rsplit(".", 1)[-1]
            if local:
                requires[local] = target
            mentions.append(
                {
                    "kind": "import",
                    "name": None,
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": rq.start(),
                    "local_name": local_name,
                    "target": target,
                    "callee": target,
                }
            )

    # reset for the structural pass (requires collected first so calls
    # through require-bound locals resolve even before their line)
    for idx, line in enumerate(lines):
        line_no = idx + 1
        stripped = line.strip()
        if not stripped:
            continue

        pushed_def: dict | None = None
        fm = _FUNC_MEMBER_RE.match(line)
        fp = _FUNC_PLAIN_RE.match(line) if not fm else None
        fa = _FUNC_ANON_ASSIGN_RE.match(line) if not fm and not fp else None
        if fm and fm.group(1) not in KEYWORDS:
            tname, _sep, mname = fm.group(1), fm.group(2), fm.group(3)
            cls_row = mint_class(tname, line_no)
            row = {
                "kind": "method",
                "qn": f"{module_qn}.{tname}.{mname}",
                "name": mname,
                "parent_qn": cls_row["qn"],
                "parent_kind": "Class",
                "start_line": line_no,
                "end_line": line_no,
                "start_col": fm.start(3),
            }
            def_rows.append(row)
            pushed_def = ("method", row["qn"], mname, row)
        elif fp and fp.group(1) not in KEYWORDS:
            _k, parent_qn = caller()
            row = {
                "kind": "function",
                "qn": f"{parent_qn}.{fp.group(1)}",
                "name": fp.group(1),
                "parent_qn": parent_qn,
                "parent_kind": "Module" if _k == "module" else "Function",
                "start_line": line_no,
                "end_line": line_no,
                "start_col": fp.start(1),
            }
            def_rows.append(row)
            pushed_def = ("function", row["qn"], fp.group(1), row)
        elif fa and fa.group(1).split(".")[0] not in KEYWORDS:
            target = fa.group(1)
            if "." in target:
                tname, mname = target.rsplit(".", 1)
                if "." not in tname:
                    cls_row = mint_class(tname, line_no)
                    row = {
                        "kind": "method",
                        "qn": f"{module_qn}.{tname}.{mname}",
                        "name": mname,
                        "parent_qn": cls_row["qn"],
                        "parent_kind": "Class",
                        "start_line": line_no,
                        "end_line": line_no,
                        "start_col": fa.start(1),
                    }
                    def_rows.append(row)
                    pushed_def = ("method", row["qn"], mname, row)
            else:
                _k, parent_qn = caller()
                row = {
                    "kind": "function",
                    "qn": f"{parent_qn}.{target}",
                    "name": target,
                    "parent_qn": parent_qn,
                    "parent_kind": "Module" if _k == "module" else "Function",
                    "start_line": line_no,
                    "end_line": line_no,
                    "start_col": fa.start(1),
                }
                def_rows.append(row)
                pushed_def = ("function", row["qn"], target, row)

        # inheritance: setmetatable(Sub, {__index = Base}) or
        # Sub = setmetatable({}, {__index = Base})
        inh_hits = [
            (im.group(1), im.group(2), im.start(1))
            for im in _SETMETA_INHERIT_RE.finditer(line)
        ]
        am = _SETMETA_ASSIGN_RE.match(line)
        if am:
            inh_hits.append((am.group(1), am.group(2), am.start(1)))
        for sub, base, col in inh_hits:
            if sub != base and sub not in KEYWORDS and base not in KEYWORDS:
                cls_row = mint_class(sub, line_no)
                mentions.append(
                    {
                        "kind": "inherit",
                        "qn": cls_row["qn"],
                        "name": sub,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": col,
                        "callee": base,
                        "base_index": 0,
                    }
                )

        # constructor pattern: return setmetatable({...}, M) inside M.new
        rs = _RETURN_SETMETA_RE.match(stripped)
        if rs:
            k, qn = caller()
            if k in ("function", "method"):
                return_facts.add((qn, rs.group(1)))

        # module export: `return M` at module scope
        re_m = _RETURN_EXPORT_RE.match(stripped)
        if re_m and caller()[0] == "module" and re_m.group(1) not in KEYWORDS:
            mentions.append(
                {
                    "kind": "export",
                    "name": re_m.group(1),
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": 0,
                }
            )
            # Module-system labels (ref constants/graph.py:100-101,156-157;
            # semantics from cpp_modules.py applied to Lua's return-table
            # convention): the returned table is the module's declared
            # interface, and the defining file is simultaneously its
            # implementation unit — one `return M` therefore yields both a
            # module_interface and a module_impl mention. Interface QN is
            # `<module_qn>::<table>` (unlike C++, Lua table names are not
            # globally unique, so the requireable path namespaces the key).
            iface = f"{module_qn}::{re_m.group(1)}"
            for mk in ("module_interface", "module_impl"):
                mentions.append(
                    {
                        "kind": mk,
                        "name": re_m.group(1),
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "target": iface,
                    }
                )

        # ---- calls ----
        k_now, caller_qn = caller()
        if pushed_def:
            attr_qn = pushed_def[1]
            attr_kind = "Method" if pushed_def[0] == "method" else "Function"
        else:
            attr_qn = caller_qn
            attr_kind = {
                "method": "Method",
                "function": "Function",
                "module": "Module",
            }[k_now]
        # a def header's own name must not read as a call site
        consumed: list[tuple[int, int]] = []
        for dm in (fm, fp, fa):
            if dm:
                consumed.append((dm.start(), dm.end()))
        ret_stmt = stripped.startswith("return ")
        ac = _ASSIGN_CALL_RE.match(stripped)
        if ac and ac.group(2).split(".")[0] not in KEYWORDS:
            call_assigns.setdefault(attr_qn, []).append(
                (line_no, ac.group(1), ac.group(2))
            )
        for cm in _CALL_RE.finditer(line):
            callee = cm.group(1)
            first = callee.split(".")[0]
            # stdlib tables are call-noise EXCEPT the io/os sink roots,
            # whose dotted members feed the READS_FROM/WRITES_TO registry
            # join (plans/io_flow.py); bare builtins stay suppressed
            suppressed = first in KEYWORDS and not (
                "." in callee and first in _SINK_ROOTS
            )
            if suppressed or any(
                s0 <= cm.start(1) < e0 for s0, e0 in consumed
            ):
                continue
            # require-bound locals rewrite to their module path downstream
            # via the alias frame (local_name binding) — emit as written
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": attr_qn,
                    "parent_kind": attr_kind,
                    "start_line": line_no,
                    "start_col": cm.start(1),
                    "callee": callee,
                    "is_ret": ret_stmt,
                    "_caller_qn": attr_qn,
                }
            )
        for cc in _COLON_CALL_RE.finditer(line):
            recv, meth = cc.group(1), cc.group(2)
            if (recv in KEYWORDS and recv != "self") or any(
                s0 <= cc.start(1) < e0 for s0, e0 in consumed
            ):
                continue
            row = {
                "kind": "call",
                "parent_qn": attr_qn,
                "parent_kind": attr_kind,
                "start_line": line_no,
                "start_col": cc.start(1),
                "callee": f"{recv}.{meth}",
                "is_ret": ret_stmt,
                "_caller_qn": attr_qn,
            }
            if recv == "self":
                # implicit-self dispatch: class context from the enclosing
                # method's own class
                encl = row["parent_qn"]
                if encl.count(".") >= 2:
                    cls_qn = encl.rsplit(".", 1)[0]
                    row["class_ctx_hint"] = f"{cls_qn}.{meth}"
            elif recv in tables or recv in classes_minted:
                row["recv_expr"] = recv
            call_rows.append(row)

        # ---- keyword block walk (after emission: defs on this line push
        # before their body, ends pop) ----
        if pushed_def:
            stack.append(pushed_def)
        for bm in _OPENERS_RE.finditer(line):
            if bm.group(1):
                if bm.group(1) == "function" and pushed_def:
                    pushed_def = None  # the def's own `function` keyword
                    continue
                if bm.group(1) == "function":
                    stack.append(("block", caller()[1], "fn", None))
                elif bm.group(1) in ("if", "for", "while", "do", "repeat"):
                    # `do` that terminates for/while headers double-counts;
                    # treat for/while as openers and skip their `do`
                    if bm.group(1) == "do" and re.search(
                        r"\b(for|while)\b", line[: bm.start()]
                    ):
                        continue
                    stack.append(("block", caller()[1], bm.group(1), None))
            else:
                if len(stack) > 1:
                    closed = stack.pop()
                    if closed[3] is not None:
                        closed[3]["end_line"] = line_no

    mentions.insert(
        0,
        {
            "kind": "module",
            "qn": module_qn,
            "name": module_qn.rsplit(".", 1)[-1],
            "parent_qn": None,
            "parent_kind": None,
            "start_line": 1,
            "end_line": len(raw_lines),
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

    for c in call_rows:
        caller_qn = c.pop("_caller_qn", None)
        callee = c["callee"]
        segs = callee.split(".")
        if (
            len(segs) == 2
            and "recv_expr" not in c
            and "class_ctx_hint" not in c
            and segs[0] not in tables
            and segs[0] not in requires
        ):
            # receiver bound from a call: local c = Circle.new() → the
            # fn-return hop types c
            rows = [
                a
                for a in call_assigns.get(caller_qn or "", ())
                if a[1] == segs[0] and a[0] <= c["start_line"]
            ]
            if rows:
                c["recv_expr"] = rows[-1][2]
        if "is_ret" not in c:
            c["is_ret"] = False
        mentions.append(c)

    return mentions
