"""Single-document mention extraction for Ruby.

Completes the reference's 10-language matrix. The reference covers Ruby with
its declarative ast-grep tier (``parsers/ast_grep_tier.py:1-278`` +
``ast_grep_patterns/ruby.yaml``): a BASIC structural extractor emitting
Module/Function/Class nodes and DEFINES/IMPORTS edges from four patterns —
``def self.$NAME`` / ``def $NAME`` (functions), ``class $NAME`` /
``module $NAME`` (classes), ``require $PATH`` / ``require_relative $PATH``
(imports) — with flat names and no call resolution.

This kernel emits the same shapes over the shared mention IR, upgraded to
the conventions every other tier here follows (each divergence from the
reference tier is deliberate and listed):

* nesting is tracked (``class A; def m`` → Method ``mod.A.m``) instead of
  the reference's flat ``module_qn.name`` — the shared join phase needs
  real parent QNs for DEFINES/DEFINES_METHOD containment;
* ``class Sub < Base`` emits an INHERITS mention (the ast-grep tier drops
  it; the YAML format has no slot for the superclass capture);
* ``attr_accessor :a, :b`` / ``attr_reader`` / ``attr_writer`` inside a
  class mint Method rows (getter name only — one row per symbol), the
  Ruby-idiomatic API surface the flat tier misses;
* ``require``/``require_relative`` targets go through the SHARED
  import-verification ladder (exact → project-prefixed → unique suffix,
  ``plans/resolution.py``) so an internal ``require_relative 'util'``
  verifies to its module; the reference tier marks every require external
  ("local require_relative resolution needs path handling this tier
  skips"). Unverified targets still become ExternalModule exactly like
  the reference.
* bare and dotted call sites are emitted (``helper()``, ``Obj.new``,
  ``recv.meth``) so the shared ladder can resolve same-module and
  imported-module calls; ``X.new`` is rewritten to the class QN itself
  (Ruby's ctor), matching how pylite emits ctor calls.

Module QN: file path with ``.rb`` stripped, dots joined — the reference's
``_emit_module`` (``ast_grep_tier.py:193-206``), no init special-case.
"""

from __future__ import annotations

import re

RUBY_EXTENSIONS = frozenset({"rb"})

KEYWORDS = frozenset(
    """BEGIN END alias and begin break case class def defined? do else elsif
    end ensure false for if in module next nil not or redo rescue retry
    return self super then true undef unless until when while yield require
    require_relative raise puts print p pp loop lambda proc new attr_accessor
    attr_reader attr_writer private public protected include extend""".split()
)

_ID = r"[a-z_][A-Za-z0-9_]*[?!=]?"
_CONST = r"[A-Z][A-Za-z0-9_]*"
_DOTTED_CONST = rf"{_CONST}(?:::{_CONST})*"

_REQUIRE_RE = re.compile(
    r"""^\s*(require(?:_relative)?)\s*\(?\s*['"]([\w./-]+)['"]"""
)
_CLASS_RE = re.compile(
    rf"^\s*class\s+({_DOTTED_CONST})(?:\s*<\s*({_DOTTED_CONST}))?\s*$"
)
_MODULE_RE = re.compile(rf"^\s*module\s+({_DOTTED_CONST})\s*$")
_DEF_SELF_RE = re.compile(rf"^\s*def\s+self\.({_ID})")
_DEF_RE = re.compile(rf"^\s*def\s+({_ID})")
_ATTR_RE = re.compile(r"^\s*(attr_accessor|attr_reader|attr_writer)\s+(.+)$")
_ATTR_SYM_RE = re.compile(r":([a-z_][A-Za-z0-9_]*)")
# a call: lowercase identifier followed by ( — Ruby's paren-less calls are
# indistinguishable from locals line-wise, so only parenthesised calls count
_CALL_RE = re.compile(rf"(?<![\w.:@$])({_ID})\s*\(")
_DOT_CALL_RE = re.compile(
    rf"(?<![\w.:@$])((?:{_DOTTED_CONST}|{_ID}|@{_ID})(?:\.{_ID})+)\s*\(")
# block openers that `end` closes (def/class/module handled separately)
_OPENER_RE = re.compile(
    r"^\s*(?:if|unless|while|until|case|for|begin)\b|"
    r"\bdo\s*(?:\|[^|]*\|)?\s*$"
)
_END_RE = re.compile(r"^\s*end\b")
_ASSIGN_NEW_RE = re.compile(
    rf"^\s*({_ID})\s*=\s*({_DOTTED_CONST})\.new\b"
)
# paren-less ctor (`K.new` — the idiomatic form); parenthesised `.new(`
# is caught by _DOT_CALL_RE and rewritten the same way
_NEW_NOPAREN_RE = re.compile(
    rf"(?<![\w.:@$])({_DOTTED_CONST})\.new\b(?!\s*\()"
)


def _module_qn_for(doc_id: str) -> str:
    parts = doc_id.split("/")
    stem = parts[-1]
    base = stem[: stem.rfind(".")] if "." in stem else stem
    return ".".join(parts[:-1] + [base])


def _strip_line(line: str) -> tuple[str, str]:
    """Blank comments (#) and string contents; returns (cleaned,
    literal_preserving) — the second keeps string contents for require
    paths but still drops comments."""
    out: list[str] = []
    lit: list[str] = []
    i, n = 0, len(line)
    while i < n:
        ch = line[i]
        if ch == "#" and (i == 0 or line[i - 1] != "{"):
            break
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
    """Parse one Ruby document into mention rows (shared IR)."""
    module_qn = _module_qn_for(doc_id)
    raw_lines = code_text.split("\n")
    pairs = [_strip_line(raw) for raw in raw_lines]
    lines = [p[0] for p in pairs]
    lit_lines = [p[1] for p in pairs]

    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    # class names minted in this file (for X.new ctor rewriting)
    local_consts: set[str] = set()
    call_assigns: dict[str, list[tuple[int, str, str]]] = {}
    # scope qn → names defined directly under it (defs, classes) — feeds the
    # enclosing-scope hint walk (ladder rung 2), same shape as cslite's
    children: dict[str, set[str]] = {}

    # scope stack: (kind, qn, row) — kind in module|class|function|method|block
    stack: list[tuple[str, str, dict | None]] = [("module", module_qn, None)]

    def scope():
        return stack[-1]

    def caller():
        for k, qn, _r in reversed(stack):
            if k in ("function", "method", "module"):
                return k, qn
            if k == "class":
                # code at class body scope executes at load time; attribute
                # it to the class's module like pylite does
                return "module", module_qn
        return "module", module_qn

    for idx, line in enumerate(lines):
        line_no = idx + 1
        stripped = line.strip()
        if not stripped:
            continue

        rq = _REQUIRE_RE.match(lit_lines[idx])
        if rq:
            target = rq.group(2)
            if target.endswith(".rb"):
                target = target[:-3]
            target = target.lstrip("./").replace("/", ".")
            mentions.append(
                {
                    "kind": "import",
                    "name": None,
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": rq.start(2),
                    "local_name": target.rsplit(".", 1)[-1],
                    "target": target,
                    "callee": target,
                }
            )
            continue

        pushed: tuple[str, str, dict | None] | None = None
        cm = _CLASS_RE.match(line)
        mm = _MODULE_RE.match(line) if not cm else None
        if cm or mm:
            name = (cm or mm).group(1).replace("::", ".")
            _k, parent_qn = scope()[0], scope()[1]
            parent_kind = {
                "module": "Module",
                "class": "Class",
                "function": "Function",
                "method": "Method",
                "block": None,
            }[scope()[0]]
            if parent_kind is None:
                parent_kind, parent_qn = "Module", module_qn
            qn = f"{parent_qn}.{name}"
            row = {
                # Ruby `module M` is a namespace/mixin — the reference's
                # ast-grep tier labels both class and module patterns as
                # Class (ast_grep_patterns/ruby.yaml classes:)
                "kind": "class",
                "qn": qn,
                "name": name.rsplit(".", 1)[-1],
                "parent_qn": parent_qn,
                "parent_kind": parent_kind,
                "start_line": line_no,
                "end_line": line_no,
                "start_col": line.find(name.split(".")[0].split("::")[0]),
            }
            def_rows.append(row)
            local_consts.add(name.rsplit(".", 1)[-1])
            children.setdefault(parent_qn, set()).add(row["name"])
            if cm and cm.group(2):
                base = cm.group(2).replace("::", ".")
                mentions.append(
                    {
                        "kind": "inherit",
                        "qn": qn,
                        "name": row["name"],
                        "parent_qn": parent_qn,
                        "parent_kind": parent_kind,
                        "start_line": line_no,
                        "start_col": cm.start(2),
                        "callee": base,
                        "base_index": 0,
                    }
                )
            pushed = ("class", qn, row)
        else:
            ds = _DEF_SELF_RE.match(line)
            d = _DEF_RE.match(line) if not ds else None
            if ds or d:
                name = (ds or d).group(1)
                k_here, qn_here = scope()[0], scope()[1]
                in_class = k_here == "class"
                parent_kind = {
                    "module": "Module",
                    "class": "Class",
                    "function": "Function",
                    "method": "Method",
                    "block": "Module",
                }[k_here]
                parent_qn = qn_here if k_here != "block" else module_qn
                row = {
                    "kind": "method" if in_class else "function",
                    "qn": f"{parent_qn}.{name}",
                    "name": name,
                    "parent_qn": parent_qn,
                    "parent_kind": parent_kind,
                    "start_line": line_no,
                    "end_line": line_no,
                    "start_col": (ds or d).start(1),
                }
                def_rows.append(row)
                children.setdefault(parent_qn, set()).add(name)
                pushed = (
                    "method" if in_class else "function",
                    row["qn"],
                    row,
                )
                # one-line body: `def m() = expr` endless method (3.0) or
                # `def m; x; end` — the trailing `end` on the same line
                # balances below; endless defs never push
                if re.search(r"\)\s*=", line) or re.search(
                    r"\bdef\b.*;\s*end\s*$", line
                ):
                    row["end_line"] = line_no
                    pushed = None

        am = _ATTR_RE.match(line)
        if am and scope()[0] == "class":
            cls_qn = scope()[1]
            for sym in _ATTR_SYM_RE.finditer(am.group(2)):
                def_rows.append(
                    {
                        "kind": "method",
                        "qn": f"{cls_qn}.{sym.group(1)}",
                        "name": sym.group(1),
                        "parent_qn": cls_qn,
                        "parent_kind": "Class",
                        "start_line": line_no,
                        "end_line": line_no,
                        "start_col": sym.start(1),
                    }
                )
                children.setdefault(cls_qn, set()).add(sym.group(1))

        # ---- calls (attributed to the enclosing def, incl. one just
        # pushed: its body follows) ----
        if pushed:
            attr_kind_k, attr_qn = pushed[0], pushed[1]
        else:
            attr_kind_k, attr_qn = caller()
        attr_kind = {
            "method": "Method",
            "function": "Function",
            "module": "Module",
            "class": "Module",
        }[attr_kind_k]
        consumed: list[tuple[int, int]] = []
        if pushed and pushed[2] is not None:
            consumed.append((0, len(line)))  # def/class header line: the
            # header's own tokens must not read as call sites; Ruby headers
            # carry no call expressions worth keeping
        ret_stmt = stripped.startswith("return ")
        an = _ASSIGN_NEW_RE.match(line)
        if an:
            call_assigns.setdefault(attr_qn, []).append(
                (line_no, an.group(1), an.group(2).replace("::", "."))
            )
        if not pushed and not am:
            stack_qns = [qn for _k, qn, _r in stack]
            for c in _DOT_CALL_RE.finditer(line):
                callee = c.group(1).replace("::", ".")
                first = callee.split(".")[0]
                if first in KEYWORDS or first.startswith("@"):
                    continue
                segs = callee.split(".")
                row = {
                    "kind": "call",
                    "parent_qn": attr_qn,
                    "parent_kind": attr_kind,
                    "start_line": line_no,
                    "start_col": c.start(1),
                    "callee": callee,
                    "is_ret": ret_stmt,
                    "_stack": stack_qns,
                }
                if segs[-1] == "new":
                    # ctor: X.new → call to the class itself (INSTANTIATES
                    # via the ladder's ctor arbitration, like pylite)
                    row["callee"] = ".".join(segs[:-1])
                elif len(segs) == 2 and segs[0] not in local_consts:
                    rows = [
                        a
                        for a in call_assigns.get(attr_qn, ())
                        if a[1] == segs[0] and a[0] <= line_no
                    ]
                    if rows:
                        row["recv_expr"] = rows[-1][2]
                call_rows.append(row)
            for c in _NEW_NOPAREN_RE.finditer(line):
                callee = c.group(1).replace("::", ".")
                if callee.split(".")[0] in KEYWORDS:
                    continue
                call_rows.append(
                    {
                        "kind": "call",
                        "parent_qn": attr_qn,
                        "parent_kind": attr_kind,
                        "start_line": line_no,
                        "start_col": c.start(1),
                        "callee": callee,
                        "is_ret": ret_stmt,
                        "_stack": stack_qns,
                    }
                )
            for c in _CALL_RE.finditer(line):
                callee = c.group(1)
                if callee in KEYWORDS:
                    continue
                if any(s0 <= c.start(1) < e0 for s0, e0 in consumed):
                    continue
                # skip if part of a dotted call already captured
                pre = line[: c.start(1)].rstrip()
                if pre.endswith(".") or pre.endswith("::"):
                    continue
                call_rows.append(
                    {
                        "kind": "call",
                        "parent_qn": attr_qn,
                        "parent_kind": attr_kind,
                        "start_line": line_no,
                        "start_col": c.start(1),
                        "callee": callee,
                        "is_ret": ret_stmt,
                        "_stack": stack_qns,
                    }
                )

        # ---- block balance ----
        if pushed:
            stack.append(pushed)
        elif _OPENER_RE.search(line) and not stripped.endswith("}"):
            # one-line modifiers (`x if y`) have no `end`; only statement-
            # initial keywords / trailing do-blocks open a frame
            stack.append(("block", scope()[1], None))
        if _END_RE.match(line) and len(stack) > 1:
            closed = stack.pop()
            if closed[2] is not None:
                closed[2]["end_line"] = line_no

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
    for c in call_rows:
        stack_qns = c.pop("_stack", [module_qn])
        callee = c["callee"]
        first = callee.split(".")[0]
        # enclosing-scope hint (ladder rung 2, cslite-shaped walk): a bare
        # callee or a Const-rooted path declared by an enclosing class/module
        # resolves under that scope's qn (`area()` inside a method hits the
        # sibling method; `Circle.new` inside `module Geometry` hits
        # `Geometry.Circle`)
        for sq in reversed(stack_qns[1:]):
            kids = children.get(sq)
            if kids and first in kids:
                c["enclosing_hint"] = f"{sq}.{callee}"
                break
        if "is_ret" not in c:
            c["is_ret"] = False
        mentions.append(c)
    return mentions
