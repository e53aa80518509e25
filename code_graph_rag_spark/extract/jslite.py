"""Single-document mention extraction for JavaScript / TypeScript.

The JS/TS sibling of ``pylite.py``: a pure-Python, Spark-free per-document
kernel emitting the SAME mention IR (``schema.MENTIONS_SCHEMA``), so the
entire downstream join phase (alias frame, resolution ladder, inheritance
closure, overrides, spans, triples) is reused unchanged — the reference
implements this tier as ``codebase_rag/parsers/js_ts/`` (tree-sitter
queries + per-language processors); here the per-file facts come from a
brace-scope scanner and the cross-file facts stay DataFrame joins.

Semantics mirrored (reference citations):

* module QN ``project.rel.path`` with ``index.ts``/``index.js`` collapsing
  to the directory (``definition_processor.py:312-319``);
* function declarations, variable-bound function/arrow expressions named by
  their binding (``parsers/js_ts/function_ingest`` — the
  ``const f = () => …`` naming rule, function_ingest.py:1160-1187);
* anonymous function/arrow expressions named ``lambda_<line>_<col>``
  (same naming scheme as the Python tier);
* classes, ``extends`` → INHERITS mention (base_index 0), class-body
  methods (incl. ``async``/``static``/``get``/``set`` modifiers),
  ``constructor`` kept as a method;
* ESM imports (default / named / namespace / bare side-effect) and CJS
  ``require`` bindings, with relative specifiers (``./x``, ``../y``)
  resolved against the importing module's directory into dotted QNs
  (``parsers/js_ts/import_processor`` relative-path semantics);
* ``export``-prefixed declarations and ``export {a, b}`` lists →
  ``export`` mentions (EXPORTS edges);
* calls + ``new Ctor()`` (the ctor call resolves to a Class downstream →
  INSTANTIATES, like Python); ``this.m()`` → class-context hint;
  ``super.m()`` → super hint (``call_resolver.py`` rungs);
* TS extras: ``interface``/``enum`` declarations, annotated params
  (``a: Shape``) and return annotations (``): Shape {``) as type-inference
  facts, ``implements`` clauses → inherit mentions flagged implements.
"""

from __future__ import annotations

import json
import re

JS_EXTENSIONS = frozenset({"js", "jsx", "mjs", "cjs", "ts", "tsx"})

KEYWORDS = frozenset(
    """var let const function class return if else for while do switch case
    break continue new delete typeof instanceof in of this super import
    export from default async await yield try catch finally throw void
    extends implements interface enum type static get set public private
    protected readonly abstract declare namespace module require true false
    null undefined constructor""".split()
)

_ID = r"[A-Za-z_$][\w$]*"
_DOTTED = rf"{_ID}(?:\.{_ID})*"

_FUNC_DECL_RE = re.compile(rf"(?:^|\b)(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*({_ID})\s*\(")
_VAR_FUNC_RE = re.compile(
    rf"(?:^|\b)(?:export\s+)?(?:var|let|const)\s+({_ID})\s*(?::[^=]+)?=\s*"
    rf"(?:async\s+)?(?:function\s*\*?\s*\(|\(?[\w$,{{}}\s:\[\]\.]*\)?\s*=>)"
)
_CLASS_RE = re.compile(
    rf"(?:^|\b)(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+({_ID})"
    rf"(?:\s+extends\s+({_DOTTED}))?(?:\s+implements\s+([\w$.,\s]+?))?\s*\{{"
)
_IFACE_RE = re.compile(
    rf"(?:^|\b)(?:export\s+)?interface\s+({_ID})(?:\s+extends\s+([\w$.,\s]+?))?\s*\{{"
)
_ENUM_RE = re.compile(rf"(?:^|\b)(?:export\s+)?(?:const\s+)?enum\s+({_ID})\s*\{{")
_METHOD_RE = re.compile(
    rf"^\s*(?:public\s+|private\s+|protected\s+|static\s+|readonly\s+|abstract\s+"
    rf"|async\s+|get\s+|set\s+|\*\s*)*({_ID})\s*(?:<[^>()]*>)?\s*\(([^;]*?)\)"
    rf"\s*(?::\s*([\w$.\[\]<>, |]+?))?\s*\{{"
)
_ARROW_ANON_RE = re.compile(r"(?:\(|,|=>|return\s|^)\s*(?:async\s+)?\([\w$,\s{}\[\]:\.]*\)\s*=>")
_IMPORT_ESM_RE = re.compile(r"^\s*import\s+(.+?)\s+from\s+['\"]([^'\"]+)['\"]")
_IMPORT_BARE_RE = re.compile(r"^\s*import\s+['\"]([^'\"]+)['\"]")
_REQUIRE_RE = re.compile(
    rf"(?:var|let|const)\s+(\{{[^}}]*\}}|{_ID})\s*=\s*require\s*\(\s*['\"]([^'\"]+)['\"]\s*\)"
)
_EXPORT_LIST_RE = re.compile(r"^\s*export\s*\{([^}]*)\}")
_EXPORT_DECL_RE = re.compile(
    rf"^\s*export\s+(?:default\s+)?(?:async\s+)?"
    rf"(?:function\s*\*?\s*|class\s+|const\s+|let\s+|var\s+|interface\s+|enum\s+)({_ID})"
)
_MODULE_EXPORTS_RE = re.compile(rf"module\s*\.\s*exports\s*(?:\.\s*({_ID})\s*)?=")
_EXPORTS_OBJ_RE = re.compile(r"module\s*\.\s*exports\s*=\s*\{([^}]*)\}")
# CommonJS member/direct exports (reference parsers/js_ts/module_system.py
# `_ingest_commonjs_exports` + `_ingest_direct_module_export`, the
# export_detection.py CJS markers): `exports.foo = ...` /
# `module.exports.foo = ...` export `foo` (and, when the RHS is a bare
# identifier, that local too); `module.exports = f` exports the identifier.
# All forms obey the statement-block stop rule — an assignment inside a
# function body runs when that function runs, not at module load
# (`_is_export_inside_function`), so only module-scope statements count.
_EXPORTS_MEMBER_RE = re.compile(
    rf"^\s*(?:module\s*\.\s*)?exports\s*\.\s*({_ID})\s*=\s*(?:({_ID})\s*;?\s*$)?"
)
_MODULE_EXPORTS_IDENT_RE = re.compile(
    rf"^\s*module\s*\.\s*exports\s*=\s*({_ID})\s*;?\s*$"
)
_EXPORTS_FUNC_RE = re.compile(
    rf"^\s*(?:module\s*\.\s*)?exports\s*\.\s*({_ID})\s*=\s*"
    rf"(?:async\s+)?(?:function\s*\*?\s*\(|\(?[\w$,{{}}\s:\[\]\.]*\)?\s*=>)"
)
_CALL_RE = re.compile(rf"(?<![\w$.])(new\s+)?({_DOTTED})\s*(?:<[^>()]*>)?\s*\(")
_CHAIN_RE = re.compile(rf"(?<![\w$.])({_DOTTED})\s*\([^()]*\)\s*\.\s*({_ID})\s*\(")
_SUPER_RE = re.compile(rf"(?<![\w$.])super\s*\.\s*({_ID})\s*\(")
_ASSIGN_CTOR_RE = re.compile(
    rf"(?:var|let|const)\s+({_ID})\s*(?::[^=]+)?=\s*new\s+({_DOTTED})\s*[(<]"
)
_PARAM_ANN_RE = re.compile(rf"^\s*(?:\.\.\.)?({_ID})\s*\??\s*:\s*({_DOTTED})")
_RETURN_NEW_RE = re.compile(rf"(?<![\w$.])return\s+new\s+({_DOTTED})\s*[(<]")
_RETURN_CALL_RE = re.compile(rf"^\s*return\s+(?:await\s+)?(new\s+)?({_DOTTED})\s*\(")
_DECOR_RE = re.compile(rf"^\s*@({_DOTTED})")
_IDENT_RE = re.compile(rf"(?<![\w$.])({_ID})\b")
_ASSIGN_CALL_RE = re.compile(
    rf"(?:var|let|const)\s+({_ID})\s*(?::[^=]+)?=\s*(?:await\s+)?({_DOTTED})\s*\("
)
# Express-style mount: app.use('/prefix', router)
_MOUNT_RE = re.compile(
    rf"(?<![\w$.]){_ID}\s*\.\s*use\s*\(\s*['\"](/[^'\"]*)['\"]\s*,\s*({_ID})\s*\)"
)
_VAR_ARG_RE = re.compile(rf"^\s*({_ID})\s*$")
_CALL_ARG_RE = re.compile(rf"^\s*(?:await\s+)?(?:new\s+)?({_DOTTED})\s*\(")
# Express-style route-call registration: app.get('/p', handler) — the
# second arg must LOOK like a handler (identifier / function / arrow), so
# a client request with a config object (axios.get('/u', {..})) is never
# a route (reference endpoint_routes.py server-registration evidence gate)
_ROUTE_CALL_RE = re.compile(
    rf"(?<![\w$.])({_ID})\s*\.\s*"
    r"(get|post|put|patch|delete|options|head|all)\s*\(\s*"
    rf"['\"`](/[^'\"`]*)['\"`]\s*,\s*(?:(?:async\s+)?(?:function\b|\()|({_ID}))"
)


def _matching_paren(line: str, open_pos: int) -> int:
    d, i, n = 0, open_pos, len(line)
    while i < n:
        if line[i] == "(":
            d += 1
        elif line[i] == ")":
            d -= 1
            if d == 0:
                return i
        i += 1
    return -1


def _split_args(argtext: str) -> list[tuple[int, str]]:
    """Top-level comma split of an argument list → [(offset, part)]."""
    parts: list[tuple[int, str]] = []
    d = 0
    start = 0
    for i, ch in enumerate(argtext):
        if ch in "([{":
            d += 1
        elif ch in ")]}":
            d -= 1
        elif ch == "," and d == 0:
            parts.append((start, argtext[start:i]))
            start = i + 1
    if argtext[start:].strip():
        parts.append((start, argtext[start:]))
    return parts


def _module_qn_for(doc_id: str) -> str:
    parts = doc_id.split("/")
    stem = parts[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    if base in ("index", "mod", "__init__"):
        qn_parts = parts[:-1]
    else:
        qn_parts = parts[:-1] + [base]
    return ".".join(qn_parts)


def resolve_specifier(spec: str, doc_id: str) -> str:
    """An import specifier → dotted module QN (relative specifiers anchored
    at the importing file's directory; bare specifiers stay as written —
    external packages, suppressed downstream like ``numpy``)."""
    if not spec.startswith("."):
        return spec.replace("/", ".")
    dir_parts = doc_id.split("/")[:-1]
    segs = spec.split("/")
    for s in segs:
        if s in (".", ""):
            continue
        if s == "..":
            if len(dir_parts) > 1:
                dir_parts = dir_parts[:-1]
        else:
            dir_parts = dir_parts + [s]
    # strip a trailing extension from the final segment (./util.js)
    if dir_parts and "." in dir_parts[-1]:
        base, ext = dir_parts[-1].rsplit(".", 1)
        if ext in JS_EXTENSIONS and base:
            dir_parts = dir_parts[:-1] + [base]
    # an explicit /index target collapses to its directory, matching
    # module_qn_for's index-file rule
    if dir_parts and dir_parts[-1] == "index":
        dir_parts = dir_parts[:-1]
    return ".".join(dir_parts)


def _strip_line(
    line: str, state: dict
) -> tuple[str, str]:
    """Blank strings/comments in one line, carrying multi-line state
    (block comments, template literals). Returns (cleaned,
    literal_preserving) of equal length."""
    out: list[str] = []
    lit: list[str] = []
    i, n = 0, len(line)
    while i < n:
        if state["block_comment"]:
            end = line.find("*/", i)
            if end == -1:
                out.append(" " * (n - i))
                lit.append(" " * (n - i))
                i = n
                break
            out.append(" " * (end + 2 - i))
            lit.append(" " * (end + 2 - i))
            i = end + 2
            state["block_comment"] = False
            continue
        if state["template"]:
            # inside a template literal: blank until an unescaped backtick
            j = i
            while j < n:
                if line[j] == "\\":
                    j += 2
                    continue
                if line[j] == "`":
                    break
                j += 1
            if j >= n:
                out.append(" " * (n - i))
                lit.append(line[i:])
                i = n
                break
            out.append(" " * (j - i) + "`")
            lit.append(line[i:j] + "`")
            i = j + 1
            state["template"] = False
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
                i = n
                break
            out.append(ch + " " * (j - i - 1) + ch)
            lit.append(line[i : j + 1])
            i = j + 1
            continue
        if ch == "`":
            state["template"] = True
            out.append("`")
            lit.append("`")
            i += 1
            continue
        out.append(ch)
        lit.append(ch)
        i += 1
    return "".join(out), "".join(lit)


class _Scope:
    __slots__ = ("kind", "qn", "name", "depth", "start_line", "row", "children")

    def __init__(self, kind, qn, name, depth, start_line, row=None):
        self.kind = kind  # module | class | interface | enum | function | method
        self.qn = qn
        self.name = name
        self.depth = depth  # brace depth of the scope BODY interior
        self.start_line = start_line
        self.row = row  # definition mention to patch end_line on close
        self.children: set[str] = set()


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one JS/TS document into mention rows (same IR as pylite)."""
    module_qn = _module_qn_for(doc_id)
    lines = code_text.split("\n")
    mentions: list[dict] = []
    def_rows: list[dict] = []
    call_rows: list[dict] = []
    export_names: set[tuple[str, int]] = set()
    # type-inference facts
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    param_types: dict[str, dict[str, str]] = {}
    return_facts: set[tuple[str, str]] = set()

    module_scope = _Scope("module", module_qn, module_qn.rsplit(".", 1)[-1], 0, 1)
    stack: list[_Scope] = [module_scope]
    children: dict[str, set[str]] = {module_qn: module_scope.children}
    # scopes awaiting their opening '{' (declaration seen, body not yet)
    pending: list[_Scope] = []
    pending_decorators: list[str] = []
    state = {"block_comment": False, "template": False}
    depth = 0

    def innermost_callable() -> _Scope:
        return next(
            s for s in reversed(stack) if s.kind not in ("class", "interface", "enum")
        )

    def innermost_class() -> str | None:
        return next(
            (s.qn for s in reversed(stack) if s.kind in ("class", "interface")), None
        )

    def push_def(kind, name, line_no, col, props=None) -> _Scope:
        parent = (
            stack[-1]
            if kind == "method"
            else innermost_callable()
        )
        qn = f"{parent.qn}.{name}"
        # class-like parents all report "Class" (pylite convention — the
        # DEFINES_METHOD split keys on it)
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

    for idx, raw in enumerate(lines):
        line_no = idx + 1
        line, lit_line = _strip_line(raw, state)
        stripped = line.strip()
        if not stripped:
            continue

        dm = _DECOR_RE.match(line)
        if dm and "(" not in line[: dm.start(1)]:
            pending_decorators.append(dm.group(1))

        consumed: list[tuple[int, int]] = []  # spans claimed by declarations

        # ---- imports (matched on the literal-preserving line: specifiers
        # are string literals, blanked in `line`) ----
        m = _IMPORT_ESM_RE.match(lit_line)
        if m:
            clause, spec = m.group(1), m.group(2)
            target = resolve_specifier(spec, doc_id)
            binds: list[tuple[str, str | None]] = []  # (local, symbol)
            clause = clause.strip()
            star = re.match(rf"\*\s+as\s+({_ID})", clause)
            if star:
                binds.append((star.group(1), None))
            else:
                named = re.search(r"\{([^}]*)\}", clause)
                head = clause.split("{")[0].strip().rstrip(",").strip()
                if head and re.fullmatch(_ID, head):
                    binds.append((head, "default"))
                if named:
                    for part in named.group(1).split(","):
                        part = part.strip()
                        if not part:
                            continue
                        if " as " in part:
                            sym, local = (x.strip() for x in part.split(" as ", 1))
                        else:
                            sym = local = part
                        if re.fullmatch(_ID, local):
                            binds.append((local, sym))
            for local, sym in binds:
                mentions.append(
                    {
                        "kind": "import",
                        "name": sym if sym not in (None, "default") else None,
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
        m = _IMPORT_BARE_RE.match(lit_line)
        if m:
            target = resolve_specifier(m.group(1), doc_id)
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
        for m in _REQUIRE_RE.finditer(lit_line):
            binding, spec = m.group(1), m.group(2)
            target = resolve_specifier(spec, doc_id)
            if binding.startswith("{"):
                for part in binding.strip("{}").split(","):
                    part = part.strip()
                    if not part:
                        continue
                    if ":" in part:  # const {a: b} = require(...)
                        sym, local = (x.strip() for x in part.split(":", 1))
                    else:
                        sym = local = part
                    if re.fullmatch(_ID, local):
                        mentions.append(
                            {
                                "kind": "import",
                                "name": sym,
                                "parent_qn": module_qn,
                                "parent_kind": "Module",
                                "start_line": line_no,
                                "start_col": 0,
                                "local_name": local,
                                "target": target,
                                "callee": target,
                            }
                        )
            else:
                mentions.append(
                    {
                        "kind": "import",
                        "name": None,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": 0,
                        "local_name": binding,
                        "target": target,
                        "callee": target,
                    }
                )
            consumed.append((m.start(), m.end()))

        # ---- exports ----
        em = _EXPORT_LIST_RE.match(line)
        if em and "from" not in line:
            for part in em.group(1).split(","):
                part = part.strip()
                if not part:
                    continue
                name = part.split(" as ")[0].strip()
                if re.fullmatch(_ID, name):
                    export_names.add((name, line_no))
            continue
        em = _EXPORT_DECL_RE.match(line)
        if em:
            export_names.add((em.group(1), line_no))
        # ---- CommonJS exports (module-scope statements only: the
        # statement-block stop rule — reference module_system.py
        # `_is_export_inside_function`) ----
        if innermost_callable().kind == "module":
            em = _EXPORTS_OBJ_RE.search(line)
            if em:
                for part in em.group(1).split(","):
                    part = part.strip()
                    if not part:
                        continue
                    # `{foo}` exports foo; `{name: localFn}` makes the
                    # VALUE's local declaration reachable (the reference
                    # export-specifier rule: the local name counts)
                    name = (
                        part.split(":")[1] if ":" in part else part
                    ).strip()
                    if re.fullmatch(_ID, name or ""):
                        export_names.add((name, line_no))
            else:
                em = _MODULE_EXPORTS_IDENT_RE.match(line)
                if em:
                    export_names.add((em.group(1), line_no))
                em = _EXPORTS_MEMBER_RE.match(line)
                if em:
                    export_names.add((em.group(1), line_no))
                    if em.group(2):
                        export_names.add((em.group(2), line_no))

        # ---- declarations (scope-opening) ----
        decls: list[tuple[int, _Scope]] = []

        cm = _CLASS_RE.search(line)
        if cm:
            name = cm.group(1)
            props = (
                {"decorators": list(pending_decorators)}
                if pending_decorators
                else None
            )
            sc = push_def("class", name, line_no, cm.start(1), props)
            pending_decorators = []
            bases: list[tuple[str, int]] = []
            if cm.group(2):
                bases.append((cm.group(2), 0))
            if cm.group(3):
                for bi, b in enumerate(x.strip() for x in cm.group(3).split(",")):
                    if b and re.fullmatch(_DOTTED, b):
                        bases.append((b, len(bases)))
            parent_qn = sc.row["parent_qn"]
            for base, bi in bases:
                mentions.append(
                    {
                        "kind": "inherit",
                        "qn": sc.qn,
                        "name": name,
                        "parent_qn": parent_qn,
                        "parent_kind": sc.row["parent_kind"],
                        "start_line": line_no,
                        "start_col": cm.start(1),
                        "callee": base,
                        "base_index": bi,
                    }
                )
            decls.append((line.find("{", cm.end(1)), sc))
            consumed.append((cm.start(), cm.end()))
        else:
            im_ = _IFACE_RE.search(line)
            if im_:
                sc = push_def("interface", im_.group(1), line_no, im_.start(1))
                if im_.group(2):
                    for bi, b in enumerate(
                        x.strip() for x in im_.group(2).split(",")
                    ):
                        if b and re.fullmatch(_DOTTED, b):
                            mentions.append(
                                {
                                    "kind": "inherit",
                                    "qn": sc.qn,
                                    "name": im_.group(1),
                                    "parent_qn": sc.row["parent_qn"],
                                    "parent_kind": sc.row["parent_kind"],
                                    "start_line": line_no,
                                    "start_col": im_.start(1),
                                    "callee": b,
                                    "base_index": bi,
                                }
                            )
                decls.append((line.find("{", im_.end(1)), sc))
                consumed.append((im_.start(), im_.end()))
            else:
                en = _ENUM_RE.search(line)
                if en:
                    sc = push_def("enum", en.group(1), line_no, en.start(1))
                    decls.append((line.find("{", en.end(1)), sc))
                    consumed.append((en.start(), en.end()))

        fm = _FUNC_DECL_RE.search(line)
        if fm and not any(s <= fm.start(1) < e for s, e in consumed):
            props = (
                {"decorators": list(pending_decorators)}
                if pending_decorators
                else None
            )
            sc = push_def("function", fm.group(1), line_no, fm.start(1), props)
            pending_decorators = []
            decls.append((line.find("{", fm.end()), sc))
            consumed.append((fm.start(), fm.end(1)))
            _collect_annotations(line, fm.end(1), sc.qn, param_types, return_facts)

        # CJS member-function export: `exports.foo = function (...)` /
        # `module.exports.bar = async () =>` mints a module function named
        # by the member (reference module_system.py `_ingest_export_function`
        # names the anonymous assigned function by its export name)
        xm = _EXPORTS_FUNC_RE.match(line)
        if xm and innermost_callable().kind == "module":
            sc = push_def("function", xm.group(1), line_no, xm.start(1))
            body = line.find("{", xm.end() - 1)
            arrow = line.find("=>", xm.end() - 2)
            if arrow != -1 and (body == -1 or body < arrow):
                body = line.find("{", arrow)
            decls.append((body, sc))
            consumed.append((xm.start(), xm.end(1)))

        vm = _VAR_FUNC_RE.search(line)
        if vm and not any(s <= vm.start(1) < e for s, e in consumed):
            sc = push_def("function", vm.group(1), line_no, vm.start(1))
            body = line.find("{", vm.end() - 1)
            arrow = line.find("=>", vm.end() - 2)
            if arrow != -1 and (body == -1 or body < arrow):
                # expression-bodied arrow: no scope body — still look past
                # the arrow for a brace
                body = line.find("{", arrow)
            decls.append((body, sc))
            consumed.append((vm.start(), vm.end(1)))

        # class-body methods: only when the innermost scope is a class-like
        if (
            stack[-1].kind in ("class", "interface", "enum")
            and depth == stack[-1].depth
        ):
            mm = _METHOD_RE.match(line)
            if mm and mm.group(1) not in (
                "if", "for", "while", "switch", "catch", "return", "new",
            ):
                name = mm.group(1)
                props = (
                    {"decorators": list(pending_decorators)}
                    if pending_decorators
                    else None
                )
                sc = push_def("method", name, line_no, mm.start(1), props)
                pending_decorators = []
                decls.append((line.rfind("{"), sc))
                consumed.append((mm.start(1), mm.end(1)))
                _collect_annotations(
                    line, mm.start(2) - 1, sc.qn, param_types, return_facts
                )

        # anonymous arrows not claimed by a named binding
        for am in _ARROW_ANON_RE.finditer(line):
            if any(s <= am.start() < e for s, e in consumed):
                continue
            caller = innermost_callable()
            lname = f"lambda_{line_no}_{am.start()}"
            def_rows.append(
                {
                    "kind": "function",
                    "qn": f"{caller.qn}.{lname}",
                    "name": lname,
                    "parent_qn": caller.qn,
                    "parent_kind": caller.kind.capitalize(),
                    "start_line": line_no,
                    "end_line": line_no,
                    "start_col": am.start(),
                    "props": None,
                }
            )

        # ---- brace walk: attach pending scopes, pop closed ones; record
        # positional events so calls later on the SAME line are attributed
        # to the scope active at their position (one-line bodies:
        # ``function f() { g(); }``) ----
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
        # declarations whose '{' is on a later line
        for pos, sc in decls[di:]:
            if pos == -1:
                if sc.row is not None:
                    sc.row["end_line"] = line_no
                pending.append(sc)

        def _stack_at(p: int) -> list[_Scope]:
            st = list(line_start_stack)
            for pos, act, sc in events:
                if pos >= p:
                    break
                if act == "push":
                    st.append(sc)
                elif len(st) > 1 and st[-1] is sc:
                    st.pop()
            return st

        def _ctx_at(p: int) -> tuple[_Scope, str | None, list[str]]:
            st = _stack_at(p)
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
                s.qn
                for s in st
                if s.kind not in ("class", "interface", "enum")
            ]
            return caller, cls, qns

        # ---- calls / references / type facts ----
        caller = innermost_callable()
        cls_qn = innermost_class()
        stack_qns = [s.qn for s in stack if s.kind not in ("class", "interface", "enum")]

        _ = (caller, cls_qn, stack_qns)  # end-of-line ctx kept for clarity
        for am2 in _ASSIGN_CTOR_RE.finditer(line):
            a_caller, _c, _q = _ctx_at(am2.start())
            scope_assigns.setdefault(a_caller.qn, []).append(
                (line_no, am2.group(1), am2.group(2))
            )
        # assignment-from-call facts (taint sources for the flow pass)
        for am3 in _ASSIGN_CALL_RE.finditer(line):
            if am3.group(2).split(".")[0] in KEYWORDS:
                continue
            a_caller, _c, _q = _ctx_at(am3.start())
            op = line.find("(", am3.end() - 1)
            arg0 = None
            if op != -1:
                lm = re.match(r"\s*['\"]", line[op + 1 :])
                if lm:
                    close = line.find(line[op + 1 + lm.end() - 1], op + 1 + lm.end())
                    if close != -1:
                        arg0 = lit_line[op + 1 + lm.end() : close]
            mentions.append(
                {
                    "kind": "assign",
                    "name": am3.group(1),
                    "parent_qn": a_caller.qn,
                    "parent_kind": a_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": am3.start(1),
                    "callee": am3.group(2),
                    "arg0_lit": arg0,
                }
            )
        # Express mounts: app.use('/prefix', router)
        for mm2 in _MOUNT_RE.finditer(lit_line):
            mentions.append(
                {
                    "kind": "mount",
                    "name": mm2.group(2),
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": mm2.start(),
                    "arg0_lit": mm2.group(1),
                }
            )
        for rcm in _ROUTE_CALL_RE.finditer(lit_line):
            rc_caller, _c, _q = _ctx_at(rcm.start())
            call_rows.append(
                {
                    "kind": "route_call",
                    "name": rcm.group(4),  # None for inline handlers
                    "local_name": rcm.group(2),
                    "parent_qn": rc_caller.qn,
                    "parent_kind": rc_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": rcm.start(),
                    "callee": f"{rcm.group(1)}.{rcm.group(2)}",
                    "arg0_lit": rcm.group(3),
                    "_stack": [],
                    "_cls": None,
                }
            )

        rm = _RETURN_NEW_RE.search(line)
        if rm:
            r_caller, _c, _q = _ctx_at(rm.start())
            if r_caller.kind in ("function", "method"):
                return_facts.add((r_caller.qn, rm.group(1)))

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

        seen_spans: list[tuple[int, int]] = []
        ret_m = _RETURN_CALL_RE.match(stripped)
        ret_callee = ret_m.group(2) if ret_m else None
        for cm2 in _CALL_RE.finditer(line):
            callee = cm2.group(2)
            first = callee.split(".")[0]
            if (first in KEYWORDS and first != "this") or any(
                s <= cm2.start(2) < e for s, e in consumed
            ):
                continue
            seen_spans.append((cm2.start(2), cm2.end(2)))
            c_caller, c_cls, c_qns = _ctx_at(cm2.start(2))
            # per-argument flow facts: identifier or direct-call args only
            op = line.find("(", cm2.end(2))
            cp = _matching_paren(line, op) if op != -1 else -1
            if cp != -1:
                for ai, (off, part) in enumerate(_split_args(line[op + 1 : cp])):
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
                            "_stack": list(c_qns),
                            "_cls": c_cls,
                        }
                    )
            if first == "this":
                rest = callee.split(".", 1)[1] if "." in callee else None
                row = {
                    "kind": "call",
                    "parent_qn": c_caller.qn,
                    "parent_kind": c_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": cm2.start(2),
                    "callee": callee,
                    "_stack": list(c_qns),
                    "_cls": c_cls,
                }
                if rest and "." not in rest and c_cls:
                    row["class_ctx_hint"] = f"{c_cls}.{rest}"
                call_rows.append(row)
                continue
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": c_caller.qn,
                    "parent_kind": c_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": cm2.start(2),
                    "callee": callee,
                    "is_ret": callee == ret_callee
                    or bool(
                        re.search(
                            rf"return\s+(?:await\s+)?(?:new\s+)?$",
                            line[: cm2.start(1 if cm2.group(1) else 2)],
                        )
                    ),
                    "_stack": list(c_qns),
                    "_cls": c_cls,
                }
            )
        for chm in _CHAIN_RE.finditer(line):
            expr, meth = chm.group(1), chm.group(2)
            if expr.split(".")[0] in KEYWORDS:
                continue
            h_caller, h_cls, h_qns = _ctx_at(chm.start(1))
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": h_caller.qn,
                    "parent_kind": h_caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": chm.start(1),
                    "callee": f"{expr}().{meth}",
                    "recv_expr": expr,
                    "_stack": list(h_qns),
                    "_cls": h_cls,
                }
            )

    # close any still-open scopes at EOF
    for sc in stack[1:]:
        if sc.row is not None and sc.row["end_line"] < len(lines):
            sc.row["end_line"] = len(lines)

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

    def_names = {r["name"] for r in def_rows}
    for name, line_no in sorted(export_names):
        if name in def_names:
            mentions.append(
                {
                    "kind": "export",
                    "name": name,
                    "parent_qn": module_qn,
                    "parent_kind": "Module",
                    "start_line": line_no,
                    "start_col": 0,
                }
            )

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

    # second pass: enclosing-scope hints + receiver types (same rung
    # semantics as pylite's second pass)
    def _lookup_var_type(stack_qns: list[str], var: str, at_line: int) -> str | None:
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
        cls_qn = c.pop("_cls")
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
            and first not in ("this",)
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


def _collect_annotations(
    line: str,
    header_start: int,
    qn: str,
    param_types: dict[str, dict[str, str]],
    return_facts: set[tuple[str, str]],
) -> None:
    """TS param/return annotations in a single-line header → type facts."""
    op = line.find("(", header_start)
    if op == -1:
        return
    d, i, n = 0, op, len(line)
    close = -1
    while i < n:
        if line[i] == "(":
            d += 1
        elif line[i] == ")":
            d -= 1
            if d == 0:
                close = i
                break
        i += 1
    if close == -1:
        return
    for arg in line[op + 1 : close].split(","):
        pm = _PARAM_ANN_RE.match(arg)
        if pm and pm.group(2) not in KEYWORDS:
            param_types.setdefault(qn, {})[pm.group(1)] = pm.group(2)
    rest = line[close + 1 :]
    rm = re.match(rf"\s*:\s*({_DOTTED})", rest)
    if rm and rm.group(1) not in KEYWORDS:
        return_facts.add((qn, rm.group(1)))
