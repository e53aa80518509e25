"""Single-document mention extraction for Python (plus the interface/enum
mini-language extensions exercised by the polyglot fixtures).

This is the per-document "mention detection" kernel that runs inside the
Arrow-batched ``mapInPandas`` UDF (see ``extract/mentions.py``). It has NO
Spark dependency and NO cross-document state: everything that needs another
file's knowledge (import verification, inheritance resolution, simple-name
fallback, variant fan-out, receiver-type class resolution) is deliberately
*not* done here — those are DataFrame joins downstream. That in-UDF/in-join
boundary is the central architectural translation of the reference
(SURVEY.md §2.12): the reference computes the same facts with tree-sitter +
shared in-memory registries (``codebase_rag/parsers/definition_processor.py``,
``function_ingest.py``, ``call_processor.py``); we compute the per-file facts
here and the shared state as joins.

Parsing model: physical lines are first joined into **logical lines**
(bracket continuations, backslash continuations, multi-line strings) so that
multi-line ``def`` headers, parenthesized multi-line imports and decorators
with multi-line arguments parse exactly like their single-line forms.
String literals (escape-aware, including mid-statement triple-quote opens)
and comments are blanked before any structural regex runs.

Semantics mirrored from the reference (each cited where implemented):

* qualified names ``project.rel.path[.Class][.func]`` with index files
  collapsing to the directory (``definition_processor.py:312-319``);
* nested definitions attach to their enclosing scope, not the module
  (``docs/architecture/graph-schema.md`` "Nested Definitions");
* anonymous functions named ``lambda_<line>_<col>``
  (``function_ingest.py:1160-1163``);
* calls attributed to the innermost enclosing function/method/module
  (``call_processor.py:1398-1660``);
* caller-sensitive resolution hints (enclosing-scope rung, class-context
  rung of ``call_resolver.py:721-974``) computed per-document;
* **local variable type inference** (``parsers/type_inference.py``,
  consumed at ``call_processor.py:2815-2822``): ``v = Circle()`` /
  annotated params / ``self.attr = Circle()`` type the receiver of
  ``v.area()`` — the kernel emits the *as-written* type-source expression
  (``recv_expr``); the class itself resolves downstream by joins;
* **return-type facts** (``call_resolver.py:833-850`` chained-call
  inference): ``return Circle()`` and ``-> Circle`` annotations emit
  ``returns`` mentions so ``v = make(); v.area()`` and ``make().area()``
  resolve through a (function → returned class) join;
* base-class list order preserved as ``base_index``
  (``graph_updater.py:1195-1225``).
"""

from __future__ import annotations

import json
import re

from code_graph_rag_spark.extract.manifests import (
    MANIFEST_FILES,
    parse_manifest as _parse_manifest,
)
from dataclasses import dataclass, field

KEYWORDS = frozenset(
    """def class if elif else while for return yield with as assert lambda
    except not and or in is raise del pass try finally import from global
    nonlocal await async match case True False None""".split()
)

# [^\W\d]\w* = unicode-aware identifier (re is unicode by default on str)
_ID = r"[^\W\d]\w*"
_DOTTED = rf"{_ID}(?:\.{_ID})*"

_DEF_RE = re.compile(rf"^(\s*)(?:async\s+)?def\s+({_ID})\s*\(")
_DEF_HEADER_RE = re.compile(
    rf"^\s*(?:async\s+)?def\s+{_ID}\s*\((.*)\)\s*(?:->\s*([^:]+))?:", re.DOTALL
)
_CLASS_RE = re.compile(
    rf"^(\s*)(class|interface|enum)\s+({_ID})\s*(?:\(([^)]*)\))?\s*:"
)
_SUPER_RE = re.compile(rf"(?<![\w.])super\s*\(\s*\)\s*\.\s*({_ID})\s*\(")
_LAMBDA_RE = re.compile(r"(?<!\w)lambda[\s:]")
_ALL_RE = re.compile(
    r"^__all__\s*(?:\:[^=]+)?=\s*[\[\(](.*?)[\]\)]", re.MULTILINE | re.DOTALL
)
_IMPORT_RE = re.compile(r"^(\s*)import\s+(.+)$")
_FROM_RE = re.compile(r"^(\s*)from\s+(\.*)([\w.]*)\s+import\s+(.+)$")
_DECOR_RE = re.compile(r"^(\s*)@\s*([\w.]+)")
# mount registrations: app.include_router(router, prefix="/api") /
# app.register_blueprint(bp, url_prefix="/x") (endpoint_prefixes.py)
_MOUNT_NAMES = frozenset({"include_router", "register_blueprint", "mount"})
_MOUNT_PREFIX_RE = re.compile(r"(?:prefix|url_prefix)\s*=\s*('|\")")
_VAR_ARG_RE = re.compile(rf"^\s*({_ID})\s*$")
_CALL_ARG_RE = re.compile(rf"^\s*(?:await\s+)?({_DOTTED})\s*\(")
_KW_ARG_RE = re.compile(rf"^\s*({_ID})\s*=(?![=<>!])\s*(.*)$")
_WITH_AS_RE = re.compile(
    rf"^with\s+({_DOTTED})\s*\(.*\)\s*as\s+({_ID})\s*:", re.DOTALL
)
_CALL_RE = re.compile(rf"(?<![\w.])({_DOTTED})\s*\(")
# Expr(...).method( — chained call on a ctor/function result; [^()]* keeps the
# arg match conservative (nested-paren args fall back to the plain call rows)
_CHAIN_RE = re.compile(rf"(?<![\w.])({_DOTTED})\s*\([^()]*\)\s*\.\s*({_ID})\s*\(")
_IDENT_RE = re.compile(rf"(?<![\w.])({_ID})\b")
# assignments: var [: ann] = [await] rhs   (…=(?!=) excludes == comparisons)
_ASSIGN_RE = re.compile(rf"^({_ID})\s*(?::[^=]+?)?\s*=(?![=<>!])\s*(?:await\s+)?(.*)$")
_SELF_ASSIGN_RE = re.compile(
    rf"^self\.({_ID})\s*(?::[^=]+?)?\s*=(?![=<>!])\s*(?:await\s+)?(.*)$"
)
_CTOR_RE = re.compile(rf"^({_DOTTED})\s*\(")
_RETURN_RE = re.compile(rf"^return\s+(?:await\s+)?({_DOTTED})\s*\(")
_PARAM_ANN_RE = re.compile(rf"^\s*\*{{0,2}}({_ID})\s*:\s*({_DOTTED})\s*(?:=.*)?$")
_STR_STMT_RE = re.compile(r"^[rbufRBUF]{0,3}('''|\"\"\"|'|\")")
_LIT_AT_RE = re.compile(r"\s*[rbufRBUF]{0,3}('|\")")
_COMMA_RE = re.compile(r"\s*,")
_RET_PREFIX_RE = re.compile(r"^\s*return\s+(?:await\s+)?")

_OPENERS = frozenset("([{")
_CLOSERS = frozenset(")]}")


def module_qn_for(doc_id: str) -> tuple[str, str]:
    """(module_qn, project) for a document path.

    Index files (``__init__.py`` / ``mod.rs`` / ``index.ts``) collapse to
    their directory (reference ``definition_processor.py:315-318``).
    """
    parts = doc_id.split("/")
    project = parts[0]
    stem = parts[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    ext = stem[dot + 1 :] if dot > 0 else ""
    if base in ("__init__", "mod", "index"):
        qn_parts = parts[:-1]
    elif ext == "go" and len(parts) >= 2 and base == parts[-2]:
        # Go package-dir convention: `shapes/shapes.go` is the package's
        # anchor file and collapses to its directory, so `import
        # "proj/shapes"` verifies to a Module (Go's import unit is the
        # DIRECTORY — reference parsers/go/module_paths.py)
        qn_parts = parts[:-1]
    else:
        qn_parts = parts[:-1] + [base]
    return ".".join(qn_parts), project


def _is_index_doc(doc_id: str) -> bool:
    stem = doc_id.rsplit("/", 1)[-1]
    dot = stem.rfind(".")
    base = stem[:dot] if dot > 0 else stem
    return base in ("__init__", "mod", "index")


def doc_extension(doc_id: str) -> str:
    stem = doc_id.rsplit("/", 1)[-1]
    dot = stem.rfind(".")
    return stem[dot + 1 :] if dot > 0 else ""


@dataclass
class _Scope:
    indent: int
    kind: str  # module | class | function | method
    qn: str
    name: str
    start_line: int
    children: set[str] = field(default_factory=set)


def _find_quote_end(line: str, start: int, quote: str) -> int:
    """Index just past the closing quote, honoring backslash escapes;
    -1 if unterminated on this line."""
    i, n, ql = start, len(line), len(quote)
    while i < n:
        if line[i] == "\\":
            i += 2
            continue
        if line.startswith(quote, i):
            return i + ql
        i += 1
    return -1


def _strip_strings_and_comments(line: str) -> tuple[str, str, str | None]:
    """Blank out string-literal contents and trailing comments so the call
    regex never fires inside them.

    Returns ``(cleaned, literal_preserving, open_triple)``: ``cleaned`` has
    string contents blanked; ``literal_preserving`` is the SAME length with
    comments cut identically but string contents kept (the io-sink pass
    reads literal file paths / URLs / modes out of it at the positions the
    cleaned line's regexes matched); ``open_triple`` is the quote style of a
    triple-quoted string that OPENED on this line without closing (including
    mid-statement opens like ``x = '''...``) — the caller must treat
    following lines as string content until it closes."""
    out = []
    lit = []
    i, n = 0, len(line)
    open_triple: str | None = None
    while i < n:
        ch = line[i]
        if ch == "#":
            break
        if ch in ("'", '"'):
            quote = line[i : i + 3] if line[i : i + 3] in ("'''", '"""') else ch
            end = _find_quote_end(line, i + len(quote), quote)
            if end == -1:
                if len(quote) == 3:
                    open_triple = quote
                out.append(" " * (n - i))
                lit.append(line[i:])
                i = n
                break
            out.append(quote + " " * (end - i - 2 * len(quote)) + quote)
            lit.append(line[i:end])
            i = end
            continue
        out.append(ch)
        lit.append(ch)
        i += 1
    return "".join(out), "".join(lit), open_triple


def _net_depth(clean: str) -> int:
    d = 0
    for ch in clean:
        if ch in _OPENERS:
            d += 1
        elif ch in _CLOSERS:
            d -= 1
    return d


def _logical_lines(lines: list[str]) -> list[tuple[int, str, str, str]]:
    """Join physical lines into logical statements.

    Returns ``[(start_line_no, raw_first_line, clean_joined, lit_joined)]``
    where ``clean_joined`` has strings/comments blanked and continuation
    lines (open brackets, trailing backslash, multi-line strings) merged,
    and ``lit_joined`` is position-aligned with ``clean_joined`` but keeps
    string-literal contents (for the io-sink literal extraction). A pure
    multi-line-string statement (e.g. a docstring) yields ``clean_joined=''``
    with the raw first line preserved for docstring capture.
    """
    out: list[tuple[int, str, str, str]] = []
    in_triple: str | None = None
    parts: list[str] = []
    lparts: list[str] = []
    raw_first = ""
    start = 0
    depth = 0
    cont = False

    def add_part(clean: str, lit: str) -> None:
        nonlocal cont, depth
        c = clean.rstrip()
        cont = c.endswith("\\")
        if cont:
            cut = len(c) - 1
            parts.append(clean[:cut])
            lparts.append(lit[:cut])
        else:
            parts.append(clean)
            lparts.append(lit)
        depth += _net_depth(clean)

    def flush() -> None:
        nonlocal parts, lparts, depth, cont
        if parts:
            out.append((start, raw_first, " ".join(parts), " ".join(lparts)))
        parts, lparts, depth, cont = [], [], 0, False

    for idx, raw in enumerate(lines):
        ln = idx + 1
        if in_triple is not None:
            pos = raw.find(in_triple)
            # honor escaped quotes inside the open string
            while pos > 0 and raw[pos - 1] == "\\":
                pos = raw.find(in_triple, pos + 1)
            if pos == -1:
                continue
            rest = raw[pos + 3 :]
            clean, lit, opened = _strip_strings_and_comments(rest)
            in_triple = opened
            if parts:
                add_part(clean, lit)
                if depth <= 0 and not cont and in_triple is None:
                    flush()
            elif clean.strip():
                out.append((ln, rest, clean, lit))
            continue

        clean, lit, opened = _strip_strings_and_comments(raw)
        if opened:
            in_triple = opened
        if not parts:
            if not clean.strip():
                if opened:
                    # pure unterminated-string statement (docstring start)
                    out.append((ln, raw, "", ""))
                continue
            start, raw_first = ln, raw
        add_part(clean, lit)
        if depth <= 0 and not cont and in_triple is None:
            flush()
    flush()
    return out


def _literal_after(
    clean: str, lit: str, pos: int
) -> tuple[str | None, int]:
    """Extract a string literal starting at ``pos`` in the cleaned line,
    reading its content from the position-aligned literal-preserving line.
    Returns (content or None, index just past the closing quote)."""
    m = _LIT_AT_RE.match(clean, pos)
    if not m:
        return None, pos
    q = m.group(1)
    qstart = m.end() - 1
    qend = clean.find(q, qstart + 1)
    if qend == -1:
        return None, pos
    return lit[qstart + 1 : qend], qend + 1


def _matching_paren(line: str, open_pos: int) -> int:
    """Index of the ')' closing the '(' at ``open_pos``; -1 if not on this
    logical line (multi-line call args — conservative skip)."""
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


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside brackets (strings already blanked)."""
    parts, buf, d = [], [], 0
    for ch in s:
        if ch in _OPENERS:
            d += 1
        elif ch in _CLOSERS:
            d -= 1
        if ch == "," and d == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


# Dispatch registrars (reference io_access/constants.py:44-47): the
# Prefect-style `@flow` / `@task` decorators register their function under
# a string key; `workflow_name=` keyword arguments produce onto it.
_DISPATCH_REGISTRARS = frozenset({"flow", "task"})
_DISPATCH_PROD_RE = re.compile(r"[(,]\s*workflow_name\s*=\s*")


_DISPATCH_ENTRY_RE = re.compile(r"^\s*(['\"]).*\1\s*:\s*([A-Za-z_]\w*)\s*$")


def _dispatch_dict_entries(
    clean: str, lit: str, brace: int
) -> list[tuple[str, str]] | None:
    """Parse a module-level dict literal into [(key, handler_ident)] —
    None unless EVERY entry maps a plain string literal to a bare
    identifier (reference ``_process_dict_registry``: one exception keeps
    config dicts out; f-strings and non-identifier values disqualify)."""
    if brace == -1:
        return None
    depth = 0
    close = -1
    for i in range(brace, len(clean)):
        if clean[i] == "{":
            depth += 1
        elif clean[i] == "}":
            depth -= 1
            if depth == 0:
                close = i
                break
    if close == -1 or clean[close + 1 :].strip():
        return None
    out: list[tuple[str, str]] = []
    seg_clean = clean[brace + 1 : close]
    seg_lit = lit[brace + 1 : close]
    pos = 0
    for part in seg_clean.split(","):
        lpart = seg_lit[pos : pos + len(part)]
        pos += len(part) + 1
        if not part.strip():
            continue
        m = _DISPATCH_ENTRY_RE.match(part)
        if not m:
            return None
        lm = _LIT_AT_RE.match(part)
        if not lm:
            return None
        q = lm.group(1)
        qstart = lm.end() - 1
        qend = part.find(q, qstart + 1)
        if qend == -1:
            return None
        key = lpart[qstart + 1 : qend]
        out.append((key, m.group(2)))
    return out or None


def _dispatch_registrar_key(
    dec: str, func_name: str
) -> tuple[str | None, str | None]:
    """(registrar tail, key) for one verbatim decorator string.

    Reference ``_registrar_key`` (dispatch_registry.py): `@flow` registers
    the hyphenated function name; `@flow(name="x")` the explicit literal;
    an explicit but NON-literal name is unknowable → (tail, None) so the
    caller records no key; a non-registrar decorator → (None, None).
    """
    head = dec.split("(", 1)[0].strip()
    tail = head.split(".")[-1]
    if tail not in _DISPATCH_REGISTRARS:
        return None, None
    if "(" in dec:
        nm = re.search(r"\bname\s*=\s*", dec)
        if nm:
            rest = dec[nm.end() :].lstrip()
            if rest[:1] in ("'", '"'):
                q = rest[0]
                end = rest.find(q, 1)
                if end > 0:
                    return tail, rest[1:end]
            return tail, None
    return tail, func_name.replace("_", "-")


def parse_document(doc_id: str, code_text: str) -> list[dict]:
    """Parse one document's concatenated code text into mention rows.

    Returns a list of dicts matching ``schema.MENTIONS_SCHEMA`` (without
    doc_id/module_qn, filled by the caller).
    """
    basename = doc_id.rsplit("/", 1)[-1]
    if basename in MANIFEST_FILES:
        # dependency-manifest source (reference definition_processor.py:
        # 451-478, parsers/dependency_parser.py): no Module node, only
        # dependency mentions → Project DEPENDS_ON_EXTERNAL ExternalPackage
        return _parse_manifest(doc_id, code_text, MANIFEST_FILES[basename])
    if basename.endswith(".csproj"):
        # any project name matches (reference parse_dependencies suffix arm)
        return _parse_manifest(doc_id, code_text, "csproj")

    module_qn, project = module_qn_for(doc_id)
    is_index = _is_index_doc(doc_id)
    lines = code_text.split("\n")
    mentions: list[dict] = []

    # module exports: __all__ = [...] — whole-text scan so multiline lists
    # work (reference is_exported/EXPORTS semantics)
    for am in _ALL_RE.finditer(code_text):
        all_line = code_text.count("\n", 0, am.start()) + 1
        for part in am.group(1).split(","):
            sym = part.strip().strip("'\"")
            if sym and re.fullmatch(_ID, sym):
                mentions.append(
                    {
                        "kind": "export",
                        "name": sym,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": all_line,
                        "start_col": 0,
                    }
                )

    module_scope = _Scope(-1, "module", module_qn, module_qn.rsplit(".", 1)[-1], 1)
    stack: list[_Scope] = [module_scope]
    # def/class registry for this file: scope_qn -> child simple names
    children: dict[str, set[str]] = {module_qn: module_scope.children}
    def_rows: list[dict] = []  # definition mentions, end_line patched later
    open_defs: list[tuple[dict, int]] = []  # (row, indent) for end_line patch
    pending_decorators: list[str] = []
    pending_docstring_for: dict | None = None

    call_rows: list[dict] = []  # resolved-later call/ref mentions
    # --- type-inference state (reference parsers/type_inference.py) ---
    # scope qn → [(line, var, ctor_expr_or_None)] in statement order;
    # a non-ctor rebind records None (drops the type)
    scope_assigns: dict[str, list[tuple[int, str, str | None]]] = {}
    # scope qn → {param: annotated type expr}
    param_types: dict[str, dict[str, str]] = {}
    # class qn → {attr: ctor expr} for self.attr = Ctor() (last wins)
    class_attr_types: dict[str, dict[str, str]] = {}
    # (function qn, returned ctor/annotation expr) facts
    return_facts: set[tuple[str, str]] = set()
    # --- dispatch-registry state (reference parsers/dispatch_registry.py;
    # join phase in plans/dispatch.py) ---
    mod_constants: dict[str, str] = {}  # module-level NAME = "literal"
    dispatch_regs: list[tuple[dict, str]] = []  # (row, registrar tail)
    dispatch_prods: list[dict] = []
    dispatch_deferred: list[tuple[dict, str]] = []  # (row, identifier)

    def scope_pop_to(indent: int, line_no: int) -> None:
        while len(stack) > 1 and indent <= stack[-1].indent:
            stack.pop()
        # patch end_line on defs that closed
        while open_defs and indent <= open_defs[-1][1]:
            row, _ = open_defs.pop()
            row["end_line"] = line_no - 1

    for line_no, raw, line, lit_line in _logical_lines(lines):
        stripped = line.strip()

        # docstring capture: first statement after a def/class header
        if pending_docstring_for is not None:
            rs = raw.strip()
            sm = _STR_STMT_RE.match(rs)
            if sm and (not stripped or stripped.lstrip("rbufRBUF")[:1] in ("'", '"')):
                quote = sm.group(1)
                body = rs[sm.end() :]
                props = json.loads(pending_docstring_for["props"] or "{}")
                if len(quote) == 3 and body.endswith(quote) and len(body) >= 3:
                    props["docstring"] = body[: -len(quote)].strip()
                elif len(quote) == 3:
                    props["docstring"] = body.strip()
                else:
                    props["docstring"] = body[: max(body.rfind(quote), 0)].strip()
                pending_docstring_for["props"] = json.dumps(props, sort_keys=True)
                pending_docstring_for = None
                continue
            pending_docstring_for = None
        if not stripped:
            continue

        indent = len(raw) - len(raw.lstrip())
        scope_pop_to(indent, line_no)
        parent = stack[-1]

        m = _DECOR_RE.match(line)
        if m:
            # store the decorator verbatim INCLUDING its literal argument
            # list (from the literal-preserving line) — the reference keeps
            # route decorators verbatim so the endpoints pass can parse
            # @app.get("/users/{id}") (parsers/endpoints.py:60-91)
            pending_decorators.append(lit_line[m.start(2) :].rstrip())
            continue

        m = _DEF_RE.match(line)
        if m:
            name = m.group(2)
            qn = f"{parent.qn}.{name}"
            kind = "method" if parent.kind == "class" else "function"
            props: dict = {}
            if pending_decorators:
                props["decorators"] = list(pending_decorators)
            row = {
                "kind": kind,
                "qn": qn,
                "name": name,
                "parent_qn": parent.qn,
                "parent_kind": parent.kind.capitalize(),
                "start_line": line_no,
                "end_line": line_no,
                "start_col": indent,
                "props": json.dumps(props, sort_keys=True) if props else None,
            }
            def_rows.append(row)
            open_defs.append((row, indent))
            parent.children.add(name)
            # registrar-decorated MODULE-LEVEL defs register under a string
            # key (reference _process_decorated walks only root children);
            # the local-shadow rule is applied at flush once all module
            # defs are known
            if pending_decorators and parent.kind == "module":
                for dec in pending_decorators:
                    tail, key = _dispatch_registrar_key(dec, name)
                    if tail is None or key is None:
                        continue
                    dispatch_regs.append(
                        (
                            {
                                "kind": "dispatch_reg",
                                "qn": qn,
                                "name": key,
                                "parent_qn": parent.qn,
                                "parent_kind": "Module",
                                "start_line": line_no,
                                "start_col": indent,
                            },
                            tail,
                        )
                    )
            scope = _Scope(indent, kind, qn, name, line_no)
            stack.append(scope)
            children[qn] = scope.children
            pending_decorators = []
            pending_docstring_for = row
            # annotated params + return annotation (type-inference sources)
            hm = _DEF_HEADER_RE.match(line)
            if hm:
                for arg in _split_top_level(hm.group(1) or ""):
                    pm = _PARAM_ANN_RE.match(arg)
                    if pm and pm.group(2) not in KEYWORDS:
                        param_types.setdefault(qn, {})[pm.group(1)] = pm.group(2)
                ret = (hm.group(2) or "").strip()
                if ret and re.fullmatch(_DOTTED, ret) and ret not in KEYWORDS:
                    return_facts.add((qn, ret))
            continue

        m = _CLASS_RE.match(line)
        if m:
            kw = m.group(2)  # class | interface | enum
            name = m.group(3)
            qn = f"{parent.qn}.{name}"
            props = {}
            if pending_decorators:
                props["decorators"] = list(pending_decorators)
            row = {
                "kind": kw,
                "qn": qn,
                "name": name,
                "parent_qn": parent.qn,
                "parent_kind": parent.kind.capitalize(),
                "start_line": line_no,
                "end_line": line_no,
                "start_col": indent,
                "props": json.dumps(props, sort_keys=True) if props else None,
            }
            def_rows.append(row)
            open_defs.append((row, indent))
            parent.children.add(name)
            bases = [b.strip() for b in (m.group(4) or "").split(",") if b.strip()]
            for bi, base in enumerate(bases):
                base_name = base.split("=")[-1].strip()  # metaclass= noise
                if not base_name or base_name in KEYWORDS:
                    continue
                if not re.fullmatch(_DOTTED, base_name):
                    continue  # subscripted generics etc.
                mentions.append(
                    {
                        "kind": "inherit",
                        "qn": qn,
                        "name": name,
                        "parent_qn": parent.qn,
                        "parent_kind": parent.kind.capitalize(),
                        "start_line": line_no,
                        "start_col": indent,
                        "callee": base_name,
                        "base_index": bi,
                    }
                )
            scope = _Scope(indent, "class", qn, name, line_no)
            stack.append(scope)
            children[qn] = scope.children
            pending_decorators = []
            pending_docstring_for = row
            continue

        m = _IMPORT_RE.match(line)
        if m and not line.lstrip().startswith("from"):
            for clause in m.group(2).split(","):
                clause = clause.strip()
                if not clause:
                    continue
                if " as " in clause:
                    target, alias = (s.strip() for s in clause.split(" as ", 1))
                    local, bind_target = alias, target
                else:
                    target = clause
                    # `import a.b` binds root `a` (reference
                    # import_processor.py python semantics)
                    local, bind_target = target.split(".")[0], target.split(".")[0]
                if not re.fullmatch(_DOTTED, target):
                    continue
                mentions.append(
                    {
                        "kind": "import",
                        "name": None,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": indent,
                        "local_name": local,
                        "target": target,
                        "callee": bind_target,
                    }
                )
            continue

        m = _FROM_RE.match(line)
        if m:
            rel_dots, src_mod, names = m.group(2), m.group(3), m.group(4)
            if rel_dots:
                # relative import anchoring: one dot = the current package.
                # For an index file the module QN *is* the package
                # (module_qn_for collapsed it), so strip one level fewer
                # (reference import_processor relative semantics; ADVICE r1)
                base_parts = module_qn.split(".")
                up = len(rel_dots) - (1 if is_index else 0)
                anchor = base_parts[: max(1, len(base_parts) - up)]
                target_mod = ".".join(anchor + (src_mod.split(".") if src_mod else []))
            else:
                target_mod = src_mod
            names = names.strip().strip("()")
            for clause in names.split(","):
                clause = clause.strip()
                if not clause or clause == "*":
                    continue
                if " as " in clause:
                    symbol, local = (s.strip() for s in clause.split(" as ", 1))
                else:
                    symbol = local = clause
                if not re.fullmatch(_ID, symbol):
                    continue
                mentions.append(
                    {
                        "kind": "import",
                        "name": symbol,
                        "parent_qn": module_qn,
                        "parent_kind": "Module",
                        "start_line": line_no,
                        "start_col": indent,
                        "local_name": local,
                        "target": target_mod,
                        "callee": target_mod,
                    }
                )
            continue

        # --- statement line: collect calls and bare references ---
        # calls attribute to the innermost enclosing function/method/module;
        # class-body statements attribute past the class to its enclosing
        # scope (graph-schema: CALLS sources are Module/Function/Method)
        caller = next(s for s in reversed(stack) if s.kind != "class")
        cls_scope = next((s.qn for s in reversed(stack) if s.kind == "class"), None)

        indent_off = len(line) - len(line.lstrip())

        # --- type-inference fact collection ---
        am = _ASSIGN_RE.match(stripped)
        if am and am.group(1) not in KEYWORDS:
            rhs_raw = am.group(2)
            rhs_lead = len(rhs_raw) - len(rhs_raw.lstrip())
            cm = _CTOR_RE.match(rhs_raw.strip())
            # module-level assignments feed the dispatch pass (reference
            # _process_module_assignment): a plain string literal becomes a
            # producer-resolvable constant; a dict literal is a registry
            # candidate when EVERY entry is "key": identifier
            if len(stack) == 1:
                rhs_pos0 = indent_off + am.start(2) + rhs_lead
                if rhs_raw.strip().startswith(("'", '"')):
                    lit0, after0 = _literal_after(line, lit_line, rhs_pos0)
                    if lit0 is not None and not line[after0:].strip():
                        mod_constants[am.group(1)] = lit0
                elif rhs_raw.strip().startswith("{"):
                    entries = _dispatch_dict_entries(
                        line, lit_line, line.find("{", rhs_pos0)
                    )
                    for key, ident in entries or ():
                        dispatch_regs.append(
                            (
                                {
                                    "kind": "dispatch_reg",
                                    "name": key,
                                    "callee": ident,
                                    "target": f"L{line_no}",
                                    "parent_qn": module_qn,
                                    "parent_kind": "Module",
                                    "start_line": line_no,
                                    "start_col": indent_off,
                                    "props": json.dumps(
                                        {"n": len(entries)}
                                    ),
                                },
                                "",  # dict form: no registrar shadow rule
                            )
                        )
            scope_assigns.setdefault(caller.qn, []).append(
                (line_no, am.group(1), cm.group(1) if cm else None)
            )
            if cm and cm.group(1).split(".")[0] not in KEYWORDS:
                # assignment-from-call fact → `assign` mention (taint source
                # for the flow pass, flow_access assignment-taint rule)
                rhs_pos = indent_off + am.start(2) + rhs_lead
                a0, _after = _literal_after(line, lit_line, rhs_pos + cm.end())
                mentions.append(
                    {
                        "kind": "assign",
                        "name": am.group(1),
                        "parent_qn": caller.qn,
                        "parent_kind": caller.kind.capitalize(),
                        "start_line": line_no,
                        "start_col": indent_off,
                        "callee": cm.group(1),
                        "arg0_lit": a0,
                    }
                )
        wm = _WITH_AS_RE.match(stripped)
        if wm and wm.group(1).split(".")[0] not in KEYWORDS:
            # `with open(...) as fh:` binds fh to the call result — the
            # canonical Python file-handle taint source
            paren = stripped.index("(", wm.end(1))
            a0, _after = _literal_after(
                line, lit_line, indent_off + paren + 1
            )
            mentions.append(
                {
                    "kind": "assign",
                    "name": wm.group(2),
                    "parent_qn": caller.qn,
                    "parent_kind": caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": indent_off,
                    "callee": wm.group(1),
                    "arg0_lit": a0,
                }
            )
            scope_assigns.setdefault(caller.qn, []).append(
                (line_no, wm.group(2), None)
            )
        sm2 = _SELF_ASSIGN_RE.match(stripped)
        if sm2 and cls_scope:
            cm = _CTOR_RE.match(sm2.group(2).strip())
            if cm and cm.group(1).split(".")[0] not in KEYWORDS:
                class_attr_types.setdefault(cls_scope, {})[sm2.group(1)] = cm.group(1)
        rm = _RETURN_RE.match(stripped)
        if rm and caller.kind in ("function", "method"):
            if rm.group(1).split(".")[0] not in KEYWORDS:
                return_facts.add((caller.qn, rm.group(1)))

        # anonymous functions: lambda_<line>_<col> (function_ingest.py:
        # 1160-1163); attached by DEFINES to the enclosing scope
        for lm in _LAMBDA_RE.finditer(line):
            lname = f"lambda_{line_no}_{lm.start()}"
            def_rows.append(
                {
                    "kind": "function",
                    "qn": f"{caller.qn}.{lname}",
                    "name": lname,
                    "parent_qn": caller.qn,
                    "parent_kind": caller.kind.capitalize(),
                    "start_line": line_no,
                    "end_line": line_no,
                    "start_col": lm.start(),
                    "props": None,
                }
            )

        # super().m() dispatch (call_resolver.py:830-831): resolved against
        # the enclosing class's ancestor chain by a closure join downstream
        for sm in _SUPER_RE.finditer(line):
            if cls_scope:
                call_rows.append(
                    {
                        "kind": "call",
                        "parent_qn": caller.qn,
                        "parent_kind": caller.kind.capitalize(),
                        "start_line": line_no,
                        "start_col": sm.start(),
                        "callee": f"super().{sm.group(1)}",
                        "super_hint": cls_scope,
                        "_caller_stack": [],
                        "_class_qn": cls_scope,
                    }
                )

        # ---- dispatch producers: a workflow_name= keyword INSIDE a call's
        # argument list (the [(,] guard excludes statement-level assignment)
        # whose value is a string literal or a module-constant identifier
        # (reference _process_producers; identifier resolution deferred to
        # the flush like the reference's finalize walk-order rule) ----
        for dpm in _DISPATCH_PROD_RE.finditer(line):
            d_row = {
                "kind": "dispatch_prod",
                "parent_qn": caller.qn,
                "parent_kind": caller.kind.capitalize(),
                "start_line": line_no,
                "start_col": dpm.start(),
            }
            d_lit, _after = _literal_after(line, lit_line, dpm.end())
            if d_lit is not None:
                dispatch_prods.append({**d_row, "name": d_lit})
            else:
                ivm = re.match(rf"({_ID})", line[dpm.end() :])
                if ivm:
                    dispatch_deferred.append((d_row, ivm.group(1)))

        seen_spans: list[tuple[int, int]] = []
        rp = _RET_PREFIX_RE.match(line)
        ret_pos = rp.end() if rp else -1
        for cm in _CALL_RE.finditer(line):
            callee = cm.group(1)
            first = callee.split(".")[0]
            if first in KEYWORDS or first == "super":
                continue
            seen_spans.append((cm.start(1), cm.end(1)))
            # literal args for the io-sink pass (file path / url / mode):
            # content comes from the position-aligned literal line
            arg0, after = _literal_after(line, lit_line, cm.end())
            arg1 = None
            if arg0 is not None:
                m2 = _COMMA_RE.match(line, after)
                if m2:
                    arg1, _ = _literal_after(line, lit_line, m2.end())
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": caller.qn,
                    "parent_kind": caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": cm.start(1),
                    "callee": callee,
                    "arg0_lit": arg0,
                    "arg1_lit": arg1,
                    # outermost call of a `return expr(...)` statement:
                    # the FLOWS_TO (via=return) source (flow_access analogue)
                    "is_ret": cm.start(1) == ret_pos,
                    "_caller_stack": [s.qn for s in stack if s.kind != "class"],
                    "_class_qn": next(
                        (s.qn for s in reversed(stack) if s.kind == "class"), None
                    ),
                }
            )
            # ---- per-argument flow facts (identifier / kw / direct-call
            # args only — literals cannot carry taint) ----
            close = _matching_paren(line, cm.end() - 1)
            if close != -1:
                for ai, part in enumerate(
                    _split_top_level(line[cm.end() : close])
                ):
                    via = f"arg:{ai}"
                    kwm = _KW_ARG_RE.match(part)
                    if kwm:
                        via = f"kw:{kwm.group(1)}"
                        part = kwm.group(2)
                    vm = _VAR_ARG_RE.match(part)
                    am2 = _CALL_ARG_RE.match(part)
                    if vm and vm.group(1) not in KEYWORDS:
                        src_kind, src = "var", vm.group(1)
                    elif am2 and am2.group(1).split(".")[0] not in KEYWORDS:
                        src_kind, src = "call", am2.group(1)
                    else:
                        continue
                    call_rows.append(
                        {
                            "kind": "argflow",
                            "parent_qn": caller.qn,
                            "parent_kind": caller.kind.capitalize(),
                            "start_line": line_no,
                            "start_col": cm.start(1),
                            "callee": callee,
                            "target": via,
                            "name": src,
                            "local_name": src_kind,
                            "arg0_lit": arg0,
                            "_caller_stack": [],
                            "_class_qn": None,
                        }
                    )
            # ---- mount registrations (endpoint prefixes) ----
            if callee.split(".")[-1] in _MOUNT_NAMES and close != -1:
                args0 = _split_top_level(line[cm.end() : close])
                rvm = _VAR_ARG_RE.match(args0[0]) if args0 else None
                pm = _MOUNT_PREFIX_RE.search(line, cm.end())
                prefix = None
                if pm and pm.start() < close:
                    prefix, _ = _literal_after(line, lit_line, pm.end() - 1)
                if rvm and prefix:
                    call_rows.append(
                        {
                            "kind": "mount",
                            "name": rvm.group(1),
                            "parent_qn": module_qn,
                            "parent_kind": "Module",
                            "start_line": line_no,
                            "start_col": cm.start(1),
                            "callee": callee,
                            "arg0_lit": prefix,
                            "_caller_stack": [],
                            "_class_qn": None,
                        }
                    )
            # ---- route-call registrations: app.add_url_rule('/p',
            # view_func=fn) / router.add_api_route('/p', fn, methods=[..])
            # (reference endpoint_routes.py call-registered routes) ----
            if (
                callee.split(".")[-1] in ("add_url_rule", "add_api_route")
                and close != -1
                and arg0
                and arg0.startswith("/")
            ):
                argtext = line[cm.end() : close]
                hm = re.search(r"(?:view_func|endpoint)\s*=\s*(\w+)", argtext)
                handler = hm.group(1) if hm else None
                if handler is None:
                    parts_a = _split_top_level(argtext)
                    if len(parts_a) > 1:
                        pv = _VAR_ARG_RE.match(parts_a[1])
                        handler = pv.group(1) if pv else None
                # methods kwarg from the literal-preserving line: the
                # stripped line has the string contents blanked
                mk = re.search(
                    r"methods\s*=\s*[\[(]([^\])]*)[\])]",
                    lit_line[cm.end() : close],
                )
                call_rows.append(
                    {
                        "kind": "route_call",
                        "name": handler,
                        "local_name": "route",
                        "target": mk.group(1) if mk else None,
                        "parent_qn": caller.qn,
                        "parent_kind": caller.kind.capitalize(),
                        "start_line": line_no,
                        "start_col": cm.start(1),
                        "callee": callee,
                        "arg0_lit": arg0,
                        "_caller_stack": [],
                        "_class_qn": None,
                    }
                )
        # chained call on a call result: Expr(...).m() — receiver type is
        # "class Expr" or "return type of Expr" (call_resolver.py:833-850);
        # the downstream type rung arbitrates, and a dotted callee can never
        # fall to the simple-name trie (the reference's drop rule)
        for chm in _CHAIN_RE.finditer(line):
            expr, meth = chm.group(1), chm.group(2)
            if expr.split(".")[0] in KEYWORDS or expr.split(".")[0] == "super":
                continue
            call_rows.append(
                {
                    "kind": "call",
                    "parent_qn": caller.qn,
                    "parent_kind": caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": chm.start(1),
                    "callee": f"{expr}().{meth}",
                    "recv_expr": expr,
                    "_caller_stack": [s.qn for s in stack if s.kind != "class"],
                    "_class_qn": next(
                        (s.qn for s in reversed(stack) if s.kind == "class"), None
                    ),
                }
            )
        # bare references (identifier not followed by '(' and not part of a
        # call's dotted path) — resolved downstream like calls but emitted
        # as REFERENCES (reference call_processor first-class refs)
        for im in _IDENT_RE.finditer(line):
            name = im.group(1)
            if name in KEYWORDS:
                continue
            s, e = im.start(1), im.end(1)
            if any(cs <= s < ce for cs, ce in seen_spans):
                continue
            rest = line[e:].lstrip()
            if rest.startswith("("):
                continue
            before = line[:s].rstrip()
            if before.endswith("."):
                continue
            call_rows.append(
                {
                    "kind": "ref",
                    "parent_qn": caller.qn,
                    "parent_kind": caller.kind.capitalize(),
                    "start_line": line_no,
                    "start_col": s,
                    "callee": name,
                    "_caller_stack": [s2.qn for s2 in stack if s2.kind != "class"],
                    "_class_qn": next(
                        (s2.qn for s2 in reversed(stack) if s2.kind == "class"), None
                    ),
                }
            )

    scope_pop_to(0, len(lines) + 1)
    for row, _ in open_defs:
        row["end_line"] = len(lines)

    # module mention
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

    # return-type facts → `returns` mentions (resolved to a Class downstream)
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

    # --- dispatch flush: drop registrar candidates shadowed by a module-
    # level def of the same name (reference _locally_defined); resolve
    # deferred producer identifiers against the module constants (reference
    # finalize — deferral makes statement order irrelevant) ---
    for d_row, d_tail in dispatch_regs:
        if d_tail and d_tail in module_scope.children:
            continue
        mentions.append(d_row)
    mentions.extend(dispatch_prods)
    for d_row, d_ident in dispatch_deferred:
        d_key = mod_constants.get(d_ident)
        if d_key:
            mentions.append({**d_row, "name": d_key})

    # --- second pass: caller-sensitive hints for calls/refs -----------------
    file_def_names = {r["name"] for r in def_rows}
    # imported local names: a bare reference to one is a first-class use of
    # an imported callable (resolved downstream via the import-alias rung)
    file_def_names |= {
        m["local_name"] for m in mentions if m.get("kind") == "import"
    }

    def _lookup_var_type(
        stack_qns: list[str], var: str, at_line: int
    ) -> str | None:
        """Innermost scope owning ``var`` decides its type: latest ctor
        assignment at/before the use line, else an annotated parameter.
        A scope that assigns the var anywhere owns it (Python locals rule)
        — an out-of-ladder later assignment yields unknown, never outer."""
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
        stack_qns = c.pop("_caller_stack")
        class_qn = c.pop("_class_qn")
        if c["kind"] == "ref" and callee not in file_def_names:
            # refs are only emitted for names defined in this file; imported
            # callables passed by value are resolved downstream via the
            # import-alias join on the call frame, so keep those too
            # (conservative: drop unknown bare identifiers — variables)
            continue
        segs = callee.split(".")
        if "." not in callee:
            # enclosing-scope ladder rung (call_resolver.py:347-401): walk
            # function scopes innermost→outermost, excluding module scope
            # (module-level siblings resolve via the same-module join rung)
            for sq in reversed(stack_qns[1:]):
                kids = children.get(sq)
                if kids and callee in kids:
                    c["enclosing_hint"] = f"{sq}.{callee}"
                    break
        elif first == "self" and class_qn:
            rest = callee.split(".", 1)[1]
            if "." not in rest:
                # self-sibling method rung (call_resolver.py:909-912)
                c["class_ctx_hint"] = f"{class_qn}.{rest}"
            elif len(segs) == 3:
                # self.attr.m(): receiver typed by self.attr = Ctor()
                # (reference type_inference class-attribute types)
                attr_t = class_attr_types.get(class_qn, {}).get(segs[1])
                if attr_t:
                    c["recv_expr"] = attr_t
        elif (
            c["kind"] == "call"
            and len(segs) == 2
            and "recv_expr" not in c
            and first not in file_def_names
        ):
            # v.m(): local-variable receiver type (type_inference.py,
            # consumed at call_processor.py:2815-2822)
            t = _lookup_var_type(stack_qns, first, c["start_line"])
            if t:
                c["recv_expr"] = t
        mentions.append(c)

    return mentions
