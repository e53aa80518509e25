"""Stdlib symbol folding — entity QN → owning-module path, per language.

Reference: ``parsers/stdlib_extractor.py`` (StdlibExtractor.extract_module_path,
lines 145-699). Given a fully-qualified external name such as
``os.path.join`` or ``std::vector``, the reference decides whether the leaf
is an *entity inside* a stdlib module (fold it away → ``os.path``) or a
module path in its own right (keep it), so external imports/calls dedup to
one node per module instead of one per referenced symbol.

The reference probes live toolchains (``importlib`` for Python at
stdlib_extractor.py:236-255, a ``node -e`` subprocess at 283-339, ``go
doc`` parsing at 360-478, a ``lua -e`` probe at 621-683) and falls back to
case heuristics when the tool is absent. A driver-side subprocess per
symbol is exactly the wrong shape for a distributed engine, so this module
is the **deterministic static-table variant**: the same fold decisions
expressed as pure string expressions (split / leaf-case / prefix /
membership in a pinned table) that run JVM-side under whole-stage codegen
and are replayable verbatim in the DuckDB oracle. Where the reference's
tool probe and its own fallback heuristic disagree, we follow the table
(documented per language below) — the table is what a 1000-executor job
can actually evaluate.

Per-language rules (deterministic mirror of stdlib_extractor.py):

* python (``.``): longest known-module prefix wins (``xml.etree.
  ElementTree.parse`` → ``xml.etree.ElementTree``; the table carries the
  dotted stdlib submodules so module-vs-entity needs no importlib probe);
  non-stdlib roots use the reference's no-tool fallback — fold iff the
  leaf is Capitalized (stdlib_extractor.py:257-261).
* js/ts (``.``): the reference folds any 2+-part name when ``node`` is
  absent (line 341); we keep a known dotted builtin submodule
  (``fs.promises``) whole and fold everything else. ``node:``-prefixed
  roots strip the scheme for the builtin lookup.
* go (``/`` then ``.``): fold iff the leaf is exported (Capitalized —
  line 480-486); stdlib iff the first segment is a known std package.
* rust (``::``): fold iff leaf is a type (Capitalized), a const
  (ALL_CAPS), or a plain lowercase word with no underscore (free fn /
  primitive — line 499-517); ``std``/``core``/``alloc`` roots are stdlib.
* cpp (``::``): fold iff root is ``std`` and the leaf looks like an
  entity (Capitalized, ``is_``/``has_`` trait prefix, or the known-entity
  table — line 519-545).
* java (``.``): class-ish leaf (Capitalized / Exception / Error /
  Interface / Builder suffix / known class) folds; stdlib iff the name
  sits under the pinned package prefixes (line 547-587).
* csharp (``.``): fold ONLY a known BCL type under a stdlib prefix —
  C# namespaces are PascalCase like types, so case alone misfolds
  namespace leaves (line 589-613 and constants/stdlib_types.py:286-301).
* lua (``.``): fold iff the root is a stdlib module or the leaf is
  Capitalized. (The reference's no-tool fallback at line 686 tests the
  *leaf* against the module table, which keeps ``string.format`` unfolded
  only because its lua probe normally answers first; the root test is the
  deterministic equivalent of the probe's answer.)
* everything else (dart, ruby, …): the generic rule — fold iff the leaf
  is Capitalized (line 691-698); ``dart:``-scheme roots mark stdlib.

Static tables are pinned snapshots of public stdlib inventories (CPython
``sys.stdlib_module_names``, the Node builtin-module list, the Go standard
library index) plus the reference's own curated sets
(constants/stdlib_types.py) — pinned, not probed at runtime, so the fold
is reproducible across workers and sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# pinned tables (data, shared verbatim by the Spark exprs and the oracle SQL)
# --------------------------------------------------------------------------

# CPython sys.stdlib_module_names snapshot (3.12), public names only,
# plus the dotted submodules the longest-prefix rule needs to tell a
# module path from an entity path.
PY_STDLIB_MODULES: tuple[str, ...] = (
    "abc", "argparse", "array", "ast", "asyncio", "atexit", "base64",
    "bdb", "binascii", "bisect", "builtins", "bz2", "calendar", "cmath",
    "cmd", "code", "codecs", "collections", "collections.abc",
    "colorsys", "compileall", "concurrent", "concurrent.futures",
    "configparser", "contextlib", "contextvars", "copy", "copyreg",
    "cProfile", "csv", "ctypes", "dataclasses", "datetime", "dbm",
    "decimal", "difflib", "dis", "doctest", "email", "email.mime",
    "email.utils", "enum", "errno", "faulthandler", "filecmp",
    "fileinput", "fnmatch", "fractions", "ftplib", "functools", "gc",
    "getopt", "getpass", "gettext", "glob", "graphlib", "gzip",
    "hashlib", "heapq", "hmac", "html", "html.parser", "http",
    "http.client", "http.server", "imaplib", "importlib",
    "importlib.metadata", "importlib.resources", "importlib.util",
    "inspect", "io", "ipaddress", "itertools", "json", "json.decoder",
    "keyword", "linecache", "locale", "logging", "logging.config",
    "logging.handlers", "lzma", "marshal", "math", "mimetypes",
    "multiprocessing", "multiprocessing.pool", "netrc", "numbers",
    "operator", "os", "os.path", "pathlib", "pdb", "pickle",
    "pickletools", "pkgutil", "platform", "plistlib", "poplib",
    "posixpath", "pprint", "profile", "pstats", "pty", "pwd", "py_compile",
    "pyclbr", "pydoc", "queue", "quopri", "random", "re", "readline",
    "reprlib", "resource", "runpy", "sched", "secrets", "select",
    "selectors", "shelve", "shlex", "shutil", "signal", "site",
    "smtplib", "socket", "socketserver", "sqlite3", "ssl", "stat",
    "statistics", "string", "stringprep", "struct", "subprocess",
    "symtable", "sys", "sysconfig", "tarfile", "tempfile", "termios",
    "textwrap", "threading", "time", "timeit", "tkinter", "token",
    "tokenize", "tomllib", "trace", "traceback", "tracemalloc", "tty",
    "turtle", "types", "typing", "unicodedata", "unittest",
    "unittest.mock", "urllib", "urllib.error", "urllib.parse",
    "urllib.request", "uuid", "venv", "warnings", "wave", "weakref",
    "webbrowser", "wsgiref", "xml", "xml.dom", "xml.etree",
    "xml.etree.ElementTree", "xml.sax", "xmlrpc", "zipapp", "zipfile",
    "zipimport", "zlib", "zoneinfo",
)

# Node builtin modules (public module list), keyed without the node: scheme;
# dotted entries are the builtin submodules kept whole by the fold.
JS_NODE_BUILTINS: tuple[str, ...] = (
    "assert", "async_hooks", "buffer", "child_process", "cluster",
    "console", "constants", "crypto", "dgram", "diagnostics_channel",
    "dns", "dns.promises", "domain", "events", "fs", "fs.promises",
    "http", "http2", "https", "inspector", "module", "net", "os",
    "path", "path.posix", "path.win32", "perf_hooks", "process",
    "punycode", "querystring", "readline", "readline.promises", "repl",
    "stream", "stream.promises", "stream.web", "string_decoder",
    "timers", "timers.promises", "tls", "trace_events", "tty", "url",
    "util", "util.types", "v8", "vm", "wasi", "worker_threads", "zlib",
)

# JS runtime globals that read as stdlib without any import
# (constants/stdlib_types.py:25-52 JS_GLOBAL_CLASS_NAMES + the builtin
# namespace objects from JS_BUILTIN_PATTERNS).
JS_GLOBALS: tuple[str, ...] = (
    "Array", "Object", "String", "Number", "Date", "RegExp", "Function",
    "Map", "Set", "WeakMap", "WeakSet", "Promise", "Error", "TypeError",
    "RangeError", "SyntaxError", "ReferenceError", "EvalError",
    "URIError", "AggregateError", "Boolean", "ArrayBuffer",
    "SharedArrayBuffer", "DataView", "EventTarget", "Event", "JSON",
    "Math", "Reflect", "Intl", "console", "globalThis",
)

# Go standard library top-level package roots (public stdlib index).
GO_STDLIB_ROOTS: tuple[str, ...] = (
    "archive", "bufio", "builtin", "bytes", "cmp", "compress",
    "container", "context", "crypto", "database", "debug", "embed",
    "encoding", "errors", "expvar", "flag", "fmt", "go", "hash", "html",
    "image", "index", "io", "iter", "log", "maps", "math", "mime",
    "net", "os", "path", "plugin", "reflect", "regexp", "runtime",
    "slices", "sort", "strconv", "strings", "structs", "sync", "syscall",
    "testing", "text", "time", "unicode", "unique", "unsafe",
)

RUST_STDLIB_ROOTS: tuple[str, ...] = ("std", "core", "alloc")

# constants/stdlib_types.py:139-161
CPP_STDLIB_ENTITIES: tuple[str, ...] = (
    "vector", "string", "map", "set", "list", "deque", "unique_ptr",
    "shared_ptr", "weak_ptr", "thread", "mutex", "condition_variable",
    "future", "promise", "sort", "find", "copy", "transform",
    "accumulate",
)

# constants/stdlib_types.py:164-175
JAVA_STDLIB_PREFIXES: tuple[str, ...] = (
    "java.", "javax.", "jdk.", "com.sun.", "sun.", "org.w3c.",
    "org.xml.", "org.ietf.", "org.omg.", "netscape.",
)

# constants/stdlib_types.py:178-195
JAVA_STDLIB_CLASSES: tuple[str, ...] = (
    "String", "Object", "Integer", "Double", "Boolean", "ArrayList",
    "HashMap", "HashSet", "LinkedList", "File", "URL", "Pattern",
    "LocalDateTime", "BigDecimal",
)

# constants/stdlib_types.py:290-295
CSHARP_STDLIB_PREFIXES: tuple[str, ...] = (
    "System.", "Microsoft.", "Windows.", "Mono.",
)

# constants/stdlib_types.py:302-397 (curated BCL set — ONLY these fold;
# see the reference's own comment on why case heuristics misfold C#).
CSHARP_STDLIB_CLASSES: tuple[str, ...] = (
    "Object", "String", "Int32", "Int64", "Boolean", "Double", "Decimal",
    "Single", "Byte", "Char", "Guid", "DateTime", "DateTimeOffset",
    "TimeSpan", "Uri", "Exception", "Nullable", "Type", "Action", "Func",
    "Console", "Task", "ValueTask", "CancellationToken", "List",
    "Dictionary", "HashSet", "Queue", "Stack", "SortedList",
    "SortedDictionary", "LinkedList", "IEnumerable", "ICollection",
    "IList", "IDictionary", "IReadOnlyList", "IReadOnlyDictionary",
    "KeyValuePair", "Enumerable", "IQueryable", "IDisposable",
    "IAsyncDisposable", "IComparable", "IEquatable", "Math", "MathF",
    "Random", "Convert", "Environment", "Array", "Span", "Memory",
    "Tuple", "Lazy", "GC", "StringBuilder", "StringComparer", "Regex",
    "Match", "Encoding", "File", "Directory", "Path", "Stream",
    "MemoryStream", "FileStream", "StreamReader", "StreamWriter",
    "TextReader", "TextWriter", "HttpClient", "HttpResponseMessage",
    "HttpRequestMessage", "JsonSerializer", "Thread", "Mutex",
    "SemaphoreSlim", "Stopwatch", "Timer", "CultureInfo",
    "IServiceProvider", "IServiceCollection", "ILogger",
)

# constants/stdlib_types.py:118-131
LUA_STDLIB_MODULES: tuple[str, ...] = (
    "string", "math", "table", "os", "io", "debug", "package",
    "coroutine", "utf8", "bit32",
)


# --------------------------------------------------------------------------
# Spark-side fold (pure F expressions — codegen end to end)
# --------------------------------------------------------------------------

def _leaf(qn: Column, cls: str) -> Column:
    """Last path segment for a separator character class."""
    return F.regexp_extract(qn, f"([^{cls}]+)$", 1)


def _parent(qn: Column, sep_re: str, cls: str) -> Column:
    return F.regexp_replace(qn, f"{sep_re}[^{cls}]+$", "")


def _capitalized(leaf: Column) -> Column:
    first = F.substring(leaf, 1, 1)
    return (first >= "A") & (first <= "Z")


def _all_caps(leaf: Column) -> Column:
    return (leaf == F.upper(leaf)) & (leaf != F.lower(leaf))


def _starts_any(qn: Column, prefixes: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for p in prefixes:
        cond = cond | qn.startswith(p)
    return cond


def fold_columns(qn: Column, language: Column) -> tuple[Column, Column]:
    """(module_path, is_stdlib) for an external qualified name.

    Both outputs are single codegen-able expression trees — no UDF, no
    lookup join; the membership tables compile to InSet filters so the
    fold adds zero shuffles wherever it is applied.
    """
    # dot-family helpers
    d_leaf = _leaf(qn, r"\.")
    d_parent = _parent(qn, r"\.", r"\.")
    d_has = qn.contains(".")
    p1 = F.regexp_extract(qn, r"^([^.]+)", 1)
    p2 = F.regexp_extract(qn, r"^([^.]+\.[^.]+)", 1)
    p3 = F.regexp_extract(qn, r"^([^.]+\.[^.]+\.[^.]+)", 1)
    # colon-family (rust/cpp)
    c_leaf = _leaf(qn, ":")
    c_parent = _parent(qn, "::", ":")
    c_has = qn.contains("::")
    c_root = F.regexp_extract(qn, r"^([^:]+)", 1)
    # go: slash first, dot second
    g_leaf = _leaf(qn, r"/\.")
    g_parent = _parent(qn, r"[/.]", r"/\.")
    g_has = qn.contains("/") | qn.contains(".")
    g_root = F.regexp_extract(qn, r"^([^/.]+)", 1)

    js_root = F.regexp_replace(p1, "^node:", "")
    js_stripped = F.regexp_replace(qn, "^node:", "")

    py_path = (
        F.when(p3.isin(*PY_STDLIB_MODULES), p3)
        .when(p2.isin(*PY_STDLIB_MODULES), p2)
        .when(p1.isin(*PY_STDLIB_MODULES), p1)
        .when(d_has & _capitalized(d_leaf), d_parent)
        .otherwise(qn)
    )
    js_path = (
        F.when(js_stripped.isin(*JS_NODE_BUILTINS), qn)
        .when(d_has, d_parent)
        .otherwise(qn)
    )
    go_path = F.when(g_has & _capitalized(g_leaf), g_parent).otherwise(qn)
    rust_fold = _capitalized(c_leaf) | _all_caps(c_leaf) | (
        (c_leaf == F.lower(c_leaf)) & (F.instr(c_leaf, "_") == 0)
    )
    rust_path = F.when(c_has & rust_fold, c_parent).otherwise(qn)
    cpp_fold = (
        _capitalized(c_leaf)
        | c_leaf.startswith("is_")
        | c_leaf.startswith("has_")
        | c_leaf.isin(*CPP_STDLIB_ENTITIES)
    )
    cpp_path = F.when(c_has & (c_root == "std") & cpp_fold, c_parent).otherwise(qn)
    java_classish = (
        _capitalized(d_leaf)
        | d_leaf.endswith("Exception")
        | d_leaf.endswith("Error")
        | d_leaf.endswith("Interface")
        | d_leaf.endswith("Builder")
        | d_leaf.isin(*JAVA_STDLIB_CLASSES)
    )
    java_path = F.when(d_has & java_classish, d_parent).otherwise(qn)
    cs_path = F.when(
        d_has
        & d_leaf.isin(*CSHARP_STDLIB_CLASSES)
        & _starts_any(qn, CSHARP_STDLIB_PREFIXES),
        d_parent,
    ).otherwise(qn)
    lua_path = F.when(
        d_has & (p1.isin(*LUA_STDLIB_MODULES) | _capitalized(d_leaf)), d_parent
    ).otherwise(qn)
    generic_path = F.when(d_has & _capitalized(d_leaf), d_parent).otherwise(qn)

    module_path = (
        F.when(language == "python", py_path)
        .when(language.isin("js", "ts", "tsx"), js_path)
        .when(language == "go", go_path)
        .when(language == "rust", rust_path)
        .when(language == "cpp", cpp_path)
        .when(language == "java", java_path)
        .when(language == "csharp", cs_path)
        .when(language == "lua", lua_path)
        .otherwise(generic_path)
    )
    is_stdlib = (
        F.when(language == "python", p1.isin(*PY_STDLIB_MODULES))
        .when(
            language.isin("js", "ts", "tsx"),
            js_root.isin(*JS_NODE_BUILTINS) | p1.isin(*JS_GLOBALS),
        )
        .when(language == "go", g_root.isin(*GO_STDLIB_ROOTS))
        .when(language == "rust", c_root.isin(*RUST_STDLIB_ROOTS))
        .when(language == "cpp", c_root == "std")
        .when(language == "java", _starts_any(qn, JAVA_STDLIB_PREFIXES))
        .when(language == "csharp", _starts_any(qn, CSHARP_STDLIB_PREFIXES))
        .when(language == "lua", p1.isin(*LUA_STDLIB_MODULES))
        .when(language == "dart", qn.startswith("dart:"))
        .otherwise(F.lit(False))
    )
    return module_path, is_stdlib


def fold_external(df: DataFrame, qn_col: str = "qn",
                  lang_col: str = "language") -> DataFrame:
    """Attach module_path / is_stdlib to a frame of external QNs."""
    path, std = fold_columns(F.col(qn_col), F.col(lang_col))
    return df.withColumn("module_path", path).withColumn(
        "is_stdlib", std.cast("int")
    )


# --------------------------------------------------------------------------
# probe corpus — one row per heuristic branch, shared with the oracle
# --------------------------------------------------------------------------

STDLIB_PROBES: tuple[tuple[str, str], ...] = (
    # python: longest-prefix ladder + non-stdlib fallbacks
    ("os.path.join", "python"),
    ("os.path", "python"),
    ("os", "python"),
    ("xml.etree.ElementTree.parse", "python"),
    ("xml.etree.ElementTree", "python"),
    ("collections.abc.Mapping", "python"),
    ("concurrent.futures.ThreadPoolExecutor", "python"),
    ("json.dumps", "python"),
    ("logging.handlers.RotatingFileHandler", "python"),
    ("requests.Session", "python"),          # non-stdlib, Capitalized leaf
    ("requests.get", "python"),              # non-stdlib, lowercase leaf
    ("myproj.core.utils", "python"),
    # js: builtin submodules kept, everything else folds
    ("fs.promises", "js"),
    ("fs.readFileSync", "js"),
    ("node:path.join", "js"),
    ("lodash.merge", "js"),
    ("JSON.parse", "js"),
    ("express", "js"),
    # go: exported leaf folds, std roots
    ("net/http.Get", "go"),
    ("net/http", "go"),
    ("fmt.Println", "go"),
    ("github.com/acme/pkg.New", "go"),
    ("strings.builder", "go"),
    # rust: type / const / free-fn leaves fold, snake_case keeps
    ("std::vec::Vec", "rust"),
    ("std::mem::swap", "rust"),
    ("std::f64::MAX", "rust"),
    ("std::collections::hash_map", "rust"),
    ("serde::Deserialize", "rust"),
    ("tokio", "rust"),
    # cpp: std-gated entity folds
    ("std::vector", "cpp"),
    ("std::is_same", "cpp"),
    ("std::chrono", "cpp"),
    ("boost::asio::io_context", "cpp"),
    # java: class-ish leaf folds; prefix table marks stdlib
    ("java.util.ArrayList", "java"),
    ("java.util.stream", "java"),
    ("java.io.IOException", "java"),
    ("com.acme.widgets.WidgetBuilder", "java"),
    ("com.acme.widgets", "java"),
    # csharp: only known BCL types under stdlib prefixes fold
    ("System.Collections.Generic.List", "csharp"),
    ("Microsoft.Extensions.Logging", "csharp"),
    ("System.Text.Json", "csharp"),
    ("Acme.Billing.Invoice", "csharp"),
    # lua: stdlib-root folds; leaf-case fallback
    ("string.format", "lua"),
    ("table.insert", "lua"),
    ("cjson.decode", "lua"),
    ("inspect.KEY", "lua"),
    # generic tier: dart scheme + ruby case rule
    ("dart:core.List", "dart"),
    ("dart:async", "dart"),
    ("json.JSON", "ruby"),
    ("active_record.base", "ruby"),
)


def stdlib_probe_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(STDLIB_PROBES), "qn string, language string")


# --------------------------------------------------------------------------
# pipeline integration — ExternalModule annotation (opt-in 'stdlib' group)
# --------------------------------------------------------------------------

def language_from_doc(doc: Column) -> Column:
    """doc path → fold language, mirroring the ``extract/mentions.py``
    extension→kernel dispatch. Unknown or absent extensions fall through to
    python — the same default the extraction dispatch uses."""
    from code_graph_rag_spark.extract.cpplite import CPP_EXTENSIONS
    from code_graph_rag_spark.extract.cslite import CSHARP_EXTENSIONS
    from code_graph_rag_spark.extract.dartlite import DART_EXTENSIONS
    from code_graph_rag_spark.extract.golite import GO_EXTENSIONS
    from code_graph_rag_spark.extract.javalite import JAVA_EXTENSIONS
    from code_graph_rag_spark.extract.jslite import JS_EXTENSIONS
    from code_graph_rag_spark.extract.lualite import LUA_EXTENSIONS
    from code_graph_rag_spark.extract.rubylite import RUBY_EXTENSIONS
    from code_graph_rag_spark.extract.rustlite import RUST_EXTENSIONS

    ext = F.lower(
        F.regexp_extract(F.coalesce(doc, F.lit("")), r"\.([A-Za-z0-9]+)$", 1)
    )
    return (
        F.when(ext.isin("ts", "tsx"), "ts")
        .when(ext.isin(*sorted(JS_EXTENSIONS - {"ts", "tsx"})), "js")
        .when(ext.isin(*sorted(JAVA_EXTENSIONS)), "java")
        .when(ext.isin(*sorted(RUST_EXTENSIONS)), "rust")
        .when(ext.isin(*sorted(GO_EXTENSIONS)), "go")
        .when(ext.isin(*sorted(CSHARP_EXTENSIONS)), "csharp")
        .when(ext.isin(*sorted(LUA_EXTENSIONS)), "lua")
        .when(ext.isin(*sorted(CPP_EXTENSIONS)), "cpp")
        .when(ext.isin(*sorted(DART_EXTENSIONS)), "dart")
        .when(ext.isin(*sorted(RUBY_EXTENSIONS)), "ruby")
        .otherwise("python")
    )


def fold_columns_normalized(qn: Column, language: Column) -> tuple[Column, Column]:
    """(module_path, is_stdlib) over PIPELINE-normalized QNs.

    ``fold_columns`` handles QNs *as written in source* (``std::vec::Vec``,
    ``net/http.Get``) — the shape the reference's extractor receives. The
    extraction kernels, however, normalize every separator to ``.``
    (rustlite ``::``→``.``, golite ``/``→``.``) and pre-split the imported
    symbol from its module at parse time (javalite emits the containing
    package, rustlite splits ``use a::b::C`` into module ``a.b`` + symbol
    ``C``), so pipeline ExternalModule ids are dot-joined module paths with
    occasional entity leaves (INHERITS bases like ``requests.Session``).
    This variant applies the same membership tables over that dotted shape
    and folds only entity-shaped leaves (Capitalized / known-entity table) —
    the as-written variant's free-function heuristics (rust plain-lowercase,
    js fold-any-dotted) would misfold ids that are already module paths.
    cpplite marks system includes with an ``external::`` scheme
    (``external::vector``): kept whole, always stdlib.
    """
    d_leaf = _leaf(qn, r"\.")
    d_parent = _parent(qn, r"\.", r"\.")
    d_has = qn.contains(".")
    p1 = F.regexp_extract(qn, r"^([^.]+)", 1)
    p2 = F.regexp_extract(qn, r"^([^.]+\.[^.]+)", 1)
    p3 = F.regexp_extract(qn, r"^([^.]+\.[^.]+\.[^.]+)", 1)
    js_root = F.regexp_replace(p1, "^node:", "")
    js_stripped = F.regexp_replace(qn, "^node:", "")
    cap = _capitalized(d_leaf)
    allcaps = _all_caps(d_leaf)
    is_cpp_sys = qn.startswith("external::")

    py_path = (
        F.when(p3.isin(*PY_STDLIB_MODULES), p3)
        .when(p2.isin(*PY_STDLIB_MODULES), p2)
        .when(p1.isin(*PY_STDLIB_MODULES), p1)
        .when(d_has & cap, d_parent)
        .otherwise(qn)
    )
    js_path = (
        F.when(js_stripped.isin(*JS_NODE_BUILTINS), qn)
        .when(d_has & cap, d_parent)
        .otherwise(qn)
    )
    go_path = F.when(d_has & cap, d_parent).otherwise(qn)
    rust_path = F.when(d_has & (cap | allcaps), d_parent).otherwise(qn)
    cpp_path = F.when(
        ~is_cpp_sys
        & d_has
        & (p1 == "std")
        & (
            cap
            | d_leaf.startswith("is_")
            | d_leaf.startswith("has_")
            | d_leaf.isin(*CPP_STDLIB_ENTITIES)
        ),
        d_parent,
    ).otherwise(qn)
    java_path = F.when(
        d_has
        & (
            cap
            | d_leaf.endswith("Exception")
            | d_leaf.endswith("Error")
            | d_leaf.endswith("Interface")
            | d_leaf.endswith("Builder")
            | d_leaf.isin(*JAVA_STDLIB_CLASSES)
        ),
        d_parent,
    ).otherwise(qn)
    cs_path = F.when(
        d_has
        & d_leaf.isin(*CSHARP_STDLIB_CLASSES)
        & _starts_any(qn, CSHARP_STDLIB_PREFIXES),
        d_parent,
    ).otherwise(qn)
    lua_path = F.when(
        d_has & (p1.isin(*LUA_STDLIB_MODULES) | cap), d_parent
    ).otherwise(qn)
    generic_path = F.when(d_has & cap, d_parent).otherwise(qn)

    module_path = (
        F.when(language == "python", py_path)
        .when(language.isin("js", "ts", "tsx"), js_path)
        .when(language == "go", go_path)
        .when(language == "rust", rust_path)
        .when(language == "cpp", cpp_path)
        .when(language == "java", java_path)
        .when(language == "csharp", cs_path)
        .when(language == "lua", lua_path)
        .otherwise(generic_path)
    )
    is_stdlib = (
        F.when(language == "python", p1.isin(*PY_STDLIB_MODULES))
        .when(
            language.isin("js", "ts", "tsx"),
            js_root.isin(*JS_NODE_BUILTINS) | p1.isin(*JS_GLOBALS),
        )
        .when(language == "go", p1.isin(*GO_STDLIB_ROOTS))
        .when(language == "rust", p1.isin(*RUST_STDLIB_ROOTS))
        .when(language == "cpp", is_cpp_sys | (p1 == "std"))
        .when(language == "java", _starts_any(qn, JAVA_STDLIB_PREFIXES))
        .when(language == "csharp", _starts_any(qn, CSHARP_STDLIB_PREFIXES))
        .when(language == "lua", p1.isin(*LUA_STDLIB_MODULES))
        .when(language == "dart", qn.startswith("dart:"))
        .otherwise(F.lit(False))
    )
    return module_path, is_stdlib


def annotate_external_nodes(
    ext_nodes: DataFrame, edges_prov: DataFrame
) -> DataFrame:
    """Opt-in ``stdlib`` capture group: ExternalModule nodes gain
    ``props = {"is_stdlib": 0|1, "module_path": <owning module>}``
    (reference ``parsers/stdlib_extractor.py`` applied at
    ``import_processor.py:2178`` — external node identity normalized to
    the owning module, here surfaced as a property annotation).

    Scale shape: the per-edge fold is a pure expression (codegen); the only
    shuffle is one groupBy over the DISTINCT ExternalModule id set, which is
    bounded by the ecosystem's package universe (~1e5 ids at any corpus
    size) — broadcast-sized forever. Language is derived per referencing doc
    (src_doc extension); a node referenced from several languages resolves
    deterministically via max(is_stdlib) / min(module_path).
    """
    refs = (
        edges_prov.filter(F.col("obj_label") == "ExternalModule")
        .select(
            F.col("obj").alias("p_id"),
            language_from_doc(F.col("src_doc")).alias("language"),
        )
        .distinct()
    )
    path, std = fold_columns_normalized(F.col("p_id"), F.col("language"))
    props = (
        refs.select(
            "p_id",
            path.alias("module_path"),
            std.cast("int").alias("is_stdlib"),
        )
        .groupBy("p_id")
        .agg(
            F.max("is_stdlib").alias("is_stdlib"),
            F.min("module_path").alias("module_path"),
        )
        .select(
            "p_id",
            F.to_json(F.struct("is_stdlib", "module_path")).alias("props"),
        )
    )
    # rename-before-join: ext_nodes and props both descend from edges_prov
    # (checkpointed, but keep the ambiguous-self-join guard anyway)
    out = ext_nodes.join(
        props, ext_nodes["id"] == props["p_id"], "left"
    ).drop("p_id")
    return out


# --------------------------------------------------------------------------
# pipeline-fixture corpus for the annotation pass (shared by the pytest and
# the kg_stdlib_nodes driver query + its VALUES oracle)
# --------------------------------------------------------------------------

STDLIB_FIXTURE_DOCS: tuple[tuple[str, str], ...] = (
    (
        "stdfix/app.py",
        "import os\n"
        "import requests\n"
        "import xml.etree.ElementTree\n"
        "from collections.abc import Mapping\n"
        "import requests.sessions\n\n"
        "class Client(requests.Session):\n"
        "    pass\n",
    ),
    (
        "stdfix/util.js",
        "const fs = require('fs');\n"
        "const merge = require('lodash');\n"
        "import { join } from 'node:path';\n",
    ),
    (
        "stdfix/Client.java",
        "package stdfix;\n"
        "import java.util.ArrayList;\n"
        "import com.acme.Widget;\n"
        "public class Client {}\n",
    ),
    (
        "stdfix/lib.rs",
        "use std::mem::swap;\n"
        "use serde::Deserialize;\n",
    ),
    (
        "stdfix/main.go",
        "package main\n\n"
        "import (\n"
        "    \"net/http\"\n"
        "    \"github.com/acme/pkg\"\n"
        ")\n",
    ),
    (
        # cpp inherit bases without an alias binding (e.g. `: public
        # std::exception`) are unresolvable and emit nothing (inherits.py
        # no-guessing rule), so the cpp row only exercises the system-include
        # scheme; the entity-shaped external base is covered by the python
        # requests.Session row
        "stdfix/w.cpp",
        "#include <vector>\n",
    ),
)

# (id) -> (name, is_stdlib, module_path) — hand-derived through the per-
# language rules above; one row per ExternalModule node the fixture mints.
STDLIB_FIXTURE_EXPECTED: dict[str, tuple[str, int, str]] = {
    # python imports: module-level targets; requests.Session comes from the
    # INHERITS external base (the entity-shaped id the fold exists for)
    "os": ("os", 1, "os"),
    "requests": ("requests", 0, "requests"),
    "xml.etree.ElementTree": ("ElementTree", 1, "xml.etree.ElementTree"),
    "collections.abc": ("abc", 1, "collections.abc"),
    "requests.sessions": ("sessions", 0, "requests.sessions"),
    "requests.Session": ("Session", 0, "requests"),
    # js require specifiers
    "fs": ("fs", 1, "fs"),
    "lodash": ("lodash", 0, "lodash"),
    "node:path": ("node:path", 1, "node:path"),
    # java class imports arrive pre-folded to the containing package
    "java.util": ("util", 1, "java.util"),
    "com.acme": ("acme", 0, "com.acme"),
    # rust use paths arrive dot-normalized, symbol pre-split
    "std.mem": ("mem", 1, "std.mem"),
    "serde": ("serde", 0, "serde"),
    # go import paths arrive dot-normalized
    "net.http": ("http", 1, "net.http"),
    "github.com.acme.pkg": ("pkg", 0, "github.com.acme.pkg"),
    # cpp: system include scheme
    "external::vector": ("external::vector", 1, "external::vector"),
}


def stdlib_fixture_docs(spark: SparkSession) -> DataFrame:
    from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

    rows = [
        {
            "doc_id": doc_id,
            "spans": [
                {"kind": "code", "text": text, "media_ref": None, "offset": 0}
            ],
        }
        for doc_id, text in STDLIB_FIXTURE_DOCS
    ]
    return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)


# --------------------------------------------------------------------------
# oracle SQL — the SAME fold logic hand-written in ANSI/DuckDB SQL
# --------------------------------------------------------------------------

def _sql_in(values: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in values) + ")"


def _sql_starts_any(col: str, prefixes: tuple[str, ...]) -> str:
    return "(" + " OR ".join(
        f"starts_with({col}, '{p}')" for p in prefixes
    ) + ")"


def fold_oracle_sql() -> str:
    """DuckDB replay of fold_columns over the shared probe corpus.

    The VALUES input and the membership tables are the shared data; the
    fold decision tree itself is re-written in SQL (CASE over the same
    leaf/parent/prefix string ops), so a heuristic-logic bug on either
    side breaks the hash match.
    """
    probes = ",\n                ".join(
        f"('{q}', '{lang}')" for q, lang in STDLIB_PROBES
    )
    return f"""
        WITH probes(qn, language) AS (VALUES
                {probes}
        ),
        base AS (
            SELECT qn, language,
                regexp_extract(qn, '([^.]+)$', 1) AS d_leaf,
                regexp_replace(qn, '\\.[^.]+$', '') AS d_parent,
                contains(qn, '.') AS d_has,
                regexp_extract(qn, '^([^.]+)', 1) AS p1,
                regexp_extract(qn, '^([^.]+\\.[^.]+)', 1) AS p2,
                regexp_extract(qn, '^([^.]+\\.[^.]+\\.[^.]+)', 1) AS p3,
                regexp_extract(qn, '([^:]+)$', 1) AS c_leaf,
                regexp_replace(qn, '::[^:]+$', '') AS c_parent,
                contains(qn, '::') AS c_has,
                regexp_extract(qn, '^([^:]+)', 1) AS c_root,
                regexp_extract(qn, '([^/.]+)$', 1) AS g_leaf,
                regexp_replace(qn, '[/.][^/.]+$', '') AS g_parent,
                (contains(qn, '/') OR contains(qn, '.')) AS g_has,
                regexp_extract(qn, '^([^/.]+)', 1) AS g_root,
                regexp_replace(regexp_extract(qn, '^([^.]+)', 1),
                               '^node:', '') AS js_root,
                regexp_replace(qn, '^node:', '') AS js_stripped
            FROM probes
        ),
        caps AS (
            SELECT *,
                (substring(d_leaf, 1, 1) BETWEEN 'A' AND 'Z') AS d_cap,
                (substring(c_leaf, 1, 1) BETWEEN 'A' AND 'Z') AS c_cap,
                (substring(g_leaf, 1, 1) BETWEEN 'A' AND 'Z') AS g_cap,
                (c_leaf = upper(c_leaf) AND c_leaf <> lower(c_leaf))
                    AS c_allcaps,
                (c_leaf = lower(c_leaf) AND instr(c_leaf, '_') = 0)
                    AS c_plainlower
            FROM base
        )
        SELECT qn, language,
            CASE
                WHEN language = 'python' THEN
                    CASE WHEN p3 IN {_sql_in(PY_STDLIB_MODULES)} THEN p3
                         WHEN p2 IN {_sql_in(PY_STDLIB_MODULES)} THEN p2
                         WHEN p1 IN {_sql_in(PY_STDLIB_MODULES)} THEN p1
                         WHEN d_has AND d_cap THEN d_parent
                         ELSE qn END
                WHEN language IN ('js', 'ts', 'tsx') THEN
                    CASE WHEN js_stripped IN {_sql_in(JS_NODE_BUILTINS)}
                             THEN qn
                         WHEN d_has THEN d_parent
                         ELSE qn END
                WHEN language = 'go' THEN
                    CASE WHEN g_has AND g_cap THEN g_parent ELSE qn END
                WHEN language = 'rust' THEN
                    CASE WHEN c_has AND (c_cap OR c_allcaps OR c_plainlower)
                             THEN c_parent
                         ELSE qn END
                WHEN language = 'cpp' THEN
                    CASE WHEN c_has AND c_root = 'std'
                              AND (c_cap OR starts_with(c_leaf, 'is_')
                                   OR starts_with(c_leaf, 'has_')
                                   OR c_leaf IN {_sql_in(CPP_STDLIB_ENTITIES)})
                             THEN c_parent
                         ELSE qn END
                WHEN language = 'java' THEN
                    CASE WHEN d_has AND (d_cap
                              OR ends_with(d_leaf, 'Exception')
                              OR ends_with(d_leaf, 'Error')
                              OR ends_with(d_leaf, 'Interface')
                              OR ends_with(d_leaf, 'Builder')
                              OR d_leaf IN {_sql_in(JAVA_STDLIB_CLASSES)})
                             THEN d_parent
                         ELSE qn END
                WHEN language = 'csharp' THEN
                    CASE WHEN d_has
                              AND d_leaf IN {_sql_in(CSHARP_STDLIB_CLASSES)}
                              AND {_sql_starts_any("qn", CSHARP_STDLIB_PREFIXES)}
                             THEN d_parent
                         ELSE qn END
                WHEN language = 'lua' THEN
                    CASE WHEN d_has AND (p1 IN {_sql_in(LUA_STDLIB_MODULES)}
                                         OR d_cap)
                             THEN d_parent
                         ELSE qn END
                ELSE CASE WHEN d_has AND d_cap THEN d_parent ELSE qn END
            END AS module_path,
            CAST(CASE
                WHEN language = 'python'
                    THEN p1 IN {_sql_in(PY_STDLIB_MODULES)}
                WHEN language IN ('js', 'ts', 'tsx')
                    THEN js_root IN {_sql_in(JS_NODE_BUILTINS)}
                         OR p1 IN {_sql_in(JS_GLOBALS)}
                WHEN language = 'go'
                    THEN g_root IN {_sql_in(GO_STDLIB_ROOTS)}
                WHEN language = 'rust'
                    THEN c_root IN {_sql_in(RUST_STDLIB_ROOTS)}
                WHEN language = 'cpp' THEN c_root = 'std'
                WHEN language = 'java'
                    THEN {_sql_starts_any("qn", JAVA_STDLIB_PREFIXES)}
                WHEN language = 'csharp'
                    THEN {_sql_starts_any("qn", CSHARP_STDLIB_PREFIXES)}
                WHEN language = 'lua'
                    THEN p1 IN {_sql_in(LUA_STDLIB_MODULES)}
                WHEN language = 'dart' THEN starts_with(qn, 'dart:')
                ELSE FALSE
            END AS INT) AS is_stdlib
        FROM caps
        ORDER BY language, qn
    """
