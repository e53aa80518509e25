"""IO access + data-flow edges (the reference's ``io`` capture group).

Reference: ``parsers/io_access/processor.py`` walks each caller's AST
against a per-language sink registry (``io_access/registry.py``) and emits
``caller READS_FROM/WRITES_TO Resource`` with synthetic resource ids
``resource::<kind>::<identity>`` (``io_access/constants.py:57``);
``parsers/flow_access/processor.py`` emits ``FLOWS_TO`` value-flow edges
keyed by (via, kind) props (``constants/graph.py:471``).

Spark form: the kernel already extracted every call's literal arg0/arg1 and
its return-position flag; here the sink REGISTRY IS A BROADCAST TABLE and
sink matching is one equi-join on the import-expanded callee — no UDF, no
per-row Python. Like the reference, the ``io`` capture group is OFF in the
default group set (``constants/graph.py:250-257``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (normalized callee, resource kind, declared direction, has_target_arg,
# has_mode_arg) — the reference's io_access/registry.py sink tables,
# MERGED across languages: the kernels all emit dotted callees over one
# mention IR, so one registry serves every tier (the reference keys its
# per-language tables the same way and unions them per file extension).
# Only Python ``open`` takes a mode string. Sinks whose callee text is
# unambiguous across languages (fmt.Println, console.log, System.out.
# println, os.Getenv vs os.getenv — Go exports are capitalized) coexist
# in one table without language gating.
IO_SINKS: list[tuple[str, str, str, bool, bool]] = [
    # ---- Python (_PYTHON_SINKS) ----
    ("open", "file", "read", True, True),
    ("os.getenv", "env", "read", True, False),
    ("os.environ.get", "env", "read", True, False),
    ("print", "stdout", "write", False, False),
    ("json.load", "file", "read", False, False),
    ("json.dump", "file", "write", False, False),
    ("requests.get", "network", "read", True, False),
    ("requests.head", "network", "read", True, False),
    ("requests.post", "network", "write", True, False),
    ("requests.put", "network", "write", True, False),
    ("requests.patch", "network", "write", True, False),
    ("requests.delete", "network", "write", True, False),
    ("urllib.request.urlopen", "network", "read", True, False),
    # ---- JS/TS (_JS_TS_SINKS) ----
    ("console.log", "stdout", "write", False, False),
    ("console.info", "stdout", "write", False, False),
    ("console.warn", "stderr", "write", False, False),
    ("console.error", "stderr", "write", False, False),
    ("fetch", "network", "read", True, False),
    ("axios.get", "network", "read", True, False),
    ("axios.head", "network", "read", True, False),
    ("axios.post", "network", "write", True, False),
    ("axios.put", "network", "write", True, False),
    ("axios.patch", "network", "write", True, False),
    ("axios.delete", "network", "write", True, False),
    ("fs.readFile", "file", "read", True, False),
    ("fs.readFileSync", "file", "read", True, False),
    ("fs.writeFile", "file", "write", True, False),
    ("fs.writeFileSync", "file", "write", True, False),
    ("fs.appendFile", "file", "write", True, False),
    ("fs.appendFileSync", "file", "write", True, False),
    # ---- Go (_GO_SINKS; exported names are capitalized, no clash) ----
    ("os.Getenv", "env", "read", True, False),
    ("os.LookupEnv", "env", "read", True, False),
    ("os.ReadFile", "file", "read", True, False),
    ("os.Open", "file", "read", True, False),
    ("os.WriteFile", "file", "write", True, False),
    ("os.Create", "file", "write", True, False),
    ("os.Remove", "file", "write", True, False),
    ("fmt.Print", "stdout", "write", False, False),
    ("fmt.Println", "stdout", "write", False, False),
    ("fmt.Printf", "stdout", "write", False, False),
    ("http.Get", "network", "read", True, False),
    ("http.Post", "network", "write", True, False),
    # ---- Java (_JAVA_SYSTEM_SINKS + Files) ----
    ("System.getenv", "env", "read", True, False),
    ("System.out.println", "stdout", "write", False, False),
    ("System.out.print", "stdout", "write", False, False),
    ("System.out.printf", "stdout", "write", False, False),
    ("System.err.println", "stderr", "write", False, False),
    ("System.err.print", "stderr", "write", False, False),
    ("Files.readString", "file", "read", True, False),
    ("Files.readAllBytes", "file", "read", True, False),
    ("Files.readAllLines", "file", "read", True, False),
    ("Files.writeString", "file", "write", True, False),
    ("Files.write", "file", "write", True, False),
    # ---- C# (_CSHARP_SINKS) ----
    ("Console.WriteLine", "stdout", "write", False, False),
    ("Console.Write", "stdout", "write", False, False),
    ("Console.ReadLine", "stdin", "read", False, False),
    ("Environment.GetEnvironmentVariable", "env", "read", True, False),
    ("File.ReadAllText", "file", "read", True, False),
    ("File.ReadAllLines", "file", "read", True, False),
    ("File.ReadAllBytes", "file", "read", True, False),
    ("File.WriteAllText", "file", "write", True, False),
    ("File.WriteAllLines", "file", "write", True, False),
    ("File.AppendAllText", "file", "write", True, False),
    # ---- Rust (_RUST_SINKS; :: normalized to . by the kernel) ----
    ("std.env.var", "env", "read", True, False),
    ("env.var", "env", "read", True, False),
    ("std.fs.read_to_string", "file", "read", True, False),
    ("fs.read_to_string", "file", "read", True, False),
    ("std.fs.read", "file", "read", True, False),
    ("fs.read", "file", "read", True, False),
    ("std.fs.write", "file", "write", True, False),
    ("fs.write", "file", "write", True, False),
    ("std.fs.remove_file", "file", "write", True, False),
    ("fs.remove_file", "file", "write", True, False),
    # println!/eprintln! are macros the call regex does not key; print
    # functions via io are the registry rows (the reference keys the same)
    ("std.io.stdin", "stdin", "read", False, False),
    ("io.stdin", "stdin", "read", False, False),
    # ---- C++ (_CPP_SINKS; :: normalized to . by the kernel) ----
    ("std.getenv", "env", "read", True, False),
    ("getenv", "env", "read", True, False),
    ("std.fopen", "file", "read", True, True),
    ("fopen", "file", "read", True, True),
    ("std.printf", "stdout", "write", False, False),
    ("printf", "stdout", "write", False, False),
    ("std.fprintf", "file", "write", False, False),
    ("fprintf", "file", "write", False, False),
    # ---- Lua (os.getenv / print share the Python rows verbatim) ----
    ("io.open", "file", "read", True, True),
    ("io.read", "stdin", "read", False, False),
    ("io.write", "stdout", "write", False, False),
    # ---- Dart ----
    ("File.readAsString", "file", "read", False, False),
    ("File.writeAsString", "file", "write", False, False),
    ("stdout.writeln", "stdout", "write", False, False),
    ("stderr.writeln", "stderr", "write", False, False),
]

DYNAMIC_TARGET = "<dynamic>"


def io_edges(mentions: DataFrame, alias: DataFrame) -> DataFrame:
    """call mentions × sink registry → READS_FROM / WRITES_TO edges.

    The callee is normalized two ways — as written, and import-expanded
    through the alias frame (``from os import getenv`` → ``os.getenv``) —
    and each candidate equi-joins the broadcast sink table. ``open``-style
    mode strings refine the declared direction (``mode`` chars w/a/x →
    write, ``+`` → read AND write, io_access/constants.py:64-67).
    """
    spark = mentions.sparkSession
    sinks = F.broadcast(
        spark.createDataFrame(
            IO_SINKS,
            "sink string, res_kind string, direction string, "
            "has_target boolean, has_mode boolean",
        )
    )
    calls = mentions.filter(F.col("kind") == "call").select(
        "doc_id",
        "module_qn",
        F.col("parent_qn").alias("subj"),
        F.col("parent_kind").alias("subj_label"),
        "callee",
        "arg0_lit",
        "arg1_lit",
        F.split(F.col("callee"), "\\.").getItem(0).alias("first_seg"),
        F.when(
            F.instr(F.col("callee"), ".") > 0,
            F.expr("substring(callee, instr(callee, '.') + 1)"),
        ).alias("rest"),
    )
    # alias frame scales with the corpus — AQE decides broadcast at runtime
    balias = alias.select(
        F.col("module_qn").alias("a_mqn"),
        F.col("local_name").alias("a_local"),
        "full_qn",
    )
    expanded = calls.join(
        balias,
        (calls["module_qn"] == F.col("a_mqn"))
        & (calls["first_seg"] == F.col("a_local")),
    ).select(
        "doc_id",
        "subj",
        "subj_label",
        "arg0_lit",
        "arg1_lit",
        F.when(F.col("rest").isNotNull(), F.concat_ws(".", "full_qn", "rest"))
        .otherwise(F.col("full_qn"))
        .alias("norm"),
    )
    as_written = calls.select(
        "doc_id",
        "subj",
        "subj_label",
        "arg0_lit",
        "arg1_lit",
        F.col("callee").alias("norm"),
    )
    hits = as_written.unionByName(expanded).join(
        sinks, F.col("norm") == sinks["sink"]
    )

    # the mode-string refinement applies ONLY to sinks that take a mode
    # argument (open); e.g. print(x, "a+b") must stay a plain stdout write
    mode = F.when(F.col("has_mode"), F.coalesce(F.col("arg1_lit"), F.lit(""))).otherwise(
        F.lit("")
    )
    is_write = (
        (F.col("direction") == "write")
        | mode.rlike("[wax]")
        | mode.contains("+")
    )
    is_read = (
        (F.col("direction") == "read") & ~mode.rlike("[wax]")
    ) | mode.contains("+")
    identity = F.when(F.col("res_kind") == "stdout", F.lit("stdout")).otherwise(
        F.when(
            F.col("has_target") & F.col("arg0_lit").isNotNull(),
            F.col("arg0_lit"),
        ).otherwise(F.lit(DYNAMIC_TARGET))
    )
    base = hits.select(
        "subj",
        "subj_label",
        F.concat_ws("::", F.lit("resource"), "res_kind", identity).alias("obj"),
        F.lit("Resource").alias("obj_label"),
        F.create_map(F.lit("kind"), F.col("res_kind")).alias("props"),
        F.col("doc_id").alias("src_doc"),
        is_read.alias("r"),
        is_write.alias("w"),
    )
    reads = base.filter(F.col("r")).select(
        "subj", F.lit("READS_FROM").alias("pred"), "obj",
        "subj_label", "obj_label", "props", "src_doc",
    )
    writes = base.filter(F.col("w")).select(
        "subj", F.lit("WRITES_TO").alias("pred"), "obj",
        "subj_label", "obj_label", "props", "src_doc",
    )
    return reads.unionByName(writes).dropDuplicates(
        ["subj", "pred", "obj", "src_doc"]
    )


def flow_edges(resolved: DataFrame) -> DataFrame:
    """``return g(...)`` → ``g FLOWS_TO f`` (via=return, kind=call).

    The flow_access analogue for the return-value flow family: the callee's
    result flows into the caller's return value. (via, kind) are part of the
    edge identity (MERGE_KEY_PROPS_BY_REL).
    """
    return (
        resolved.filter(
            (F.col("kind") == "call")
            & F.col("is_ret")
            & F.col("target_label").isin("Function", "Method")
        )
        .select(
            F.col("target_variant").alias("subj"),
            F.lit("FLOWS_TO").alias("pred"),
            F.col("caller_qn").alias("obj"),
            F.col("target_label").alias("subj_label"),
            F.col("caller_label").alias("obj_label"),
            F.create_map(
                F.lit("via"), F.lit("return"), F.lit("kind"), F.lit("call")
            ).alias("props"),
            F.col("doc_id").alias("src_doc"),
        )
        .dropDuplicates(["subj", "pred", "obj", "src_doc"])
    )
