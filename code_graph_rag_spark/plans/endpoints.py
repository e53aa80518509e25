"""Endpoint exposure: route decorators → ``EXPOSES`` edges.

Reference: ``parsers/endpoints.py:60-91`` parses handler route decorators
(``@app.get("/users/{id}")``, ``@router.route("/x", methods=["POST"])``)
into ``(METHOD, /path)`` pairs; handlers get ``Function|Method -EXPOSES->
Resource(kind=ENDPOINT)`` edges with the endpoint id carrying project,
method and path (``endpoint_routes.py``). Mount prefixes
(``app.include_router(router, prefix="/api")``,
``endpoint_prefixes.py``) prepend to every route hung off that router
variable.

Spark form: decorators live verbatim in the entity ``props`` JSON (the
kernels store the full decorator text incl. the literal argument list);
this pass is pure DataFrame — ``from_json`` → ``explode`` →
``regexp_extract`` for the route parse, one broadcast-friendly join for
mount prefixes. No UDF anywhere; the whole pass is whole-stage codegen and
scales linearly with the entity table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HTTP_METHODS = ("get", "post", "put", "patch", "delete", "head", "options", "websocket")

# @[receiver.]name("<path>"...) with a literal leading-slash path — computed
# paths (prefix + "/x") are rejected, like the reference's text parse
_ROUTE_RE = r"^@?(?:(\w+(?:\.\w+)*)\.)?(\w+)\(\s*['\"](/[^'\"]*)['\"]"
_METHODS_KWARG_RE = r"methods\s*=\s*[\[({]([^\])}]*)[\])}]"

# include_router / use / mount registration: receiver variable + prefix
_MOUNT_RE = (
    r"(?:include_router|use|mount|register_blueprint)\(\s*(\w+)\s*,"
    r"[^)]*?(?:prefix\s*=\s*|url_prefix\s*=\s*)['\"](/[^'\"]*)['\"]"
)


def endpoint_edges(entities: DataFrame, mentions: DataFrame) -> DataFrame:
    """entities(props JSON with decorators) + mentions → EXPOSES edges.

    Edge: handler -EXPOSES-> ``endpoint::<project>::<METHOD> <path>``
    (Resource node, kind=endpoint — materialized by the generic
    resource-node derivation in ``pipeline.py``). Routes declared with
    ``methods=[...]`` fan out one edge per method; plain ``@x.route`` is
    GET (reference ``_DEFAULT_ROUTE_METHOD``).
    """
    handlers = entities.filter(
        F.col("label").isin("Function", "Method") & F.col("props").isNotNull()
    ).select(
        F.col("qualified_name").alias("subj"),
        F.col("label").alias("subj_label"),
        F.col("doc_id").alias("src_doc"),
        F.element_at(F.split("qualified_name", "\\."), 1).alias("project"),
        F.explode(
            F.from_json(F.col("props"), "struct<decorators:array<string>>")[
                "decorators"
            ]
        ).alias("dec"),
    )
    routes = handlers.select(
        "subj",
        "subj_label",
        "src_doc",
        "project",
        "dec",
        F.lower(F.regexp_extract("dec", _ROUTE_RE, 2)).alias("dec_name"),
        F.regexp_extract("dec", _ROUTE_RE, 1).alias("receiver"),
        F.regexp_extract("dec", _ROUTE_RE, 3).alias("path"),
        F.regexp_extract("dec", _METHODS_KWARG_RE, 1).alias("methods_kwarg"),
    ).filter(
        (F.col("path") != "")
        & (F.col("dec_name").isin(*HTTP_METHODS) | (F.col("dec_name") == "route"))
    )
    # method fan-out: http-verb decorators carry their own method; route()
    # takes a methods=[...] kwarg, defaulting to GET
    methods = F.when(
        F.col("dec_name").isin(*HTTP_METHODS), F.array(F.upper("dec_name"))
    ).otherwise(
        F.when(
            F.col("methods_kwarg") != "",
            F.expr(
                "transform(filter(split(regexp_replace(methods_kwarg,"
                " '[\\'\"\\\\s]', ''), ','), x -> x <> ''), x -> upper(x))"
            ),
        ).otherwise(F.array(F.lit("GET")))
    )
    routed = routes.select(
        "subj",
        "subj_label",
        "src_doc",
        "project",
        "receiver",
        "path",
        F.explode(methods).alias("method"),
    )

    # mount prefixes: the kernels emit a ``mount`` mention for
    # include_router/use/mount/register_blueprint calls (name = the router
    # variable, arg0_lit = the prefix literal — endpoint_prefixes.py). The
    # registry is tiny (one row per mount call) → broadcast join on the
    # receiver variable name. The reference's prefix resolver walks import
    # chains; the receiver-name join is its declarative fallback
    # (endpoint_prefixes.py UNKNOWN_LEAD marker covers the ambiguous rest).
    mounts = (
        mentions.filter(
            (F.col("kind") == "mount") & F.col("arg0_lit").isNotNull()
        )
        .select(
            F.col("name").alias("receiver"),
            F.col("arg0_lit").alias("m_prefix"),
        )
        .dropDuplicates(["receiver"])
    )
    prefixed = routed.join(F.broadcast(mounts), "receiver", "left").select(
        "subj",
        "subj_label",
        "src_doc",
        "project",
        "method",
        F.concat(F.coalesce("m_prefix", F.lit("")), F.col("path")).alias("full_path"),
    )

    return _to_exposes(prefixed)


def _to_exposes(prefixed: DataFrame) -> DataFrame:
    """(subj, subj_label, src_doc, project, method, full_path) → EXPOSES
    edge rows with the shared endpoint-resource id scheme."""
    return prefixed.select(
        "subj",
        F.lit("EXPOSES").alias("pred"),
        F.concat_ws(
            "::",
            F.lit("endpoint"),
            "project",
            F.concat_ws(" ", "method", "full_path"),
        ).alias("obj"),
        "subj_label",
        F.lit("Resource").alias("obj_label"),
        F.create_map(
            F.lit("kind"),
            F.lit("endpoint"),
            F.lit("method"),
            F.col("method"),
            F.lit("path"),
            F.col("full_path"),
        ).alias("props"),
        "src_doc",
    ).dropDuplicates(["subj", "obj", "src_doc"])


def route_call_edges(entities: DataFrame, mentions: DataFrame) -> DataFrame:
    """Call-registered routes → EXPOSES edges (reference
    ``endpoint_routes.py``, issue #886 shapes): Express verb calls
    ``app.get('/p', handler)``, Flask/FastAPI ``add_url_rule`` /
    ``add_api_route``, Go ``http.HandleFunc("/p", h)`` (incl. Go 1.22
    ``"GET /p"`` patterns) and echo/gin/chi verb methods.

    The kernels emit one ``route_call`` mention per registration
    (``local_name`` = verb | ``route`` | ``any``, ``arg0_lit`` = path,
    ``name`` = handler identifier or null for inline handlers, ``target``
    = raw methods kwarg). Attribution ladder (endpoint_routes.py): a
    named handler must resolve to a module Function/Method (inner join —
    the server-registration evidence gate: an identifier that is NOT a
    module function, e.g. a client config object, yields nothing); an
    inline handler attributes to the registering call's enclosing
    callable, else the module.
    """
    rc = mentions.filter(F.col("kind") == "route_call").select(
        "module_qn",
        F.col("doc_id").alias("src_doc"),
        "name",
        "local_name",
        "target",
        "parent_qn",
        "parent_kind",
        F.col("arg0_lit").alias("raw_path"),
        F.element_at(F.split("module_qn", "\\."), 1).alias("project"),
        F.split(F.col("callee"), "\\.").getItem(0).alias("receiver"),
    )
    # Go 1.22 "VERB /path" patterns carry the method inside the literal
    p_verb = F.regexp_extract("raw_path", r"^([A-Z]+) (/.*)$", 1)
    p_path = F.regexp_extract("raw_path", r"^([A-Z]+) (/.*)$", 2)
    path = F.when(p_verb != "", p_path).otherwise(F.col("raw_path"))
    methods = (
        F.when(
            F.col("local_name") == "route",
            F.when(
                F.col("target").isNotNull() & (F.col("target") != ""),
                F.expr(
                    "transform(filter(split(regexp_replace(target,"
                    " '[\\'\"\\\\s]', ''), ','), x -> x <> ''), x -> upper(x))"
                ),
            ).otherwise(F.array(F.lit("GET"))),
        )
        .when(
            F.col("local_name") == "any",
            F.array(F.when(p_verb != "", p_verb).otherwise(F.lit("ANY"))),
        )
        .otherwise(F.array(F.upper("local_name")))
    )
    routed = rc.select(
        "module_qn",
        "src_doc",
        "name",
        "parent_qn",
        "parent_kind",
        "project",
        "receiver",
        path.alias("path"),
        F.explode(methods).alias("method"),
    )

    fns = entities.filter(
        F.col("label").isin("Function", "Method")
    ).select(
        F.col("qn").alias("handler_qn"),
        F.col("qualified_name").alias("handler_id"),
        F.col("label").alias("handler_label"),
    )
    named = (
        routed.filter(F.col("name").isNotNull())
        .withColumn(
            "handler_qn", F.concat_ws(".", "module_qn", "name")
        )
        .join(fns, "handler_qn")  # inner: the evidence gate
        .select(
            F.col("handler_id").alias("subj"),
            F.col("handler_label").alias("subj_label"),
            "src_doc",
            "project",
            "method",
            "path",
            "receiver",
        )
    )
    unnamed = routed.filter(F.col("name").isNull()).select(
        F.when(
            F.col("parent_kind").isin("Function", "Method"),
            F.col("parent_qn"),
        )
        .otherwise(F.col("module_qn"))
        .alias("subj"),
        F.when(
            F.col("parent_kind").isin("Function", "Method"),
            F.col("parent_kind"),
        )
        .otherwise(F.lit("Module"))
        .alias("subj_label"),
        "src_doc",
        "project",
        "method",
        "path",
        "receiver",
    )
    all_routes = named.unionByName(unnamed)

    # sub-router mount prefixes apply to call-registered routes exactly as
    # to decorator routes (the receiver variable is the join key)
    mounts = (
        mentions.filter(
            (F.col("kind") == "mount") & F.col("arg0_lit").isNotNull()
        )
        .select(
            F.col("name").alias("receiver"),
            F.col("arg0_lit").alias("m_prefix"),
        )
        .dropDuplicates(["receiver"])
    )
    prefixed = all_routes.join(F.broadcast(mounts), "receiver", "left").select(
        "subj",
        "subj_label",
        "src_doc",
        "project",
        "method",
        F.concat(F.coalesce("m_prefix", F.lit("")), F.col("path")).alias(
            "full_path"
        ),
    )
    return _to_exposes(prefixed)
