"""Client URL → endpoint resolution: RESOLVES_TO edges.

Reference: ``parsers/endpoints.py:425-545`` (``link_endpoints``) resolves
every literal request URL captured as a NETWORK resource against the
ENDPOINT resources emitted by the route pass, driver-side, one URL at a
time.  Matching semantics (``url_matches_template``,
``parsers/endpoints.py:129-159``):

* template segments like ``{id}`` / ``:id`` / ``<id>`` / ``<int:id>``
  match exactly one path segment;
* scheme, host, port, query string, fragment and a trailing slash are
  ignored;
* an absolute URL qualifies; a rootful relative URL (``/api/users``) is a
  same-origin request and qualifies on its path; a schemeless fragment and
  a protocol-relative ``//cdn.example.com/x`` are rejected;
* a template opening with the unknown-lead marker (``/**/users/{id}``)
  has an unresolvable mount prefix and matches the URL path's tail;
* templates without a literal segment are skipped entirely (they would
  match any same-length path);
* direction compatibility: a URL only ever read (GET-family sinks) cannot
  resolve to a write-only route and vice versa
  (``_direction_compatible``);
* candidate scoping (#879/#908): an absolute URL whose host names an
  indexed project only sees that project's endpoints; a rootful URL sees
  the calling projects' endpoints; full fan-out only for an absolute URL
  whose host names no indexed project.

Spark form: both frames are bounded by distinct literal URLs / declared
routes — orders of magnitude smaller than the corpus — so the match is an
equi-join on (segment count, direction, project-scope) with an RLIKE
residual over a regex derived from the template by pure string transforms
(no UDF).  The reference's bounded *inference* modes (#911 suffix /
#923 mount-lead recording) are out of scope here; exact + unknown-lead
matching covers every template our endpoint pass emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_READ_METHODS = ("GET", "HEAD", "OPTIONS")

# one path segment that is a route parameter, any supported syntax
_PARAM_SEG = r"\{[^}/]*\}|<[^>/]*>|:[A-Za-z_][A-Za-z0-9_]*"


def _strip(col):
    """Path normalization shared by both sides: drop query/fragment and
    the trailing slash (the reference compares segment lists, which has
    the same effect)."""
    return F.regexp_replace(F.regexp_replace(col, r"[?#].*$", ""), r"/+$", "")


def _nseg(col):
    # segment count without array HOFs: count maximal runs of non-/ chars
    return F.regexp_count(col, F.lit(r"[^/]+"))


def _template_regex(template):
    """Template → Java regex via string transforms: param segments become a
    placeholder, literal text is meta-escaped, the placeholder becomes
    ``[^/]+``.  ``\\x01`` cannot appear in a route literal."""
    ph = F.regexp_replace(template, _PARAM_SEG, "\x01")
    esc = F.regexp_replace(ph, r"([.+?*()\[\]$^|\\{}])", r"\\$1")
    return F.regexp_replace(esc, "\x01", "[^/]+")


def resolves_to_edges(io_e: DataFrame, endpoint_e: DataFrame) -> DataFrame:
    """READS_FROM/WRITES_TO network rows × EXPOSES rows → RESOLVES_TO.

    ``io_e``: the io-sink edge frame (``plans/io_flow.io_edges``);
    ``endpoint_e``: the EXPOSES frame (``plans/endpoints``). Output rows:
    NETWORK Resource -RESOLVES_TO-> endpoint Resource.
    """
    nets = (
        io_e.filter(
            F.col("pred").isin("READS_FROM", "WRITES_TO")
            & F.col("obj").startswith("resource::network::")
        )
        .select(
            F.col("obj").alias("subj"),
            F.expr("substring(obj, 20)").alias("url"),
            F.when(F.col("pred") == "READS_FROM", F.lit("read"))
            .otherwise(F.lit("write"))
            .alias("direction"),
            F.element_at(F.split("subj", r"\."), 1).alias("caller_project"),
            "src_doc",
        )
        .filter(F.col("url") != "<dynamic>")
        .withColumn(
            "is_abs", F.col("url").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
        )
        .withColumn(
            "is_rooted",
            F.col("url").startswith("/") & ~F.col("url").startswith("//"),
        )
        .filter(F.col("is_abs") | F.col("is_rooted"))
        .withColumn(
            "host",
            F.when(
                F.col("is_abs"),
                F.lower(
                    F.regexp_extract(
                        "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1
                    )
                ),
            ),
        )
        .withColumn(
            "path",
            _strip(
                F.when(
                    F.col("is_abs"),
                    F.regexp_extract(
                        "url", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
                    ),
                ).otherwise(F.col("url"))
            ),
        )
        .withColumn("n_seg", _nseg(F.col("path")))
        .dropDuplicates(["subj", "direction", "src_doc"])
    )

    eps = (
        endpoint_e.filter(F.col("pred") == "EXPOSES")
        .select(
            F.col("obj").alias("endpoint"),
            F.regexp_extract("obj", r"^endpoint::([^:]*)::", 1).alias(
                "project"
            ),
            F.regexp_extract("obj", r"^endpoint::[^:]*::(\S+) ", 1).alias(
                "method"
            ),
            _strip(F.regexp_extract("obj", r"^endpoint::[^:]*::\S+ (.*)$", 1))
            .alias("template"),
        )
        .dropDuplicates(["endpoint"])
        # direction gate (reference _direction_compatible)
        .withColumn(
            "direction",
            F.when(F.col("method").isin(*_READ_METHODS), F.lit("read"))
            .otherwise(F.lit("write")),
        )
        # skip templates with no literal segment: after removing every
        # param marker something alphanumeric must remain
        .filter(
            F.regexp_replace("template", _PARAM_SEG, "").rlike("[A-Za-z0-9]")
        )
        .withColumn("is_tail", F.col("template").startswith("/**"))
        .withColumn(
            "tpl_body",
            F.when(
                F.col("is_tail"), F.expr("substring(template, 4)")
            ).otherwise(F.col("template")),
        )
        .withColumn("tpl_regex", _template_regex(F.col("tpl_body")))
        .withColumn("n_seg", _nseg(F.col("tpl_body")))
    )
    # project stem (compose-convention hash suffix + underscore folding,
    # reference _project_stem) — our projects are plain path roots, so the
    # stem is the lowercase underscore-folded name
    eps = eps.withColumn(
        "project_stem", F.lower(F.regexp_replace("project", "_", "-"))
    )

    # disambiguate the shared column names before the theta-joins
    e = eps.select(
        F.col("endpoint"),
        F.col("project").alias("e_project"),
        F.col("project_stem").alias("e_stem"),
        F.col("direction").alias("e_dir"),
        F.col("is_tail"),
        F.col("tpl_regex"),
        F.col("n_seg").alias("e_nseg"),
    )

    def matched(n: DataFrame, scope_cond) -> DataFrame:
        exact = (~F.col("is_tail")) & F.regexp_like(
            F.col("path"),
            F.concat(F.lit("^"), F.col("tpl_regex"), F.lit("$")),
        )
        tail = (
            F.col("is_tail")
            & (F.col("n_seg") >= F.col("e_nseg"))
            & F.regexp_like(
                F.col("path"),
                # any run of lead segments, then the template body (which
                # keeps its leading slash) as the path's tail
                F.concat(
                    F.lit("^(/[^/]+)*"), F.col("tpl_regex"), F.lit("$")
                ),
            )
        )
        return n.join(
            e, scope_cond & (F.col("direction") == F.col("e_dir")), "inner"
        ).filter(exact | tail)

    abs_nets = nets.filter(F.col("is_abs"))
    known_stems = e.select(F.col("e_stem").alias("host")).distinct()
    # absolute URL, host names an indexed project → that project only
    scoped = matched(
        abs_nets.join(known_stems, "host", "left_semi"),
        F.col("host") == F.col("e_stem"),
    )
    # absolute URL, host unknown → full fan-out (reference keeps it)
    fanout = matched(
        abs_nets.join(known_stems, "host", "left_anti"), F.lit(True)
    )
    # rootful same-origin → the calling project's endpoints only (#908)
    rooted = matched(
        nets.filter(F.col("is_rooted")),
        F.col("caller_project") == F.col("e_project"),
    )

    return (
        scoped.unionByName(fanout)
        .unionByName(rooted)
        .select(
            "subj",
            F.lit("RESOLVES_TO").alias("pred"),
            F.col("endpoint").alias("obj"),
            F.lit("Resource").alias("subj_label"),
            F.lit("Resource").alias("obj_label"),
            F.create_map(F.lit("kind"), F.lit("url")).alias("props"),
            "src_doc",
        )
        .dropDuplicates(["subj", "obj", "src_doc"])
    )
