"""Cypher-subset read path compiled to DataFrame plans (SURVEY §2.13).

The reference answers graph questions by generating read-only Cypher and
running it against Memgraph (``tools/codebase_query.py:30-120``); its whole
query surface is MATCH patterns over labeled nodes and typed edges with
property predicates, projections, aggregation, ORDER BY and LIMIT
(``cypher_queries.py`` — audit triples, decorated functions, orphan scans).
This module re-expresses that read path Spark-first: a Cypher MATCH query is
parsed and compiled to a declarative DataFrame plan over the materialized
``nodes`` / ``edges`` frames, so Catalyst gets full predicate pushdown and
join planning — no graph store in the loop.

Supported subset (everything the reference's read queries use):

- ``MATCH (a:Label|Label2 {prop: 'lit'})-[r:REL|REL2]->(b) ...`` chains of
  any length, both arrow directions, anonymous nodes/edges.
- Variable-length edges ``-[:REL*]->`` (bounded transitive closure by
  doubling — O(log depth) shuffles, same pattern as the inheritance
  closure in ``plans/inherits.py``).
- ``WHERE`` with AND/OR/NOT, ``=``, ``<>``, ``<``, ``<=``, ``>``, ``>=``,
  ``STARTS WITH``, ``CONTAINS``, ``IN [...]``, ``IS [NOT] NULL``; label
  predicates ``n:Label``; degree/pattern predicates ``(n)--()``,
  ``(n)-->()``, ``(n)<--()``, ``(n)-[:REL]->()`` (the reference's orphan
  audit shape, ``cypher_queries.py:7-10``) — compiled to left-semi /
  left-anti joins on the edge frame, so they stay distributed.
- ``OPTIONAL MATCH`` chains anchored on a bound variable (the reference's
  project-structure query, ``cypher_queries.py:31-33``) — compiled to left
  outer joins; chained optionals propagate nulls.
- ``WITH [DISTINCT] items [WHERE cond]`` pipeline stages (the
  damaged-structure probe ``WITH n, count(parent) AS parents WHERE parents
  > 1``, ``cypher_queries.py:44-48``): bare variables pass through, count()
  aggregates with the other items as group keys, aliases shadow variables
  downstream.
- ``UNWIND labels(n) AS l`` (CYPHER_AUDIT_LABELS — a label projection here,
  since the store is one row per label).
- ``RETURN [DISTINCT]`` items: ``x.prop``, ``x`` (the node key),
  ``labels(x)[0]``, ``type(r)``, ``toLower(expr)``, literals, ``count(*)``,
  ``count([DISTINCT] expr)``, ``sum/min/max/avg(expr)`` (also in WITH
  stages, so fan-out-of-an-aggregate pipelines like ``WITH m, count(f) AS
  n RETURN max(n)`` compile); Cypher aggregation semantics (non-aggregate
  items are the group keys).
- ``ORDER BY alias [ASC|DESC], ...`` and ``LIMIT n``.

Node property names map onto the node-frame columns; ``qualified_name`` is
the node key (``id`` column) per the reference's per-label unique keys
(``constants/graph.py:112-137``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<str>'(?:[^'\\]|\\.)*')
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<arrow><-|->)
    | (?P<sym><=|>=|<>|\.\.|[()\[\]{}:,.|*=<>-])
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.X,
)

_KEYWORDS = {
    "MATCH", "WHERE", "RETURN", "DISTINCT", "AS", "ORDER", "BY", "LIMIT",
    "AND", "OR", "NOT", "IS", "NULL", "STARTS", "WITH", "CONTAINS", "IN",
    "DESC", "ASC", "COUNT", "LABELS", "TYPE", "OPTIONAL", "UNWIND",
    "TOLOWER", "SUM", "MIN", "MAX", "AVG",
}


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m or m.end() == i:
            if q[i:].strip():
                raise CypherError(f"cannot tokenize at: {q[i:i + 20]!r}")
            break
        i = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "name" and text.upper() in _KEYWORDS:
            out.append(("kw", text.upper()))
        else:
            out.append((kind, text))
    return out


class CypherError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class NodePat:
    var: str
    labels: list[str] = field(default_factory=list)
    props: list[tuple[str, object]] = field(default_factory=list)


@dataclass
class EdgePat:
    var: str | None
    rels: list[str]
    left_to_right: bool  # True for (a)-[...]->(b)
    varlen: bool = False


@dataclass
class WithStage:
    distinct: bool
    items: list[tuple[tuple, str]]  # (expr, alias)
    where: object | None


@dataclass
class Query:
    chains: list[list]  # alternating NodePat / EdgePat
    pre_where: object | None  # WHERE before OPTIONAL MATCH clauses
    optional_chains: list[list]  # one chain per OPTIONAL MATCH clause
    where: object | None
    unwind: tuple[str, str] | None  # UNWIND labels(var) AS alias
    withs: list[WithStage]
    distinct: bool
    items: list[tuple[tuple, str]]  # (expr, alias)
    order: list[tuple[str, bool]]  # (alias, desc)
    limit: int | None


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def take(self, kind=None, text=None):
        t = self.peek()
        if kind and t[0] != kind:
            raise CypherError(f"expected {kind}, got {t}")
        if text and t[1] != text:
            raise CypherError(f"expected {text!r}, got {t}")
        self.i += 1
        return t

    def at(self, kind, text=None):
        t = self.peek()
        return t[0] == kind and (text is None or t[1] == text)

    # -- pattern ------------------------------------------------------------

    def parse(self) -> Query:
        self.take("kw", "MATCH")
        chains = [self._chain()]
        while self.at("sym", ","):
            self.take()
            chains.append(self._chain())
        pre_where = None
        if self.at("kw", "WHERE"):
            self.take()
            pre_where = self._or_expr()
        optional_chains: list[list] = []
        while self.at("kw", "OPTIONAL"):
            self.take()
            self.take("kw", "MATCH")
            optional_chains.append(self._chain())
        where = None
        if self.at("kw", "WHERE"):
            self.take()
            where = self._or_expr()
        unwind = None
        if self.at("kw", "UNWIND"):
            # UNWIND labels(n) AS l — the one UNWIND shape the reference's
            # audit queries use; our store is one row per label, so this is
            # a projection of the row's label, not a row multiplier
            self.take()
            self.take("kw", "LABELS")
            self.take("sym", "(")
            uvar = self.take("name")[1]
            self.take("sym", ")")
            self.take("kw", "AS")
            unwind = (uvar, self.take("name")[1])
        withs: list[WithStage] = []
        while self.at("kw", "WITH"):
            self.take()
            wdist = False
            if self.at("kw", "DISTINCT"):
                self.take()
                wdist = True
            witems = [self._ret_item()]
            while self.at("sym", ","):
                self.take()
                witems.append(self._ret_item())
            wwhere = None
            if self.at("kw", "WHERE"):
                self.take()
                wwhere = self._or_expr()
            withs.append(WithStage(wdist, witems, wwhere))
        self.take("kw", "RETURN")
        distinct = False
        if self.at("kw", "DISTINCT"):
            self.take()
            distinct = True
        items = [self._ret_item()]
        while self.at("sym", ","):
            self.take()
            items.append(self._ret_item())
        order: list[tuple[str, bool]] = []
        if self.at("kw", "ORDER"):
            self.take()
            self.take("kw", "BY")
            order.append(self._order_item(items))
            while self.at("sym", ","):
                self.take()
                order.append(self._order_item(items))
        limit = None
        if self.at("kw", "LIMIT"):
            self.take()
            limit = int(self.take("num")[1])
        if self.peek()[0] != "eof":
            raise CypherError(f"trailing tokens at {self.peek()}")
        return Query(
            chains, pre_where, optional_chains, where, unwind, withs,
            distinct, items, order, limit,
        )

    _anon = 0

    def _gensym(self) -> str:
        _Parser._anon += 1
        return f"__anon{_Parser._anon}"

    def _chain(self) -> list:
        out = [self._node_pat()]
        while self.at("sym", "-") or self.at("arrow", "<-"):
            ep = self._edge_pat()
            out.append(ep)
            out.append(self._node_pat())
        return out

    def _node_pat(self) -> NodePat:
        self.take("sym", "(")
        var = self._gensym()
        if self.at("name"):
            var = self.take("name")[1]
        labels: list[str] = []
        if self.at("sym", ":"):
            self.take()
            labels.append(self.take("name")[1])
            while self.at("sym", "|"):
                self.take()
                labels.append(self.take("name")[1])
        props: list[tuple[str, object]] = []
        if self.at("sym", "{"):
            self.take()
            while not self.at("sym", "}"):
                k = self.take("name")[1]
                self.take("sym", ":")
                props.append((k, self._literal()))
                if self.at("sym", ","):
                    self.take()
            self.take("sym", "}")
        self.take("sym", ")")
        return NodePat(var, labels, props)

    def _edge_pat(self) -> EdgePat:
        if self.at("arrow", "<-"):
            self.take()
            left_to_right = False
        else:
            self.take("sym", "-")
            left_to_right = True
        var, rels, varlen = None, [], False
        if self.at("sym", "["):
            self.take()
            if self.at("name"):
                var = self.take("name")[1]
            if self.at("sym", ":"):
                self.take()
                rels.append(self.take("name")[1])
                while self.at("sym", "|"):
                    self.take()
                    rels.append(self.take("name")[1])
            if self.at("sym", "*"):
                self.take()
                varlen = True
                # swallow optional bounds like *1..4 (closure bound is the
                # compiler's doubling depth; explicit bounds are advisory)
                while self.at("num") or self.at("sym", ".."):
                    self.take()
            self.take("sym", "]")
        if left_to_right:
            self.take("arrow", "->")
        else:
            self.take("sym", "-")
        return EdgePat(var, rels, left_to_right, varlen)

    def _literal(self):
        t = self.peek()
        if t[0] == "str":
            self.take()
            return t[1][1:-1].replace("\\'", "'")
        if t[0] == "num":
            self.take()
            return float(t[1]) if "." in t[1] else int(t[1])
        if t == ("kw", "NULL"):
            self.take()
            return None
        raise CypherError(f"expected literal, got {t}")

    # -- WHERE --------------------------------------------------------------

    def _or_expr(self):
        left = self._and_expr()
        while self.at("kw", "OR"):
            self.take()
            left = ("or", left, self._and_expr())
        return left

    def _and_expr(self):
        left = self._not_expr()
        while self.at("kw", "AND"):
            self.take()
            left = ("and", left, self._not_expr())
        return left

    def _not_expr(self):
        if self.at("kw", "NOT"):
            self.take()
            return ("not", self._not_expr())
        if self.at("sym", "("):
            # `(n)--()` pattern predicate vs parenthesized condition:
            # a pattern is `(` name `)` followed by an edge connector
            if (
                self.peek(1)[0] == "name"
                and self.peek(2) == ("sym", ")")
                and (self.peek(3) in (("sym", "-"), ("arrow", "<-")))
            ):
                return self._pattern_pred()
            self.take()
            e = self._or_expr()
            self.take("sym", ")")
            return e
        return self._cmp()

    def _pattern_pred(self):
        """Degree predicate ``(var)--()`` / ``(var)-->()`` / ``(var)<--()``
        with an optional ``[:REL|REL2]`` — the far node must be anonymous
        and bare in the v1 subset."""
        self.take("sym", "(")
        var = self.take("name")[1]
        self.take("sym", ")")
        rels: list[str] = []

        def _relspec():
            if self.at("sym", "["):
                self.take()
                if self.at("sym", ":"):
                    self.take()
                    rels.append(self.take("name")[1])
                    while self.at("sym", "|"):
                        self.take()
                        rels.append(self.take("name")[1])
                self.take("sym", "]")

        if self.at("arrow", "<-"):
            self.take()
            _relspec()
            self.take("sym", "-")
            direction = "in"
        else:
            self.take("sym", "-")
            _relspec()
            if self.at("arrow", "->"):
                self.take()
                direction = "out"
            else:
                self.take("sym", "-")
                direction = "both"
        self.take("sym", "(")
        self.take("sym", ")")
        return ("pattern", var, rels, direction)

    def _cmp(self):
        # label predicate `var:Label` (cypher_queries.py `NOT n:Project`)
        if self.at("name") and self.peek(1) == ("sym", ":"):
            var = self.take("name")[1]
            self.take("sym", ":")
            return ("labelis", var, self.take("name")[1])
        lhs = self._value_expr()
        t = self.peek()
        if t == ("kw", "IS"):
            self.take()
            neg = False
            if self.at("kw", "NOT"):
                self.take()
                neg = True
            self.take("kw", "NULL")
            return ("isnull", lhs, neg)
        if t == ("kw", "STARTS"):
            self.take()
            self.take("kw", "WITH")
            return ("startswith", lhs, self._literal())
        if t == ("kw", "CONTAINS"):
            self.take()
            return ("contains", lhs, self._literal())
        if t == ("kw", "IN"):
            self.take()
            self.take("sym", "[")
            vals = [self._literal()]
            while self.at("sym", ","):
                self.take()
                vals.append(self._literal())
            self.take("sym", "]")
            return ("in", lhs, vals)
        if t[0] == "sym" and t[1] in ("=", "<>", "<", "<=", ">", ">="):
            self.take()
            return ("cmp", t[1], lhs, self._literal())
        raise CypherError(f"expected comparison, got {t}")

    # -- RETURN -------------------------------------------------------------

    def _value_expr(self) -> tuple:
        """x.prop | x | labels(x)[0] | type(r) | count(...)"""
        t = self.peek()
        if t == ("kw", "COUNT"):
            self.take()
            self.take("sym", "(")
            if self.at("sym", "*"):
                self.take()
                inner, dist = None, False
            else:
                dist = False
                if self.at("kw", "DISTINCT"):
                    self.take()
                    dist = True
                inner = self._value_expr()
            self.take("sym", ")")
            return ("count", dist, inner)
        if t[0] == "kw" and t[1] in ("SUM", "MIN", "MAX", "AVG"):
            self.take()
            self.take("sym", "(")
            dist = False
            if self.at("kw", "DISTINCT"):
                self.take()
                dist = True
            inner = self._value_expr()
            self.take("sym", ")")
            return ("agg", t[1].lower(), dist, inner)
        if t == ("kw", "LABELS"):
            self.take()
            self.take("sym", "(")
            var = self.take("name")[1]
            self.take("sym", ")")
            self.take("sym", "[")
            self.take("num")
            self.take("sym", "]")
            return ("label", var)
        if t == ("kw", "TYPE"):
            self.take()
            self.take("sym", "(")
            var = self.take("name")[1]
            self.take("sym", ")")
            return ("type", var)
        if t == ("kw", "TOLOWER"):
            self.take()
            self.take("sym", "(")
            inner = self._value_expr()
            self.take("sym", ")")
            return ("lower", inner)
        if t[0] in ("num", "str") or t == ("kw", "NULL"):
            return ("lit", self._literal())
        var = self.take("name")[1]
        if self.at("sym", "."):
            self.take()
            return ("prop", var, self.take("name")[1])
        return ("var", var)

    def _ret_item(self) -> tuple[tuple, str]:
        expr = self._value_expr()
        if self.at("kw", "AS"):
            self.take()
            alias = self.take("name")[1]
        else:
            alias = _default_alias(expr)
        return (expr, alias)

    def _order_item(self, items) -> tuple[str, bool]:
        # an ORDER BY key is an output alias or a bare x.prop that matches one
        t = self.peek()
        if t[0] == "name" and self.peek(1) != ("sym", "."):
            alias = self.take("name")[1]
        else:
            expr = self._value_expr()
            alias = next(
                (a for e, a in items if e == expr), _default_alias(expr)
            )
        desc = False
        if self.at("kw", "DESC"):
            self.take()
            desc = True
        elif self.at("kw", "ASC"):
            self.take()
        return (alias, desc)


def _default_alias(expr: tuple) -> str:
    kind = expr[0]
    if kind == "prop":
        return expr[2]
    if kind == "var":
        return expr[1]
    if kind == "label":
        return "label"
    if kind == "type":
        return "rel"
    if kind == "count":
        return "n"
    if kind == "agg":
        return expr[1]
    if kind == "lower":
        return _default_alias(expr[1])
    return "expr"


def _agg_col(e: tuple, fro: frozenset) -> F.Column:
    """Compile an aggregate RETURN/WITH item: count(*) / count([DISTINCT] x)
    / sum/min/max/avg([DISTINCT] x). DISTINCT on min/max is a no-op by
    definition; sum DISTINCT maps to sum_distinct; avg DISTINCT has no
    built-in and is rejected rather than silently mis-computed."""
    if e[0] == "count":
        _, dist, inner = e
        if inner is None:
            return F.count(F.lit(1))
        if dist:
            return F.countDistinct(_compile_value(inner, fro))
        return F.count(_compile_value(inner, fro))
    _, fn, dist, inner = e
    col = _compile_value(inner, fro)
    if dist:
        if fn == "sum":
            return F.sum_distinct(col)
        if fn == "avg":
            raise CypherError("avg(DISTINCT ...) is not supported")
    return {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[fn](col)


# ---------------------------------------------------------------------------
# compiler
# ---------------------------------------------------------------------------

# Cypher property → node-frame column. qualified_name IS the node key
# (reference constants/graph.py:114-136 — per-label unique key).
_PROP_COL = {
    "qualified_name": "id",
    "absolute_path": "path",
    "name": "name",
    "path": "path",
    "start_line": "start_line",
    "end_line": "end_line",
}


def _node_col(var: str, prop: str) -> str:
    col = _PROP_COL.get(prop)
    if col is None:
        raise CypherError(f"unsupported property {prop!r}")
    return f"{var}__{col}"


def _closure_pairs(pairs: DataFrame, doublings: int = 4) -> DataFrame:
    """Bounded transitive closure by doubling over distinct (src, dst):
    depth ≤ 2^doublings in `doublings` self-join rounds (log-depth shuffle
    count — the plan a per-hop loop cannot match at scale)."""
    clo = pairs.distinct().localCheckpoint(eager=True)
    for _ in range(doublings):
        ext = (
            clo.alias("x")
            .join(clo.alias("y"), F.col("x.dst") == F.col("y.src"))
            .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
        )
        nxt = clo.unionByName(ext).distinct().localCheckpoint(eager=True)
        if nxt.count() == clo.count():
            return nxt
        clo = nxt
    return clo


def _compile_where(cond, aliases: frozenset = frozenset()) -> F.Column:
    kind = cond[0]
    if kind == "and":
        return _compile_where(cond[1], aliases) & _compile_where(
            cond[2], aliases
        )
    if kind == "or":
        return _compile_where(cond[1], aliases) | _compile_where(
            cond[2], aliases
        )
    if kind == "not":
        return ~_compile_where(cond[1], aliases)
    if kind == "labelis":
        return F.col(f"{cond[1]}__label") == cond[2]
    if kind == "pattern":
        raise CypherError(
            "pattern predicates are only supported as top-level AND "
            "conjuncts (optionally under NOT) — not inside OR"
        )
    col = _compile_value(cond[1] if kind != "cmp" else cond[2], aliases)
    if kind == "isnull":
        return col.isNotNull() if cond[2] else col.isNull()
    if kind == "startswith":
        return col.startswith(cond[2])
    if kind == "contains":
        return col.contains(cond[2])
    if kind == "in":
        return col.isin(*cond[2])
    if kind == "cmp":
        op, lit = cond[1], cond[3]
        return {
            "=": col == lit,
            "<>": col != lit,
            "<": col < lit,
            "<=": col <= lit,
            ">": col > lit,
            ">=": col >= lit,
        }[op]
    raise CypherError(f"bad condition {cond!r}")


def _compile_value(expr: tuple, aliases: frozenset = frozenset()) -> F.Column:
    kind = expr[0]
    if kind == "prop":
        return F.col(_node_col(expr[1], expr[2]))
    if kind == "var":
        # a WITH alias shadows the node-variable namespace downstream
        if expr[1] in aliases:
            return F.col(expr[1])
        return F.col(f"{expr[1]}__id")
    if kind == "label":
        return F.col(f"{expr[1]}__label")
    if kind == "type":
        return F.col(f"{expr[1]}__pred")
    if kind == "lower":
        return F.lower(_compile_value(expr[1], aliases))
    if kind == "lit":
        return F.lit(expr[1])
    raise CypherError(f"not a scalar expression: {expr!r}")


def _apply_with(
    df: DataFrame,
    stage: WithStage,
    aliases: set[str],
    node_vars: dict,
) -> tuple[DataFrame, set[str], dict]:
    """One ``WITH`` pipeline stage (Cypher's horizon): project/aggregate the
    listed items, then optionally filter. A bare node variable passes all of
    its columns through (so ``n.prop`` still works downstream); expression
    items become plain alias columns that shadow the variable namespace;
    count() items aggregate with the non-aggregate items as group keys
    (Cypher aggregation semantics). Variables not listed fall out of scope,
    exactly like the reference's damaged-structure probe
    ``WITH n, count(parent) AS parents WHERE parents > 1``."""
    fro = frozenset(aliases)
    passthrough: list[str] = []
    scalars: list[tuple[tuple, str]] = []
    aggs: list[tuple[tuple, str]] = []
    for e, a in stage.items:
        if e[0] in ("count", "agg"):
            aggs.append((e, a))
        elif e[0] == "var" and e[1] not in fro and e[1] in node_vars:
            passthrough.append(e[1])
        else:
            scalars.append((e, a))
    key_cols = [
        c
        for v in passthrough
        for c in df.columns
        if c.startswith(f"{v}__")
    ]
    scalar_cols = [_compile_value(e, fro).alias(a) for e, a in scalars]
    if aggs:
        agg_cols = [_agg_col(e, fro).alias(a) for e, a in aggs]
        gb = [F.col(c) for c in key_cols] + scalar_cols
        df = df.groupBy(*gb).agg(*agg_cols) if gb else df.agg(*agg_cols)
    else:
        df = df.select(*([F.col(c) for c in key_cols] + scalar_cols))
        if stage.distinct:
            df = df.distinct()
    new_aliases = set(aliases) | {a for _, a in scalars} | {a for _, a in aggs}
    new_vars = {v: node_vars[v] for v in passthrough}
    if stage.where is not None:
        df = df.filter(_compile_where(stage.where, frozenset(new_aliases)))
    return df, new_aliases, new_vars


def run_cypher(
    nodes: DataFrame, edges: DataFrame, query: str, closure_doublings: int = 4
) -> DataFrame:
    """Compile + run a read-only Cypher MATCH query over the graph frames.

    Returns a DataFrame whose columns are the RETURN aliases. The plan is
    pure DataFrame ops: label/property filters push into the node scan,
    each edge hop is an equi-join on the node key, variable-length hops use
    the doubling closure, and aggregation follows Cypher semantics
    (non-aggregate RETURN items are the grouping keys).
    """
    q = _Parser(_tokenize(query)).parse()

    node_vars: dict[str, DataFrame] = {}

    def node_df(np: NodePat) -> DataFrame:
        d = nodes
        if np.labels:
            d = d.filter(F.col("label").isin(*np.labels))
        for k, v in np.props:
            col = _PROP_COL.get(k)
            if col is None:
                raise CypherError(f"unsupported property {k!r}")
            d = d.filter(F.col(col) == v)
        keep = ["label", "id", "name", "path", "start_line", "end_line"]
        return d.select(
            *[F.col(c).alias(f"{np.var}__{c}") for c in keep if c in d.columns]
        )

    df: DataFrame | None = None
    eidx = 0

    def compile_chain(chain: list, rebind: frozenset = frozenset()):
        """One MATCH chain → a joined part frame. ``rebind`` names node
        variables that are ALLOWED to re-appear (the shared anchors of an
        OPTIONAL MATCH — their re-derived columns are join keys that the
        caller renames and drops)."""
        nonlocal eidx
        left = chain[0]
        part = node_df(left)
        if left.var in node_vars and left.var not in rebind:
            raise CypherError(f"duplicate node variable {left.var!r}")
        node_vars[left.var] = part
        i = 1
        while i < len(chain):
            ep: EdgePat = chain[i]
            right: NodePat = chain[i + 1]
            e = edges
            if ep.rels:
                e = e.filter(F.col("pred").isin(*ep.rels))
            src, dst = ("subj", "obj") if ep.left_to_right else ("obj", "subj")
            eidx += 1
            # Multi-label entities (e.g. a package dir that is also a
            # module) are one node with several labels in the reference's
            # store but one ROW PER LABEL here — the edge's endpoint labels
            # are therefore part of its identity, and a single-hop join
            # binds on (id, label). Variable-length hops bind on id only
            # (intermediate labels are not observable from closure pairs).
            if ep.varlen:
                pairs = _closure_pairs(
                    e.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
                    closure_doublings,
                ).select(
                    F.col("src").alias(f"__e{eidx}_src"),
                    F.col("dst").alias(f"__e{eidx}_dst"),
                )
                lcond = (
                    F.col(f"{chain[i - 1].var}__id") == F.col(f"__e{eidx}_src")
                )
                rcond = F.col(f"__e{eidx}_dst") == F.col(f"{right.var}__id")
                drop = [f"__e{eidx}_src", f"__e{eidx}_dst"]
            else:
                cols = [
                    F.col(src).alias(f"__e{eidx}_src"),
                    F.col(dst).alias(f"__e{eidx}_dst"),
                    F.col(f"{src}_label").alias(f"__e{eidx}_srclab"),
                    F.col(f"{dst}_label").alias(f"__e{eidx}_dstlab"),
                ]
                if ep.var:
                    cols.append(F.col("pred").alias(f"{ep.var}__pred"))
                pairs = e.select(*cols)
                lcond = (
                    F.col(f"{chain[i - 1].var}__id") == F.col(f"__e{eidx}_src")
                ) & (
                    F.col(f"{chain[i - 1].var}__label")
                    == F.col(f"__e{eidx}_srclab")
                )
                rcond = (
                    F.col(f"__e{eidx}_dst") == F.col(f"{right.var}__id")
                ) & (
                    F.col(f"__e{eidx}_dstlab") == F.col(f"{right.var}__label")
                )
                drop = [
                    f"__e{eidx}_src",
                    f"__e{eidx}_dst",
                    f"__e{eidx}_srclab",
                    f"__e{eidx}_dstlab",
                ]
            part = part.join(pairs, lcond)
            if right.var in node_vars and right.var not in rebind:
                raise CypherError(
                    f"duplicate node variable {right.var!r} (cycles and "
                    "shared-variable comma patterns are out of the v1 subset)"
                )
            rdf = node_df(right)
            part = part.join(rdf, rcond).drop(*drop)
            node_vars[right.var] = rdf
            i += 2
        return part

    for chain in q.chains:
        part = compile_chain(chain)
        df = part if df is None else df.crossJoin(part)

    def apply_where(d: DataFrame, where, aliases: frozenset) -> DataFrame:
        # peel pattern predicates off the top-level AND conjuncts: they
        # compile to left-semi (positive) / left-anti (negated) joins on
        # the edge frame — a distributed degree test, never a collect
        def conjuncts(c):
            if c[0] == "and":
                return conjuncts(c[1]) + conjuncts(c[2])
            return [c]

        residual = []
        for c in conjuncts(where):
            pat, anti = None, False
            if c[0] == "pattern":
                pat = c
            elif c[0] == "not" and c[1][0] == "pattern":
                pat, anti = c[1], True
            if pat is None:
                residual.append(c)
                continue
            _, var, rels, direction = pat
            if var not in node_vars:
                raise CypherError(f"unknown variable {var!r} in pattern")
            e = edges
            if rels:
                e = e.filter(F.col("pred").isin(*rels))
            sides = []
            if direction in ("out", "both"):
                sides.append(e.select(F.col("subj").alias("__pk")))
            if direction in ("in", "both"):
                sides.append(e.select(F.col("obj").alias("__pk")))
            keys = sides[0] if len(sides) == 1 else sides[0].unionByName(sides[1])
            d = d.join(
                keys,
                F.col(f"{var}__id") == F.col("__pk"),
                "left_anti" if anti else "left_semi",
            )
        for c in residual:
            d = d.filter(_compile_where(c, aliases))
        return d

    if q.pre_where is not None:
        # a WHERE before OPTIONAL MATCH binds to the required pattern —
        # applying it before the left joins keeps optional rows intact
        df = apply_where(df, q.pre_where, frozenset())

    for oc in q.optional_chains:
        # OPTIONAL MATCH = left outer join of the optional pattern against
        # the rows matched so far, keyed on the shared (already-bound)
        # variables; unmatched rows carry nulls for the new variables —
        # exactly Cypher's semantics, and chained optionals propagate nulls
        # (a null anchor key never equi-matches).
        if oc[0].var not in node_vars:
            raise CypherError(
                "OPTIONAL MATCH must start from an already-bound variable"
            )
        shared = [
            n.var for n in oc[::2] if isinstance(n, NodePat)
            and n.var in node_vars
        ]
        part = compile_chain(oc, rebind=frozenset(shared))
        ren: list[str] = []
        for v in shared:
            for c in [c for c in part.columns if c.startswith(f"{v}__")]:
                part = part.withColumnRenamed(c, f"__r_{c}")
                ren.append(f"__r_{c}")
        cond = None
        for v in shared:
            c = (F.col(f"{v}__id") == F.col(f"__r_{v}__id")) & (
                F.col(f"{v}__label") == F.col(f"__r_{v}__label")
            )
            cond = c if cond is None else cond & c
        df = df.join(part, cond, "left").drop(*ren)

    if q.where is not None:
        df = apply_where(df, q.where, frozenset())

    aliases: set[str] = set()
    if q.unwind is not None:
        uvar, ualias = q.unwind
        if uvar not in node_vars:
            raise CypherError(f"unknown variable {uvar!r} in UNWIND")
        df = df.withColumn(ualias, F.col(f"{uvar}__label"))
        aliases.add(ualias)

    for stage in q.withs:
        df, aliases, node_vars = _apply_with(df, stage, aliases, node_vars)

    fro = frozenset(aliases)
    aggs = [(e, a) for e, a in q.items if e[0] in ("count", "agg")]
    keys = [(e, a) for e, a in q.items if e[0] not in ("count", "agg")]
    if aggs:
        key_cols = [_compile_value(e, fro).alias(a) for e, a in keys]
        agg_cols = [_agg_col(e, fro).alias(a) for e, a in aggs]
        df = (
            df.groupBy(*key_cols).agg(*agg_cols)
            if key_cols
            else df.agg(*agg_cols)
        )
        out = df
    else:
        out = df.select(*[_compile_value(e, fro).alias(a) for e, a in q.items])
        if q.distinct:
            out = out.distinct()

    if q.order:
        out = out.orderBy(
            *[F.desc(a) if d else F.asc(a) for a, d in q.order]
        )
    if q.limit is not None:
        out = out.limit(q.limit)
    return out
