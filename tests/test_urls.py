"""URL → endpoint resolution (plans/urls.resolves_to_edges).

Pins the Spark join-based matcher against the reference's
url_matches_template / link_endpoints semantics
(parsers/endpoints.py:129-159, 425-545) on hand-built edge frames:
param segments, query/trailing-slash stripping, the direction gate, the
literal-segment gate, host scoping with unknown-host fan-out, rootful
same-origin scoping, rejected URL shapes, and unknown-lead tail templates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from code_graph_rag_spark.plans.urls import resolves_to_edges


def _io(spark, rows):
    # (caller_qn, pred, url)
    return spark.createDataFrame(
        [
            (s, p, f"resource::network::{u}", "d.py")
            for s, p, u in rows
        ],
        "subj string, pred string, obj string, src_doc string",
    )


def _eps(spark, rows):
    # (project, identity) e.g. ("svc", "GET /users/{id}")
    return spark.createDataFrame(
        [(f"endpoint::{p}::{i}", "EXPOSES") for p, i in rows],
        "obj string, pred string",
    )


def _run(spark, io_rows, ep_rows):
    out = resolves_to_edges(_io(spark, io_rows), _eps(spark, ep_rows))
    return sorted((r.subj, r.obj) for r in out.collect())


def test_exact_param_query_slash(spark):
    got = _run(
        spark,
        [("svc.client.f", "READS_FROM", "http://svc/users/42?verbose=1")],
        [("svc", "GET /users/{id}")],
    )
    assert got == [
        (
            "resource::network::http://svc/users/42?verbose=1",
            "endpoint::svc::GET /users/{id}",
        )
    ]
    # trailing slash on either side
    got = _run(
        spark,
        [("svc.client.f", "READS_FROM", "http://svc/users/42/")],
        [("svc", "GET /users/<id>")],
    )
    assert len(got) == 1


def test_direction_gate(spark):
    # write URL cannot hit a read-only route, and vice versa
    assert (
        _run(
            spark,
            [("svc.c.f", "WRITES_TO", "http://svc/users/42")],
            [("svc", "GET /users/{id}")],
        )
        == []
    )
    assert (
        _run(
            spark,
            [("svc.c.f", "READS_FROM", "http://svc/orders")],
            [("svc", "POST /orders")],
        )
        == []
    )


def test_no_literal_segment_skipped(spark):
    assert (
        _run(
            spark,
            [("svc.c.f", "READS_FROM", "http://svc/anything")],
            [("svc", "GET /{slug}")],
        )
        == []
    )


def test_segment_count_must_match(spark):
    assert (
        _run(
            spark,
            [("svc.c.f", "READS_FROM", "http://svc/users/42/extra")],
            [("svc", "GET /users/{id}")],
        )
        == []
    )


def test_host_scoping_and_fanout(spark):
    eps = [("svc", "GET /users/{id}"), ("billing", "GET /users/{id}")]
    # host names an indexed project -> only that project's endpoint
    got = _run(
        spark, [("a.c.f", "READS_FROM", "http://billing/users/1")], eps
    )
    assert got == [
        (
            "resource::network::http://billing/users/1",
            "endpoint::billing::GET /users/{id}",
        )
    ]
    # unknown host -> full fan-out (both match)
    got = _run(
        spark, [("a.c.f", "READS_FROM", "https://api.ex.com/users/1")], eps
    )
    assert len(got) == 2


def test_rootful_same_origin(spark):
    eps = [("svc", "GET /users/{id}"), ("billing", "GET /users/{id}")]
    got = _run(spark, [("svc.client.f", "READS_FROM", "/users/9")], eps)
    assert got == [
        ("resource::network::/users/9", "endpoint::svc::GET /users/{id}")
    ]


def test_rejected_url_shapes(spark):
    eps = [("svc", "GET /users/{id}")]
    # protocol-relative, schemeless fragment, dynamic
    for url in ("//cdn.ex.com/users/1", "users/1", "<dynamic>"):
        assert _run(spark, [("svc.c.f", "READS_FROM", url)], eps) == []


def test_unknown_lead_tail_template(spark):
    got = _run(
        spark,
        [("svc.c.f", "READS_FROM", "http://gw/api/v2/users/5")],
        [("svc", "GET /**/users/{id}")],
    )
    assert got == [
        (
            "resource::network::http://gw/api/v2/users/5",
            "endpoint::svc::GET /**/users/{id}",
        )
    ]
    # tail longer than the URL cannot match
    assert (
        _run(
            spark,
            [("svc.c.f", "READS_FROM", "http://gw/users")],
            [("svc", "GET /**/users/{id}")],
        )
        == []
    )


def test_regex_metachars_in_literals(spark):
    # dots in literal segments must not act as wildcards
    assert (
        _run(
            spark,
            [("svc.c.f", "READS_FROM", "http://svc/filexjson")],
            [("svc", "GET /file.json")],
        )
        == []
    )
    got = _run(
        spark,
        [("svc.c.f", "READS_FROM", "http://svc/file.json")],
        [("svc", "GET /file.json")],
    )
    assert len(got) == 1
