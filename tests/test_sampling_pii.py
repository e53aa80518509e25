"""Deterministic splitting/sampling and PII scrubbing operators."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.sampling import hash_split, stratified_sample
from code_graph_rag_spark.operators.text import pii_scrub


def _bucket_twin(key, salt):
    h = int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:15], 16)
    return h % 10_000


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr", "zh"][i % 4]) for i in range(400)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_hash_split_matches_twin_and_is_stable(docs_df):
    got = {r["doc_id"]: r["split"] for r in hash_split(docs_df).collect()}
    for doc_id in range(400):
        b = _bucket_twin(doc_id, "split-v1")
        exp = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert got[doc_id] == exp, doc_id
    # proportions are in the right ballpark at n=400
    from collections import Counter

    c = Counter(got.values())
    assert c["train"] > 320 and c["val"] < 60 and c["test"] < 60
    # repartitioning must not change the assignment
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs_df.repartition(7)).collect()
    }
    assert again == got


def test_hash_split_salt_versions_assignment(docs_df):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs_df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs_df, salt="split-v2").collect()
    }
    assert a != b  # some docs must migrate under a new salt


def test_stratified_sample_matches_twin(docs_df):
    fr = {"en": 5000, "zh": 10000}
    got = {r["doc_id"] for r in stratified_sample(docs_df, fr).collect()}
    langs = ["en", "de", "fr", "zh"]
    exp = {
        i
        for i in range(400)
        if _bucket_twin(i, "sample-v1") < fr.get(langs[i % 4], 0)
    }
    assert got == exp
    # all zh kept, no de/fr at default_bp=0
    assert {i for i in range(400) if langs[i % 4] == "zh"} <= got
    assert not any(langs[i % 4] in ("de", "fr") for i in got)


def test_pii_scrub(spark):
    rows = [
        (1, "contact me at jane.doe+x@example.org or bob@test.co thanks"),
        (2, "server at 10.0.255.3 went down"),
        (3, "call +1 555-123-4567 now"),
        (4, "clean text with no identifiers at all"),
        (5, "mixed bob@x.io and 192.168.1.1 and 555-867-5309"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (2, 0, 0)
    assert (got[2]["n_email"], got[2]["n_ip"]) == (0, 1)
    assert got[3]["n_phone"] == 1
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[5]["n_email"] == 1 and got[5]["n_ip"] == 1
    # scrubbed text no longer matches any pattern: re-scrub is a fixpoint
    scrubbed_texts = {
        1: "contact me at <EMAIL> or <EMAIL> thanks",
        4: "clean text with no identifiers at all",
    }
    import hashlib as hl

    for d, txt in scrubbed_texts.items():
        exp_hash = int(hl.md5(txt.encode()).hexdigest()[:15], 16)
        assert got[d]["scrub_hash"] == exp_hash, d
