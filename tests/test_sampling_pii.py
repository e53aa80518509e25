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


def test_pack_bins_matches_twin(spark):
    from code_graph_rag_spark.operators.sampling import pack_bins

    rows = [(i, " ".join(["tok"] * (1 + i % 7))) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pack_bins(df, budget=10, n_shards=4).collect()}
    # pure-Python twin
    shards: dict[int, list[int]] = {}
    for i in range(60):
        shards.setdefault(_bucket_twin(i, "pack-v1") % 4, []).append(i)
    for shard, ids in shards.items():
        cum = 0
        pos: dict[int, int] = {}
        for d in sorted(ids):
            n = 1 + d % 7
            bin_id = cum // 10
            cum += n
            pos[bin_id] = pos.get(bin_id, 0) + 1
            r = got[d]
            assert (r["shard"], r["n_tokens"]) == (shard, n), d
            assert (r["bin_id"], r["bin_pos"]) == (bin_id, pos[bin_id]), d
    # repartitioning must not change the packing
    again = {
        r["doc_id"]: (r["shard"], r["bin_id"], r["bin_pos"])
        for r in pack_bins(df.repartition(5), budget=10, n_shards=4).collect()
    }
    assert again == {
        d: (r["shard"], r["bin_id"], r["bin_pos"]) for d, r in got.items()
    }


def test_corpus_filter_verdicts(spark):
    from code_graph_rag_spark.operators.text import corpus_filter

    rows = [
        (1, "the quick brown fox and the lazy dog of the north is happy "
            "to be here today"),                       # ok
        (2, "le la et les des le la et"),              # lang (fr wins)
        (3, "the .,!?;: .,!?;: .,!?;:"),               # quality (punct-heavy)
        (4, "the " * 30),                              # repetition
        (5, "the cat and the dog email bob@x.io is here to stay now fine"),  # pii
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in corpus_filter(df).collect()}
    assert got[1]["verdict"] == "ok" and got[1]["keep"]
    assert got[2]["verdict"] == "lang" and not got[2]["keep"]
    assert got[3]["verdict"] == "quality"
    assert got[4]["verdict"] == "repetition"
    assert got[5]["verdict"] == "pii" and got[5]["n_pii"] == 1


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
