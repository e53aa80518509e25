"""Randomized brute-force exactness for the round-5 dedup additions.

Seeded random corpora (with planted copies/mutations so near-dups exist)
are run through ``cross_corpus_dups`` and ``decontaminate`` and compared
ROW-EXACTLY against independent pure-Python re-implementations of the
full recipe (md5-based hash60, MinHash permutations, banding, combined
bucket cap, agreement, best-match ranking / n-gram overlap counting).
Complements the planted-scenario tests with unplanned inputs.
"""

from __future__ import annotations

import hashlib
import random

from code_graph_rag_spark.operators.decontam import decontaminate
from code_graph_rag_spark.operators.dedup import (
    MOD,
    _perm_params,
    cross_corpus_dups,
)

VOCAB = [f"w{i}" for i in range(24)]


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm_tokens(text: str) -> list[str]:
    norm = " ".join(text.strip().lower().split())
    return norm.split(" ") if norm else []


def _shingles(text: str, n: int) -> set[str]:
    toks = _norm_tokens(text)
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _sig(text: str, k: int = 16, n: int = 3) -> list[int]:
    hs = [_hash60(s) % MOD for s in _shingles(text, n)]
    return [min((h * a + b) % MOD for h in hs) for a, b in _perm_params(k)]


def _py_cross_corpus(new, corpus, k=16, bands=4, n=3, min_agree=0.5, cap=1024):
    r = k // bands
    sigs = {d: _sig(t, k, n) for d, t in new + corpus}
    band_rows = []  # (side, doc, band, band_hash)
    for side, frame in (("n", new), ("c", corpus)):
        for d, _ in frame:
            s = sigs[d]
            for b in range(bands):
                bh = _hash60(",".join(str(x) for x in s[b * r : (b + 1) * r]))
                band_rows.append((side, d, b, bh))
    from collections import Counter, defaultdict

    bucket_n = Counter((b, bh) for _, _, b, bh in band_rows)
    kept = {key for key, c in bucket_n.items() if c <= cap}
    buckets = defaultdict(lambda: ([], []))
    for side, d, b, bh in band_rows:
        if (b, bh) in kept:
            buckets[(b, bh)][0 if side == "n" else 1].append(d)
    pairs = set()
    for ns, cs in buckets.values():
        for dn in ns:
            for dc in cs:
                pairs.add((dn, dc))
    hits = defaultdict(list)
    for dn, dc in pairs:
        agree = round(
            sum(a == b for a, b in zip(sigs[dn], sigs[dc])) / float(k), 6
        )
        if agree >= min_agree:
            hits[dn].append((agree, dc))
    out = []
    for dn in sorted(hits):
        best = sorted(hits[dn], key=lambda t: (-t[0], t[1]))[0]
        out.append((dn, best[1], best[0], len(hits[dn])))
    return out


def _py_decontam(train, eval_docs, n=8, min_shared=1):
    from collections import defaultdict

    idx = defaultdict(set)  # shingle -> eval doc ids
    for d, t in eval_docs:
        for s in _shingles(t, n):
            idx[s].add(d)
    out = []
    for d, t in sorted(train):
        shared = {s for s in _shingles(t, n) if s in idx}
        if len(shared) >= min_shared:
            ev = set().union(*(idx[s] for s in shared))
            out.append((d, len(ev), len(shared)))
    return out


def _corpus(seed: int, n_docs: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        if docs and rng.random() < 0.3:
            # mutated copy of an earlier doc: verbatim, or one token edited
            base = rng.choice(docs)[1].split()
            if rng.random() < 0.5 and base:
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
            docs.append((i, " ".join(base)))
        else:
            docs.append(
                (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(4, 26))))
            )
    return docs


def test_cross_corpus_matches_bruteforce_on_random_corpora(spark):
    for seed in (7, 41):
        docs = _corpus(seed, 36)
        new = [(d, t) for d, t in docs if d % 3 == 0]
        corpus = [(d, t) for d, t in docs if d % 3 != 0]
        got = [
            (r["doc_id"], r["corpus_doc_id"], r["sig_agree"], r["n_matches"])
            for r in cross_corpus_dups(
                spark.createDataFrame(new, ["doc_id", "text"]),
                spark.createDataFrame(corpus, ["doc_id", "text"]),
            ).collect()
        ]
        assert got == _py_cross_corpus(new, corpus), f"seed {seed}"


def test_decontam_matches_bruteforce_on_random_corpora(spark):
    for seed in (13, 99):
        docs = _corpus(seed, 36)
        ev = [(d, t) for d, t in docs if d % 4 == 0]
        tr = [(d, t) for d, t in docs if d % 4 != 0]
        got = sorted(
            (r["doc_id"], r["n_eval_docs"], r["n_shared"])
            for r in decontaminate(
                spark.createDataFrame(tr, ["doc_id", "text"]),
                spark.createDataFrame(ev, ["doc_id", "text"]),
                n=4,
            ).collect()
        )
        assert got == _py_decontam(tr, ev, n=4), f"seed {seed}"
