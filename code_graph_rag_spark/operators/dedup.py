"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB regime:

* **exact**: one hash-aggregate on a 60-bit content hash — a single shuffle
  on the hash key, map-side partial aggregation, no data skew (hashes are
  uniform).
* **MinHash + LSH banding**: shingle → K portable hash functions →
  per-document signature (one explode + groupBy) → band keys → candidate
  pairs via an equi-join on (band, band-hash). Candidate verification is a
  signature comparison, NOT a text comparison, so the join payload stays
  tiny. Pairwise work is confined to LSH buckets — never O(N²).
* **n-gram Jaccard**: exact verification on the shingle sets, via an
  explode + self-join on shingle (inverted-index join), group-count, and the
  |A∩B| / (|A|+|B|-|A∩B|) identity — the classic "jaccard without pairs
  materialization" plan.
* **SimHash**: 64-bit sign-aggregated fingerprint, vectorized in pandas
  (Arrow batches), hamming-bucket join on rotated prefixes.

All hash functions are md5-derived and portable to DuckDB so the driver's
oracle can replay them in SQL (see ``__spark_entry__``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.text import (
    doc_shingles as _doc_shingles,
    hash60,
    norm_text,
)

MOD = 1_000_000_007


def _perm_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations."""
    rng_a = [1_000_003, 999_983, 101_111, 777_767, 424_243]
    out = []
    for i in range(k):
        a = (rng_a[i % len(rng_a)] * (i + 1) * 2 + 1) % MOD
        b = (i * 912_871 + 7) % MOD
        out.append((a, b))
    return out


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Returns (content_hash, n_docs, doc_ids sorted, keeper = min doc_id).
    One shuffle on the 60-bit hash.
    """
    h = hash60(norm_text(F.col("text"))).alias("content_hash")
    return (
        documents.select(h, "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded, distinct per doc (codegen path — see
    operators.text.doc_shingles)."""
    return _doc_shingles(documents, n)


def minhash_signatures(
    documents: DataFrame, k: int = 16, n: int = 3
) -> DataFrame:
    """(doc_id, sig: array<long>[k]) MinHash signatures.

    Plan shape: explode shingles → hash once → k affine transforms → one
    groupBy(doc_id) with k min() partial aggregations (map-side combine
    means the shuffle carries k longs per doc, not the shingles).
    """
    sh = doc_shingles(documents, n).withColumn(
        "h", hash60(F.col("shingle")) % MOD
    )
    aggs = [
        F.min((F.col("h") * a + b) % MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(k))
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id", F.array(*[f"m{i}" for i in range(k)]).alias("sig")
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    max_bucket: int | None = 1024,
    persist_registry: list | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates.

    Band the k-row signature into ``bands`` bands of k/bands rows; docs
    agreeing on any full band collide. Returns (doc_a, doc_b, sig_agree =
    fraction of matching signature rows) with doc_a < doc_b.

    ``max_bucket`` caps the per-(band, band_hash) bucket size: a boilerplate
    band shared by B docs yields B²/2 pairs, so buckets larger than the cap
    are dropped before the self-join (their members still pair through their
    other, more selective bands). ON by default — an uncapped bucket
    self-join is the classic LSH scale-killer; the DuckDB oracle mirrors
    the cap exactly (``__spark_entry__._lsh_candidates_sql``).
    """
    r = k // bands
    # persist: the signature pipeline feeds both sides of the band self-join
    # (unpersisted it is computed twice — measured 2x on the sf0.1 bench).
    # Callers that pass ``persist_registry`` own the unpersist (the
    # GraphResult cache-tracking rule); without one the blocks live until
    # the frame is garbage-collected + ContextCleaner runs.
    sigs = minhash_signatures(documents, k, n).persist()
    if persist_registry is not None:
        persist_registry.append(sigs)
    # band hash via hash60 (md5-derived) — portable to the DuckDB oracle,
    # unlike Spark's engine-internal F.hash
    banded = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    hash60(F.concat_ws(",", *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    if max_bucket is not None:
        small = (
            banded.groupBy("band", "band_hash")
            .agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") <= max_bucket)
            .select("band", "band_hash")
        )
        banded = banded.join(small, ["band", "band_hash"], "left_semi")
    left = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig").alias("sig_a"),
        "band",
        "band_hash",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig").alias("sig_b"),
        "band",
        "band_hash",
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # codegen agreement: k is a Python constant — unrolled comparisons stay
    # in whole-stage codegen, unlike interpreted zip_with/filter HOFs
    matches = sum(
        (F.col("sig_a")[i] == F.col("sig_b")[i]).cast("int") for i in range(k)
    )
    agree = matches.cast("double") / F.lit(float(k))
    return pairs.select(
        "doc_a", "doc_b", F.round(agree, 6).alias("sig_agree")
    )


def hub_shingles(
    documents: DataFrame, n: int = 3, max_df_frac: float = 0.5
) -> DataFrame:
    """Observability for the DF cap: (shingle, df) rows the cap drops."""
    sh = doc_shingles(documents, n)
    totals = documents.agg(F.count("*").alias("n_docs"))
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .crossJoin(totals)
        .filter(F.col("df") > F.ceil(F.lit(max_df_frac) * F.col("n_docs")))
        .select("shingle", "df")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    max_df_frac: float | None = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted-index self-join: |A∩B| from the join group counts, |A|,|B|
    from per-doc shingle counts — pairs never materialize text.

    Hub shingles (boilerplate in >``max_df_frac`` of all docs) are the
    quadratic blow-up at scale — a shingle shared by 1M docs alone yields
    10¹² join rows. The document-frequency cap drops them from the shingle
    universe entirely (both from the join AND from |A|,|B|, keeping the
    Jaccard identity consistent over the capped universe); the dropped set
    is enumerable via ``hub_shingles``. Everything is declarative — the cap
    threshold is a crossJoin against a 1-row count, no driver action.
    """
    sh = doc_shingles(documents, n)
    if max_df_frac is not None:
        totals = documents.agg(F.count("*").alias("n_docs"))
        kept = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .crossJoin(totals)
            .filter(
                F.col("df") <= F.ceil(F.lit(max_df_frac) * F.col("n_docs"))
            )
            .select("shingle")
        )
        sh = sh.join(kept, "shingle", "left_semi")
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("doc_a", "doc_b", "n_common", "jaccard")


def simhash(documents: DataFrame, bits: int = 60, n: int = 3) -> DataFrame:
    """SimHash over word shingles — ONE shuffle, whole-stage codegen.

    Bit b of the fingerprint is the sign of Σ_shingles (±1 by shingle-hash
    bit b). Rather than exploding to (doc, bit) rows (bits× row blowup
    through two shuffles — the round-1 plan), each bit is a conditional-sum
    aggregate over the shingle frame: the single groupBy(doc_id) gets
    map-side partial aggregation, so the shuffle carries ``bits`` longs per
    doc. 60 bits because hash60 is a 60-bit value; every expression is
    JVM-side and md5-portable, so the DuckDB oracle replays it exactly.
    """
    exploded = doc_shingles(documents, n).withColumn(
        "h", hash60(F.col("shingle"))
    )
    aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1).cast("long"))
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = exploded.groupBy("doc_id").agg(*aggs)
    fp = None
    for b in range(bits):
        term = F.when(
            F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_near_dups(
    documents: DataFrame,
    bits: int = 60,
    n: int = 3,
    max_hamming: int = 3,
    max_bucket: int | None = 4096,
    persist_registry: list | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs via pigeonhole banding.

    Split the ``bits``-bit fingerprint into ``max_hamming + 1`` contiguous
    bands: a pair within hamming distance ``max_hamming`` has at most
    ``max_hamming`` differing bands, so it agrees EXACTLY on at least one —
    candidate generation is an equi-join on (band, band_value), never an
    all-pairs scan. Candidates verify with ``bit_count(a XOR b)``.

    ``max_bucket`` caps degenerate bands (the all-zeros band of boilerplate
    corpora) with the same groupBy + left-semi pattern as
    ``lsh_candidate_pairs`` — a capped doc still pairs through its other,
    more selective bands; clusters identical across EVERY band beyond the
    cap are exact-dedup's job, not near-dup's. Returns
    (doc_a, doc_b, hamming) with doc_a < doc_b, fully DuckDB-replayable.
    """
    nb = max_hamming + 1
    width = bits // nb
    # band b covers bits [b*width, (b+1)*width); the last band also takes
    # the bits % nb remainder so the union covers every bit (pigeonhole
    # needs full coverage)
    masks = [
        (b * width, (1 << (width + (bits - nb * width if b == nb - 1 else 0))) - 1)
        for b in range(nb)
    ]
    fps = simhash(documents, bits, n).persist()
    if persist_registry is not None:
        persist_registry.append(fps)
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", off).bitwiseAND(
                        F.lit(mask).cast("long")
                    )
                    for off, mask in masks
                ]
            )
        ).alias("band", "band_val"),
    )
    if max_bucket is not None:
        small = (
            banded.groupBy("band", "band_val")
            .agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") <= max_bucket)
            .select("band", "band_val")
        )
        banded = banded.join(small, ["band", "band_val"], "left_semi")
    left = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        "band",
        "band_val",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        "band",
        "band_val",
    )
    return (
        left.join(right, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def near_dup_clusters(
    documents: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    min_agree: float = 0.5,
    max_bucket: int | None = 1024,
    persist_registry: list | None = None,
) -> DataFrame:
    """End-to-end fuzzy dedup: MinHash-LSH candidates → signature-agreement
    gate → connected components → keep-one-representative verdict.

    This is the full training-data near-dedup pipeline (the composition the
    per-stage operators above exist for): candidate pairs come from
    ``lsh_candidate_pairs`` (bucketed, band-capped — never O(N²)), pairs
    below ``min_agree`` signature agreement are dropped, and the surviving
    similarity graph is collapsed with the alternating large-star/small-star
    connected-components algorithm (``linking.connected_components`` —
    O(log² n) rounds independent of cluster diameter, min-aggregates only,
    so hub docs get map-side combining). The cluster representative (keeper)
    is the minimum doc_id — the deterministic "keep first" policy.

    Returns one row per document that belongs to a ≥2-doc near-dup cluster:
    (doc_id, cluster_rep, cluster_size, is_keeper), ordered by doc_id.
    Untouched documents are implicitly keepers and are omitted (at corpus
    scale the duplicate set is the small output; emitting the full corpus
    again would dominate the sink).
    """
    from code_graph_rag_spark.linking import connected_components

    pairs = lsh_candidate_pairs(
        documents, k, bands, n, max_bucket, persist_registry=persist_registry
    ).filter(F.col("sig_agree") >= min_agree)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    sizes = cc.groupBy("canonical_id").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "canonical_id")
        .select(
            F.col("entity_id").alias("doc_id"),
            F.col("canonical_id").alias("cluster_rep"),
            "cluster_size",
            (F.col("entity_id") == F.col("canonical_id")).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


def cross_corpus_dups(
    new_docs: DataFrame,
    corpus: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    min_agree: float = 0.5,
    max_bucket: int | None = 1024,
    persist_registry: list | None = None,
) -> DataFrame:
    """Incremental-ingest dedup: flag documents in a NEW batch that
    near-duplicate an EXISTING corpus (the FineWeb/Dolma cross-dump shape —
    every production training pipeline dedups each new crawl against what
    it already has, not just within itself).

    Same MinHash-LSH recipe as ``lsh_candidate_pairs`` but the candidate
    join is new-side bands against corpus-side bands — an equi-join on
    (band, band_hash) between two frames, so NEITHER side is ever
    self-joined and neither needs to broadcast (at 100 TB both sides are
    huge; each shuffles exactly once on the band key, and the signature
    frames carry k longs per doc, never text). ``max_bucket`` caps the
    COMBINED (band, band_hash) bucket across both sides: the cross-bucket
    blow-up is |new bucket| x |corpus bucket|, and bounding the sum bounds
    the product; capped docs still pair through their other, more
    selective bands, exactly as in the self-join variant.

    Returns one row per contaminated new document: (doc_id,
    corpus_doc_id = best match by agreement then lowest id, sig_agree,
    n_matches = corpus docs at or above ``min_agree``), ordered by doc_id.
    """
    # ONE signature pipeline over the tagged union of both inputs: each
    # side is scanned once and the k min-aggregates run in a single
    # map-side-combined groupBy keyed on (side, doc_id) — the r5 shape ran
    # two separate scan+groupBy pipelines (two shuffles, two persists) for
    # the same bytes. The struct key keeps the two id spaces disjoint even
    # when doc_ids collide across frames; per-doc signatures are identical
    # (shingle hashing never sees the key).
    tagged = new_docs.select(
        F.struct(
            F.lit(1).alias("side"), F.col("doc_id").alias("id")
        ).alias("doc_id"),
        "text",
    ).unionByName(
        corpus.select(
            F.struct(
                F.lit(0).alias("side"), F.col("doc_id").alias("id")
            ).alias("doc_id"),
            "text",
        )
    )
    sigs = minhash_signatures(tagged, k, n).persist()
    if persist_registry is not None:
        persist_registry.append(sigs)
    sig_new = sigs.filter(F.col("doc_id.side") == 1).select(
        F.col("doc_id.id").alias("doc_id"), "sig"
    )
    sig_corp = sigs.filter(F.col("doc_id.side") == 0).select(
        F.col("doc_id.id").alias("doc_id"), "sig"
    )
    r = k // bands

    def _banded(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "doc_id",
            "sig",
            F.posexplode(
                F.array(
                    *[
                        hash60(
                            F.concat_ws(
                                ",",
                                *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)],
                            )
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "band_hash"),
        )

    bn = _banded(sig_new)
    bc = _banded(sig_corp)
    if max_bucket is not None:
        small = (
            bn.select("band", "band_hash")
            .unionAll(bc.select("band", "band_hash"))
            .groupBy("band", "band_hash")
            .agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") <= max_bucket)
            .select("band", "band_hash")
        )
        bn = bn.join(small, ["band", "band_hash"], "left_semi")
        bc = bc.join(small, ["band", "band_hash"], "left_semi")
    left = bn.select("doc_id", F.col("sig").alias("sig_a"), "band", "band_hash")
    right = bc.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("sig").alias("sig_b"),
        "band",
        "band_hash",
    )
    pairs = left.join(right, ["band", "band_hash"]).dropDuplicates(
        ["doc_id", "corpus_doc_id"]
    )
    matches = sum(
        (F.col("sig_a")[i] == F.col("sig_b")[i]).cast("int") for i in range(k)
    )
    hits = pairs.select(
        "doc_id",
        "corpus_doc_id",
        F.round(matches.cast("double") / F.lit(float(k)), 6).alias("sig_agree"),
    ).filter(F.col("sig_agree") >= min_agree)
    # best match (highest agreement, ties → lowest corpus id) + match
    # count in ONE hash aggregate with map-side partial combine:
    # min(struct(-agree, id)) replaces the r5 row_number sort-window +
    # count window pair (same winner — float negation is exact — with no
    # per-doc sort and half the execution phases)
    return (
        hits.groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("sig_agree")).alias("na"),
                    F.col("corpus_doc_id").alias("cid"),
                )
            ).alias("m"),
            F.count("*").alias("n_matches"),
        )
        .select(
            "doc_id",
            F.col("m.cid").alias("corpus_doc_id"),
            (-F.col("m.na")).alias("sig_agree"),
            "n_matches",
        )
        .orderBy("doc_id")
    )


def dedup_keep_first(documents: DataFrame) -> DataFrame:
    """The end-to-end exact-dedup operator: keep the lowest doc_id per
    normalized-content group (deterministic winner)."""
    h = hash60(norm_text(F.col("text"))).alias("content_hash")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        documents.select("*", h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "content_hash")
    )
