"""Entity linking + canonicalization at scale (north-rule components).

Two stages, both pure DataFrame:

1. **Candidate generation** — fuzzy entity-linking candidates between
   qualified names:
   * broadcast **alias dictionary** hits (exact known aliases — the Spark
     form of the reference's trie exact lookups);
   * **MinHash-LSH banding over qualified-name shingles**: character
     n-grams of the dotted QN → K portable min-hashes → banded bucket join.
     Two QNs sharing a band bucket are candidate co-references (e.g.
     ``pkg.mod.Store`` / ``pkg.mod_v2.Store`` style near-duplicates).

2. **Canonicalization** — connected components over the candidate-pair
   frame via iterative self-join label propagation (union-find analogue):
   every entity's label converges to the minimum entity id in its
   component; the minimum member becomes the canonical id. Hub-skew is
   handled by **salting**: high-degree nodes are split across
   ``n_salts`` shards during the propagate join and min-merged after, so a
   single hub key never lands on one reducer (SURVEY §4 custom-work 1).

The reference's in-memory duplicate canonicalization is
``function_registry.py:69-90`` (variant minting, which we keep exactly —
``plans/variants.py``); this module adds the *cross-name* linking the north
star specifies for 10^12-doc scale, where near-identical qualified names
from independent shards must merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.text import hash60

MOD = 1_000_000_007
_PERMS = [
    (2000007, 7),
    (3999933, 912878),
    (606667, 1825749),
    (6222137, 2738620),
    (4866143, 3651491),
    (1213333, 4564362),
    (9333141, 5477233),
    (3111037, 6390104),
]


def qn_shingles(col, n: int = 3):
    """Character n-gram shingles of a qualified name (dots kept — they
    carry structure)."""
    padded = F.concat(F.lit("^"), col, F.lit("$"))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(padded) - n, F.lit(0))),
            lambda i: F.substring(padded, i + 1, n),
        )
    )


def minhash_qn_signatures(entities: DataFrame, k: int = 8) -> DataFrame:
    """(entity_id, sig array<long>[k]) over qualified-name shingles."""
    sh = entities.select(
        F.col("qualified_name").alias("entity_id"),
        F.explode(qn_shingles(F.col("qualified_name"))).alias("shingle"),
    ).withColumn("h", hash60(F.col("shingle")) % MOD)
    aggs = [
        F.min((F.col("h") * a + b) % MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(_PERMS[:k])
    ]
    return (
        sh.groupBy("entity_id")
        .agg(*aggs)
        .select("entity_id", F.array(*[f"m{i}" for i in range(k)]).alias("sig"))
    )


def lsh_link_candidates(
    entities: DataFrame,
    alias_pairs: DataFrame | None = None,
    k: int = 8,
    bands: int = 4,
    min_agreement: float = 0.5,
) -> DataFrame:
    """Candidate co-reference pairs (a, b) with a < b.

    ``alias_pairs`` (optional): known-alias frame (a, b) — broadcast and
    unioned in at full confidence (the broadcast alias dictionary rung).
    """
    r = k // bands
    sigs = minhash_qn_signatures(entities, k)
    banded = sigs.select(
        "entity_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        F.concat_ws(
                            ",", *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.select(
        F.col("entity_id").alias("a"), F.col("sig").alias("sig_a"), "band", "band_hash"
    )
    right = banded.select(
        F.col("entity_id").alias("b"), F.col("sig").alias("sig_b"), "band", "band_hash"
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    ).cast("double") / F.lit(float(k))
    # verification gate: near-duplicate ENTITIES share their simple name
    # (last QN segment); without it, a child QN and its parent scope — whose
    # shingle set is nearly a subset — sneak past the MinHash agreement
    # (observed: method ↔ its module merging at agreement ≥0.95)
    last = lambda c: F.element_at(F.split(c, "\\."), -1)  # noqa: E731
    out = (
        pairs.filter(agree >= min_agreement)
        .filter(last(F.col("a")) == last(F.col("b")))
        .select("a", "b")
    )
    if alias_pairs is not None:
        out = out.unionByName(
            F.broadcast(alias_pairs.select("a", "b")).filter(F.col("a") < F.col("b"))
        ).dropDuplicates(["a", "b"])
    return out


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    n_salts: int = 8,
) -> DataFrame:
    """Union-find over an edge frame: (entity_id, canonical_id).

    Label propagation to the component minimum. The propagate join is
    salted: the adjacency is exploded into ``n_salts`` shards keyed
    (node, salt) so hub nodes fan across reducers; shard minima are merged
    by a second small aggregation. Converges in O(log(diameter))
    double-direction rounds; every round cuts lineage (localCheckpoint) —
    iterative-algorithm discipline (SURVEY §4).
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
        .persist()
    )
    # initial label = own id
    labels = (
        edges.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    salt = (F.abs(F.hash("y")) % n_salts).alias("salt")

    for it in range(max_iter):
        # propagate: each node's new label = min(own, neighbors' labels).
        # join neighbor labels through the salted adjacency
        lab_x = labels.select(F.col("node").alias("x"), F.col("label").alias("lx"))
        neigh = (
            edges.join(lab_x, "x")
            .select(F.col("y"), F.col("lx"), salt)
            .groupBy("y", "salt")
            .agg(F.min("lx").alias("lmin_shard"))
            .groupBy("y")
            .agg(F.min("lmin_shard").alias("lneigh"))
        )
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["y"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("lneigh"), F.col("label"))
                ).alias("label"),
                (F.col("lneigh") < F.col("label")).alias("changed"),
            )
        )
        # each round is an action anyway (convergence check), so checkpoint
        # every round: cuts lineage AND caches for the count
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break

    edges.unpersist()
    return labels.select(
        F.col("node").alias("entity_id"), F.col("label").alias("canonical_id")
    )


def canonicalize_entities(
    entities: DataFrame,
    alias_pairs: DataFrame | None = None,
    k: int = 8,
    bands: int = 4,
    min_agreement: float = 0.75,
) -> DataFrame:
    """entities(qualified_name, ...) → (entity_id, canonical_id) mapping.

    Entities with no candidate edge map to themselves.
    """
    cands = lsh_link_candidates(
        entities, alias_pairs, k=k, bands=bands, min_agreement=min_agreement
    )
    cc = connected_components(cands)
    all_ids = entities.select(
        F.col("qualified_name").alias("entity_id")
    ).distinct()
    return (
        all_ids.join(cc, "entity_id", "left")
        .select(
            "entity_id",
            F.coalesce(F.col("canonical_id"), F.col("entity_id")).alias(
                "canonical_id"
            ),
        )
    )


def rewrite_edges_canonical(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite a triple frame's endpoints through the canonical mapping and
    re-dedup — the final merge step of canonicalization."""
    msub = mapping.select(
        F.col("entity_id").alias("subj"), F.col("canonical_id").alias("csubj")
    )
    mobj = mapping.select(
        F.col("entity_id").alias("obj"), F.col("canonical_id").alias("cobj")
    )
    return (
        edges.join(msub, "subj", "left")
        .join(mobj, "obj", "left")
        .select(
            F.coalesce("csubj", "subj").alias("subj"),
            "pred",
            F.coalesce("cobj", "obj").alias("obj"),
            "subj_label",
            "obj_label",
            *(["props"] if "props" in edges.columns else []),
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )
