"""SimRank similarity for a seed pair set (Jeh & Widom, KDD'02).

"Two objects are similar if they are referenced by similar objects":
the recursive link-similarity measure of a citation/link graph, the
pair-level sibling of the co-citation count (`metrics.cocitation_coupling`
is exactly SimRank's first iteration, unnormalized).  This operator
computes the second SimRank iteration s2 for a set of seed pairs —
the first iteration that looks past directly shared in-neighbors.

Why not the textbook all-pairs iteration: materializing s(u, v) for
every vertex pair is O(V²) state and dies at link-graph scale.  The
engine instead evaluates s2 for a *pair set* (default: all pairs over
the top in-degree seeds, the hub pages whose similarity one actually
audits) through an exact algebraic factorization that never builds a
neighborhood cross product:

    s1(u, v) = C·|I(u) ∩ I(v)| / (d(u)·d(v))          (s0 = identity)
    s2(a, b) = C/(d(a)·d(b)) · Σ_{u∈I(a), v∈I(b)} ŝ1(u, v)
             = C/(na·nb) · ( common(a,b)
                             + C·( Σ_w g(a,w)·g(b,w) − Σ_{u∈I(a)∩I(b)} 1/d(u) ) )

where g(a, w) = Σ_{u∈I(a), w∈I(u)} 1/d(u) is a weighted two-hop
in-walk profile (one edge join + one keyed aggregate per seed side,
the same Σd² shuffle shape as the triangle/co-citation plans), and the
Σ_w inner product is a single equi-join on the grandparent vertex.
The diagonal correction subtracts the u = v terms the inner product
double-counts (ŝ1(u, u) = 1, not s1's off-diagonal form).

Scale: seed-restricted by construction — `ia` is |seeds|·avg-indeg
rows; `g` is one two-hop expansion of those rows; every join keys on a
vertex id, no cartesian anywhere. The pair scores are exact (modulo the
final engine-portable rounding), not sampled random-walk estimates.

Reference parity: the reference has no SimRank; this extends its
link-analysis ring (PageRank/HITS/SALSA live in `pagerank.py`,
`hits.py`) with the canonical pairwise measure over the same digraphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def simrank_pairs(
    edges: DataFrame,
    *,
    n_seeds: int = 8,
    c: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """(a, b, na, nb, common, s1, s2) for all pairs over the top
    ``n_seeds`` in-degree vertices (ties by id) of the digraph.

    ``na``/``nb`` are in-degrees, ``common`` the shared-in-neighbor
    count, ``s1``/``s2`` the first/second SimRank iterates with decay
    ``c``, rounded to ``round_to`` decimals for engine-portable
    comparison. Pairs of seeds sharing nothing still appear (s2 can be
    positive through the two-hop term alone)."""
    if n_seeds < 2:
        raise ValueError(f"simrank_pairs: need >= 2 seeds, got {n_seeds}")
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    indeg = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("d"))
    seeds = (
        indeg.orderBy(F.desc("d"), F.asc("id")).limit(n_seeds).select("id")
    )
    # in-neighbor rows of each seed: (a, u) — |seeds|·avg-indeg rows
    ia = (
        e.join(F.broadcast(seeds.withColumnRenamed("id", "dst")), "dst")
        .select(F.col("dst").alias("a"), F.col("src").alias("u"))
    )
    na = ia.groupBy("a").agg(F.count("*").alias("n"))
    # per-in-neighbor weight 1/d(u)
    wu = ia.join(indeg.withColumnRenamed("id", "u"), "u").select(
        "a", "u", (F.lit(1.0) / F.col("d")).alias("inv_d")
    )
    # shared-in-neighbor count and the diagonal correction Σ 1/d(u)
    common = (
        ia.join(ia.select(F.col("a").alias("b"), "u"), "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    diag = (
        wu.join(ia.select(F.col("a").alias("b"), "u"), "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("inv_d").alias("diag"))
    )
    # g(a, w): two-hop in-walk profile, then the Σ_w inner product
    g = (
        wu.join(e.select(F.col("dst").alias("u"), F.col("src").alias("w")), "u")
        .groupBy("a", "w")
        .agg(F.sum("inv_d").alias("g"))
    )
    dot = (
        g.join(g.select(F.col("a").alias("b"), "w", F.col("g").alias("g2")), "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("g") * F.col("g2")).alias("dot"))
    )
    pairs = (
        seeds.select(F.col("id").alias("a"))
        .join(seeds.select(F.col("id").alias("b")), F.col("a") < F.col("b"))
    )
    nn = F.col("_na") * F.col("_nb")
    cm = F.coalesce("common", F.lit(0))
    s2 = (
        F.lit(c) / nn
        * (cm + F.lit(c) * (F.coalesce("dot", F.lit(0.0)) - F.coalesce("diag", F.lit(0.0))))
    )
    return (
        pairs.join(na.select(F.col("a"), F.col("n").alias("_na")), "a")
        .join(na.select(F.col("a").alias("b"), F.col("n").alias("_nb")), "b")
        .join(common, ["a", "b"], "left")
        .join(diag, ["a", "b"], "left")
        .join(dot, ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.col("_na").cast("bigint").alias("na"),
            F.col("_nb").cast("bigint").alias("nb"),
            cm.cast("bigint").alias("common"),
            F.round(F.lit(c) * cm / nn, round_to).alias("s1"),
            F.round(s2, round_to).alias("s2"),
        )
    )
