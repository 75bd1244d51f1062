"""Embedding clustering — deterministic Lloyd k-means assignment.

The scale path for organizing an embedding corpus (IVF-style coarse
quantization for ANN, near-dup bucketing, topic balancing): a fixed
number of Lloyd iterations from deterministic seeds. Centroids are k·dim
doubles — driver-resident and broadcast into Catalyst expressions as
literals, so each iteration is ONE full scan computing an argmin over k
inline squared-L2 expressions plus one (cluster, pos) aggregate for the
means. No UDFs, no cross join, no per-row Python; the only driver data
is the k×dim centroid matrix (bytes, not rows).

Determinism / oracle-mirrorability: seeds are the k lowest-``vec_id``
embeddings; assignment ties break toward the lower cluster id; distances
and means are double arithmetic identical in shape to the DuckDB oracle
(queries/pipeline.py) — integer cluster labels make ulp-level summation
differences harmless away from exact ties.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class KMeansResult:
    assignments: DataFrame  # (vec_id BIGINT, cluster INT)
    centroids: list[list[float]]  # k × dim, final means
    iterations: int


def _assign_expr(centroids: list[list[float]]):
    """argmin_j ||v - c_j||² as a pure Catalyst expression: build an array
    of (d2, j) structs and take array_min (lexicographic → min distance,
    ties to lower j)."""
    structs = []
    for j, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(
                F.col("v"), lit, lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(F.struct(d2.alias("d2"), F.lit(j).alias("j")))
    return F.array_min(F.array(*structs))["j"]


def kmeans_assign(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Run ``iters`` Lloyd rounds from the k lowest-id seed vectors and
    return final assignments. An empty cluster keeps its previous
    centroid (standard Lloyd convention)."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist()
    seed_rows = e.orderBy("vec_id").limit(k).collect()
    if not seed_rows:
        e.unpersist()
        raise ValueError("kmeans_assign: input is empty — no rows to seed centroids from")
    if len(seed_rows) < k:
        # fewer rows than clusters: run with effective k = |rows| (each
        # row its own seed) rather than fabricating centroids
        k = len(seed_rows)
    centroids = [list(r.v) for r in seed_rows]
    dim = len(centroids[0])

    assigned = None
    for _ in range(iters):
        assigned = e.select(
            "vec_id", "v", _assign_expr(centroids).alias("cluster")
        )
        means = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]
        by_cluster: dict[int, list[float]] = {}
        for r in means:
            by_cluster.setdefault(int(r.cluster), [0.0] * dim)[int(r.pos)] = float(
                r.m
            )
        for j, vec in by_cluster.items():
            new_c[j] = vec
        centroids = new_c

    final = e.select("vec_id", _assign_expr(centroids).alias("cluster"))
    final = final.localCheckpoint(eager=True)
    e.unpersist()
    return KMeansResult(final, centroids, iters)
