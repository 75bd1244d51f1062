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


def _assign_bcast(e: DataFrame, cent: DataFrame):
    """(vec_id, v, cluster) via a broadcast nested-loop join against the
    centroid relation — the large-k path. Map-side only (no shuffle of
    the corpus): each partition streams its rows against the broadcast
    k×dim table, then one groupBy(vec_id) takes min(d2, cluster), which
    is the same lexicographic tie rule as the literal argmin."""
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "v",
        F.struct(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
            F.col("cluster").alias("j"),
        ).alias("dj"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.first("v").alias("v"), F.min("dj").alias("dj"))
        .select("vec_id", "v", F.col("dj.j").alias("cluster"))
    )


def kmeans_assign(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "literal",
) -> KMeansResult:
    """Run ``iters`` Lloyd rounds from the k lowest-id seed vectors and
    return final assignments. An empty cluster keeps its previous
    centroid (standard Lloyd convention).

    ``strategy``: ``"literal"`` (default) inlines the k×dim centroids as
    Catalyst literals — one scan, zero joins, ideal for the small-k IVF
    coarse-quantizer case. ``"broadcast"`` carries the centroids as a
    broadcast relation and assigns via a map-side nested-loop join —
    the same distances and the same lower-cluster tie rule, but the plan
    size stays constant as k grows, so it is the path for k in the
    thousands (the literal expression tree grows O(k·dim) and would
    stall Catalyst analysis long before the executors feel it)."""
    if strategy not in ("literal", "broadcast"):
        raise ValueError(f"kmeans_assign: unknown strategy {strategy!r}")
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

    def _cent_df(c: list[list[float]]) -> DataFrame:
        return spark.createDataFrame(
            [(j, list(map(float, v))) for j, v in enumerate(c)],
            "cluster INT, cv ARRAY<DOUBLE>",
        )

    def _assigned(c: list[list[float]]) -> DataFrame:
        if strategy == "broadcast":
            return _assign_bcast(e, _cent_df(c))
        return e.select("vec_id", "v", _assign_expr(c).alias("cluster"))

    assigned = None
    for _ in range(iters):
        assigned = _assigned(centroids)
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

    final = _assigned(centroids).select("vec_id", "cluster")
    final = final.localCheckpoint(eager=True)
    e.unpersist()
    return KMeansResult(final, centroids, iters)


def silhouette_by_cluster(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster simplified (centroid-based) silhouette after ``iters``
    Lloyd rounds: for each vector, a = distance to its own final
    centroid, b = distance to the nearest OTHER final centroid,
    s = (b - a) / max(a, b); returned as (cluster, n, silhouette6) with
    the mean s per cluster rounded to 6 decimals.

    The centroid-based form (vs pairwise-point silhouette, which is
    O(n²) and dead at corpus scale) is the standard cluster-quality
    gate a 100 TB embedding pipeline runs after IVF training: one full
    scan against the broadcast k×dim centroid matrix — the same
    literal-argmin expression shape as ``kmeans_assign`` — then one
    k-row aggregate. Zero joins, zero Python on the data path.
    Assignment and the a-distance reuse the argmin's lexicographic
    (d2, j) tie rule, so labels equal ``kmeans_assign``'s exactly."""
    if k < 2:
        raise ValueError(
            "silhouette_by_cluster: k must be >= 2 — the b-distance needs "
            "at least one other cluster"
        )
    res = kmeans_assign(
        spark, embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    structs = []
    for j, c in enumerate(res.centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(F.col("v"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(F.struct(d2.alias("d2"), F.lit(j).alias("j")))
    scored = (
        e.select("vec_id", F.array(*structs).alias("dj"))
        .select("vec_id", "dj", F.array_min("dj").alias("own"))
        .select(
            F.col("own.j").alias("cluster"),
            F.sqrt(F.col("own.d2")).alias("a"),
            F.sqrt(
                F.array_min(
                    F.filter("dj", lambda x: x["j"] != F.col("own.j"))
                )["d2"]
            ).alias("b"),
        )
    )
    s = F.when(F.greatest("a", "b") == 0.0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    return (
        scored.withColumn("s", s)
        .groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("s"), 6).alias("silhouette6"),
        )
    )
