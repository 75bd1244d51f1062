"""Product quantization (PQ) — subspace k-means codes for embeddings.

The compression step an ANN/vector-store pipeline runs after (or instead
of) scalar int8 quantization (``similarity.quantize_int8``): split each
d-dim vector into ``m`` contiguous subvectors, learn a small k-means
codebook per subspace (Lloyd, same recurrence as
``clustering.kmeans_assign``), and store each vector as ``m`` small
integer codes. 64-dim float32 → 4 bytes at m=4/k<=256 (64×
compression); asymmetric-distance search scans codes, not floats.

Scale shape: codebook training is m *independent* small-k k-means runs
over sliced arrays (each: literal-centroid argmin scan + one
posexplode aggregate per Lloyd round — no joins, no shuffle beyond the
k×sub-dim aggregate); the final encode is ONE scan with all m argmin
expressions fused — zero joins, zero shuffle, whole-stage codegen. At
10^9 vectors the encode is embarrassingly parallel and the training
aggregates are k×dim-bounded (driver traffic is the codebooks only).

Reference: Jégou et al., "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — public method; implementation is original.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .clustering import kmeans_assign


@dataclass
class PqResult:
    codes: DataFrame  # (vec_id, code_0..code_{m-1} INT, mse6 DOUBLE)
    codebooks: list[list[list[float]]]  # m × k × (dim/m)


def _sub_d2(vec_col, lo: int, sub: int, centroid: list[float]):
    """Squared L2 distance of the [lo, lo+sub) slice to ``centroid`` —
    left-associative accumulation (matches kmeans_assign's order)."""
    sliced = F.transform(
        F.slice(vec_col, lo + 1, sub), lambda e: e.cast("double")
    )
    return F.aggregate(
        F.zip_with(
            sliced,
            F.array(*[F.lit(c) for c in centroid]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    spark: SparkSession,
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mse_digits: int = 4,
) -> PqResult:
    """Train per-subspace codebooks and encode every vector.

    Output: (vec_id, code_0..code_{m-1}, mse{d}) — code_j is the
    subspace-j cluster id (argmin squared-L2, ties to the lower id —
    kmeans_assign's rule), mse = Σ_j d2_j / dim, rounded to
    ``mse_digits``. Codes are exact across engines; the rounded mse is
    the reconstruction-quality metric a quantization gate thresholds on.
    """
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("pq_encode: input is empty")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"pq_encode: dim {dim} not divisible by m {m}")
    sub = dim // m

    codebooks: list[list[list[float]]] = []
    for j in range(m):
        sub_df = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("embedding"),
        )
        res = kmeans_assign(spark, sub_df, k=k, iters=iters)
        codebooks.append(res.centroids)

    vec = F.col(vec_col)
    cols = [F.col(id_col).alias("vec_id")]
    d2_total = F.lit(0.0)
    for j, book in enumerate(codebooks):
        # argmin over the codebook via min(struct(d2, code)) — one fused
        # expression, no join; same tie rule as clustering._assign_expr
        pairs = F.array(
            *[
                F.struct(
                    _sub_d2(vec, j * sub, sub, c).alias("d2"),
                    F.lit(ci).alias("code"),
                )
                for ci, c in enumerate(book)
            ]
        )
        best = F.array_min(pairs)
        cols.append(best["code"].cast("int").alias(f"code_{j}"))
        d2_total = d2_total + best["d2"]
    cols.append(
        F.round(d2_total / F.lit(float(dim)), mse_digits).alias(
            f"mse{mse_digits}"
        )
    )
    return PqResult(embeddings.select(*cols), codebooks)


def ivfpq_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 3,
    n_clusters: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    query_mod: int = 25,
    m: int = 4,
    pq_k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate nearest neighbors — the production vector-store
    plan: a coarse k-means quantizer restricts each query to ``nprobe``
    inverted lists, and candidates are ranked by the PQ asymmetric
    distance (ADC), never by their full vectors.

    Scale shape (the reason IVF-PQ wins at 10^9 vectors): the candidate
    join carries (vec_id, cluster, m small int codes) — ~8 bytes of
    payload instead of d×4 — and the query side precomputes one
    m×k distance lookup table per query row (a pure Catalyst array
    expression), so scoring a candidate is m array lookups + m-1 adds,
    zero joins against the float vectors. The cluster join is the only
    shuffle and it is keyed/bucketed by the coarse assignment.

    Output: (query_id, neighbor_id, adc4) — top-``k`` by ADC (rounded to
    4 before ranking so the order is reproducible cross-engine), ties to
    the lower neighbor id. Queries: ``id % query_mod == 0``.
    """
    from .clustering import kmeans_assign

    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("ivfpq_topk: input is empty")
    dim = int(first["d"])
    sub = dim // m

    coarse = kmeans_assign(
        spark, embeddings, k=n_clusters, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    pq = pq_encode(
        spark, embeddings, m=m, k=pq_k, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    inv = coarse.assignments.join(
        pq.codes.select("vec_id", *[f"code_{j}" for j in range(m)]), "vec_id"
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        "cluster",
        *[f"code_{j}" for j in range(m)],
    )

    vec = F.col(vec_col)
    probe_structs = F.array(
        *[
            F.struct(
                _sub_d2(vec, 0, dim, c).alias("d2"), F.lit(ci).alias("cid")
            )
            for ci, c in enumerate(coarse.centroids)
        ]
    )
    luts = [
        F.array(
            *[_sub_d2(vec, j * sub, sub, c) for c in pq.codebooks[j]]
        ).alias(f"_lut_{j}")
        for j in range(m)
    ]
    q = (
        embeddings.where((F.col(id_col) % query_mod) == 0)
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(
                F.slice(F.array_sort(probe_structs), 1, nprobe)
            ).alias("_p"),
            *luts,
        )
        .select(
            "query_id", F.col("_p.cid").alias("cluster"),
            *[f"_lut_{j}" for j in range(m)],
        )
    )
    # element_at is 1-based; codes are 0-based → +1
    adc = F.element_at(F.col("_lut_0"), F.col("code_0") + 1)
    for j in range(1, m):
        adc = adc + F.element_at(F.col(f"_lut_{j}"), F.col(f"code_{j}") + 1)
    scored = (
        q.join(inv, "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(adc, 4).alias("adc4"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc4"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
