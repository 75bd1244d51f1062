"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k: query subset × corpus cross
  join with the dot product as a Catalyst ``aggregate``/``zip_with``
  expression (JVM-side, codegen'd — no UDF). The exactness baseline.
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH bucketing;
  candidates share a signature bucket, ranked by exact cosine within
  buckets. Hyperplanes are deterministic (xxhash64-seeded per (plane,
  dim)), so results are reproducible across partitionings and runs.

At 1e12 rows the brute-force path is a deliberate non-starter (quadratic);
the LSH plan is bucket-join shaped exactly like dedup's band join, with
the same bounded-bucket skew property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def with_cosine(pairs: DataFrame, a: str = "emb_a", b: str = "emb_b") -> DataFrame:
    """Add ``cos`` — dot(a,b)/(|a||b|) as pure Catalyst expressions."""
    dot = F.aggregate(
        F.zip_with(_as_double(F.col(a)), _as_double(F.col(b)), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(_as_double(F.col(c)), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return pairs.withColumn("cos", dot / (norm(a) * norm(b)))


def cosine_topk(
    emb: DataFrame,
    k: int = 3,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos4): exact top-k cosine neighbors for the
    deterministic query subset ``vec_id % query_mod == 0``; ranking by
    (rounded cosine desc, neighbor id asc) so ties are engine-portable."""
    q = emb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("emb_a")
    ).where(F.col("query_id") % query_mod == 0)
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb_b"))
    pairs = q.crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    scored = with_cosine(pairs).select(
        "query_id", "neighbor_id", F.round("cos", 4).alias("cos4")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos4"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos4")
    )


def _hyperplane_signature(emb: DataFrame, n_planes: int, id_col: str, vec_col: str) -> DataFrame:
    """(id, sig): sign bits of n_planes deterministic random hyperplanes.
    Plane weights w(p, d) ∈ [-0.5, 0.5) derive from xxhash64(p, d) — no
    stored model, reproducible anywhere."""
    dims = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)

    def _plane_term(plane: int):
        def term(x, d):
            w = (
                (F.abs(F.xxhash64(F.lit(plane), d)) % F.lit(10**6)).cast("double")
                / F.lit(10**6)
                - F.lit(0.5)
            )
            return x * w

        return term

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(_as_double(F.col(vec_col)), dims, _plane_term(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(2**p)).otherwise(F.lit(0))
    return emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("emb"), sig.alias("sig"))


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    query_mod: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos4): approximate top-k — candidates are
    corpus vectors in the query's hyperplane bucket, ranked by exact
    cosine. Recall rises with fewer planes / multiple tables; this single-
    table variant is the bucket-join skeleton the scale path needs."""
    signed = _hyperplane_signature(emb, n_planes, id_col, vec_col).persist()
    q = signed.where(F.col("id") % query_mod == 0).select(
        F.col("id").alias("query_id"), F.col("emb").alias("emb_a"), "sig"
    )
    c = signed.select(F.col("id").alias("neighbor_id"), F.col("emb").alias("emb_b"), "sig")
    pairs = q.join(c, "sig").where(F.col("query_id") != F.col("neighbor_id"))
    scored = with_cosine(pairs).select(
        "query_id", "neighbor_id", F.round("cos", 4).alias("cos4")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos4"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos4")
    )
    return out


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    subset_mod: int = 4,
) -> DataFrame:
    """(id_a, id_b, cos4): embedding-cosine near-duplicate pairs above
    ``threshold`` within the deterministic subset id % subset_mod == 0
    (quadratic guard for the checked variant; the production path feeds
    ann_lsh buckets instead of a subset)."""
    s = emb.where(F.col(id_col) % subset_mod == 0)
    a = s.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"))
    b = s.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(pairs)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos4"))
        .where(F.col("cos4") >= threshold)
    )
