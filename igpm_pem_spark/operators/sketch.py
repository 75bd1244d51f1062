"""Deterministic cardinality sketching — the KMV (k-minimum-values)
distinct-count estimator a 100 TB pipeline uses where an exact
countDistinct would shuffle every key (vocabulary size, unique-URL
counts, per-source token diversity).

Why KMV and not HyperLogLog: Spark's ``approx_count_distinct`` is HLL
with engine-private hashing — its value cannot be reproduced by another
engine, so it can never be driver-oracled. KMV with the repo's portable
md5-prefix hash (the split_by_hash family) is exactly reproducible in
DuckDB: hash every distinct key into [0, 16^15), keep the k smallest,
and estimate N ≈ (k-1) · DOMAIN / h_k. Accuracy is the textbook
1/sqrt(k-2) relative error — k=256 gives ~6%.

Scale shape: hash is a stateless projection; the k-smallest step is
``distinct().orderBy(h).limit(k)`` which Spark executes as TakeOrdered —
per-partition top-k then a k-row merge on the driver side of the plan,
never a global sort. The result is a 1-row relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# hash domain: 15 hex chars of md5 → [0, 16^15)
KMV_DOMAIN = 16 ** 15


def kmv_hash(key: Column, salt: str = "kmv") -> Column:
    """Portable uniform hash into [0, KMV_DOMAIN) — same md5-prefix
    construction as sampling.split_bucket, without the bucket modulus."""
    s = F.concat(F.lit(salt + ":"), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def kmv_hash_sql(key: str, salt: str = "kmv") -> str:
    """DuckDB SQL text computing the same hash value per row."""
    return f"(('0x' || substr(md5('{salt}:' || CAST({key} AS VARCHAR)), 1, 15))::BIGINT)"


def kmv_distinct(
    df: DataFrame, key_col: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """1-row (k_used, kth_hash, est_distinct): KMV estimate of
    ``countDistinct(key_col)``.

    If the relation has fewer than k distinct keys the sketch is exact:
    k_used is the observed count and est_distinct = k_used (the
    estimator formula only applies when the k-th minimum exists at full
    occupancy). Deterministic for any input, any partitioning."""
    if k < 3:
        raise ValueError("kmv_distinct: k must be >= 3 for a finite-variance estimate")
    mins = (
        df.select(kmv_hash(F.col(key_col), salt).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = mins.agg(
        F.count("*").alias("k_used"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(
            F.floor(
                (F.lit(float(k - 1)) * F.lit(float(KMV_DOMAIN)))
                / F.col("kth_hash").cast("double")
            ).cast("long")
        )
        .alias("est_distinct"),
    )


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """(group, k_used, kth_hash, est_distinct): per-group KMV distinct
    estimate — the sketch composed under GROUP BY (per-language vocab
    sizes, per-source unique users) without a per-group countDistinct
    shuffle of every key.

    Scale shape: one distinct over (group, hash) then a window top-k per
    group — partial aggregation does the heavy lifting and per-group
    state is k rows. Exact-degrade below k, as in kmv_distinct."""
    if k < 3:
        raise ValueError("kmv_distinct_by: k must be >= 3")
    from pyspark.sql import Window

    hs = (
        df.select(F.col(group_col).alias("grp"), kmv_hash(F.col(key_col), salt).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    mins = hs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    agg = mins.groupBy("grp").agg(
        F.count("*").alias("k_used"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1) * float(KMV_DOMAIN)) / F.col("kth_hash").cast("double")
            ).cast("bigint")
        )
        .alias("est_distinct"),
    )


def kmv_by_sql(
    group_sql: str, key_sql: str, from_sql: str, k: int = 64, salt: str = "kmv"
) -> str:
    """DuckDB SQL of kmv_distinct_by (same values per group)."""
    h = kmv_hash_sql(key_sql, salt)
    return f"""
WITH hs AS (SELECT DISTINCT {group_sql} AS grp, {h} AS h FROM {from_sql}),
mins AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hs
  ) WHERE rn <= {k}
)
SELECT grp AS {group_sql}, count(*) AS k_used, max(h) AS kth_hash,
       CASE WHEN count(*) < {k} THEN count(*)
            ELSE CAST(floor(({float(k - 1)} * {float(KMV_DOMAIN)}) / CAST(max(h) AS DOUBLE)) AS BIGINT)
       END AS est_distinct
FROM mins GROUP BY grp
"""
