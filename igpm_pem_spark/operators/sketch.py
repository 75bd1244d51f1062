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


def anf_kmv(
    spark,
    edges: DataFrame,
    *,
    hops: int = 3,
    k: int = 32,
    salt: str = "anf",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, h, k_used, n_reach_est): the neighborhood function — how many
    vertices lie within h hops of each vertex (undirected, self included)
    — estimated per vertex by a KMV sketch merged along edges (the ANF
    idea of Palmer/Gibbons/Faloutsos KDD'02, with KMV in place of their
    Flajolet-Martin bitmasks so the estimate is portable arithmetic an
    independent SQL engine reproduces exactly).

    State is one ascending array of ≤k hashes per vertex. Per hop, every
    vertex merges its neighbors' sketches with its own: one message join
    + one groupBy whose per-group state is bounded by (degree+1)·k longs
    (at web scale a hub's merge fans in via partial aggregation; beyond
    that the standard move is a two-level salted merge — the sketch union
    is associative and commutative, so any merge tree is exact). The
    sketch rows are k longs regardless of how large the h-hop ball gets —
    the whole point at 10^9 vertices, where exact per-vertex reach sets
    are quadratic.

    Sketches below occupancy k are exact counts (k_used < k ⇒ the ball
    itself had k_used distinct hash values)."""
    from .graph import canonical_undirected

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    e = canonical_undirected(edges)
    sym = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("nbr"))
        .unionByName(e.select(F.col("dst").alias("v"), F.col("src").alias("nbr")))
        .repartition(num_partitions, "nbr")
        .localCheckpoint(eager=True)
    )
    state = (
        sym.select(F.col("v").alias("id"))
        .distinct()
        .select("id", F.array(kmv_hash(F.col("id"), salt)).alias("ks"))
        .repartition(num_partitions, "id")
        .localCheckpoint(eager=True)
    )

    def _est(h: int) -> DataFrame:
        n = F.size("ks")
        return state.select(
            "id",
            F.lit(h).cast("int").alias("h"),
            n.cast("int").alias("k_used"),
            F.when(n < k, n.cast("bigint"))
            .otherwise(
                F.floor(
                    F.lit(float(k - 1) * float(KMV_DOMAIN))
                    / F.element_at("ks", k).cast("double")
                ).cast("bigint")
            )
            .alias("n_reach_est"),
        )

    out: DataFrame | None = None
    for h in range(1, hops + 1):
        msgs = sym.join(
            state.select(F.col("id").alias("nbr"), "ks"), "nbr"
        ).select(F.col("v").alias("id"), "ks")
        state = (
            state.unionByName(msgs)
            .groupBy("id")
            .agg(
                F.slice(
                    F.array_sort(F.array_distinct(F.flatten(F.collect_list("ks")))),
                    1,
                    k,
                ).alias("ks")
            )
            .localCheckpoint(eager=True)
        )
        hop_est = _est(h)
        out = hop_est if out is None else out.unionByName(hop_est)
    return out


def anf_oracle_sql(g_sql: str, hops: int = 3, k: int = 32, salt: str = "anf") -> str:
    """DuckDB SQL of ``anf_kmv``: exact h-hop reach sets (unrolled,
    MATERIALIZED), then the identical min-k / estimator arithmetic over
    the same portable hash values."""
    h = kmv_hash_sql("node", salt)
    parts = [
        f"""WITH ge AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM ({g_sql}) q WHERE src <> dst
)
, sym AS MATERIALIZED (
  SELECT src AS v, dst AS nbr FROM ge UNION ALL SELECT dst, src FROM ge
)
, r0 AS MATERIALIZED (
  SELECT id, id AS node FROM (SELECT src AS id FROM ge UNION SELECT dst FROM ge)
)"""
    ]
    for i in range(1, hops + 1):
        q = i - 1
        parts.append(
            f"""
, r{i} AS MATERIALIZED (
  SELECT id, node FROM r{q}
  UNION
  SELECT s.v AS id, r.node FROM sym s JOIN r{q} r ON r.id = s.nbr
)"""
        )
    hop_selects = []
    for i in range(1, hops + 1):
        hop_selects.append(
            f"""
SELECT id, CAST({i} AS INT) AS h, CAST(count(*) AS INT) AS k_used,
       CASE WHEN count(*) < {k} THEN count(*)
            ELSE CAST(floor({float(k - 1) * float(KMV_DOMAIN)} / CAST(max(hv) AS DOUBLE)) AS BIGINT)
       END AS n_reach_est
FROM (
  SELECT id, hv, row_number() OVER (PARTITION BY id ORDER BY hv) AS rn
  FROM (SELECT DISTINCT id, {h} AS hv FROM r{i})
) WHERE rn <= {k} GROUP BY id"""
        )
    parts.append("\nUNION ALL".join(hop_selects))
    return "".join(parts)


# ----------------------------------------------------------------- CMS
# count-min sketch: D independent W-wide integer counter rows; the
# estimate for a key is the min over its D counters. Overcounts only
# (collisions add), never undercounts — the classic heavy-hitter sketch
# (Cormode & Muthukrishnan 2005, public method; implementation original).
CMS_DEPTH = 4
CMS_WIDTH = 256
# permutation ids 100.. keep the CMS row hashes disjoint from the
# minhash family's 0..NUM_PERM
_CMS_PERM_BASE = 100


def cms_bucket_exprs(tid: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """List of D bucket columns for a portable token id."""
    from ..functions.hashing import P, perm_coeffs

    out = []
    for d in range(depth):
        a, b = perm_coeffs(_CMS_PERM_BASE + d)
        out.append(((F.lit(a) * tid + F.lit(b)) % F.lit(P)) % F.lit(width))
    return out


def cms_bucket_sql(d: int, tid: str = "tid", width: int = CMS_WIDTH) -> str:
    from ..functions.hashing import P, perm_coeffs

    a, b = perm_coeffs(_CMS_PERM_BASE + d)
    return f"((({a} * {tid} + {b}) % {P}) % {width})"


def cms_heavy_hitters(
    docs: DataFrame,
    topn: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, est, exact): top-``topn`` corpus tokens by count-min
    estimate (ties → lexicographically smaller token), with the exact
    count alongside — the sketch guarantees est >= exact, and the gap is
    the collision overcount a D×W budget buys.

    Scale shape: the counter table is depth×width rows TOTAL regardless
    of corpus size — the token stream aggregates straight into it (one
    explode×D + one shuffle of (d, bucket) keys, i.e. bounded
    cardinality, perfectly combinable map-side). Estimates then need
    only the DISTINCT tokens joined (broadcast) against the tiny counter
    relation. At 10^12 tokens the exact per-token count this query also
    emits is the expensive half; a production run drops it and keeps
    the sketch half, which never shuffles more than D·W counters.
    """
    from ..functions.text import token_id, tokens

    toks = tokens(docs, id_col=id_col, text_col=text_col).select(
        "token", token_id("token").alias("tid")
    )
    buckets = cms_bucket_exprs(F.col("tid"), depth, width)
    counters = (
        toks.select(
            F.posexplode(F.array(*buckets)).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("c"))
    )
    cand = toks.groupBy("token", "tid").agg(F.count("*").alias("exact"))
    est = None
    joined = cand
    for d in range(depth):
        cd = counters.where(F.col("d") == d).select(
            F.col("bucket").alias(f"_b{d}"), F.col("c").alias(f"_c{d}")
        )
        joined = joined.join(
            F.broadcast(cd), buckets[d] == F.col(f"_b{d}"), "left"
        )
        e = F.coalesce(F.col(f"_c{d}"), F.lit(0))
        est = e if est is None else F.least(est, e)
    scored = joined.select("token", est.alias("est"), "exact")
    # TakeOrdered (per-partition top-n + driver-side n-row merge), not a
    # single-partition row_number window — the distinct-token relation
    # is corpus-vocabulary-sized
    return scored.orderBy(F.desc("est"), F.asc("token")).limit(topn)
