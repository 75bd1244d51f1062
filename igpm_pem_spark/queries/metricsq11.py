"""Twelfth metrics ring (round-5 session 9, batch 4): dedup cluster-size
census, BFS distance-to-core profile, ANN bucket-occupancy telemetry,
and the degree-Zipf power-law fit — every one an exact-integer
aggregate up to at most one final division (the Zipf OLS follows the
proven doc_zipf_slope float contract).

These four are the OBSERVABILITY ring a 100 TB deployment runs next to
the operators themselves: how big are the near-dup families the LSH
finds, how far does the graph sit from its hub core, how full are the
ANN buckets the max-bucket cap protects, and how heavy is the degree
tail the salt plan must absorb."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._common import G_SPARSE_SQL, docs, edges, emb
from .graphq import _with_g
from .pipeline2 import _dedup_clusters_sql

QUERIES: dict = {}

# ---- dedup cluster-size census ---------------------------------------


def _q_dedup_cluster_sizes(spark, sf_dir):
    """(cluster_size, n_clusters, n_docs): the near-dup family census —
    what fraction of the corpus sits in how-big duplicate families, the
    one-look summary that tells an operator whether the crawl is
    mostly-unique or mirror-dominated (and sizes the survivor savings).
    Composition: dedup_clusters → groupBy canonical → size histogram;
    everything after the (already capped) LSH pass is count arithmetic."""
    from ..operators.dedup import dedup_clusters
    from ._common import graph_nparts

    cl = dedup_clusters(
        spark, docs(spark, sf_dir), threshold=0.1,
        num_partitions=graph_nparts(spark, sf_dir),
    )
    sizes = cl.groupBy("canonical").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        (F.count("*") * F.col("cluster_size")).cast("bigint").alias("n_docs"),
    )


def _dedup_sizes_sql() -> str:
    return f"""
WITH cl AS MATERIALIZED ({_dedup_clusters_sql()}),
sizes AS (SELECT canonical, CAST(count(*) AS BIGINT) AS cluster_size
          FROM cl GROUP BY canonical)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
"""


QUERIES["doc_dedup_cluster_sizes"] = (_q_dedup_cluster_sizes, _dedup_sizes_sql())


# ---- BFS distance-to-core profile ------------------------------------
_CORE_HUBS = 5
_CORE_HOPS = 4


def _q_core_distance_hist(spark, sf_dir):
    """(dist, n_vertices): multi-source BFS profile from the top-degree
    hub core (ties → lower id) on the sparse graph, horizon 4;
    unreached vertices report dist = -1 — the metric complement of
    graph_hitting_time8 (hops, not expected walk steps). One joint
    frontier (no per-seed dimension — min-dist semantics by
    construction), one join + anti-join per level."""
    e = edges(spark, sf_dir, G_SPARSE_SQL)
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("d")
    )
    hubs = deg.orderBy(F.col("d").desc(), "id").limit(_CORE_HUBS).select("id")
    reached = hubs.select("id", F.lit(0).cast("long").alias("dist"))
    frontier = hubs
    for lvl in range(1, _CORE_HOPS + 1):
        frontier = (
            frontier.join(sym.withColumnRenamed("src", "id"), "id")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reached.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        reached = reached.unionByName(
            frontier.select("id", F.lit(lvl).cast("long").alias("dist"))
        )
    out = (
        deg.select("id")
        .join(reached, "id", "left")
        .select(F.coalesce("dist", F.lit(-1)).cast("long").alias("dist"))
        .groupBy("dist")
        .agg(F.count("*").cast("bigint").alias("n_vertices"))
    )
    sym.unpersist()
    return out


def _core_hist_sql() -> str:
    parts = [
        ", deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d"
        "  FROM sym GROUP BY src)",
        f", l0 AS (SELECT id FROM deg ORDER BY d DESC, id LIMIT {_CORE_HUBS})",
        ", r0 AS (SELECT id FROM l0)",
    ]
    for k in range(1, _CORE_HOPS + 1):
        p = k - 1
        parts.append(f"""
, l{k} AS (SELECT DISTINCT e.dst AS id FROM l{p} JOIN sym e ON e.src = l{p}.id
           WHERE e.dst NOT IN (SELECT id FROM r{p}))
, r{k} AS (SELECT id FROM r{p} UNION SELECT id FROM l{k})""")
    dist = " ".join(
        f"UNION ALL SELECT id, CAST({k} AS BIGINT) AS dist FROM l{k}"
        for k in range(1, _CORE_HOPS + 1)
    )
    parts.append(f"""
, dists AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM l0 {dist})
SELECT coalesce(t.dist, -1) AS dist, CAST(count(*) AS BIGINT) AS n_vertices
FROM deg LEFT JOIN dists t ON t.id = deg.id
GROUP BY 1""")
    return "".join(parts)


QUERIES["graph_core_distance_hist"] = (
    _q_core_distance_hist,
    _with_g(_core_hist_sql(), G_SPARSE_SQL),
)


# ---- ANN bucket-occupancy telemetry ----------------------------------


def _q_ann_bucket_stats(spark, sf_dir):
    """(sz, n_buckets, dropped): occupancy census of the hyperplane-LSH
    (table, signature) buckets, flagged by whether the max-bucket cap
    (the r04 scale fix) drops them before the candidate self-join —
    exactly the telemetry that shows how much quadratic work the cap
    removed on a low-entropy corpus. Pure count arithmetic over the
    signature relation; no vector is ever touched."""
    from ..functions.hashing import ANN_MAX_BUCKET, ANN_PLANES, ANN_TABLES
    from ..operators.similarity import hyperplane_buckets

    sigs = hyperplane_buckets(
        emb(spark, sf_dir), n_tables=ANN_TABLES, n_planes=ANN_PLANES
    )
    return (
        sigs.groupBy("tbl", "sig")
        .agg(F.count("*").cast("bigint").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").cast("bigint").alias("n_buckets"))
        .select(
            "sz", "n_buckets", (F.col("sz") > ANN_MAX_BUCKET).alias("dropped")
        )
    )


def _ann_bucket_stats_sql() -> str:
    from ..functions.hashing import ANN_MAX_BUCKET
    from .pipeline import _ANN_PRELUDE, _ann_sigs_union

    return (
        _ANN_PRELUDE.format(sigs=_ann_sigs_union())
        + f"""
, bsz AS (SELECT tbl, sig, CAST(count(*) AS BIGINT) AS sz
          FROM sigs GROUP BY tbl, sig)
SELECT sz, CAST(count(*) AS BIGINT) AS n_buckets,
       sz > {ANN_MAX_BUCKET} AS dropped
FROM bsz GROUP BY sz
"""
    )


QUERIES["emb_ann_bucket_stats"] = (_q_ann_bucket_stats, _ann_bucket_stats_sql())


# ---- degree-Zipf power-law fit ---------------------------------------
_DZ_TOP = 50


def _q_degree_zipf(spark, sf_dir):
    """(n_top, slope6, intercept6): OLS fit of ln(degree) on ln(rank)
    over the top-50 degree vertices (ties → lower id) of the DENSE
    co-occurrence graph — the power-law tail exponent the skew salt
    plan must absorb (doc_zipf_slope's token-frequency contract, on
    degrees). rank/degree stay exact integers until the two logs; the
    fit is the same 5-aggregate OLS the token oracle proved."""
    e = edges(spark, sf_dir)
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    w = Window.orderBy(F.desc("d"), F.asc("id"))
    top = (
        deg.orderBy(F.col("d").desc(), "id").limit(_DZ_TOP)
        .withColumn("rank", F.row_number().over(w))
    )
    xy = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("d").cast("double")).alias("y"),
    )
    fit = xy.agg(
        F.count("*").alias("n_top"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
    )
    slope = (F.col("mxy") - F.col("mx") * F.col("my")) / (
        F.col("mxx") - F.col("mx") * F.col("mx")
    )
    intercept = F.col("my") - slope * F.col("mx")
    return fit.select(
        F.col("n_top").cast("bigint").alias("n_top"),
        F.round(slope, 6).alias("slope6"),
        F.round(intercept, 6).alias("intercept6"),
    )


_DEGREE_ZIPF_SQL = f"""
, deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)
, top AS (
  SELECT d, row_number() OVER (ORDER BY d DESC, id ASC) AS rank
  FROM deg ORDER BY d DESC, id LIMIT {_DZ_TOP})
, xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(d AS DOUBLE)) AS y FROM top)
, fit AS (
  SELECT count(*) AS n_top, avg(x) AS mx, avg(y) AS my,
         avg(x * y) AS mxy, avg(x * x) AS mxx
  FROM xy)
SELECT CAST(n_top AS BIGINT) AS n_top,
       round((mxy - mx * my) / (mxx - mx * mx), 6) AS slope6,
       round(my - (mxy - mx * my) / (mxx - mx * mx) * mx, 6) AS intercept6
FROM fit
"""

QUERIES["graph_degree_zipf_slope"] = (
    _q_degree_zipf,
    _with_g(_DEGREE_ZIPF_SQL),
)
