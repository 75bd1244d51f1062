"""Fourteenth metrics ring (round-5 session 10, batch 7): short-walk
return probabilities, IVF inverted-list balance telemetry, and the
new-vs-returning daily engagement split.

Return probability p_t(v→v) is the walk-diagnostic dual of the
clustering coefficient (p_2 = Σ 1/(d_v d_u) over neighbors; p_3 sees
triangles) and the quantity spectral methods estimate globally — here
exact, per seed. IVF list sizes are the kmeans analogue of the ANN
bucket census (a skewed inverted list is a latency cliff at query
time). New-vs-returning is the growth-accounting view of the events
stream the WAU/active-days censuses don't separate."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import G_SPARSE_SQL, edges, register
from .graphq import _with_g

QUERIES: dict = {}

# ---- 3-step walk return probabilities --------------------------------
_WR_SEEDS = 5


def _q_walk_return(spark, sf_dir):
    """(id, p2_6, p3_6): exact 2- and 3-step return probabilities of the
    simple random walk from the 5 lowest-id vertices. p2 = Σ_{u∈N(v)}
    (1/d_v)(1/d_u); p3 additionally requires the third hop to close a
    triangle — p3 > 0 iff the seed participates in one, and its
    magnitude weighs those triangles by degree (the local mixing
    diagnostic). Two message joins from a 5-row frontier; work ∝ seed
    2-hop neighborhoods."""
    e = edges(spark, sf_dir, G_SPARSE_SQL)
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("d")
    ).persist()
    seeds = deg.orderBy("id").limit(_WR_SEEDS).select(
        F.col("id").alias("s"), F.col("d").alias("ds")
    )
    # hop 1: s -> u with mass 1/ds carried as (s, u, 1/(ds*du)) prepared
    h1 = (
        seeds.join(sym.withColumnRenamed("src", "s"), "s")
        .select("s", "ds", F.col("dst").alias("u"))
        .join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
    )
    p2 = (
        h1.join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u"
        )
        .where(F.col("w") == F.col("s"))
        .groupBy(F.col("s").alias("id"))
        .agg(
            F.sum(
                F.lit(1.0) / (F.col("ds") * F.col("du")).cast("double")
            ).alias("p2")
        )
    )
    # hop 2: (s,u) -> w != s ... then hop 3 must return to s
    h2 = (
        h1.join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u"
        )
        .join(deg.select(F.col("id").alias("w"), F.col("d").alias("dw")), "w")
    )
    p3 = (
        h2.join(
            sym.select(F.col("src").alias("w"), F.col("dst").alias("x")), "w"
        )
        .where(F.col("x") == F.col("s"))
        .groupBy(F.col("s").alias("id"))
        .agg(
            F.sum(
                F.lit(1.0)
                / (F.col("ds") * F.col("du") * F.col("dw")).cast("double")
            ).alias("p3")
        )
    )
    out = (
        seeds.select(F.col("s").alias("id"))
        .join(p2, "id", "left")
        .join(p3, "id", "left")
        .select(
            "id",
            F.round(F.coalesce("p2", F.lit(0.0)), 6).alias("p2_6"),
            F.round(F.coalesce("p3", F.lit(0.0)), 6).alias("p3_6"),
        )
        .localCheckpoint(eager=True)
    )
    sym.unpersist()
    deg.unpersist()
    return out


_WALK_RETURN_SQL = f"""
, deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src)
, seeds AS (SELECT id AS s, d AS ds FROM deg ORDER BY id LIMIT {_WR_SEEDS})
, h1 AS (
  SELECT sd.s, sd.ds, e.dst AS u, du.d AS du
  FROM seeds sd JOIN sym e ON e.src = sd.s
  JOIN deg du ON du.id = e.dst)
, p2 AS (
  SELECT h1.s AS id, sum(1.0 / CAST(h1.ds * h1.du AS DOUBLE)) AS p2
  FROM h1 JOIN sym e ON e.src = h1.u AND e.dst = h1.s
  GROUP BY h1.s)
, h2 AS (
  SELECT h1.s, h1.ds, h1.du, e.dst AS w, dw.d AS dw
  FROM h1 JOIN sym e ON e.src = h1.u
  JOIN deg dw ON dw.id = e.dst)
, p3 AS (
  SELECT h2.s AS id, sum(1.0 / CAST(h2.ds * h2.du * h2.dw AS DOUBLE)) AS p3
  FROM h2 JOIN sym e ON e.src = h2.w AND e.dst = h2.s
  GROUP BY h2.s)
SELECT sd.s AS id,
       round(coalesce(p2.p2, 0.0), 6) AS p2_6,
       round(coalesce(p3.p3, 0.0), 6) AS p3_6
FROM seeds sd
LEFT JOIN p2 ON p2.id = sd.s
LEFT JOIN p3 ON p3.id = sd.s
"""

QUERIES["graph_walk_return3"] = (
    _q_walk_return,
    _with_g(_WALK_RETURN_SQL, G_SPARSE_SQL),
)


# ---- IVF inverted-list balance ---------------------------------------


def _q_ivf_list_sizes(spark, sf_dir):
    """(cluster, list_size, imbalance_micro): inverted-list sizes of the
    2-round kmeans coarse quantizer plus each list's imbalance factor
    size/(N/k) in exact micro-units — the kmeans analogue of the ANN
    bucket census: a 10× over-full list is a query-latency cliff at
    nprobe time. One count per cluster; the imbalance is one exact
    division folded to integers (size·k·1e6 / N)."""
    from ..operators.clustering import kmeans_assign
    from ._common import emb

    res = kmeans_assign(spark, emb(spark, sf_dir), k=8, iters=2)
    a = res.assignments
    n = a.count()
    k = 8
    return (
        a.groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(F.count("*").cast("bigint").alias("list_size"))
        .select(
            "cluster",
            "list_size",
            # floor() in BOTH engines: a bare CAST(double AS BIGINT)
            # truncates in Spark but rounds in DuckDB
            F.floor(F.col("list_size") * k * 1000000 / F.lit(n))
            .cast("bigint")
            .alias("imbalance_micro"),
        )
    )


def _ivf_sizes_sql() -> str:
    from .pipeline2 import _KMEANS_SQL

    return f"""
WITH asg AS MATERIALIZED ({_KMEANS_SQL}),
nn AS (SELECT count(*) AS n FROM asg)
SELECT CAST(cluster AS INT) AS cluster,
       CAST(count(*) AS BIGINT) AS list_size,
       CAST(floor(count(*) * 8 * 1000000 / (SELECT n FROM nn)) AS BIGINT) AS imbalance_micro
FROM asg GROUP BY cluster
"""


QUERIES["emb_ivf_list_sizes"] = (_q_ivf_list_sizes, _ivf_sizes_sql())


# ---- new vs returning daily ------------------------------------------


def _q_new_returning(spark, sf_dir):
    """(day, n_new, n_returning): daily active users split by whether
    the day is the user's first-seen day — the growth-accounting view
    (is the stream acquiring or retaining?). Two exact aggregates: a
    per-user min-day and one distinct (user, day) census."""
    register(spark, sf_dir)
    ud = (
        spark.table("events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(first, "user_id")
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("long"))
            .cast("bigint")
            .alias("n_new"),
            F.sum((F.col("day") != F.col("first_day")).cast("long"))
            .cast("bigint")
            .alias("n_returning"),
        )
    )


_NEW_RETURNING_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
fst AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
SELECT CAST(ud.day AS VARCHAR) AS day,
       CAST(sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN ud.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
FROM ud JOIN fst f USING (user_id)
GROUP BY ud.day
"""

QUERIES["rel_new_returning_daily"] = (_q_new_returning, _NEW_RETURNING_SQL)
