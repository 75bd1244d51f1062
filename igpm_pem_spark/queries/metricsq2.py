"""Third metrics ring: seeded closeness centrality, degree-skew
summary (Gini), the adaptive hub salt plan, and RFM segmentation —
each oracle-paired with exact-dtype DuckDB SQL.

The first two close the centrality/skew-measurement gap around the
iterative kernels (the Gini number and the salt plan are the two
inputs a 100 TB deployment reads BEFORE launching a superstep loop:
how skewed is the shuffle key, and which hubs get split how many
ways); RFM is the canonical customer-scoring composition over window
quantiles that a relational engine is expected to express.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._common import G_PARTS_SQL, G_SPARSE_SQL, edges, register
from .graphq import _with_g


def _q_closeness_seeds(spark, sf_dir):
    """Bounded closeness centrality of the 5 lowest-id seeds: reach count,
    distance sum and reach/dist ratio over each seed's ≤3-hop closure —
    the per-seed dual of harmonic_centrality_seeds (same J4 frontier
    expansion, grouped by seed instead of by reached vertex), work ∝ seed
    neighborhoods, never the whole graph."""
    from ..operators.graph import vertex_ids
    from ..operators.paths import path_closure_from

    e = edges(spark, sf_dir, G_SPARSE_SQL)
    seeds = vertex_ids(e).orderBy("id").limit(5)
    cl = path_closure_from(e, seeds, max_hops=3, directed=False)
    return cl.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("reach"),
        F.sum("hops").cast("long").alias("dist_sum"),
        F.round(F.count("*") * F.lit(1.0) / F.sum("hops"), 6).alias("close6"),
    )


_CLOSENESS_SQL = _with_g(
    """
    , verts AS (SELECT DISTINCT src AS id FROM sym)
    , seeds AS (SELECT id FROM verts ORDER BY id LIMIT 5)
    , h1 AS (SELECT s.id AS sid, e.dst, 1 AS hops
             FROM seeds s JOIN sym e ON e.src = s.id)
    , h2 AS (SELECT h.sid, e.dst, 2 AS hops
             FROM (SELECT DISTINCT sid, dst FROM h1) h
             JOIN sym e ON e.src = h.dst WHERE e.dst <> h.sid)
    , h3 AS (SELECT h.sid, e.dst, 3 AS hops
             FROM (SELECT DISTINCT sid, dst FROM h2) h
             JOIN sym e ON e.src = h.dst WHERE e.dst <> h.sid)
    , hh AS (
        SELECT sid, dst, min(hops) AS hops FROM (
            SELECT * FROM h1 UNION ALL
            SELECT * FROM h2 UNION ALL
            SELECT * FROM h3
        ) GROUP BY sid, dst
    )
    SELECT sid AS id,
           CAST(count(*) AS BIGINT) AS reach,
           CAST(sum(hops) AS BIGINT) AS dist_sum,
           round(count(*) * 1.0 / sum(hops), 6) AS close6
    FROM hh GROUP BY sid
    """,
    G_SPARSE_SQL,
)


def _q_degree_gini(spark, sf_dir):
    from ..operators.metrics import degree_gini

    return degree_gini(edges(spark, sf_dir, G_SPARSE_SQL))


# the oracle ranks per-vertex (row_number over V) — fine for DuckDB on
# test scale; the engine side computes the identical rank-sum from the
# degree histogram (see operators/metrics.degree_gini), which is the
# 100 TB-safe formulation. Tie order cannot change sum(i*d): within a
# tied block d is constant and the i-range is fixed.
_GINI_SQL = _with_g(
    """
    , deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)
    , ranked AS (SELECT d, row_number() OVER (ORDER BY d, id) AS i FROM deg)
    SELECT CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(sum(d) AS BIGINT) AS deg_total,
           round((2.0 * sum(i * d) - (count(*) + 1.0) * sum(d))
                 / ((count(*) * 1.0) * sum(d)), 6) AS gini6
    FROM ranked
    """,
    G_SPARSE_SQL,
)


_SALT_ROWS_PER_TASK = 96


def _q_salt_plan(spark, sf_dir):
    """Hub split factors for the dense co-occurrence graph's symmetrized
    edge relation keyed by src — the table a PageRank superstep shuffles
    every iteration. Keys with more than 96 rows get ceil(cnt/96)
    reducer splits; the count itself is two-phase salted."""
    from ..operators.graph import canonical_undirected, symmetrize
    from ..operators.partition import skew_salt_plan

    sym = symmetrize(canonical_undirected(edges(spark, sf_dir, G_PARTS_SQL)))
    return skew_salt_plan(sym, "src", rows_per_task=_SALT_ROWS_PER_TASK)


_SALT_PLAN_SQL = _with_g(
    f"""
    , deg AS (SELECT src AS id, count(*) AS cnt FROM sym GROUP BY src)
    SELECT id, CAST(cnt AS BIGINT) AS cnt,
           CAST((cnt + {_SALT_ROWS_PER_TASK - 1}) // {_SALT_ROWS_PER_TASK}
                AS BIGINT) AS n_splits
    FROM deg WHERE cnt > {_SALT_ROWS_PER_TASK}
    """,
    G_PARTS_SQL,
)


def _q_rfm(spark, sf_dir):
    """RFM segmentation over orders: per-customer recency (days before
    the corpus max order date), frequency (order count), monetary (sum of
    totalprice in exact integer cents — per-row round then integer sum,
    so the aggregate is associative and engine-order-independent), each
    scored into ntile(4) quartiles with the custkey as the deterministic
    tie-break. The three scoring windows are unpartitioned by nature
    (global quantiles over one row per CUSTOMER — the already-aggregated
    narrow relation, not the orders table); at 100 TB the same scores
    come from approx_percentile cutoff joins instead of a rank window,
    trading exact quartile boundaries for a fully parallel plan."""
    register(spark, sf_dir)
    o = spark.table("orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("_anchor"))
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("_last"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "monetary_cents"
        ),
    )
    j = per.join(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff("_anchor", "_last").cast("long")
    )
    w_r = Window.orderBy("recency_days", "o_custkey")
    w_f = Window.orderBy("frequency", "o_custkey")
    w_m = Window.orderBy("monetary_cents", "o_custkey")
    scored = (
        j.withColumn("r_q", F.ntile(4).over(w_r).cast("long"))
        .withColumn("f_q", F.ntile(4).over(w_f).cast("long"))
        .withColumn("m_q", F.ntile(4).over(w_m).cast("long"))
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.col("monetary_cents").cast("long").alias("monetary_cents"),
        "r_q",
        "f_q",
        "m_q",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("long")
        .alias("rfm_code"),
    )


_RFM_SQL = """
WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS a FROM orders)
, per AS (
    SELECT o_custkey,
           date_diff('day', max(CAST(o_orderdate AS DATE)),
                     (SELECT a FROM anchor)) AS recency_days,
           count(*) AS frequency,
           sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS monetary_cents
    FROM orders GROUP BY o_custkey
)
, q AS (
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_q,
           ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
           ntile(4) OVER (ORDER BY monetary_cents, o_custkey) AS m_q
    FROM per
)
SELECT o_custkey,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary_cents AS BIGINT) AS monetary_cents,
       CAST(r_q AS BIGINT) AS r_q,
       CAST(f_q AS BIGINT) AS f_q,
       CAST(m_q AS BIGINT) AS m_q,
       CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_code
FROM q
"""


QUERIES = {
    "closeness_centrality_seeds": (_q_closeness_seeds, _CLOSENESS_SQL),
    "graph_degree_gini": (_q_degree_gini, _GINI_SQL),
    "graph_salt_plan": (_q_salt_plan, _SALT_PLAN_SQL),
    "rel_rfm": (_q_rfm, _RFM_SQL),
}
