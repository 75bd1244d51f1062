"""Thirteenth metrics ring (round-5 session 9, batch 5): weighted
s-core membership, line-graph degree histogram, int8 pairwise-distance
histogram, and per-user active-days histogram — every decision and
every bucket exact-integer, so all four are engine-exact by
construction (no float appears anywhere before output).

s-core is the multiplicity-aware core decomposition (Eidsaa-Almaas) the
unweighted k-core family cannot express; the line-graph profile is the
edge-adjacency view conflict-scheduling (edge coloring, matching width)
reads; the distance histogram is the concentration audit for the
quantized embedding space (how separable the corpus is at int8
resolution); active-days is the engagement-depth census next to the
sliding-WAU trend."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import G_SPARSE_SQL, edges, register
from .graphq import _with_g

QUERIES: dict = {}

# ---- weighted s-core --------------------------------------------------
_SCORE_S = 8
_SCORE_ORACLE_ROUNDS = 16

# co-occurrence multiplicity graph, INTEGER weights (the DOUBLE cast of
# graphq._G_WPARTS_SQL would work, but the peel compare must be integer)
_G_WINT_SQL = """
SELECT a.l_partkey AS src, b.l_partkey AS dst,
       CAST(count(*) AS BIGINT) AS w
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
WHERE a.l_orderkey % 10 = 0
GROUP BY a.l_partkey, b.l_partkey
"""


def _q_s_core(spark, sf_dir):
    """Vertices of the s=8 strength core of the multiplicity-weighted
    co-occurrence graph — iterative weighted peel, every threshold
    compare an exact-integer sum (operators/kcore.py::s_core)."""
    from ..operators.kcore import s_core
    from ._common import graph_nparts

    res = s_core(
        spark, edges(spark, sf_dir, _G_WINT_SQL), s=_SCORE_S,
        num_partitions=graph_nparts(spark, sf_dir),
    )
    if not (res.converged and res.rounds < _SCORE_ORACLE_ROUNDS):
        raise RuntimeError(
            f"s_core peel took {res.rounds} rounds (converged="
            f"{res.converged}); raise _SCORE_ORACLE_ROUNDS to keep the "
            "unrolled oracle exact"
        )
    return res.vertices.select("id")


def _score_sql(s: int, rounds: int) -> str:
    parts = [
        ", e0 AS MATERIALIZED (SELECT src, dst, w FROM sym)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", a{r} AS MATERIALIZED (
  SELECT src AS id FROM e{r - 1} GROUP BY src HAVING sum(w) >= {s}
), e{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w FROM e{r - 1} e
  JOIN a{r} x ON x.id = e.src JOIN a{r} y ON y.id = e.dst
)"""
        )
    parts.append(f" SELECT DISTINCT src AS id FROM e{rounds}")
    return "".join(parts)


_SCORE_SQL = (
    f"WITH g AS ({_G_WINT_SQL})"
    f", sym AS (SELECT src, dst, w FROM g"
    f"          UNION ALL SELECT dst AS src, src AS dst, w FROM g)"
    + _score_sql(_SCORE_S, _SCORE_ORACLE_ROUNDS)
)

QUERIES["graph_score8_vertices"] = (_q_s_core, _SCORE_SQL)


# ---- line-graph degree histogram --------------------------------------


def _q_line_degree_hist(spark, sf_dir):
    """(dl, n_edges): degree histogram of the LINE GRAPH of the sparse
    co-occurrence graph, computed WITHOUT materializing it — an edge
    (u,v)'s line-degree is d(u)+d(v)−2, so the whole profile is one
    degree aggregate + two lookups per edge. Σ dl = 2·|E(L)| gives the
    line graph's edge count (= Σ d(v)·(d(v)−1)/2 wedges) for free —
    the width estimate an edge-coloring/conflict scheduler needs before
    deciding whether the line graph is even buildable at scale."""
    e = edges(spark, sf_dir, G_SPARSE_SQL)
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("d")
    )
    return (
        e.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
        .select((F.col("du") + F.col("dv") - 2).cast("bigint").alias("dl"))
        .groupBy("dl")
        .agg(F.count("*").cast("bigint").alias("n_edges"))
    )


_LINE_HIST_SQL = """
, deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src)
SELECT d1.d + d2.d - 2 AS dl, CAST(count(*) AS BIGINT) AS n_edges
FROM g JOIN deg d1 ON d1.id = g.src JOIN deg d2 ON d2.id = g.dst
GROUP BY 1
"""

QUERIES["graph_line_degree_hist"] = (
    _q_line_degree_hist,
    _with_g(_LINE_HIST_SQL, G_SPARSE_SQL),
)


# ---- int8 pairwise-distance histogram ---------------------------------
_DH_MOD = 4  # subset guard: vec_id % 4 — pairs are quadratic IN THE
             # SUBSET only, same discipline as the exact-cosine baselines
_DH_DIM_BOUND = 4096


def _q_dist_histogram(spark, sf_dir):
    """(bucket, n_pairs): binary-magnitude histogram of pairwise squared
    distances over the int8-quantized subset (vec_id % 4 = 0) — the
    concentration-of-measure audit: a narrow histogram means distances
    carry no signal at int8 resolution and ANN recall will suffer;
    exact integers end-to-end (Σ(qa−qb)² BIGINT, length(bin(·))
    buckets). Deliberately quadratic in the GUARDED subset, like every
    exact baseline here; the production signal at scale comes from the
    same histogram over ANN candidate pairs instead."""
    from ..operators.similarity import quantize_int8
    from ._common import emb

    q = (
        quantize_int8(emb(spark, sf_dir))
        .where(F.col("vec_id") % _DH_MOD == 0)
        .select(
            "vec_id", F.transform("qv", lambda x: x.cast("long")).alias("qv")
        )
    )
    a = q.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa"))
    b = q.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb"))
    d2 = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(d2.alias("d2"))
        .groupBy(F.length(F.bin("d2")).cast("bigint").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


_DIST_HIST_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id % {_DH_MOD} = 0),
s AS (
  SELECT vec_id, v,
         (SELECT max(abs(t.x)) FROM unnest(v) AS t(x)) AS am
  FROM e
),
q AS (
  SELECT vec_id,
         list_transform(
           v,
           x -> CAST(CAST(floor(x * (CASE WHEN am > 0 THEN 127.0 / am ELSE 0.0 END)
                           + 0.5) AS INT) AS BIGINT)
         ) AS qv
  FROM s
),
pd AS (
  SELECT CAST(sum((a.qv[CAST(r.i AS INT)] - b.qv[CAST(r.i AS INT)])
                  * (a.qv[CAST(r.i AS INT)] - b.qv[CAST(r.i AS INT)])) AS BIGINT) AS d2
  FROM q a JOIN q b ON a.vec_id < b.vec_id,
       range(1, {_DH_DIM_BOUND + 1}) r(i)
  WHERE r.i <= len(a.qv)
  GROUP BY a.vec_id, b.vec_id
)
SELECT CAST(length(bin(d2)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pd GROUP BY 1
"""

QUERIES["emb_dist_histogram_int8"] = (_q_dist_histogram, _DIST_HIST_SQL)


# ---- per-user active-days histogram -----------------------------------


def _q_active_days(spark, sf_dir):
    """(n_days, n_users): engagement-depth census — how many distinct
    calendar days each user appears on, folded to a histogram. The
    companion to the sliding-WAU trend (breadth over time vs depth per
    user); two exact count aggregates."""
    register(spark, sf_dir)
    per = (
        spark.table("events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_days"))
    )
    return per.groupBy("n_days").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


_ACTIVE_DAYS_SQL = """
WITH per AS (
  SELECT user_id, CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
  FROM events GROUP BY user_id
)
SELECT n_days, CAST(count(*) AS BIGINT) AS n_users
FROM per GROUP BY n_days
"""

QUERIES["rel_active_days_histogram"] = (_q_active_days, _ACTIVE_DAYS_SQL)
