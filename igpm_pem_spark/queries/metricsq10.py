"""Eleventh metrics ring (round-5 session 9, batch 3): truncated
hitting time to the hub core, temporal triangle closure delay, the
event-chain stationary distribution, and MinHash-estimate calibration —
each oracle-paired with dtype-exact DuckDB SQL.

The first two extend the link-graph family (absorbing-walk proximity;
temporal motif dynamics), the last two the pipeline-telemetry family
(sequence modeling over events; sketch-accuracy audit for the dedup
LSH). Float discipline: hitting time / stationary mass follow the
proven PageRank recursion-and-round contract; closure delays and
calibration curves are exact integers up to one final division."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import NUM_PERM
from ._common import G_SPARSE_SQL, docs, edges, register
from .graphq import _with_g
from .metricsq9 import _SNAP_INST
from .pipeline import _TOK_CTE, _band_union, _minhash_select

QUERIES: dict = {}

# ---- truncated hitting time to the hub core --------------------------
_HT_HUBS = 5
_HT_ITERS = 8


def _q_hitting_time(spark, sf_dir):
    from ..operators.centrality import hitting_time_truncated

    return hitting_time_truncated(
        spark, edges(spark, sf_dir, G_SPARSE_SQL),
        n_hubs=_HT_HUBS, iters=_HT_ITERS,
    ).select("id", F.round("h", 6).alias("h6"))


_HITTING_SQL = f"""
, verts AS (SELECT DISTINCT src AS id FROM sym)
, deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src)
, hubs AS (SELECT src AS id FROM deg ORDER BY d DESC, src LIMIT {_HT_HUBS})
, ht(iter, id, h) AS (
    -- anchor must be CAST to DOUBLE: a bare 0.0 literal types the whole
    -- recursion column DECIMAL(2,1) in DuckDB and quantizes every value
    SELECT 0, id, CAST(0.0 AS DOUBLE) FROM verts
    UNION ALL
    SELECT t.iter + 1, e.src,
           CASE WHEN e.src IN (SELECT id FROM hubs) THEN 0.0
                ELSE 1.0 + sum(t.h) / max(d.d) END
    FROM ht t JOIN sym e ON e.dst = t.id JOIN deg d ON d.src = e.src
    WHERE t.iter < {_HT_ITERS}
    GROUP BY t.iter, e.src
)
SELECT id, round(h, 6) AS h6 FROM ht WHERE iter = {_HT_ITERS}
"""

QUERIES["graph_hitting_time8"] = (
    _q_hitting_time,
    _with_g(_HITTING_SQL, G_SPARSE_SQL, recursive=True),
)


# ---- temporal triangle closure delay ---------------------------------
# first-appearance month per canonical edge of the sparse temporal
# co-occurrence graph; a triangle's closure delay is the month spread of
# its three edges — how long the open wedge waited for its closing edge
# (Kossinets-Watts triadic closure dynamics), all exact integers.
_CLOSURE_EDGES_SQL = f"""
WITH inst AS ({_SNAP_INST})
SELECT src, dst, CAST(min(m) AS BIGINT) AS em
FROM inst GROUP BY src, dst
"""


def _q_triangle_closure(spark, sf_dir):
    """(delay_months, n_triangles): histogram of triangle closure
    delays. The triangle join is the standard e1/e2/e3 canonical wedge
    close (a<b<c — each triangle counted once) carrying each edge's
    first-appearance month; the spread is greatest−least of three
    BIGINTs. Work = O(wedges of the sparse slice); the histogram is
    delay-cardinality rows."""
    e = edges(spark, sf_dir, _CLOSURE_EDGES_SQL)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("em").alias("m1"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"), F.col("em").alias("m2"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"), F.col("em").alias("m3"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(
            (
                F.greatest("m1", "m2", "m3") - F.least("m1", "m2", "m3")
            ).alias("delay_months")
        )
        .groupBy("delay_months")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


_CLOSURE_SQL = f"""
WITH g AS ({_CLOSURE_EDGES_SQL})
SELECT greatest(e1.em, e2.em, e3.em) - least(e1.em, e2.em, e3.em) AS delay_months,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM g e1 JOIN g e2 ON e2.src = e1.dst
JOIN g e3 ON e3.src = e1.src AND e3.dst = e2.dst
GROUP BY 1
"""

QUERIES["graph_triangle_closure_delay"] = (_q_triangle_closure, _CLOSURE_SQL)


# ---- event-chain stationary distribution -----------------------------
_ST_ITERS = 8


def _q_event_stationary(spark, sf_dir):
    """8-step power iteration on the per-user event-type transition
    chain: π₀ uniform over types with outgoing transitions, π_{t+1}(j) =
    Σ_i π_t(i)·c_ij/c_i — where user journeys settle, the long-run mix
    the funnel queries summarize stepwise. The chain is event-type ×
    event-type (a broadcast-size relation); each step is one tiny join.
    Types without outgoing transitions leak their inflow (substochastic
    truncation), identically in both engines."""
    from pyspark.sql import Window

    register(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = spark.table("events").select("user_id", "event_id", "ts", "event_type")
    trans = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    outc = trans.groupBy("a").agg(F.sum("c").cast("bigint").alias("tot"))
    p = trans.join(outc, "a").select(
        "a", "b", (F.col("c").cast("double") / F.col("tot")).alias("p")
    ).persist()
    states = p.select(F.col("a").alias("event_type")).distinct()
    k = states.count()
    pi = states.select("event_type", F.lit(1.0 / k).alias("pi"))
    for _ in range(_ST_ITERS):
        pi = (
            pi.join(p.withColumnRenamed("a", "event_type"), "event_type")
            .groupBy(F.col("b").alias("event_type"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
        )
    out = states.join(pi, "event_type", "left").select(
        "event_type",
        F.round(F.coalesce("pi", F.lit(0.0)), 6).alias("pi6"),
    )
    p.unpersist()
    return out


_STATIONARY_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT event_type AS a, nxt AS b, CAST(count(*) AS BIGINT) AS c
  FROM ev WHERE nxt IS NOT NULL GROUP BY event_type, nxt
),
outc AS (SELECT a, CAST(sum(c) AS BIGINT) AS tot FROM trans GROUP BY a),
p AS (SELECT t.a, t.b, CAST(t.c AS DOUBLE) / o.tot AS p
      FROM trans t JOIN outc o USING (a)),
states AS (SELECT DISTINCT a AS event_type FROM p),
kk AS (SELECT count(*) AS k FROM states),
pw(iter, event_type, pi) AS (
    SELECT 0, event_type, 1.0 / (SELECT k FROM kk) FROM states
    UNION ALL
    SELECT w.iter + 1, p.b, sum(w.pi * p.p)
    FROM pw w JOIN p ON p.a = w.event_type
    WHERE w.iter < {_ST_ITERS}
    GROUP BY w.iter, p.b
)
SELECT s.event_type, round(coalesce(w.pi, 0.0), 6) AS pi6
FROM states s LEFT JOIN (SELECT event_type, pi FROM pw WHERE iter = {_ST_ITERS}) w
  USING (event_type)
"""

QUERIES["rel_event_stationary8"] = (_q_event_stationary, _STATIONARY_SQL)


# ---- MinHash-estimate calibration ------------------------------------
def _q_minhash_calibration(spark, sf_dir):
    """Sketch-accuracy audit of the dedup LSH: for every verified
    candidate pair (exact Jaccard ≥ 0.1 — the production threshold),
    bucket by the MinHash ESTIMATE (matching signature positions out of
    {NUM_PERM}) and report the mean exact Jaccard per bucket — the
    calibration curve that tells an operator whether the sketch is
    biased before trusting it at 100 TB. Exact scores fold to
    micro-units before summing (one exact-integer division per bucket);
    the estimate is an integer column compare, {NUM_PERM} terms."""
    from ..operators.dedup import lsh_jaccard_pairs, minhash_signatures

    d = docs(spark, sf_dir)
    pairs = lsh_jaccard_pairs(d, threshold=0.1)
    sig = minhash_signatures(d)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(NUM_PERM)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(NUM_PERM)],
    )
    est = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("long") for i in range(NUM_PERM)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            est.cast("bigint").alias("est_matches"),
            F.round(F.col("jaccard") * 1000000, 0).cast("bigint").alias("jm"),
        )
        .groupBy("est_matches")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum("jm").cast("double") / F.count("*") / 1000000.0, 6
            ).alias("avg_jac6"),
        )
    )


def _minhash_calibration_sql() -> str:
    from .pipeline import _LSH_JACCARD_SQL

    pairs = _LSH_JACCARD_SQL.format(
        minhash=_minhash_select(), bands=_band_union()
    )
    est = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(NUM_PERM)
    )
    return f"""
{_TOK_CTE},
sig AS (SELECT doc_id, {_minhash_select()} FROM dt GROUP BY doc_id),
pr AS MATERIALIZED ({pairs}),
cal AS (
  SELECT CAST({est} AS BIGINT) AS est_matches,
         CAST(round(p.jaccard * 1000000, 0) AS BIGINT) AS jm
  FROM pr p JOIN sig sa ON sa.doc_id = p.doc_a
            JOIN sig sb ON sb.doc_id = p.doc_b
)
SELECT est_matches,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(jm) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_jac6
FROM cal GROUP BY est_matches
"""


QUERIES["doc_minhash_calibration"] = (
    _q_minhash_calibration,
    _minhash_calibration_sql(),
)
