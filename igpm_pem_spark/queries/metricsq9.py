"""Tenth metrics ring (round-5 session 9, batch 2): deterministic
farthest-point k-center seeding over the int8 grid, 1-WL snapshot
similarity between temporal slices of the link graph, the knn(k)
degree-correlation profile, and the inter-event gap histogram — each
oracle-paired with dtype-exact DuckDB SQL.

Exactness discipline: k-center runs entirely on exact-integer squared
distances (the int8-quantized corpus — what 100 TB actually stores);
the WL similarity compares md5 color histograms with a multiset-Jaccard
of exact counts; knn(k) collapses the nested mean into ONE integer
division (Σ s(v)) / (k·n_k); gap buckets are binary-magnitude classes
via length(bin(µs)) — no log2 float near power-of-two boundaries."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._common import G_SPARSE_SQL, edges, register
from .graphq import _with_g

QUERIES: dict = {}

# ---- greedy k-center over the int8 grid ------------------------------
_KC_K = 8
_KC_DIM_BOUND = 4096


def _q_kcenter_int8(spark, sf_dir):
    from ..operators.clustering import kcenter_greedy_int8
    from ._common import emb

    return kcenter_greedy_int8(spark, emb(spark, sf_dir), k=_KC_K)


def _kcenter_sql(k: int) -> str:
    """Unrolled Gonzalez traversal: ctr_r = the argmax-dmin pick
    (ties → lower vec_id), dm_r = fold least(previous, d2-to-new).
    Distances are exact BIGINT Σ(qa−qb)² — multiplication, never
    power(). Rows with d2sel = 0 past rank 1 (all points coincide with
    centers) are filtered, mirroring the kernel's early stop."""
    rng = f"range(1, {_KC_DIM_BOUND + 1}) r(i)"

    def d2(c: str) -> str:
        return (
            f"SELECT p.vec_id,\n"
            f"   CAST(sum((p.qv[CAST(r.i AS INT)] - {c}.qv[CAST(r.i AS INT)])\n"
            f"        * (p.qv[CAST(r.i AS INT)] - {c}.qv[CAST(r.i AS INT)])) AS BIGINT) AS d\n"
            f"   FROM q p, {c}, {rng} WHERE r.i <= len(p.qv)\n"
            f"   GROUP BY p.vec_id"
        )

    parts = [f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
ctr1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
dm1 AS ({d2('ctr1')})"""]
    for r in range(2, k + 1):
        p = r - 1
        parts.append(f""",
pk{r} AS (SELECT vec_id, d FROM dm{p} ORDER BY d DESC, vec_id LIMIT 1),
ctr{r} AS (SELECT q.vec_id, q.qv FROM q JOIN pk{r} USING (vec_id)),
nd{r} AS ({d2(f'ctr{r}')}),
dm{r} AS (SELECT dm{p}.vec_id, least(dm{p}.d, nd{r}.d) AS d
          FROM dm{p} JOIN nd{r} USING (vec_id))""")
    union = "\nUNION ALL ".join(
        [
            "SELECT CAST(1 AS BIGINT) AS rank, vec_id,"
            " CAST(0 AS BIGINT) AS d2sel FROM ctr1"
        ]
        + [
            f"SELECT CAST({r} AS BIGINT), vec_id, CAST(d AS BIGINT) FROM pk{r}"
            for r in range(2, k + 1)
        ]
    )
    parts.append(
        f"\nSELECT rank, vec_id, d2sel FROM ({union})"
        f" WHERE rank = 1 OR d2sel > 0 ORDER BY rank"
    )
    return "".join(parts)


QUERIES["emb_kcenter_int8"] = (_q_kcenter_int8, _kcenter_sql(_KC_K))


# ---- 1-WL snapshot similarity ----------------------------------------
# temporal slices of the sparse co-occurrence graph: snapshot A = months
# up to the floor-midpoint, snapshot B = the full history. The WL color
# histograms (3 refinement rounds, md5 colors — the proven
# graph_wl_colors machinery) compare via multiset Jaccard.
_WLS_ROUNDS = 3

_SNAP_INST = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
       CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) AS m
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN orders o ON o.o_orderkey = a.l_orderkey
WHERE a.l_orderkey % 50 = 0
"""

_SNAP_A_SQL = f"""
WITH inst AS ({_SNAP_INST}),
mc AS (SELECT CAST(floor((min(m) + max(m)) / 2.0) AS BIGINT) AS c FROM inst)
SELECT DISTINCT src, dst FROM inst, mc WHERE inst.m <= mc.c
"""

_SNAP_B_SQL = f"""
WITH inst AS ({_SNAP_INST})
SELECT DISTINCT src, dst FROM inst
"""


def _q_wl_snapshot_sim(spark, sf_dir):
    """Structural drift between the half-history and full-history link
    graphs, measured representation-level: multiset Jaccard of their
    1-WL color histograms — the graph-fingerprint comparison a corpus
    versioning pipeline runs per snapshot pair (equal histograms ⇒
    1-WL-indistinguishable; the Jaccard quantifies HOW different).
    Histograms are |color classes| rows (≪ V); the compare is one
    full-outer join of two tiny relations."""
    from ..operators.wl import wl_histogram

    ha = wl_histogram(
        edges(spark, sf_dir, _SNAP_A_SQL), rounds=_WLS_ROUNDS
    ).withColumnRenamed("n_vertices", "na")
    hb = wl_histogram(
        edges(spark, sf_dir, _SNAP_B_SQL), rounds=_WLS_ROUNDS
    ).withColumnRenamed("n_vertices", "nb")
    j = (
        ha.join(hb, "color", "full_outer")
        .select(
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    return j.agg(
        F.sum((F.col("na") > 0).cast("long")).cast("bigint").alias("n_colors_a"),
        F.sum((F.col("nb") > 0).cast("long")).cast("bigint").alias("n_colors_b"),
        F.sum(F.least("na", "nb")).cast("bigint").alias("minsum"),
        F.sum(F.greatest("na", "nb")).cast("bigint").alias("maxsum"),
        F.round(
            F.sum(F.least("na", "nb")).cast("double")
            / F.sum(F.greatest("na", "nb")),
            6,
        ).alias("jac6"),
    )


def _wl_chain(prefix: str, rounds: int) -> str:
    """Prefixed replica of metricsq4's proven WL round chain, reading
    {prefix}sym and ending at {prefix}w{rounds}."""
    parts = [
        f", {prefix}w0 AS MATERIALIZED (SELECT src AS id,"
        f" CAST(count(*) AS VARCHAR) AS color FROM {prefix}sym GROUP BY src)"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
, {prefix}n{r} AS (SELECT e.src AS id, w.color AS nc
           FROM {prefix}sym e JOIN {prefix}w{p} w ON w.id = e.dst)
, {prefix}c{r} AS (SELECT id, nc, CAST(count(*) AS VARCHAR) AS cnt
           FROM {prefix}n{r} GROUP BY id, nc)
, {prefix}s{r} AS (SELECT id, string_agg(nc || 'x' || cnt, ';' ORDER BY nc || 'x' || cnt) AS sig
           FROM {prefix}c{r} GROUP BY id)
, {prefix}w{r} AS MATERIALIZED (
    SELECT w.id, substr(md5(w.color || '|' || s.sig), 1, 16) AS color
    FROM {prefix}w{p} w JOIN {prefix}s{r} s ON s.id = w.id)
""")
    return "".join(parts)


_WL_SNAP_SQL = (
    f"WITH ga AS ({_SNAP_A_SQL})"
    f", asym AS (SELECT src, dst FROM ga UNION ALL SELECT dst, src FROM ga)"
    f", gb AS ({_SNAP_B_SQL})"
    f", bsym AS (SELECT src, dst FROM gb UNION ALL SELECT dst, src FROM gb)"
    + _wl_chain("a", _WLS_ROUNDS)
    + _wl_chain("b", _WLS_ROUNDS)
    + f"""
, ha AS (SELECT color, CAST(count(*) AS BIGINT) AS na FROM aw{_WLS_ROUNDS} GROUP BY color)
, hb AS (SELECT color, CAST(count(*) AS BIGINT) AS nb FROM bw{_WLS_ROUNDS} GROUP BY color)
, j AS (SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        FROM ha FULL OUTER JOIN hb USING (color))
SELECT CAST(sum(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_colors_a,
       CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_colors_b,
       CAST(sum(least(na, nb)) AS BIGINT) AS minsum,
       CAST(sum(greatest(na, nb)) AS BIGINT) AS maxsum,
       round(CAST(sum(least(na, nb)) AS DOUBLE) / sum(greatest(na, nb)), 6) AS jac6
FROM j
"""
)

QUERIES["graph_wl_snapshot_sim"] = (_q_wl_snapshot_sim, _WL_SNAP_SQL)


# ---- knn(k) degree-correlation profile -------------------------------
def _q_knn_curve(spark, sf_dir):
    """Pastor-Satorras knn(k): mean neighbor degree of degree-k
    vertices, the assortativity PROFILE (the scalar assortativity query
    collapses this curve to one correlation). Exactness: within a
    degree class every vertex divides by the same k, so the nested mean
    collapses to (Σ_v s(v)) / (k·n_k) — integer sums, ONE division.
    Output is degree-cardinality (tiny); the work is one neighbor-join
    + two groupBys."""
    e = edges(spark, sf_dir, G_SPARSE_SQL)
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    s = (
        sym.join(deg.select(F.col("id").alias("dst"), F.col("d").alias("nd")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("nd").cast("bigint").alias("s"))
    )
    return (
        deg.join(s, "id")
        .groupBy(F.col("d").alias("k"))
        .agg(
            F.count("*").cast("bigint").alias("n_vertices"),
            F.sum("s").cast("bigint").alias("s_total"),
        )
        .select(
            "k", "n_vertices",
            F.round(
                F.col("s_total").cast("double")
                / (F.col("k") * F.col("n_vertices")),
                6,
            ).alias("knn6"),
        )
    )


_KNN_CURVE_SQL = """
, deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src)
, s AS (SELECT e.src AS id, CAST(sum(nd.d) AS BIGINT) AS s
        FROM sym e JOIN deg nd ON nd.id = e.dst GROUP BY e.src)
SELECT deg.d AS k,
       CAST(count(*) AS BIGINT) AS n_vertices,
       round(CAST(sum(s.s) AS DOUBLE) / (deg.d * count(*)), 6) AS knn6
FROM deg JOIN s ON s.id = deg.id
GROUP BY deg.d
"""

QUERIES["graph_knn_curve"] = (
    _q_knn_curve,
    _with_g(_KNN_CURVE_SQL, G_SPARSE_SQL),
)


# ---- inter-event gap histogram ---------------------------------------
def _q_gap_histogram(spark, sf_dir):
    """Per-user inter-event gap distribution in binary magnitude
    classes: bucket = length(bin(gap_µs)) = ⌊log2⌋+1 — pure integer/
    string ops, no float log near power-of-two boundaries (the failure
    mode of floor(log2(x)) at exactly 2^k). The session-timeout picker
    reads this histogram to place the inactivity threshold where the
    within-session and between-session modes separate. One window lag
    per user + one groupBy; gaps of identical-timestamp events order by
    event_id for a deterministic lag. The diff is timestampdiff in
    MICROSECONDs on the naive timestamps — timezone-free, so session
    timeZone config can never shift a gap."""
    register(spark, sf_dir)
    ev = spark.table("events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .where(F.col("prev").isNotNull())
        .withColumn("gap", F.expr("timestampdiff(MICROSECOND, prev, ts)"))
    )
    return (
        gaps.groupBy(F.length(F.bin("gap")).cast("bigint").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n_gaps"))
    )


_GAP_SQL = """
WITH gaps AS (
  SELECT date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
)
SELECT CAST(length(bin(gap)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM gaps WHERE gap IS NOT NULL
GROUP BY 1
"""

QUERIES["rel_gap_histogram"] = (_q_gap_histogram, _GAP_SQL)
