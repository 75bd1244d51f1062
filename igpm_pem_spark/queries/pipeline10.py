"""Tenth pipeline ring: BM25 ranked retrieval, the log2-bucketed
document-length histogram, and per-language exact-duplicate-rate
telemetry — the retrieval-scoring and corpus-profiling trio a
training-data pipeline reads alongside dedup/quality gates.

BM25 is the inverted-index (sparse) retrieval path, complementary to
embedding-ANN (dense) and MinHash (set overlap); the length histogram
is the standard one-scan corpus profile (power-of-two buckets via
integer bit-length — no float log, so no boundary drift at exact
powers); the dup-rate rollup is the per-language health number an
ingest run publishes before dedup decides what to keep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import docs, register
from .pipeline import _TOK_CTE


def _q_bm25(spark, sf_dir):
    from ..functions.text import bm25_topk

    return bm25_topk(docs(spark, sf_dir), k=10, n_query_terms=3)


_BM25_SQL = f"""
{_TOK_CTE}
, lens AS (SELECT doc_id, count(*) * 1.0 AS dl FROM tok GROUP BY doc_id)
, tf AS (SELECT doc_id, token, count(*) * 1.0 AS tf
         FROM tok GROUP BY doc_id, token)
, dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
, nn AS (SELECT (SELECT count(*) FROM documents) * 1.0 AS n,
                (SELECT count(*) * 1.0 FROM tok)
                / (SELECT count(*) FROM documents) AS avgdl)
, q AS (SELECT token, df FROM dfq ORDER BY df DESC, token LIMIT 3)
, per AS (
    SELECT tf.doc_id,
           ln(((SELECT n FROM nn) - q.df + 0.5) / (q.df + 0.5) + 1.0)
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl
                             / (SELECT avgdl FROM nn))) AS s
    FROM tf JOIN q USING (token) JOIN lens l ON l.doc_id = tf.doc_id
)
SELECT doc_id, round(sum(s), 6) AS bm25_6
FROM per GROUP BY doc_id
ORDER BY bm25_6 DESC, doc_id LIMIT 10
"""


def _q_length_hist(spark, sf_dir):
    """Power-of-two character-length histogram: bucket = bit length of
    n_chars (0 for empty docs) — integer arithmetic end to end, so the
    bucket boundary at exact powers of two can't drift the way
    floor(log2(x)) does through float ln. One scan, |buckets| rows."""
    register(spark, sf_dir)
    d = spark.table("documents")
    bucket = (
        F.when(F.col("n_chars") <= 0, F.lit(0))
        .otherwise(F.length(F.bin(F.col("n_chars"))))
        .cast("long")
    )
    return d.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )


_LENGTH_HIST_SQL = """
SELECT CASE WHEN n_chars <= 0 THEN 0
            ELSE length(bin(n_chars)) END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total
FROM documents
GROUP BY 1
"""


def _q_dup_rate_by_lang(spark, sf_dir):
    """Per-language exact-duplicate telemetry: total docs, distinct
    texts, and the duplicate share. countDistinct is the standard
    two-phase partial-distinct aggregate (scales); at extreme
    cardinality the same number comes from the KMV sketch ring
    (doc_vocab_kmv_by_lang) — this is the exact small-keyspace rollup."""
    register(spark, sf_dir)
    d = spark.table("documents")
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("text").cast("long").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.countDistinct("text") / F.count("*"), 6
        ).alias("dup_share6"),
    )


_DUP_RATE_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
       round(1.0 - count(DISTINCT text) * 1.0 / count(*), 6) AS dup_share6
FROM documents GROUP BY lang
"""


def _q_funnel_latency(spark, sf_dir):
    """Time-to-convert for each funnel transition (view→click,
    click→purchase): per user, the first qualifying ordered timestamps
    (same chain as rel_funnel3), then exact integer epoch-second
    latencies rolled up per transition. sum_sec is an associative BIGINT
    sum; avg_sec6 = sum/n is one IEEE division of exact integers, so
    both engines agree bit-for-bit before rounding."""
    register(spark, sf_dir)
    e = spark.table("events")
    t1 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        e.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    t3 = (
        e.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.first("t2").alias("t2"))
    )
    lat12 = t2.select(
        (F.unix_timestamp("t2") - F.unix_timestamp("t1")).alias("sec")
    )
    lat23 = t3.select(
        (F.unix_timestamp("t3") - F.unix_timestamp("t2")).alias("sec")
    )

    def roll(df, name):
        return df.agg(
            F.lit(name).alias("transition"),
            F.count("*").cast("long").alias("n_users"),
            F.sum("sec").cast("long").alias("sum_sec"),
            F.round(F.sum("sec") / F.count("*"), 6).alias("avg_sec6"),
        )

    return roll(lat12, "view->click").unionAll(roll(lat23, "click->purchase"))


_FUNNEL_LATENCY_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2, min(t1.t1) AS t1 FROM events e
  JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3, min(t2.t2) AS t2 FROM events e
  JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), l12 AS (SELECT CAST(floor(epoch(t2)) - floor(epoch(t1)) AS BIGINT) AS sec
           FROM t2),
l23 AS (SELECT CAST(floor(epoch(t3)) - floor(epoch(t2)) AS BIGINT) AS sec
        FROM t3)
SELECT 'view->click' AS transition,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(sec) AS BIGINT) AS sum_sec,
       round(CAST(sum(sec) AS BIGINT) * 1.0 / count(*), 6) AS avg_sec6
FROM l12
UNION ALL
SELECT 'click->purchase', CAST(count(*) AS BIGINT),
       CAST(sum(sec) AS BIGINT),
       round(CAST(sum(sec) AS BIGINT) * 1.0 / count(*), 6)
FROM l23
"""


_OUTLIER_DIM_BOUND = 4096


def _q_emb_outlier(spark, sf_dir):
    """Top-5 embedding outliers by centroid-distance z-score: d(x) =
    ‖x − mean‖, z = (d − μ_d)/σ_d with the population σ computed by the
    explicit avg(d²) − μ² formula (NOT stddev_pop's streaming update, so
    the oracle can reproduce it term-for-term). The mean vector is a
    driver-resident dim-length literal (one aggregate scan, same shape
    as the kmeans centroids); scoring is a second single scan. Ordering
    uses the ROUNDED z so the cross-engine ranking is stable."""
    from ._common import emb

    e = emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mean_rows = (
        e.select(F.posexplode("v").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    m = [0.0] * len(mean_rows)
    for r in mean_rows:
        m[int(r.pos)] = float(r.m)
    lit = F.array(*[F.lit(x) for x in m])
    d = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    dd = e.select("vec_id", d.alias("d"))
    st = dd.agg(F.avg("d").alias("mu"), F.avg(F.col("d") * F.col("d")).alias("m2"))
    j = dd.crossJoin(F.broadcast(st))
    z = (F.col("d") - F.col("mu")) / F.sqrt(
        F.col("m2") - F.col("mu") * F.col("mu")
    )
    return (
        j.select("vec_id", F.round(z, 6).alias("z6"))
        .orderBy(F.col("z6").desc(), "vec_id")
        .limit(5)
    )


_OUTLIER_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
, m AS (
    SELECT CAST(r.i AS INT) AS pos, avg(e.v[CAST(r.i AS INT)]) AS m
    FROM e, range(1, {_OUTLIER_DIM_BOUND + 1}) r(i)
    WHERE r.i <= len(e.v) GROUP BY r.i
)
, dd AS (
    SELECT e.vec_id,
           sqrt(sum((e.v[m.pos] - m.m) * (e.v[m.pos] - m.m))) AS d
    FROM e JOIN m ON m.pos <= len(e.v)
    GROUP BY e.vec_id
)
, st AS (SELECT avg(d) AS mu, avg(d * d) AS m2 FROM dd)
SELECT vec_id,
       round((d - mu) / sqrt(m2 - mu * mu), 6) AS z6
FROM dd, st
ORDER BY z6 DESC, vec_id LIMIT 5
"""


QUERIES = {
    "doc_bm25_top10": (_q_bm25, _BM25_SQL),
    "doc_length_histogram": (_q_length_hist, _LENGTH_HIST_SQL),
    "doc_dup_rate_by_lang": (_q_dup_rate_by_lang, _DUP_RATE_SQL),
    "rel_funnel_latency": (_q_funnel_latency, _FUNNEL_LATENCY_SQL),
    "emb_outlier_z": (_q_emb_outlier, _OUTLIER_SQL),
}
