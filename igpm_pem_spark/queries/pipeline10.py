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


QUERIES = {
    "doc_bm25_top10": (_q_bm25, _BM25_SQL),
    "doc_length_histogram": (_q_length_hist, _LENGTH_HIST_SQL),
    "doc_dup_rate_by_lang": (_q_dup_rate_by_lang, _DUP_RATE_SQL),
}
