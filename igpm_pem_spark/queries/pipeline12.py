"""Training-data pipeline queries, twelfth ring (round-5 session 9):
n-gram novelty vs the earlier corpus, dedup-survivorship quality
telemetry, and day-of-week event seasonality — each with an exact DuckDB
oracle over the same parquet views.

Float discipline: every ratio in this ring is ONE division over
exact-integer (or exact-micro-unit) sums, so the doubles are
bit-identical across engines before the shared round(., 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import STOPWORDS
from ._common import docs, register
from .pipeline import _TOK_CTE, _in_list
from .pipeline2 import _dedup_clusters_sql

QUERIES: dict = {}

# ---- per-document n-gram novelty ------------------------------------
_NOV_N = 5


def _q_ngram_novelty(spark, sf_dir):
    from ..functions.text import ngram_novelty

    return ngram_novelty(docs(spark, sf_dir), n=_NOV_N)


# 5-grams over the shared tok CTE (consecutive non-empty tokens via
# lead, mirroring the row-local slice shingling exactly)
_NOVELTY_SQL = f"""
{_TOK_CTE},
ng AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           token || ' ' || lead(token, 1) OVER w
                 || ' ' || lead(token, 2) OVER w
                 || ' ' || lead(token, 3) OVER w
                 || ' ' || lead(token, 4) OVER w AS g
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE g IS NOT NULL
),
fs AS (SELECT g, min(doc_id) AS first_doc FROM ng GROUP BY g)
SELECT n.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       round(CAST(sum(CASE WHEN f.first_doc = n.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novel_frac
FROM ng n JOIN fs f USING (g)
GROUP BY n.doc_id
"""

QUERIES["doc_ngram_novelty"] = (_q_ngram_novelty, _NOVELTY_SQL)


# ---- dedup survivorship quality telemetry ---------------------------
def _q_survivor_quality(spark, sf_dir):
    """Per (lang, kept) quality audit of the end-to-end dedup pipeline:
    does survivor selection keep the right documents? Quality scores
    are folded to exact micro-units (round(q·1e6) as BIGINT) before
    summing, so the group means are one exact-integer division each —
    the aggregate stays engine-identical even though group sizes (and
    hence summation order) differ between engines. The corpus-side
    composition (clusters → survivor flag → quality join → 8-row
    rollup) is exactly what a production dedup run reports per shard."""
    from ..functions.text import quality_score
    from ..operators.dedup import dedup_clusters
    from ._common import graph_nparts

    d = docs(spark, sf_dir)
    cl = dedup_clusters(
        spark, d, threshold=0.1, num_partitions=graph_nparts(spark, sf_dir)
    )
    q = quality_score(d).select(
        "doc_id",
        F.round(F.col("quality") * 1000000, 0).cast("bigint").alias("q_micro"),
    )
    return (
        d.select("doc_id", "lang")
        .join(cl.select("doc_id", "keep"), "doc_id")
        .join(q, "doc_id")
        .groupBy("lang", "keep")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("q_micro").cast("double") / F.count("*") / 1000000.0, 6
            ).alias("avg_quality6"),
        )
    )


def _survivor_quality_sql() -> str:
    # quality micro-units re-derived from the proven doc_quality oracle
    # formula (pipeline._QUALITY_SQL), composed with the dedup-cluster
    # chain; DuckDB nests the WITH-bearing cluster query as a derived
    # table.
    clusters = _dedup_clusters_sql()
    # per_doc/quality formula byte-mirrors pipeline._QUALITY_SQL (the
    # proven doc_quality oracle); round(., 6) happens BEFORE the
    # micro-unit fold in BOTH engines so the integer fold operates on
    # already-proven-identical doubles (no double-rounding divergence).
    return f"""
{_TOK_CTE},
per_doc AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN token IN ({_in_list(STOPWORDS)}) THEN 1 ELSE 0 END) AS n_stop
  FROM tok GROUP BY doc_id
),
qual AS (
  SELECT b.doc_id,
         CAST(round(round(
           0.5 * least(coalesce(p.n_tokens, 0) / 100.0, 1.0)
           + 0.3 * (1.0 - abs(coalesce(p.n_stop, 0)
                              / greatest(coalesce(p.n_tokens, 0), 1) - 0.4))
           + 0.2 * (1.0 - least((length(b.text) - length(replace(b.text, ',', '')))
                                / greatest(length(b.text), 1) * 10, 1.0)),
         6) * 1000000, 0) AS BIGINT) AS q_micro
  FROM documents b
  LEFT JOIN per_doc p USING (doc_id)
),
cl AS MATERIALIZED ({clusters})
SELECT d.lang, c.keep,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(q.q_micro) AS DOUBLE) / count(*) / 1000000.0, 6)
         AS avg_quality6
FROM documents d
JOIN cl c ON c.doc_id = d.doc_id
JOIN qual q ON q.doc_id = d.doc_id
GROUP BY d.lang, c.keep
"""


QUERIES["doc_survivor_quality"] = (_q_survivor_quality, _survivor_quality_sql())


# ---- day-of-week event seasonality ----------------------------------
def _q_seasonality_dow(spark, sf_dir):
    """Day-of-week seasonality index per event type: 7·n/total — 1.0 is
    a flat profile, >1 an overloaded weekday. The dow is computed as
    epoch-days mod 7 (0 = Thursday, 1970-01-01), pure integer
    arithmetic with no engine-specific weekday convention; the index is
    one exact-integer division. Day-cardinality output (≤ 7 rows per
    event type) from one groupBy over the events scan."""
    register(spark, sf_dir)
    ev = spark.table("events").select(
        "event_type",
        (
            (
                F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) % 7
            )
            + 7
        ).cast("long")
        .alias("_d7"),
    ).select("event_type", (F.col("_d7") % 7).alias("dow"))
    per = ev.groupBy("event_type", "dow").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = ev.groupBy("event_type").agg(F.count("*").cast("bigint").alias("t"))
    return per.join(tot, "event_type").select(
        "event_type",
        "dow",
        "n",
        F.round((F.lit(7) * F.col("n")).cast("double") / F.col("t"), 6).alias(
            "idx6"
        ),
    )


_SEASONALITY_SQL = """
WITH e AS (
  SELECT event_type,
         ((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7) + 7) % 7
           AS dow
  FROM events
),
per AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY event_type, dow),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS t
        FROM e GROUP BY event_type)
SELECT p.event_type, p.dow, p.n,
       round(CAST(7 * p.n AS DOUBLE) / t.t, 6) AS idx6
FROM per p JOIN tot t USING (event_type)
"""

QUERIES["rel_seasonality_dow"] = (_q_seasonality_dow, _SEASONALITY_SQL)
