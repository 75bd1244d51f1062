"""Training-data pipeline queries, thirteenth ring (round-5 session 10,
batch 6): the Heaps-law growth exponent, the quality-vs-duplication
correlation, and the int8 norm-concentration histogram.

All three audit corpus health at one number's glance: is vocabulary
still growing sublinearly as the crawl scales (Heaps β), are duplicates
systematically lower-quality (point-biserial r — justifies dedup as a
quality filter, not just a storage saver), and do embedding norms
concentrate (a pre-normalization pathology ANN recall pays for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import docs, emb

QUERIES: dict = {}

# ---- Heaps-law growth exponent ---------------------------------------


def _q_heaps_slope(spark, sf_dir):
    """(n_points, slope6, intercept6): OLS fit of ln(vocab) on
    ln(tokens) over the 10 cumulative decile points of the vocabulary
    growth curve — Heaps' V = K·N^β, with β the single number that says
    whether the corpus is still discovering new language (β≈0.5) or
    re-crawling itself (β→0). Inputs are the exact-integer growth
    curve; the fit is the proven 5-aggregate OLS over 10 points."""
    from .pipeline8 import _q_vocab_growth

    gv = _q_vocab_growth(spark, sf_dir)
    xy = gv.select(
        F.log(F.col("tokens_cum").cast("double")).alias("x"),
        F.log(F.col("vocab_cum").cast("double")).alias("y"),
    )
    fit = xy.agg(
        F.count("*").alias("n_points"),
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
        F.col("n_points").cast("bigint").alias("n_points"),
        F.round(slope, 6).alias("slope6"),
        F.round(intercept, 6).alias("intercept6"),
    )


def _heaps_sql() -> str:
    from .pipeline8 import _VOCAB_SQL

    return f"""
WITH gv AS MATERIALIZED ({_VOCAB_SQL}),
xy AS (SELECT ln(CAST(tokens_cum AS DOUBLE)) AS x,
              ln(CAST(vocab_cum AS DOUBLE)) AS y FROM gv),
fit AS (
  SELECT count(*) AS n_points, avg(x) AS mx, avg(y) AS my,
         avg(x * y) AS mxy, avg(x * x) AS mxx
  FROM xy)
SELECT CAST(n_points AS BIGINT) AS n_points,
       round((mxy - mx * my) / (mxx - mx * mx), 6) AS slope6,
       round(my - (mxy - mx * my) / (mxx - mx * mx) * mx, 6) AS intercept6
FROM fit
"""


QUERIES["doc_heaps_slope"] = (_q_heaps_slope, _heaps_sql())


# ---- quality vs duplication correlation ------------------------------


def _q_quality_dup_corr(spark, sf_dir):
    """(n_docs, n_dups, r6): point-biserial correlation between quality
    and being a non-survivor duplicate — the one-number justification
    for dedup-as-quality-filter (negative r: duplicates skew
    low-quality). Every aggregate (n, n_dup, Σq, Σq², Σq over dups) is
    an exact BIGINT in micro-units; the correlation is a fixed chain of
    IEEE ops over those integers, so both engines compute bit-identical
    doubles before round(., 6)."""
    from ..functions.text import quality_score
    from ..operators.dedup import dedup_clusters
    from ._common import graph_nparts

    d = docs(spark, sf_dir)
    cl = dedup_clusters(
        spark, d, threshold=0.1, num_partitions=graph_nparts(spark, sf_dir)
    )
    q = quality_score(d).select(
        "doc_id",
        F.round(F.col("quality") * 1000000, 0).cast("bigint").alias("qm"),
    )
    t = q.join(cl.select("doc_id", "keep"), "doc_id")
    agg = t.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((~F.col("keep")).cast("long")).cast("bigint").alias("nd"),
        F.sum("qm").cast("bigint").alias("s1"),
        F.sum(F.col("qm") * F.col("qm")).cast("bigint").alias("s2"),
        F.sum(F.when(~F.col("keep"), F.col("qm")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("sd"),
    )
    n = F.col("n").cast("double")
    nd = F.col("nd").cast("double")
    md = F.col("sd").cast("double") / nd
    mk = (F.col("s1") - F.col("sd")).cast("double") / (n - nd)
    sdev = F.sqrt(
        F.col("s2").cast("double") / n
        - (F.col("s1").cast("double") / n) * (F.col("s1").cast("double") / n)
    )
    r = (md - mk) / sdev * F.sqrt(nd * (n - nd) / (n * n))
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("nd").alias("n_dups"),
        F.round(
            F.when(
                (F.col("nd") > 0) & (F.col("nd") < F.col("n")) & (sdev > 0), r
            ),
            6,
        ).alias("r6"),
    )


def _quality_dup_corr_sql() -> str:
    from .pipeline2 import _dedup_clusters_sql
    from .pipeline12 import _survivor_quality_sql

    # reuse the byte-mirrored micro-unit quality CTE from the
    # survivor-quality oracle by rebuilding the same prelude here
    clusters = _dedup_clusters_sql()
    qual_prelude = _survivor_quality_sql().split(",\ncl AS MATERIALIZED")[0]
    return f"""{qual_prelude},
cl AS MATERIALIZED ({clusters}),
t AS (SELECT q.q_micro AS qm, NOT c.keep AS is_dup
      FROM qual q JOIN cl c USING (doc_id)),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         CAST(sum(qm) AS BIGINT) AS s1,
         CAST(sum(qm * qm) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN is_dup THEN qm ELSE 0 END) AS BIGINT) AS sd
  FROM t)
SELECT n AS n_docs, nd AS n_dups,
       round(CASE WHEN nd > 0 AND nd < n
                   AND sqrt(CAST(s2 AS DOUBLE) / n
                            - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) > 0
             THEN (CAST(sd AS DOUBLE) / nd
                   - CAST(s1 - sd AS DOUBLE) / (CAST(n AS DOUBLE) - nd))
                  / sqrt(CAST(s2 AS DOUBLE) / n
                         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                  * sqrt(CAST(nd AS DOUBLE) * (CAST(n AS DOUBLE) - nd)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             END, 6) AS r6
FROM agg
"""


QUERIES["doc_quality_dup_corr"] = (_q_quality_dup_corr, _quality_dup_corr_sql())


# ---- int8 norm-concentration histogram -------------------------------


def _q_norm_histogram(spark, sf_dir):
    """(bucket, n_vectors): binary-magnitude histogram of squared int8
    norms over the WHOLE corpus (linear scan, exact BIGINT Σqv²) — the
    norm-concentration audit: a single dominant bucket means the corpus
    is effectively on a sphere and cosine ≈ dot; a wide spread means
    normalization is load-bearing before ANN."""
    from ..operators.similarity import quantize_int8

    q = quantize_int8(emb(spark, sf_dir))
    n2 = F.aggregate(
        F.transform("qv", lambda x: x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    return (
        q.select(n2.alias("n2"))
        .groupBy(F.length(F.bin("n2")).cast("bigint").alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n_vectors"))
    )


_NORM_HIST_SQL = """
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
n2 AS (
  SELECT q.vec_id,
         CAST(sum(q.qv[CAST(r.i AS INT)] * q.qv[CAST(r.i AS INT)]) AS BIGINT) AS n2
  FROM q, range(1, 4097) r(i) WHERE r.i <= len(q.qv)
  GROUP BY q.vec_id
)
SELECT CAST(length(bin(n2)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM n2 GROUP BY 1
"""

QUERIES["emb_norm_histogram_int8"] = (_q_norm_histogram, _NORM_HIST_SQL)
