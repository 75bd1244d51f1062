"""Driver queries: context-window chunking, C4-style quality gating,
exact grouped percentiles, per-customer moving averages, and brand-level
graph contraction — the round-4 second wave. Every query is oracle-paired
with value-exact DuckDB SQL (integer decisions, round-6 floats)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._common import G_PARTS_SQL, docs, edges, register

_MAX_TOKENS = 20000

_CHUNK, _STRIDE = 64, 48

_XS_CTE = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS xs
  FROM documents
)
"""


def _q_chunks(spark, sf_dir):
    """Fixed-token-window chunking (chunk 64, stride 48): the packing
    step between cleaning and tokenization. Stateless row-local map —
    no shuffle anywhere in the plan."""
    from ..functions.text import chunk_tokens

    return chunk_tokens(docs(spark, sf_dir), chunk_size=_CHUNK, stride=_STRIDE)


_CHUNKS_SQL = (
    _XS_CTE
    + f"""
, nz AS (SELECT doc_id, xs, len(xs) AS n FROM base WHERE len(xs) > 0)
SELECT doc_id,
       CAST(r.s // {_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(xs, CAST(r.s + 1 AS INT), CAST(least(r.s + {_CHUNK}, n) AS INT))) AS INT) AS n_tokens,
       array_to_string(list_slice(xs, CAST(r.s + 1 AS INT), CAST(least(r.s + {_CHUNK}, n) AS INT)), ' ') AS chunk_text
FROM nz JOIN range(0, {_MAX_TOKENS}, {_STRIDE}) r(s) ON r.s < n
"""
)


def _q_span_dedup(spark, sf_dir):
    """Cross-document span dedup summary: 16-token spans appearing in
    >= 2 distinct documents (functions/text.py::span_duplicates)."""
    from ..functions.text import span_duplicates

    return span_duplicates(docs(spark, sf_dir), span=16, min_docs=2)


_SPAN_DEDUP_SQL = (
    _XS_CTE
    + f"""
, nz AS (SELECT doc_id, xs, len(xs) AS n FROM base WHERE len(xs) > 0)
, spans AS (
  SELECT doc_id,
         array_to_string(list_slice(xs, CAST(r.s + 1 AS INT), CAST(least(r.s + 16, n) AS INT)), ' ') AS t,
         len(list_slice(xs, CAST(r.s + 1 AS INT), CAST(least(r.s + 16, n) AS INT))) AS nt
  FROM nz JOIN range(0, {_MAX_TOKENS}, 16) r(s) ON r.s < n
)
SELECT md5(t) AS span_md5,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_spans,
       min(doc_id) AS min_doc_id
FROM spans WHERE nt = 16
GROUP BY md5(t) HAVING count(DISTINCT doc_id) >= 2
"""
)


def _q_c4_filter(spark, sf_dir):
    """C4-style quality gate: length floor, mean-word-length band,
    repetition cap, diversity floor — all decided on integer
    comparisons so both engines agree bit-exactly."""
    from ..functions.text import c4_quality_flags

    return c4_quality_flags(docs(spark, sf_dir), min_words=30)


_C4_SQL = (
    """
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS xs
  FROM documents
)
, stats AS (
  SELECT doc_id,
         CAST(len(xs) AS INT) AS n_words,
         CAST(coalesce(list_sum(list_transform(xs, x -> length(x))), 0) AS BIGINT) AS total_chars,
         CAST(coalesce(list_max(list_transform(list_distinct(xs),
              d -> len(list_filter(xs, x -> x = d)))), 0) AS INT) AS max_word_freq,
         CAST(len(list_distinct(xs)) AS INT) AS n_distinct,
         regexp_matches(text, '[.!?]\\s*$') AS ends_terminal
  FROM base
)
SELECT doc_id, n_words, total_chars, max_word_freq, n_distinct, ends_terminal,
       (n_words >= 30 AND total_chars >= 3 * n_words AND total_chars <= 8 * n_words
        AND max_word_freq * 5 <= n_words AND n_distinct * 10 >= 3 * n_words) AS keep
FROM stats
"""
)


def _q_percentiles(spark, sf_dir):
    """A1/W-family: exact interpolated quantiles (p25/p50/p90) of
    lineitem quantity per return flag — ``percentile`` in Spark and
    ``quantile_cont`` in DuckDB share the rank = p·(n−1) linear
    interpolation definition, so values agree exactly."""
    register(spark, sf_dir)
    li = spark.table("lineitem")
    pct = F.percentile("l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)))
    return li.groupBy("l_returnflag").agg(
        F.round(F.element_at(pct, 1), 6).alias("p25"),
        F.round(F.element_at(pct, 2), 6).alias("p50"),
        F.round(F.element_at(pct, 3), 6).alias("p90"),
    )


_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS p25,
       round(quantile_cont(l_quantity, 0.50), 6) AS p50,
       round(quantile_cont(l_quantity, 0.90), 6) AS p90
FROM lineitem GROUP BY l_returnflag
"""


def _q_moving_avg(spark, sf_dir):
    """W1-family: 4-row trailing moving average + previous-order delta of
    order value per customer, deterministic (date, key) order. The frame
    sums ≤4 doubles in a fixed order — identical in both engines."""
    register(spark, sf_dir)
    o = spark.table("orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.avg("o_totalprice").over(w.rowsBetween(-3, 0)), 4
        ).alias("ma4"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)),
            4,
        ).alias("delta_prev"),
    )


_MOVING_AVG_SQL = """
SELECT o_custkey, o_orderkey,
       round(avg(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4,
       round(o_totalprice - coalesce(lag(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0), 4) AS delta_prev
FROM orders
"""


def _q_contract_brand(spark, sf_dir):
    """Graph contraction by an external vertex attribute: collapse the
    part co-occurrence graph to its BRAND-level quotient graph (the host
    graph of a web link graph; the package graph of an import graph).
    Two broadcast joins against the 25-row key map + one groupBy — the
    edge table shuffles once, on the quotient key."""
    register(spark, sf_dir)
    g = edges(spark, sf_dir)
    p = spark.table("part").select("p_partkey", "p_brand")
    lab = (
        g.join(F.broadcast(p.withColumnRenamed("p_partkey", "src")), "src")
        .withColumnRenamed("p_brand", "bsrc")
        .join(
            F.broadcast(
                p.select(F.col("p_partkey").alias("dst"), F.col("p_brand").alias("bdst"))
            ),
            "dst",
        )
    )
    return (
        lab.select(
            F.least("bsrc", "bdst").alias("brand_a"),
            F.greatest("bsrc", "bdst").alias("brand_b"),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("weight"))
    )


_CONTRACT_BRAND_SQL = f"""
WITH g AS ({G_PARTS_SQL}),
lab AS (
  SELECT ps.p_brand AS bsrc, pd.p_brand AS bdst
  FROM g JOIN part ps ON ps.p_partkey = g.src
         JOIN part pd ON pd.p_partkey = g.dst
)
SELECT least(bsrc, bdst) AS brand_a, greatest(bsrc, bdst) AS brand_b,
       count(*) AS weight
FROM lab GROUP BY 1, 2
"""


QUERIES = {
    "doc_chunks": (_q_chunks, _CHUNKS_SQL),
    "doc_c4_filter": (_q_c4_filter, _C4_SQL),
    "doc_span_dedup": (_q_span_dedup, _SPAN_DEDUP_SQL),
    "rel_percentiles": (_q_percentiles, _PERCENTILES_SQL),
    "rel_moving_avg": (_q_moving_avg, _MOVING_AVG_SQL),
    "graph_contract_brand": (_q_contract_brand, _CONTRACT_BRAND_SQL),
}


def _q_pca_top(spark, sf_dir):
    """Top principal component of the embedding corpus by fixed-step
    power iteration — one scan + one 64-value aggregate per step, no
    shuffle, no materialized covariance."""
    from ..operators.pca import pca_top_component
    from ._common import emb

    return pca_top_component(emb(spark, sf_dir), dim=64, iters=8)


def _pca_sql():
    from ..operators.pca import pca_oracle_sql

    return pca_oracle_sql(dim=64, iters=8)


QUERIES["emb_pca_top"] = (_q_pca_top, _pca_sql())


def _q_pca_top2(spark, sf_dir):
    """Top-2 principal directions (deflated power iteration) — the 2-D
    whitening basis; same one-scan-per-step zero-shuffle job shape."""
    from ..operators.pca import pca_second_component
    from ._common import emb

    return pca_second_component(emb(spark, sf_dir), dim=64, iters=8)


def _pca2_sql():
    from ..operators.pca import pca2_oracle_sql

    return pca2_oracle_sql(dim=64, iters=8)


QUERIES["emb_pca_top2"] = (_q_pca_top2, _pca2_sql())
