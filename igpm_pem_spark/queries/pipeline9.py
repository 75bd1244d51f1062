"""Round-5 session-7 additions: market-basket lift, Zipf slope,
embedding class separation, event burstiness.

Each Spark operator is paired with a DuckDB oracle that replays the same
definition in ANSI SQL over the same parquet views; every aggregate /
computed column is aliased identically on both sides and cast to a
portable dtype (BIGINT counts, round-6 doubles) per the driver's
dtype-sensitive value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import docs, emb, register

# ------------------------------------------------ market-basket lift


def _q_basket_lift(spark, sf_dir):
    """Top-20 brand pairs by co-purchase lift over order baskets."""
    from ..operators.market import copurchase_lift

    register(spark, sf_dir)
    baskets = (
        spark.table("lineitem")
        .join(
            F.broadcast(spark.table("part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    )
    return copurchase_lift(baskets, top_k=20).select(
        F.col("item_a").alias("brand_a"),
        F.col("item_b").alias("brand_b"),
        "n_pair",
        "support6",
        "lift6",
    )


_BASKET_SQL = """
WITH bi AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n AS (SELECT count(DISTINCT basket) AS n_baskets FROM bi),
ic AS (SELECT item, count(*) AS n_item FROM bi GROUP BY item),
pc AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_pair
  FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
)
SELECT pc.item_a AS brand_a, pc.item_b AS brand_b,
       CAST(pc.n_pair AS BIGINT) AS n_pair,
       round(pc.n_pair * 1.0 / n.n_baskets, 6) AS support6,
       round((CAST(pc.n_pair AS DOUBLE) * n.n_baskets)
             / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift6
FROM pc
CROSS JOIN n
JOIN ic ia ON ia.item = pc.item_a
JOIN ic ib ON ib.item = pc.item_b
ORDER BY lift6 DESC, brand_a, brand_b
LIMIT 20
"""

# ------------------------------------------------ Zipf slope per lang


def _q_zipf(spark, sf_dir):
    """OLS Zipf fit (ln freq ~ ln rank) over each lang's top-50 tokens."""
    from ..operators.corpus import zipf_slope

    return zipf_slope(docs(spark, sf_dir), group_col="lang", top_n=50)


_ZIPF_SQL = """
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
  FROM documents
), counts AS (
  SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token
), ranked AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rank
  FROM counts
), xy AS (
  SELECT lang, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
  FROM ranked WHERE rank <= 50
), fit AS (
  SELECT lang, count(*) AS n_top,
         avg(x) AS mx, avg(y) AS my, avg(x * y) AS mxy, avg(x * x) AS mxx
  FROM xy GROUP BY lang
)
SELECT lang, CAST(n_top AS BIGINT) AS n_top,
       round((mxy - mx * my) / (mxx - mx * mx), 6) AS slope6,
       round(my - (mxy - mx * my) / (mxx - mx * mx) * mx, 6) AS intercept6
FROM fit
"""

# ------------------------------------------------ class separation


def _q_class_sep(spark, sf_dir):
    """Per-label centroid cohesion vs nearest-other-centroid cosine."""
    from ..operators.features import class_separation

    return class_separation(emb(spark, sf_dir))


_CLASS_SEP_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), d AS (
  SELECT label, vec_id, CAST(r.i AS INT) AS i, v[CAST(r.i AS INT)] AS x
  FROM e JOIN range(1, 4097) r(i) ON r.i <= len(v)
), cent AS (
  SELECT label, i, avg(x) AS mu FROM d GROUP BY label, i
), cnorm AS (
  SELECT label, sqrt(sum(mu * mu)) AS cn FROM cent GROUP BY label
), dotv AS (
  SELECT d.label, d.vec_id, sum(d.x * c.mu) AS dot, sqrt(sum(d.x * d.x)) AS vn
  FROM d JOIN cent c ON c.label = d.label AND c.i = d.i
  GROUP BY d.label, d.vec_id
), intra AS (
  SELECT dv.label, count(*) AS n_vecs, avg(dv.dot / (dv.vn * cn.cn)) AS ic
  FROM dotv dv JOIN cnorm cn ON cn.label = dv.label GROUP BY dv.label
), inter0 AS (
  SELECT a.label AS la, b.label AS lb, sum(a.mu * b.mu) AS dd
  FROM cent a JOIN cent b ON a.i = b.i AND a.label <> b.label
  GROUP BY a.label, b.label
), inter AS (
  SELECT la AS label, max(dd / (ca.cn * cb.cn)) AS mi
  FROM inter0 JOIN cnorm ca ON ca.label = inter0.la
              JOIN cnorm cb ON cb.label = inter0.lb
  GROUP BY la
)
SELECT i.label, CAST(i.n_vecs AS BIGINT) AS n_vecs,
       round(i.ic, 6) AS intra_cos6,
       round(t.mi, 6) AS max_inter_cos6,
       round(i.ic - t.mi, 6) AS margin6
FROM intra i JOIN inter t ON t.label = i.label
"""

# ------------------------------------------------ event burstiness


def _q_burstiness(spark, sf_dir):
    """Goh-Barabasi burstiness of per-user event inter-arrival times."""
    from ..operators.temporal import interarrival_burstiness

    register(spark, sf_dir)
    return interarrival_burstiness(spark.table("events"), min_gaps=4)


_BURST_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
), gaps AS (
  SELECT user_id, gap_us / 1000000.0 AS gap_s FROM g WHERE gap_us IS NOT NULL
), s AS (
  SELECT user_id, count(*) AS n_gaps, avg(gap_s) AS m, stddev_samp(gap_s) AS sd
  FROM gaps GROUP BY user_id
)
SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
       round(m, 6) AS mean_gap_s6,
       round(sd, 6) AS sd_gap_s6,
       round(CASE WHEN sd + m > 0 THEN (sd - m) / (sd + m) ELSE 0.0 END, 6)
         AS burstiness6
FROM s WHERE n_gaps >= 4
"""


QUERIES = {
    "rel_basket_lift": (_q_basket_lift, _BASKET_SQL),
    "doc_zipf_slope": (_q_zipf, _ZIPF_SQL),
    "emb_class_separation": (_q_class_sep, _CLASS_SEP_SQL),
    "rel_burstiness": (_q_burstiness, _BURST_SQL),
}
