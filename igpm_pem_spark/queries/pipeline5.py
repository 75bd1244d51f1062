"""Driver queries, round-4 third wave: ordered event funnel, cohort
retention, and PCA projection — the product-analytics / feature-prep
operators a training-data pipeline runs next to the graph kernels.
Every query is oracle-paired with value-exact DuckDB SQL (integer
counts; round-6 floats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import register


def _q_funnel3(spark, sf_dir):
    """3-step ordered funnel (view → click → purchase) per user: step k
    is reached when an event of type k strictly follows the user's first
    step-(k−1) event. Each stage is one groupBy + one equi-join keyed on
    user_id — the per-user relation shrinks monotonically, so at scale
    every stage after the first joins against an ever-smaller (often
    broadcastable) survivor set."""
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
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        e.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    step = lambda df, k: df.agg(  # noqa: E731
        F.lit(k).cast("int").alias("step"), F.count("*").alias("n_users")
    )
    return step(t1, 1).unionAll(step(t2, 2)).unionAll(step(t3, 3))


_FUNNEL3_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST(1 AS INT) AS step, count(*) AS n_users FROM t1
UNION ALL SELECT CAST(2 AS INT), count(*) FROM t2
UNION ALL SELECT CAST(3 AS INT), count(*) FROM t3
"""


def _q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: customers grouped by first-order month,
    counted distinct in each subsequent month offset. Month arithmetic is
    integer (year·12 + month), so both engines agree exactly. Two
    shuffles total: the first-order groupBy and the final (cohort,
    offset) count-distinct — both keyed, no window over the fact table."""
    register(spark, sf_dir)
    o = spark.table("orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int")
    om = o.select("o_custkey", mi.alias("mi"))
    first = om.groupBy("o_custkey").agg(F.min("mi").alias("cohort_mi"))
    return (
        om.join(first, "o_custkey")
        .groupBy(
            F.col("cohort_mi"),
            (F.col("mi") - F.col("cohort_mi")).cast("int").alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


_COHORT_SQL = """
WITH om AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS mi
  FROM orders
), first AS (
  SELECT o_custkey, min(mi) AS cohort_mi FROM om GROUP BY o_custkey
)
SELECT first.cohort_mi,
       CAST(om.mi - first.cohort_mi AS INT) AS months_since,
       count(DISTINCT om.o_custkey) AS n_customers
FROM om JOIN first ON first.o_custkey = om.o_custkey
GROUP BY first.cohort_mi, months_since
"""


def _q_pca_project(spark, sf_dir):
    """Every embedding's coordinate on the corpus top principal direction
    (fixed 8-step power iteration) — the 1-D feature a curriculum sort or
    outlier gate consumes. The projection is a stateless scan-wide
    expression: zero shuffle."""
    from ..operators.pca import pca_project
    from ._common import emb

    return pca_project(emb(spark, sf_dir), dim=64, iters=8)


def _pca_project_sql():
    from ..operators.pca import pca_project_oracle_sql

    return pca_project_oracle_sql(dim=64, iters=8)


def _q_knn_label_acc(spark, sf_dir):
    """Leave-self-out 5-NN label-vote accuracy per class on the exact
    cosine subset baseline — the intrinsic embedding-quality gate."""
    from ..operators.similarity import knn_label_accuracy
    from ._common import emb

    return knn_label_accuracy(emb(spark, sf_dir), k=5, query_mod=25)


_KNN_ACC_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS e1
  FROM embeddings WHERE vec_id % 25 = 0
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.e1, c.embedding::DOUBLE[]), 4) AS cos4
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
),
topk AS (
  SELECT query_id, neighbor_id FROM scored
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC) <= 5
),
votes AS (
  SELECT t.query_id, e.label AS nb_label, count(*) AS c
  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
  GROUP BY t.query_id, e.label
),
pred AS (
  SELECT query_id, nb_label AS pred FROM votes
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY c DESC, nb_label ASC) = 1
)
SELECT e.label,
       count(*) AS n_queries,
       CAST(sum(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
GROUP BY e.label
"""


def _q_logreg_weights(spark, sf_dir):
    """Linear-probe weights: binary one-vs-rest logistic regression on
    the frozen embedding column, 4 fixed full-batch GD steps — each step
    ONE corpus scan fused into a 65-double global aggregate, zero
    shuffle (operators/linear_probe.py)."""
    from ..operators.linear_probe import logreg_probe_weights

    register(spark, sf_dir)
    emb = spark.table("embeddings")
    return logreg_probe_weights(emb)


def _q_logreg_acc(spark, sf_dir):
    """Train-set accuracy of the linear probe at margin>0 — the
    embedding-quality scalar gate next to emb_knn_label_acc."""
    from ..operators.linear_probe import logreg_probe_accuracy

    register(spark, sf_dir)
    emb = spark.table("embeddings")
    return logreg_probe_accuracy(emb)


def _logreg_sqls():
    from ..operators.linear_probe import (
        logreg_accuracy_oracle_sql,
        logreg_oracle_sql,
    )

    return logreg_oracle_sql(), logreg_accuracy_oracle_sql()


_LOGREG_W_SQL, _LOGREG_ACC_SQL = _logreg_sqls()


QUERIES = {
    "rel_funnel3": (_q_funnel3, _FUNNEL3_SQL),
    "emb_logreg_probe": (_q_logreg_weights, _LOGREG_W_SQL),
    "emb_logreg_acc": (_q_logreg_acc, _LOGREG_ACC_SQL),
    "rel_cohort_retention": (_q_cohort_retention, _COHORT_SQL),
    "emb_pca_project": (_q_pca_project, _pca_project_sql()),
    "emb_knn_label_acc": (_q_knn_label_acc, _KNN_ACC_SQL),
}
