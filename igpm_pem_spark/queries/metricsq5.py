"""Sixth metrics ring: bipartite butterfly counting, temporal monthly
triangle counts, hard-negative mining for contrastive training, and the
linear probe's lift chart — each oracle-paired with dtype-exact DuckDB
SQL.

Butterflies (2x2 bicliques) are the bipartite clustering primitive —
the motif behind co-purchase/co-click structure that unipartite
triangles miss entirely (a customer-part graph has NO triangles).
Monthly triangle counts are the temporal-motif view: the same
id-ordered two-join triangle plan with the month index carried as an
extra equi-key, so cohesion-over-time costs exactly one triangle pass.
Hard-negative mining is the triplet-construction step of contrastive
embedding training: per query, the nearest same-label positive and the
count of different-label vectors scoring within the margin.
The lift chart ranks the corpus by probe margin and reports per-decile
positive rates — where the probe's ranking actually concentrates the
positives."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._common import emb, register


# ---- bipartite butterfly count ---------------------------------------------
def _q_butterflies(spark, sf_dir):
    """Butterfly (2x2 biclique) census of the customer-part incidence
    graph. Wedges are enumerated from the PART side (sum d_p^2 is ~30%
    of the customer side here — pick the smaller Σd² side, the standard
    orientation trick), then B = sum C(w, 2) over per-customer-pair
    common-part counts. All exact integers. At 100 TB the hub mitigation
    is the same as the triangle kernel's: degree-orient the wedge side
    or cap/salt hub parts — the wedge join is the entire cost."""
    register(spark, sf_dir)
    b = (
        spark.table("orders").alias("o")
        .join(
            spark.table("lineitem").alias("l"),
            F.col("l.l_orderkey") == F.col("o.o_orderkey"),
        )
        .select(
            F.col("o.o_custkey").alias("c"), F.col("l.l_partkey").alias("p")
        )
        .distinct()
    )
    w = (
        b.alias("a")
        .join(
            b.alias("b2"),
            (F.col("a.p") == F.col("b2.p")) & (F.col("a.c") < F.col("b2.c")),
        )
        .groupBy(F.col("a.c").alias("c1"), F.col("b2.c").alias("c2"))
        .agg(F.count("*").alias("cw"))
    )
    return w.agg(
        F.sum((F.col("cw") * (F.col("cw") - 1) / F.lit(2)))
        .cast("long")
        .alias("n_butterflies"),
        F.count("*").cast("long").alias("n_connected_pairs"),
        F.sum("cw").cast("long").alias("n_wedges"),
    )


_BUTTERFLY_SQL = """
WITH b AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
w AS (
  SELECT a.c AS c1, b2.c AS c2, count(*) AS cw
  FROM b a JOIN b b2 ON a.p = b2.p AND a.c < b2.c
  GROUP BY a.c, b2.c
)
SELECT CAST(sum(cw * (cw - 1) / 2) AS BIGINT) AS n_butterflies,
       CAST(count(*) AS BIGINT) AS n_connected_pairs,
       CAST(sum(cw) AS BIGINT) AS n_wedges
FROM w
"""


# ---- monthly triangle counts -------------------------------------------------
_G_MONTH_SQL = """
SELECT DISTINCT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS INT) AS mi,
       a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN orders o ON o.o_orderkey = a.l_orderkey
WHERE a.l_orderkey % 10 = 0
"""


def _q_monthly_triangles(spark, sf_dir):
    """Per-month triangle counts of the month-stamped co-occurrence
    graph: the id-ordered triangle plan (J5) with the month index as an
    extra equi-join key — temporal cohesion costs ONE triangle pass, and
    the month key co-partitions the wedge shuffle for free."""
    register(spark, sf_dir)
    g = spark.sql(_G_MONTH_SQL)
    g1, g2, g3 = g.alias("g1"), g.alias("g2"), g.alias("g3")
    tri = (
        g1.join(
            g2,
            (F.col("g2.mi") == F.col("g1.mi"))
            & (F.col("g2.src") == F.col("g1.dst")),
        )
        .join(
            g3,
            (F.col("g3.mi") == F.col("g1.mi"))
            & (F.col("g3.src") == F.col("g1.src"))
            & (F.col("g3.dst") == F.col("g2.dst")),
        )
    )
    return tri.groupBy(F.col("g1.mi").alias("mi")).agg(
        F.count("*").cast("long").alias("n_triangles")
    )


_MONTHLY_TRI_SQL = f"""
WITH g AS ({_G_MONTH_SQL})
SELECT g1.mi AS mi, CAST(count(*) AS BIGINT) AS n_triangles
FROM g g1
JOIN g g2 ON g2.mi = g1.mi AND g2.src = g1.dst
JOIN g g3 ON g3.mi = g1.mi AND g3.src = g1.src AND g3.dst = g2.dst
GROUP BY g1.mi
"""


# ---- hard-negative mining ------------------------------------------------------
HARD_NEG_MARGIN = 0.05


def _q_hard_negatives(spark, sf_dir):
    """Contrastive-triplet mining for the 5 lowest-id query vectors:
    the positive is the nearest same-label vector (rounded cosine,
    vec_id tie-break), hard negatives are different-label vectors
    scoring within 0.05 of it — the triplets an embedding fine-tune
    trains on. The scan is queries x corpus (bounded by the seed count;
    swap the candidate pool to ANN at scale, same downstream)."""
    from ..operators.similarity import with_cosine

    e = emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    scored = with_cosine(
        e.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id")),
        "embedding", "q_emb",
    ).select(
        "query_id", "q_label", "vec_id", "label",
        F.round("cos", 4).alias("cos4"),
    )
    pos = (
        scored.where(F.col("label") == F.col("q_label"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.desc("cos4"), F.asc("vec_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("pos_id"),
            F.col("cos4").alias("pos_cos4"),
        )
    )
    neg = scored.where(F.col("label") != F.col("q_label")).select(
        "query_id", F.col("cos4").alias("neg_cos4")
    )
    return (
        pos.join(neg, "query_id")
        .groupBy("query_id", "pos_id", "pos_cos4")
        .agg(
            F.sum(
                F.when(
                    F.col("neg_cos4") >= F.col("pos_cos4") - F.lit(HARD_NEG_MARGIN), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_hard_negatives")
        )
    )


_HARD_NEG_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS q_label, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, q.q_label, c.vec_id, c.label,
         round(list_cosine_similarity(q.qe, c.embedding::DOUBLE[]), 4) AS cos4
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
),
pos AS (
  SELECT query_id, vec_id AS pos_id, cos4 AS pos_cos4
  FROM (SELECT query_id, vec_id, cos4,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos4 DESC, vec_id ASC) AS rn
        FROM scored WHERE label = q_label)
  WHERE rn = 1
)
SELECT p.query_id, p.pos_id, p.pos_cos4,
       CAST(sum(CASE WHEN s.cos4 >= p.pos_cos4 - {HARD_NEG_MARGIN}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hard_negatives
FROM pos p JOIN scored s
  ON s.query_id = p.query_id AND s.label <> s.q_label
GROUP BY p.query_id, p.pos_id, p.pos_cos4
"""


# ---- probe lift chart -------------------------------------------------------------
def _q_probe_lift(spark, sf_dir):
    """Lift chart of the logistic probe: corpus ranked by fitted margin,
    per decile the positive rate (operators/linear_probe.py — same
    4-step GD recurrence the probe/acc/AUC queries replay)."""
    from ..operators.linear_probe import logreg_lift_deciles

    return logreg_lift_deciles(emb(spark, sf_dir))


def _lift_sql() -> str:
    from ..operators.linear_probe import logreg_lift_oracle_sql

    return logreg_lift_oracle_sql()


QUERIES = {
    "graph_butterflies": (_q_butterflies, _BUTTERFLY_SQL),
    "graph_monthly_triangles": (_q_monthly_triangles, _MONTHLY_TRI_SQL),
    "emb_hard_negatives": (_q_hard_negatives, _HARD_NEG_SQL),
    "emb_probe_lift": (_q_probe_lift, _lift_sql()),
}
