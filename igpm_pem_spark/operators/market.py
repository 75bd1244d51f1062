"""Market-basket co-occurrence lift — association mining over baskets.

The reference's pattern matcher enumerates co-occurring labeled vertices
inside a match (patternmatching/query/condition.py counts attribute
co-occurrence within a result set); the relational generalization a
training-data / commerce pipeline runs at scale is pairwise association
over baskets: for every unordered item pair, support, confidence and
lift against the independence baseline.

Scale shape (the part that must survive 100 TB):
- the basket→item table is deduplicated FIRST (``distinct`` on the two
  key columns), so the self-join fan-out is bounded by the number of
  *distinct* items per basket, not the raw line count;
- the pair join is an equi-join on the basket key — both sides are the
  same deduplicated frame, so Spark co-partitions them with a single
  exchange that AQE reuses for both inputs;
- per-item totals and the global basket count are map-side-combinable
  aggregates; the final lift arithmetic is all JVM column expressions.
Skew note: a basket with B distinct items emits B·(B-1)/2 pairs. For
brand-level baskets B is bounded by the brand vocabulary (25 in TPC-H),
so the worst basket is constant work; for open item vocabularies, cap B
with the same window-count guard dedup.py:123 uses for LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_lift(
    baskets: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    top_k: int = 20,
) -> DataFrame:
    """Pairwise association stats over (basket, item) memberships.

    Returns the ``top_k`` pairs by lift: ``(item_a, item_b, n_pair,
    support6, lift6)`` with ``item_a < item_b``, ordered by
    (lift desc, item_a, item_b) so the cut is deterministic under ties.

    lift(a,b) = P(a,b) / (P(a)·P(b)) with probabilities over baskets;
    computed as ``(n_pair·N) / (n_a·n_b)`` in double precision (the
    integer product can exceed int64 at corpus scale).
    """
    b = baskets.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()

    totals = b.agg(F.countDistinct("basket").alias("n_baskets"))
    item_counts = b.groupBy("item").agg(F.count("*").alias("n_item"))

    pairs = (
        b.alias("a")
        .join(
            b.alias("bb"),
            (F.col("a.basket") == F.col("bb.basket"))
            & (F.col("a.item") < F.col("bb.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("bb.item").alias("item_b")
        )
        .agg(F.count("*").alias("n_pair"))
    )

    out = (
        pairs.join(
            F.broadcast(item_counts).withColumnRenamed("n_item", "n_a"),
            F.col("item_a") == F.col("item"),
        )
        .drop("item")
        .join(
            F.broadcast(item_counts).withColumnRenamed("n_item", "n_b"),
            F.col("item_b") == F.col("item"),
        )
        .drop("item")
        .crossJoin(F.broadcast(totals))
    )
    lift = (F.col("n_pair").cast("double") * F.col("n_baskets")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        out.select(
            "item_a",
            "item_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.round(F.col("n_pair") * F.lit(1.0) / F.col("n_baskets"), 6).alias(
                "support6"
            ),
            F.round(lift, 6).alias("lift6"),
        )
        .orderBy(F.desc("lift6"), "item_a", "item_b")
        .limit(top_k)
    )
