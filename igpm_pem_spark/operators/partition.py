"""Edge-cut-aware partition assignment — the north rule's
"edge-cut-aware repartitioning" as a measured, first-class operator
rather than a repartition() call site.

The reference partitions its data graph with METIS k-way edge-cut
minimization plus ghost-vertex overlap (``subgraph/divide.py:8-30``,
``subgraph/overlap.py:8-46``). The Spark-native realization: communities
from the deterministic LPA kernel (the engine's A8 primitive) are packed
size-descending round-robin into k parts (the reference's own W5 greedy
bin-packing rule, ``parallel/gray_mp.py:172-178``), giving every vertex a
partition id that keeps community-internal edges co-located.
``edge_cut_summary`` then MEASURES the claim: the fraction of edges
crossing parts under this assignment vs under plain hash partitioning —
the number a 100 TB deployment uses to decide whether the extra
partition-map join is worth it (each cut edge is one shuffled message
per superstep).

Scale shape: the LPA kernel is the usual message-passing joins; the
packing window runs over ONE ROW PER COMMUNITY (≪ V — it is the only
driver-narrow relation here); assignment is one join of `labels` against
the packed map. The summary is a single aggregate over the edge table
with two map-side lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .graph import canonical_undirected
from .matching import vertex_priority, vertex_priority_sql


def lpa_partitions(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 4,
    lpa_iters: int = 3,
    num_partitions: int | None = None,
    strategy: str = "window",
) -> DataFrame:
    """(id, part): deterministic edge-cut-aware partition assignment —
    ``lpa_iters`` LPA sweeps, then communities packed into ``k`` parts.

    ``strategy="window"`` (default, the oracle-checked spec) packs
    size-descending (ties by label) round-robin — the reference's W5
    greedy rule. The global window is a single-task sort over ONE ROW
    PER COMMUNITY, fine while communities ≪ V; on a shattered graph
    (LPA leaving ~V singletons) use ``strategy="hash"``, which packs by
    portable label hash — fully parallel, same co-location property for
    the communities that matter, weaker balance guarantee."""
    from .labelprop import label_propagation

    labels = label_propagation(
        spark, edges, max_iter=lpa_iters, num_partitions=num_partitions
    ).labels
    if strategy == "hash":
        return labels.select(
            "id",
            (vertex_priority(F.col("label"), salt="pack") % F.lit(k))
            .cast("int")
            .alias("part"),
        )
    if strategy != "window":
        raise ValueError(f"lpa_partitions: unknown strategy {strategy!r}")
    sizes = labels.groupBy("label").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("label"))
    packed = sizes.select(
        "label", ((F.row_number().over(w) - 1) % k).cast("int").alias("part")
    )
    return labels.join(packed, "label").select("id", "part")


def edge_cut_summary(
    edges: DataFrame,
    assign: DataFrame,
    k: int = 4,
    salt: str = "part",
) -> DataFrame:
    """One row (n_edges, cut_lpa, cut_hash, cut_ratio_lpa6,
    cut_ratio_hash6): edges crossing parts under ``assign`` (id, part)
    vs under portable-hash partitioning into the same ``k`` parts."""
    e = canonical_undirected(edges)
    ps = assign.select(F.col("id").alias("src"), F.col("part").alias("p_src"))
    pd_ = assign.select(F.col("id").alias("dst"), F.col("part").alias("p_dst"))
    hp = lambda c: vertex_priority(F.col(c), salt=salt) % F.lit(k)  # noqa: E731
    j = e.join(ps, "src").join(pd_, "dst")
    cuts = j.agg(
        F.count("*").alias("n_edges"),
        F.sum((F.col("p_src") != F.col("p_dst")).cast("long")).alias("cut_lpa"),
        F.sum((hp("src") != hp("dst")).cast("long")).alias("cut_hash"),
    )
    # balance: the largest part's vertex share — a partitioner that wins
    # the cut by piling everything into one part is reported as such
    bal = (
        assign.groupBy("part")
        .agg(F.count("*").alias("nv"))
        .agg(
            F.max("nv").alias("max_nv"),
            F.sum("nv").alias("tot_nv"),
            F.count("*").alias("n_parts_used"),
        )
        .select(
            F.round(F.col("max_nv") / F.col("tot_nv"), 6).alias("max_part_share6"),
            F.col("n_parts_used").cast("long").alias("n_parts_used"),
        )
    )
    return cuts.crossJoin(bal).select(
        "n_edges",
        "cut_lpa",
        "cut_hash",
        F.round(F.col("cut_lpa") / F.col("n_edges"), 6).alias("cut_ratio_lpa6"),
        F.round(F.col("cut_hash") / F.col("n_edges"), 6).alias("cut_ratio_hash6"),
        "max_part_share6",
        "n_parts_used",
    )


def partition_oracle_tail(k: int = 4) -> str:
    """SQL tail (expects CTEs ``g``, ``sym``, ``l3`` in scope — the
    registry's unrolled 3-round LPA chain) computing lpa_partitions."""
    return f"""
, sizes AS (SELECT label, count(*) AS n FROM l3 GROUP BY label)
, packed AS (
    SELECT label,
           CAST((row_number() OVER (ORDER BY n DESC, label ASC) - 1) % {k} AS INT) AS part
    FROM sizes
)
, assign AS (SELECT l.id, p.part FROM l3 l JOIN packed p USING (label))
"""


def edge_cut_oracle_tail(k: int = 4, salt: str = "part") -> str:
    """SQL tail (expects ``g`` and ``assign``) computing edge_cut_summary."""
    hs = vertex_priority_sql("g.src", salt)
    hd = vertex_priority_sql("g.dst", salt)
    return f"""
, cuts AS (
  SELECT count(*) AS n_edges,
         CAST(sum(CASE WHEN ps.part <> pd.part THEN 1 ELSE 0 END) AS BIGINT) AS cut_lpa,
         CAST(sum(CASE WHEN ({hs} % {k}) <> ({hd} % {k}) THEN 1 ELSE 0 END) AS BIGINT) AS cut_hash
  FROM g JOIN assign ps ON ps.id = g.src JOIN assign pd ON pd.id = g.dst
)
, bal AS (
  SELECT round(max(nv) * 1.0 / sum(nv), 6) AS max_part_share6,
         count(*) AS n_parts_used
  FROM (SELECT part, count(*) AS nv FROM assign GROUP BY part)
)
SELECT n_edges, cut_lpa, cut_hash,
       round(cut_lpa * 1.0 / n_edges, 6) AS cut_ratio_lpa6,
       round(cut_hash * 1.0 / n_edges, 6) AS cut_ratio_hash6,
       max_part_share6, n_parts_used
FROM cuts, bal
"""


def skew_salt_plan(
    df: DataFrame,
    key: str,
    rows_per_task: int,
    n_salts: int = 16,
) -> DataFrame:
    """(id, cnt, n_splits): per-key reducer split factors for the keys
    whose observed multiplicity exceeds ``rows_per_task`` — the measured,
    adaptive companion to ``graph.salted_count`` (O9). That operator
    splits EVERY key a fixed 16 ways; this one counts first and emits
    ``ceil(cnt / rows_per_task)`` splits for just the hubs, which is what
    a repartition-by-key superstep loop wants at 100 TB: AQE's skew-join
    splitting rebalances one exchange at a time, but an iterative kernel
    re-shuffles on the same key every superstep, so the plan is computed
    once from table stats and applied to all of them (the same
    measure-then-lay-out discipline as ``lpa_partitions``).

    The frequency count itself runs through the two-phase salted
    aggregation, so counting a hub key is not itself skewed. The split
    factor stays in exact integer arithmetic: (cnt + r − 1) DIV r."""
    from .graph import salted_count

    cnt = salted_count(df, key, n_salts=n_salts, out="cnt")
    return (
        cnt.where(F.col("cnt") > rows_per_task)
        .select(
            F.col(key).alias("id"),
            F.col("cnt").cast("long").alias("cnt"),
            F.expr(
                f"(cnt + {rows_per_task - 1}) DIV {rows_per_task}"
            ).cast("long").alias("n_splits"),
        )
    )
