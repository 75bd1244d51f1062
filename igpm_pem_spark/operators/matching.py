"""Deterministic maximal matching — the handshake (local-dominant) kernel.

A matching is a set of edges no two of which share a vertex; a MAXIMAL
matching admits no further edge. It is the standard coarsening primitive
of multilevel graph partitioners — the reference partitions its data
graph with METIS (``subgraph/divide.py:8-30``), whose coarsening phase
contracts a maximal matching per level — and the classic building block
for distributed independent-set/coloring pipelines.

Distributed shape (handshake): give every edge a deterministic priority
(the repo's portable md5-prefix hash, so an independent SQL engine
reproduces every value); per round, each live vertex points at its
minimum-priority incident edge, and an edge whose BOTH endpoints point at
it is matched; matched vertices leave the graph. With hash (i.e.
effectively random) priorities the expected round count is O(log n) —
adversarial chains that starve id-ordered greedy matchings cannot form,
because priority order is uncorrelated with graph structure.

Every round is two shuffles (per-vertex argmin + handshake join) over the
LIVE edge set only, which shrinks geometrically; at 100 TB the first
round dominates and is a plain groupBy + join over the edge table. The
fixed-round form (``rounds=k``) is what the driver oracle checks — the
same k rounds unrolled in SQL — and ``converged`` reports whether the
matching is already maximal (no live edge left).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .graph import canonical_undirected


def edge_priority(src=None, dst=None, salt: str = "match"):
    """Portable deterministic edge priority in [0, 16^15): md5-prefix of
    ``salt:src_dst`` — identical arithmetic in DuckDB (see
    ``edge_priority_sql``), same family as sampling.split_bucket."""
    src = F.col("src") if src is None else src
    dst = F.col("dst") if dst is None else dst
    s = F.concat(
        F.lit(salt + ":"), src.cast("string"), F.lit("_"), dst.cast("string")
    )
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def edge_priority_sql(src: str = "src", dst: str = "dst", salt: str = "match") -> str:
    return (
        f"(('0x' || substr(md5('{salt}:' || CAST({src} AS VARCHAR) || '_' || "
        f"CAST({dst} AS VARCHAR)), 1, 15))::BIGINT)"
    )


@dataclass
class MatchingResult:
    matched: DataFrame  # (src, dst, rnd) — canonical src<dst, 1-based round
    rounds: int
    converged: bool  # True when no live edge remained after the last round


def handshake_matching(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int = 8,
    salt: str = "match",
    num_partitions: int | None = None,
) -> MatchingResult:
    """Run ``rounds`` handshake rounds over the canonical simple graph and
    return the matched edges with the round each was matched in.

    Determinism: the per-vertex argmin orders by (priority, src, dst) — a
    total order even under hash collisions — so the result is a pure
    function of the edge set, independent of partitioning."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    live = (
        canonical_undirected(edges)
        .withColumn("h", edge_priority(salt=salt))
        .repartition(num_partitions, "src")
        .localCheckpoint(eager=True)
    )
    matched: DataFrame | None = None
    converged = False
    for rnd in range(1, rounds + 1):
        sym = live.select(F.col("src").alias("v"), "src", "dst", "h").unionByName(
            live.select(F.col("dst").alias("v"), "src", "dst", "h")
        )
        w = Window.partitionBy("v").orderBy("h", "src", "dst")
        best = (
            sym.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select("v", "src", "dst")
        )
        m = (
            best.where(F.col("v") == F.col("src"))
            .select("src", "dst")
            .join(
                best.where(F.col("v") == F.col("dst")).select("src", "dst"),
                ["src", "dst"],
                "left_semi",
            )
            .withColumn("rnd", F.lit(rnd).cast("int"))
            .localCheckpoint(eager=True)  # also truncates the round's lineage
        )
        if m.rdd.isEmpty():
            converged = True
            break
        matched = m if matched is None else matched.unionByName(m)
        mv = m.select(F.col("src").alias("v")).unionByName(
            m.select(F.col("dst").alias("v"))
        )
        live = (
            live.join(mv, live.src == mv.v, "left_anti")
            .join(mv, live.dst == mv.v, "left_anti")
            .localCheckpoint(eager=True)
        )
        if live.rdd.isEmpty():
            converged = True
            break
    if matched is None:
        matched = spark.createDataFrame([], "src BIGINT, dst BIGINT, rnd INT")
    return MatchingResult(matched=matched, rounds=rounds, converged=converged)


def matching_oracle_sql(g_sql: str, rounds: int = 8, salt: str = "match") -> str:
    """DuckDB SQL computing the identical matching: the same ``rounds``
    handshake rounds unrolled as CTE chains over the canonical graph."""
    h = edge_priority_sql(salt=salt)
    parts = [
        f"""WITH e0 AS MATERIALIZED (
  SELECT src, dst, {h} AS h FROM (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM ({g_sql}) q WHERE src <> dst
  )
)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        # every CTE is MATERIALIZED: each round references the previous
        # round's relation several times, and inlining would re-evaluate
        # the whole chain per reference (exponential in rounds)
        parts.append(
            f"""
, b{i} AS MATERIALIZED (
  SELECT v, src, dst FROM (
    SELECT v, src, dst,
           row_number() OVER (PARTITION BY v ORDER BY h, src, dst) AS rn
    FROM (SELECT src AS v, src, dst, h FROM e{p}
          UNION ALL SELECT dst AS v, src, dst, h FROM e{p})
  ) WHERE rn = 1
)
, m{i} AS MATERIALIZED (
  SELECT u.src, u.dst, CAST({i} AS INT) AS rnd
  FROM (SELECT src, dst FROM b{i} WHERE v = src) u
  JOIN (SELECT src, dst FROM b{i} WHERE v = dst) w USING (src, dst)
)
, mv{i} AS MATERIALIZED (SELECT src AS v FROM m{i} UNION SELECT dst FROM m{i})
, e{i} AS MATERIALIZED (
  SELECT e.src, e.dst, e.h FROM e{p} e
  WHERE e.src NOT IN (SELECT v FROM mv{i})
    AND e.dst NOT IN (SELECT v FROM mv{i})
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM m{i}" for i in range(1, rounds + 1))
    parts.append(f"\nSELECT src, dst, rnd FROM ({union})")
    return "".join(parts)
