"""Distributed greedy graph coloring — Jones–Plassmann.

A proper coloring (no edge monochromatic) is the standard scheduling
primitive over a link graph: vertices of one color class can be updated /
crawled / recomputed concurrently with no neighbor conflicts. The
Jones–Plassmann (1993) kernel is the classic distributed form of greedy
coloring: per round, every LIVE vertex whose deterministic priority is a
local maximum among live neighbors colors itself with the smallest color
absent from its already-colored neighborhood, then leaves the live set.
Local maxima form an independent set, so a round never colors two
adjacent vertices — the coloring is proper by construction.

Priorities are the repo's portable md5-prefix hashes (same family as
``matching.py``), so an independent SQL engine replays every round
bit-exactly; ties broken by id. With hash priorities the expected round
count is O(log n / log log n); the fixed-round form (``rounds=k``) is
what the driver oracle checks — the same k rounds unrolled in SQL — and
vertices still live after the last round are simply not emitted (both
engines agree on the survivor set).

Scale shape per round: one join+groupBy over the LIVE edge set for the
local-max test, one join over the ready-vertex neighborhood for the
used-color sets (bounded by degree per group; the set of colors a vertex
ever sees is ≤ its degree). The live edge set shrinks geometrically, so
round 1 dominates and is a plain message shuffle over the edge table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._superstep import loop_confs
from .graph import canonical_undirected, kernel_nparts
from .matching import vertex_priority, vertex_priority_sql


@dataclass
class ColoringResult:
    colored: DataFrame  # (id BIGINT, color INT, rnd INT)
    rounds: int
    converged: bool  # True when every vertex was colored


def jp_coloring(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int = 8,
    salt: str = "color",
    num_partitions: int | None = None,
) -> ColoringResult:
    """Proper coloring of the undirected simple graph; see module doc."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = canonical_undirected(edges).repartition(num_partitions, "src")
    # full symmetric adjacency (for used-color lookups against already-
    # colored neighbors) — never shrinks, cached once
    sym = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("nbr"))
        .unionByName(e.select(F.col("dst").alias("v"), F.col("src").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    live_v = (
        sym.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("p", vertex_priority(salt=salt))
        .localCheckpoint(eager=True)
    )
    live_sym = sym
    colored: DataFrame | None = None
    converged = False
    # loop_confs: per-round fresh plans repeat driver-serial
    # Janino/AQE work every round (see _superstep.loop_confs)
    with loop_confs(spark):
        for rnd in range(1, rounds + 1):
            # blocked = live vertices with a live neighbor of higher (p, id)
            pv = live_v.select(F.col("id").alias("v"), F.col("p").alias("pv"))
            pn = live_v.select(F.col("id").alias("nbr"), F.col("p").alias("pn"))
            blocked = (
                live_sym.join(pv, "v")
                .join(pn, "nbr")
                .where(
                    F.struct(F.col("pn"), F.col("nbr"))
                    > F.struct(F.col("pv"), F.col("v"))
                )
                .select(F.col("v").alias("id"))
                .distinct()
            )
            ready = live_v.join(blocked, "id", "left_anti").localCheckpoint(eager=True)
            if ready.isEmpty():
                converged = True
                break
            # smallest color absent from the already-colored neighborhood
            if colored is None:
                newly = ready.select(
                    "id", F.lit(0).alias("color"), F.lit(rnd).cast("int").alias("rnd")
                )
            else:
                used = (
                    sym.join(ready.select(F.col("id").alias("v")), "v")
                    .join(
                        colored.select(F.col("id").alias("nbr"), "color"), "nbr"
                    )
                    .groupBy(F.col("v").alias("id"))
                    .agg(F.collect_set("color").alias("used"))
                )
                mex = F.array_min(
                    F.array_except(
                        F.sequence(F.lit(0), F.size("used")), F.col("used")
                    )
                )
                newly = ready.join(used, "id", "left").select(
                    "id",
                    F.coalesce(mex, F.lit(0)).cast("int").alias("color"),
                    F.lit(rnd).cast("int").alias("rnd"),
                )
            newly = newly.localCheckpoint(eager=True)
            colored = newly if colored is None else colored.unionByName(newly)
            colored = colored.localCheckpoint(eager=True)
            live_v = live_v.join(newly.select("id"), "id", "left_anti").localCheckpoint(
                eager=True
            )
            lv = live_v.select(F.col("id").alias("v"))
            live_sym = (
                live_sym.join(lv, "v", "left_semi")
                .join(lv.withColumnRenamed("v", "nbr"), "nbr", "left_semi")
                .localCheckpoint(eager=True)
            )
            if live_v.isEmpty():
                converged = True
                break
    if colored is None:
        colored = spark.createDataFrame([], "id BIGINT, color INT, rnd INT")
    return ColoringResult(colored=colored, rounds=rounds, converged=converged)


def jp_coloring_oracle_sql(g_sql: str, rounds: int = 8, salt: str = "color") -> str:
    """DuckDB SQL of ``jp_coloring``: the same rounds unrolled, every CTE
    MATERIALIZED so DuckDB does not inline the exponentially-referenced
    round states."""
    p = vertex_priority_sql("id", salt)
    parts = [
        f"""WITH ge AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM ({g_sql}) q WHERE src <> dst
)
, sym AS MATERIALIZED (
  SELECT src AS v, dst AS nbr FROM ge UNION ALL SELECT dst, src FROM ge
)
, v0 AS MATERIALIZED (
  SELECT id, {p} AS p FROM (SELECT src AS id FROM ge UNION SELECT dst FROM ge)
)
, e0 AS MATERIALIZED (SELECT v, nbr FROM sym)
, col0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS INT) AS color,
         CAST(NULL AS INT) AS rnd WHERE false
)"""
    ]
    for i in range(1, rounds + 1):
        q = i - 1
        parts.append(
            f"""
, blocked{i} AS MATERIALIZED (
  SELECT DISTINCT s.v AS id
  FROM e{q} s JOIN v{q} a ON a.id = s.v JOIN v{q} b ON b.id = s.nbr
  WHERE ROW(b.p, s.nbr) > ROW(a.p, s.v)
)
, ready{i} AS MATERIALIZED (
  SELECT id FROM v{q} WHERE id NOT IN (SELECT id FROM blocked{i})
)
, used{i} AS MATERIALIZED (
  SELECT s.v AS id, list(DISTINCT c.color) AS used
  FROM sym s JOIN ready{i} r ON r.id = s.v JOIN col{q} c ON c.id = s.nbr
  GROUP BY s.v
)
, new{i} AS MATERIALIZED (
  SELECT r.id,
         CAST(coalesce(list_min(list_filter(range(0, len(u.used) + 2),
              x -> NOT list_contains(u.used, x))), 0) AS INT) AS color,
         CAST({i} AS INT) AS rnd
  FROM ready{i} r LEFT JOIN used{i} u ON u.id = r.id
)
, col{i} AS MATERIALIZED (
  SELECT * FROM col{q} UNION ALL SELECT * FROM new{i}
)
, v{i} AS MATERIALIZED (
  SELECT v.id, v.p FROM v{q} v WHERE v.id NOT IN (SELECT id FROM new{i})
)
, e{i} AS MATERIALIZED (
  SELECT e.v, e.nbr FROM e{q} e
  WHERE e.v IN (SELECT id FROM v{i}) AND e.nbr IN (SELECT id FROM v{i})
)"""
        )
    parts.append(f"\nSELECT id, color, rnd FROM col{rounds}")
    return "".join(parts)
