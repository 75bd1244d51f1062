"""Strongly connected components — min-label coloring (FW-BW-MIN).

WCC (``components.py``) ignores direction; directed link graphs (imports,
citations, follows) also need SCC. The classic distributed algorithm
(Orzan's coloring / FW-BW-MIN — the standard choice when you only have
message passing, e.g. Pregel-style systems) runs in phases over the
ALIVE subgraph:

1. **Color**: propagate ``color(v) = min(color(v), colors of in-neighbors)``
   along edge direction to fixpoint — each vertex ends with the smallest
   alive id that can reach it forward.
2. **Mark**: the pivot of color c is vertex c itself. Propagate a mark
   from each pivot BACKWARD, restricted to same-colored vertices, to
   fixpoint. Marked vertices of color c are mutually reachable with the
   pivot (forward via coloring, backward via marking) — exactly SCC(c).
3. Emit marked vertices (scc id = their color), remove them, repeat.

Every phase is the same frontier-restricted join+min-aggregate superstep
the WCC kernel runs (one shuffle per sweep, layout pinned to the
adjacency); phases shrink the alive set monotonically. Worst case (a long
path DAG) is O(V) phases — like every pivot-based SCC scheme — but each
phase then costs O(alive) only; cycle-rich graphs finish in a few
phases. ``max_phases`` guards the pathological case loudly.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class SccResult:
    components: DataFrame  # (id BIGINT, scc BIGINT) — scc = min member id
    phases: int
    supersteps: int
    converged: bool
    stats: list = field(default_factory=list)


def _min_prop_fix(
    state: DataFrame,
    adj: DataFrame,
    num_partitions: int,
    max_iter: int,
) -> tuple[DataFrame, int]:
    """Run color(v) ← min(color(v), min over edges (u,v) of color(u)) to
    fixpoint, frontier-restricted. state: (id, color, changed)."""
    steps = 0
    while steps < max_iter:
        frontier = state.where("changed").select(
            F.col("id").alias("src"), F.col("color").alias("cand")
        )
        raw = adj.join(frontier.hint("shuffle_hash"), "src").select("dst", "cand")
        msgs = (
            raw.repartition(num_partitions, "dst")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cand").alias("cand"))
        )
        state = state.join(msgs, "id", "left").select(
            "id",
            F.least(
                F.col("color"), F.coalesce(F.col("cand"), F.col("color"))
            ).alias("color"),
            (F.coalesce(F.col("cand"), F.col("color")) < F.col("color")).alias(
                "changed"
            ),
        ).localCheckpoint(eager=True)
        steps += 1
        if state.where("changed").limit(1).count() == 0:
            return state, steps
    raise RuntimeError(f"min-propagation did not converge in {max_iter} sweeps")


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_phases: int = 50,
    max_iter: int = 200,
    num_partitions: int | None = None,
) -> SccResult:
    """(id, scc) over the directed simple graph; scc = min member id
    (matching ``nx.strongly_connected_components`` up to labeling)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    fwd = e.repartition(num_partitions, "src").persist()
    alive = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(num_partitions, "id")
        .localCheckpoint(eager=True)
    )

    done: DataFrame | None = None
    phases = supersteps = 0
    converged = False
    t0 = time.time()
    while phases < max_phases:
        if alive.limit(1).count() == 0:
            converged = True
            break
        phases += 1
        # restrict both edge directions to the alive subgraph
        fa = (
            fwd.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        ba = fa.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        # 1. forward min-coloring
        color0 = alive.select(
            "id", F.col("id").alias("color"), F.lit(True).alias("changed")
        ).localCheckpoint(eager=True)
        colored, s1 = _min_prop_fix(color0, fa, num_partitions, max_iter)
        supersteps += s1
        # 2. backward pivot marking within same color: encode "marked with
        # color c" as color value c, unmarked as null, and reuse min-prop
        # on the color-respecting backward edges
        same_color = (
            ba.join(
                colored.select(F.col("id").alias("src"), F.col("color").alias("_cs")),
                "src",
            )
            .join(
                colored.select(F.col("id").alias("dst"), F.col("color").alias("_cd")),
                "dst",
            )
            .where(F.col("_cs") == F.col("_cd"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        mark0 = colored.select(
            "id",
            F.when(F.col("id") == F.col("color"), F.col("color")).alias("m"),
            (F.col("id") == F.col("color")).alias("changed"),
        ).select(
            "id", F.coalesce(F.col("m"), F.lit(2**62)).alias("color"), "changed"
        ).localCheckpoint(eager=True)
        marked, s2 = _min_prop_fix(mark0, same_color, num_partitions, max_iter)
        supersteps += s2
        # marked < sentinel ⇒ pivot's color reached v backward within its
        # color class ⇒ v ∈ SCC(pivot). (min over marks is safe: within a
        # color class the only possible mark is the class's pivot color.)
        scc_now = marked.where(F.col("color") < F.lit(2**62)).select(
            "id", F.col("color").alias("scc")
        )
        done = scc_now if done is None else done.unionByName(scc_now)
        done = done.localCheckpoint(eager=True)
        alive = (
            alive.join(scc_now.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
    fwd.unpersist()
    if not converged and alive.limit(1).count() > 0:
        raise RuntimeError(
            f"SCC did not finish in {max_phases} phases — pathological "
            "pivot chain; raise max_phases"
        )
    result = SccResult(done, phases, supersteps, True)
    result.stats.append({"wall_sec": round(time.time() - t0, 3)})
    return result
