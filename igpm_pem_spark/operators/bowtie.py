"""Bow-tie decomposition of a directed graph — the canonical web-scale
link-graph structure analysis (Broder et al., "Graph structure in the
web"): every vertex is classified relative to the largest strongly
connected component as

* ``core``          — member of the largest SCC
* ``in``            — reaches the core, not in it
* ``out``           — reached from the core, not in it
* ``tube``          — on an IN→OUT path that bypasses the core
* ``tendril``       — hangs off IN (forward) or off OUT (backward)
* ``disconnected``  — none of the above

Computation: one SCC run (operators/scc.py) plus four frontier-BFS
reachability fixpoints (forward/backward from the core, forward from
IN, backward from OUT). Each BFS level is one equi-join + anti-join +
distinct — the same superstep shape as the A5 hash-min kernel, so work
per level is O(frontier-adjacent edges), never the full graph, and the
whole decomposition is message-passing joins end to end.

Classification is a single when-chain evaluated in the fixed order
core → in → out → tube → tendril → disconnected, which is also the
order the DuckDB oracle's CASE uses — the two engines agree exactly on
every vertex.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._superstep import loop_confs
from .graph import kernel_nparts

from .scc import strongly_connected_components


def _reach(
    edges: DataFrame, seeds: DataFrame, num_partitions: int, batch: int = 3
) -> DataFrame:
    """(id): vertices reachable from ``seeds`` (seeds included) over the
    directed edge relation — frontier BFS to fixpoint.

    ``batch`` levels are expanded lazily per materialization (the
    steps_per_commit trick from the iterative kernels): one checkpoint +
    one count job per batch instead of two jobs per level, which is what
    dominates wall time on deep, small frontiers."""
    visited = seeds.select("id").distinct().localCheckpoint(eager=True)
    n_visited = visited.count()
    frontier = visited
    # AQE + codegen off for the BFS loop (see pagerank's loop note)
    with loop_confs(edges.sparkSession):
        while True:
            vis = visited
            for _ in range(batch):
                frontier = (
                    edges.join(frontier.withColumnRenamed("id", "src"), "src")
                    .select(F.col("dst").alias("id"))
                    .distinct()
                    .join(vis, "id", "left_anti")
                )
                vis = vis.unionByName(frontier)
            vis = (
                vis.repartition(num_partitions, "id").localCheckpoint(eager=True)
            )
            n_now = vis.count()
            if n_now == n_visited:
                return visited
            # next batch expands from everything newly discovered this batch
            frontier = vis.join(visited, "id", "left_anti")
            visited, n_visited = vis, n_now


@dataclass
class BowtieResult:
    classes: DataFrame  # (id, cls)
    core_scc: int       # label (min member id) of the core SCC


def bowtie_decomposition(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
) -> BowtieResult:
    """(id, cls) per vertex of the directed simple graph; core = largest
    SCC, ties broken toward the smaller SCC label (min member id) —
    deterministic in any engine."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(num_partitions, "src")
        .persist()
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).repartition(num_partitions, "src").persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )

    scc = strongly_connected_components(
        spark, e, num_partitions=num_partitions
    ).components.persist()
    top = (
        scc.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .first()
    )
    core_label = int(top["scc"])
    core = scc.where(F.col("scc") == core_label).select("id").persist()

    fwd = _reach(e, core, num_partitions)          # reached from core
    bwd = _reach(rev, core, num_partitions)        # reaching core
    outs = fwd.join(core, "id", "left_anti").persist()
    ins = bwd.join(core, "id", "left_anti").persist()
    fin = _reach(e, ins, num_partitions)           # forward from IN
    bout = _reach(rev, outs, num_partitions)       # backward from OUT

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("id", F.lit(True).alias(name))

    j = (
        verts.join(flag(core, "is_core"), "id", "left")
        .join(flag(ins, "is_in"), "id", "left")
        .join(flag(outs, "is_out"), "id", "left")
        .join(flag(fin, "is_fin"), "id", "left")
        .join(flag(bout, "is_bout"), "id", "left")
    )
    cls = (
        F.when(F.col("is_core"), "core")
        .when(F.col("is_in"), "in")
        .when(F.col("is_out"), "out")
        .when(F.col("is_fin") & F.col("is_bout"), "tube")
        .when(F.col("is_fin") | F.col("is_bout"), "tendril")
        .otherwise("disconnected")
    )
    out = j.select("id", cls.alias("cls")).localCheckpoint(eager=True)
    for df in (e, rev, verts, scc, core, outs, ins):
        df.unpersist()
    return BowtieResult(out, core_label)
