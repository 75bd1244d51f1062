"""Connected components via hash-min message passing.

The reference computes weakly-connected components as the blocking
structure for all RWR work (``patternmatching/gray/rwr.py:26,56-61``;
work-splitting ``parallel/gray_mp.py:172-178``) with a NetworkX library
call. Our distributed kernel: every vertex starts labeled with its own id
and repeatedly adopts ``min(own, neighbors')`` until a fixpoint — each
superstep is one join + one min-aggregate over the once-shuffled adjacency.

Frontier-restricted and exact: only vertices whose component label changed
in the previous superstep send messages (an unchanged vertex cannot improve
a neighbor), so work decays as components settle — the reference's
partial-execution idea (O2 in SURVEY.md §4) realized exactly, not
approximately. Kill/resume carries the (component, changed) state so
settled vertices are never recomputed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lineage import LineageLog, SuperstepStats
from ._superstep import commit_and_stats, edge_partition_counts
from .graph import partitioned_adjacency, vertex_ids


def _cc_step(state: DataFrame, adj: DataFrame, n_parts: int | None = None) -> DataFrame:
    # only vertices that improved last round can improve a neighbor
    frontier = state.where("changed").select(
        F.col("id").alias("src"), F.col("component").alias("cand")
    )
    raw = adj.join(frontier.hint("shuffle_hash"), "src").select("dst", "cand")
    # repartition-then-min: avoids V×P map-side combine output (see
    # pagerank._group_sum); layout pinned to the adjacency's partition
    # count, not the session shuffle default (pagerank.py does the same)
    msgs = (
        (raw.repartition(n_parts, "dst") if n_parts else raw.repartition("dst"))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("cand").alias("cand"))
    )
    return state.join(msgs, "id", "left").select(
        "id",
        F.least(
            F.col("component"), F.coalesce(F.col("cand"), F.col("component"))
        ).alias("component"),
        (F.coalesce(F.col("cand"), F.col("component")) < F.col("component")).alias(
            "changed"
        ),
    )


@dataclass
class ComponentsResult:
    components: DataFrame  # (id BIGINT, component BIGINT) — component = min member id
    supersteps: int
    converged: bool
    resumed_from: int | None
    stats: list[SuperstepStats] = field(default_factory=list)


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_iter: int = 100,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    steps_per_commit: int = 1,
) -> ComponentsResult:
    """Hash-min WCC. Edge direction is ignored (weak connectivity,
    matching the reference's ``to_directed`` + WCC)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    adj = partitioned_adjacency(edges, num_partitions, directed=False).persist()
    verts = vertex_ids(adj).repartition(num_partitions, "id").persist()
    edge_parts = edge_partition_counts(adj)

    log = LineageLog(spark, checkpoint_dir)
    start_step, resumed_from = 0, None
    state: DataFrame | None = None
    if resume and checkpoint_dir:
        last = log.last_committed()
        if last is not None:
            state = log.load_state(last)
            start_step, resumed_from = last + 1, last
    if state is None:
        state = verts.select(
            "id", F.col("id").alias("component"), F.lit(True).alias("changed")
        ).localCheckpoint(eager=True)

    converged = False
    step = start_step
    while step < max_iter:
        t0 = time.time()
        block = min(steps_per_commit, max_iter - step)
        new_state, intermediates = state, []
        for b in range(block):
            new_state = _cc_step(new_state, adj, num_partitions)
            if b < block - 1:
                new_state = new_state.persist()  # keep unrolled plan linear
                intermediates.append(new_state)
        step += block
        state, delta, _ = commit_and_stats(
            log, step - 1, new_state,
            F.col("changed").cast("double"), F.col("changed"), edge_parts, t0,
            num_partitions=num_partitions,
        )
        for df in intermediates:
            df.unpersist()
        if delta == 0.0:
            converged = True
            break
    adj.unpersist()
    verts.unpersist()
    result = ComponentsResult(
        state.select("id", "component"), step, converged, resumed_from
    )
    result.stats = log.stats
    return result


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, size) — the reference's community-size statistic input
    (``gray_incremental.py:92-96``)."""
    return components.groupBy("component").agg(F.count("*").alias("size"))


def median_component_size(components: DataFrame, min_size: int = 2) -> float:
    """Median size over components of ≥ min_size members — mirrors
    ``statistics.median([len(c) for c in wccs if len(c) > 1])``
    (``gray_incremental.py:92-96``) via ``percentile_approx`` at scale."""
    row = (
        component_sizes(components)
        .where(F.col("size") >= min_size)
        .agg(F.percentile_approx("size", 0.5, 10000).alias("m"))
        .first()
    )
    return float(row["m"]) if row["m"] is not None else float("nan")
