"""Deterministic synchronous label propagation (community detection).

Plays the role of the reference's recursive Louvain community scoping
(``patternmatching/gray/incremental/query_call.py:130-165``, duplicated at
``incremental/rl_model.py:13-69``): the reference picks "affected regions"
as the union of communities touched by new edges. Louvain is inherently
order-dependent (asynchronous greedy); per SURVEY.md §7 risk (4) we pin a
*synchronous, deterministic* LPA as the spec'd semantics so results are
reproducible across partitionings and cluster sizes:

    label'(v) = the neighbor label with the highest count;
                ties broken by the smallest label;
                vertices with no neighbors keep their label.

Each superstep = one join over the once-shuffled adjacency + a count
aggregate + a window argmax (A9's tie pattern, ``gray_multiple.py:436-441``,
here with exact deterministic ordering). The iteration count bounds
community diameter — the knob that replaces the reference's RL-tuned
community-size threshold (SURVEY.md §3.3) with deterministic control.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..lineage import LineageLog, SuperstepStats
from ._superstep import commit_and_stats, edge_partition_counts
from .graph import partitioned_adjacency, vertex_ids


def _lpa_step(state: DataFrame, adj: DataFrame, n_parts: int | None = None) -> DataFrame:
    raw = adj.join(
        state.select(F.col("id").alias("src"), "label").hint("shuffle_hash"), "src"
    ).select("dst", "label")
    # repartition-then-count: (dst,label) keys have near-edge cardinality,
    # so map-side combine buys nothing and costs V×P (pagerank._group_sum);
    # layout pinned to the adjacency's partition count (pagerank.py ditto)
    hist = (
        (raw.repartition(n_parts, "dst") if n_parts else raw.repartition("dst"))
        .groupBy(F.col("dst").alias("id"), "label")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))
    best = (
        hist.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("id", F.col("label").alias("new_label"))
    )
    return state.join(best, "id", "left").select(
        "id",
        F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
        (F.coalesce(F.col("new_label"), F.col("label")) != F.col("label")).alias(
            "changed"
        ),
    )


@dataclass
class LabelPropResult:
    labels: DataFrame  # (id BIGINT, label BIGINT)
    supersteps: int
    converged: bool
    resumed_from: int | None
    stats: list[SuperstepStats] = field(default_factory=list)


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_iter: int = 10,
    stop_on_stable: bool = True,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    steps_per_commit: int = 1,
) -> LabelPropResult:
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
            "id", F.col("id").alias("label"), F.lit(True).alias("changed")
        ).localCheckpoint(eager=True)

    converged = False
    step = start_step
    while step < max_iter:
        t0 = time.time()
        block = min(steps_per_commit, max_iter - step)
        new_state, intermediates = state, []
        for b in range(block):
            new_state = _lpa_step(new_state, adj, num_partitions)
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
        if stop_on_stable and delta == 0.0:
            converged = True
            break
    adj.unpersist()
    verts.unpersist()
    result = LabelPropResult(state.select("id", "label"), step, converged, resumed_from)
    result.stats = log.stats
    return result
