"""Shared superstep bookkeeping: commit state + one stats job.

Every kernel commits its new state (parquet round-trip or localCheckpoint —
the lineage-truncation barrier) and then runs a SINGLE aggregation job,
grouped by physical partition id, that yields the global delta norm, the
active-vertex count, and the per-partition lineage rows in one pass.
Keeping the superstep at two Spark jobs (materialize + stats) is what makes
driver-side iteration cheap enough for hundreds of supersteps.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, functions as F

from ..lineage import LineageLog, SuperstepStats


def commit_and_stats(
    log: LineageLog,
    step: int,
    new_state: DataFrame,
    delta_expr: Column,
    active_expr: Column,
    edge_parts: dict[int, int],
    t0: float,
    partition_key: str | None = "id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, float, int]:
    """Materialize ``new_state``, aggregate ``delta_expr`` / ``active_expr``
    per physical partition in one job, then finalize the superstep's
    lineage rows + commit marker. Returns (committed_state, delta,
    n_active). The stats job doubles as the cache-population action for
    in-memory commits."""
    if num_partitions is None:
        num_partitions = new_state.sparkSession.sparkContext.defaultParallelism
    committed = log.commit_state(
        step, new_state, SuperstepStats(step, -1.0, -1, 0.0),
        partition_key=partition_key, num_partitions=num_partitions,
    )
    rows = (
        committed.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.sum(delta_expr).alias("d"),
            F.sum(active_expr.cast("long")).alias("a"),
        )
        .collect()
    )
    delta = sum(float(r["d"] or 0.0) for r in rows)
    active = sum(int(r["a"] or 0) for r in rows)
    st = log.stats[-1]
    st.delta_norm, st.active_vertices = delta, active
    st.partition_stats = [
        {
            "partition_id": int(r["pid"]),
            "edge_count": edge_parts.get(int(r["pid"]), 0),
            "delta_norm": float(r["d"] or 0.0),
        }
        for r in rows
    ]
    st.wall_time_sec = time.time() - t0
    log.finalize(step, st)
    return committed, delta, active


def edge_partition_counts(adj: DataFrame) -> dict[int, int]:
    return {
        int(r["pid"]): int(r["cnt"])
        for r in adj.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
