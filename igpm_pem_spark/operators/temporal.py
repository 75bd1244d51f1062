"""Time-respecting reachability — earliest-arrival over timestamped edges.

A temporal link graph (crawl snapshots, commit streams, citation dates)
supports paths only where timestamps are non-decreasing along the walk: an
edge (u, v, t) is traversable iff the walker is at u no later than t, and
taking it puts the walker at v at time t. The earliest-arrival fixpoint

    arrival(v) = min over edges (u, v, t) with t >= arrival(u) of t

is the temporal analogue of SSSP (Wu et al., VLDB 2014, "Path Problems in
Temporal Graphs") and the primitive behind influence windows, temporal
diameter, and "when could this page first have been reached from the seed
set". The reference replays arrival buckets but never answers
time-respecting reachability (``incremental/gray_incremental.py`` treats
each cumulative snapshot statically); the relational form below gets it
with the same frontier-restricted superstep as the SSSP kernel.

Correctness of the frontier restriction: arrival times are monotone
non-increasing per vertex, and a smaller arrival is always at least as
permissive (t >= a is implied by t >= a' when a' <= a), so min-merging
candidates per superstep and relaxing only improved vertices explores
every time-respecting path — the same optimal substructure argument as
(min, +). Arrival times are input timestamps VERBATIM (never sums), so
the fixpoint is engine-exact and mirrorable by a bounded recursive-CTE
oracle that min-merges per level.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .graph import kernel_nparts

from ..lineage import LineageLog, SuperstepStats
from ._superstep import commit_and_stats, edge_partition_counts, loop_confs


@dataclass
class EarliestArrivalResult:
    arrivals: DataFrame  # (id BIGINT, arrival BIGINT) — reached only
    supersteps: int
    converged: bool
    stats: list[SuperstepStats] = field(default_factory=list)


def _ea_step(state: DataFrame, adj: DataFrame, num_partitions: int) -> DataFrame:
    """One temporal relaxation: improved vertices push every out-edge
    whose timestamp is at or after their arrival; the edge timestamp IS
    the candidate arrival at the head."""
    frontier = state.where("changed").select(
        F.col("id").alias("src"), F.col("arrival").alias("a0")
    )
    raw = (
        adj.join(frontier.hint("shuffle_hash"), "src")
        .where(F.col("ts") >= F.col("a0"))
        .select("dst", F.col("ts").alias("cand"))
    )
    msgs = (
        raw.repartition(num_partitions, "dst")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("cand").alias("cand"))
    )
    return state.join(msgs, "id", "full").select(
        "id",
        F.least(
            F.coalesce(F.col("arrival"), F.col("cand")),
            F.coalesce(F.col("cand"), F.col("arrival")),
        ).alias("arrival"),
        (
            F.col("arrival").isNull()
            | (F.coalesce(F.col("cand"), F.col("arrival")) < F.col("arrival"))
        ).alias("changed"),
    )


def earliest_arrival(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    *,
    ts_col: str = "ts",
    start_ts: int = 0,
    directed: bool = True,
    max_iter: int = 100,
    num_partitions: int | None = None,
    steps_per_commit: int = 4,
) -> EarliestArrivalResult:
    """Earliest-arrival times from a seed set released at ``start_ts``.

    Edges are directed by default (temporal semantics are rarely
    symmetric); ``directed=False`` symmetrizes instances, keeping each
    (src, dst, ts) occurrence. Parallel edge instances between the same
    endpoints at different times are the POINT of the model and are all
    kept; duplicates of the same (src, dst, ts) collapse. Seeds below
    their own ``start_ts`` trivially arrive at ``start_ts``; vertices
    with no time-respecting path from any seed are absent."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = edges.select(
        "src", "dst", F.col(ts_col).cast("long").alias("ts")
    ).where(F.col("src") != F.col("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "ts")
        )
    adj = e.distinct().repartition(num_partitions, "src").persist()
    edge_parts = edge_partition_counts(adj)
    log = LineageLog(spark, None)

    state = spark.createDataFrame(
        [(int(s), int(start_ts), True) for s in sources],
        "id BIGINT, arrival BIGINT, changed BOOLEAN",
    ).repartition(num_partitions, "id").localCheckpoint(eager=True)

    converged, step = False, 0
    # AQE + codegen off for the loop (see pagerank's loop note)
    with loop_confs(spark):
        while step < max_iter:
            t0 = time.time()
            block = min(steps_per_commit, max_iter - step)
            new_state, intermediates = state, []
            for b in range(block):
                new_state = _ea_step(new_state, adj, num_partitions)
                if b < block - 1:
                    # lazy localCheckpoint: truncate the LOGICAL plan (see
                    # the pagerank/sssp block loops for the measured why)
                    new_state = new_state.localCheckpoint(eager=False)
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
    result = EarliestArrivalResult(
        state.select("id", "arrival"), step, converged
    )
    result.stats = log.stats
    return result


def interarrival_burstiness(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 4,
) -> DataFrame:
    """Goh-Barabasi burstiness of per-entity event inter-arrival times:
    ``(entity, n_gaps, mean_gap_s6, sd_gap_s6, burstiness6)`` with
    B = (sigma - mu) / (sigma + mu) over the entity's gap distribution —
    B -> -1 for a metronome, 0 for a Poisson process, -> +1 for extreme
    bursts (Goh & Barabasi, EPL 81 (2008): "Burstiness and memory in
    complex systems"). The temporal-stream analogue of the degree-Gini
    skew gate: a crawl/commit stream whose hot entities are bursty wants
    event-time windows sized to the burst, not the mean.

    Gaps are computed in integer microseconds (``unix_micros``) then
    scaled to seconds, so the lag arithmetic is exact and engine-
    portable; the per-entity ordering tie-break (ts, id) is total.
    Scale shape: one window shuffle keyed on the entity (the same
    partitioning every per-entity sessionization already uses) followed
    by a map-side-combinable aggregate; entities below ``min_gaps``
    gaps are filtered before output. sigma is the SAMPLE stddev."""
    w = Window.partitionBy("ent").orderBy("us", "eid")
    gaps = (
        events.select(
            F.col(entity_col).alias("ent"),
            # cast handles TIMESTAMP_NTZ parquet columns; gaps are
            # differences, so any fixed zone offset cancels
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
            F.col(id_col).alias("eid"),
        )
        .withColumn("gap_s", (F.col("us") - F.lag("us").over(w)) / F.lit(1000000.0))
        .where(F.col("gap_s").isNotNull())
    )
    stats = gaps.groupBy("ent").agg(
        F.count("*").alias("n_gaps"),
        F.avg("gap_s").alias("m"),
        F.stddev_samp("gap_s").alias("sd"),
    )
    b = F.when(
        F.col("sd") + F.col("m") > 0,
        (F.col("sd") - F.col("m")) / (F.col("sd") + F.col("m")),
    ).otherwise(F.lit(0.0))
    return stats.where(F.col("n_gaps") >= min_gaps).select(
        F.col("ent").alias(entity_col),
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.round("m", 6).alias("mean_gap_s6"),
        F.round("sd", 6).alias("sd_gap_s6"),
        F.round(b, 6).alias("burstiness6"),
    )
