"""Per-superstep checkpoint + lineage bookkeeping.

The reference checkpoints RWR/EXTRACT state as per-process pickles and
reloads them on restart (``patternmatching/gray/rwr.py:34-54``,
``parallel/gray_mp_rl.py:29-35``). Our equivalent is table-valued:

* state tables (ranks / components / labels) written to
  ``<dir>/state/superstep=K/`` as parquet (Iceberg-shaped: on a real
  cluster these are `writeTo(...).createOrReplace()` Iceberg snapshots);
* one lineage row per (superstep, partition): partition id, edge count,
  delta-norm, wall-time — the north rule's resumability evidence;
* a commit marker written only AFTER the state parquet commit, so a crash
  between the two leaves a resumable prefix (never a torn superstep).

Resume = read the newest committed superstep and continue; vertices whose
state already converged are carried, not recomputed (kernel-specific
frontier logic lives with each kernel).

The parquet write/read round-trip doubles as the lineage-truncation
barrier that iterative Spark needs (the classic plan-blowup failure mode).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SuperstepStats:
    superstep: int
    delta_norm: float
    active_vertices: int
    wall_time_sec: float
    partition_stats: list[dict] = field(default_factory=list)


class LineageLog:
    """Checkpoint directory manager. ``base_dir=None`` → in-memory only
    (localCheckpoint truncation, no resume)."""

    def __init__(self, spark: SparkSession, base_dir: str | None):
        self.spark = spark
        self.base_dir = base_dir
        self.stats: list[SuperstepStats] = []
        if base_dir:
            os.makedirs(os.path.join(base_dir, "state"), exist_ok=True)
            os.makedirs(os.path.join(base_dir, "lineage"), exist_ok=True)

    # -- state tables -------------------------------------------------
    def _state_path(self, superstep: int) -> str:
        return os.path.join(self.base_dir, "state", f"superstep={superstep}")

    def _marker_path(self, superstep: int) -> str:
        return os.path.join(self.base_dir, f"_committed_{superstep}.json")

    def commit_state(
        self,
        superstep: int,
        state: DataFrame,
        stats: SuperstepStats,
        partition_key: str | None = None,
        num_partitions: int | None = None,
    ) -> DataFrame:
        """Materialize a superstep's state (durable parquet, or in-memory
        when no checkpoint dir). The superstep is NOT resumable until
        ``finalize`` runs.

        In-memory mode is a plain eager localCheckpoint: it truncates the
        (otherwise doubling-per-superstep) logical plan. It also erases
        partitioning metadata, costing the state-side exchanges each
        superstep — preserving the partitioning via repartition+persist
        chains was measured SLOWER here (extra exchange + cache churn beat
        the elision win at V ≪ E), so the simple barrier stays.
        ``partition_key``/``num_partitions`` are accepted for future
        layouts where the trade flips (e.g. V-heavy graphs).
        """
        self.stats.append(stats)
        if not self.base_dir:
            # NOTE on stats hygiene: localCheckpoint's LogicalRDD leaf
            # inherits the child plan's ESTIMATED sizeInBytes
            # (LogicalRDD.rewriteStatsAndConstraints), and join-bearing
            # supersteps estimate it as the PRODUCT of their inputs — a
            # self-joining kernel squares it every commit, the BigInt's
            # digit count doubles per iteration, and the driver ends up
            # multiplying million-digit numbers inside the stats visitor
            # (measured: 16 s → 44 s → 109 s per superstep on 9k rows).
            # Kernels whose step references state more than once MUST
            # materialize a cache before committing (commit_and_stats
            # does this by running the stats job on a persisted state
            # first) so the leaf inherits real InMemoryRelation bytes.
            # Linear-plan kernels (pagerank's value/delta steps) commit
            # here directly: their estimate grows additively in digits,
            # which stays harmless for hundreds of supersteps.
            #
            # coalesce bounds the checkpointed PARTITION count at the
            # kernel's declared width: a state plan that unions several
            # state-derived branches normally ends each branch at a fresh
            # shuffle (constant width), but a session-level plan change —
            # e.g. a leaked cached edge subtree giving Catalyst accurate
            # small stats and flipping a shuffle join to broadcast — makes
            # branches inherit the carried state's partitioning, and the
            # per-commit union then grows (×branches)^superstep partitions
            # (measured as a 3.6M-task stage storm in the onion peel).
            # Narrow coalesce (no shuffle) is a no-op when width is
            # already ≤ num_partitions.
            if num_partitions:
                state = state.coalesce(num_partitions)
            return state.localCheckpoint(eager=True)
        path = self._state_path(superstep)
        state.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def release(self) -> None:
        """Unpersist any in-memory states still held (call at kernel end;
        the final state stays usable — Spark recomputes from the truncated
        plan if its cache is gone, callers typically re-persist it)."""
        for df in getattr(self, "_mem_states", [])[:-1]:
            df.unpersist()
        self._mem_states = getattr(self, "_mem_states", [])[-1:]

    def finalize(self, superstep: int, stats: SuperstepStats) -> None:
        """Write lineage rows + the commit marker — strictly AFTER the state
        parquet commit and stats computation, so a crash anywhere earlier
        leaves a cleanly resumable prefix (never a torn superstep)."""
        if not self.base_dir:
            return
        lineage_rows = [
            {
                "superstep": superstep,
                "partition_id": int(p.get("partition_id", -1)),
                "edge_count": int(p.get("edge_count", 0)),
                "delta_norm": float(p.get("delta_norm", 0.0)),
                "wall_time_sec": float(stats.wall_time_sec),
            }
            for p in (stats.partition_stats or [{"partition_id": -1}])
        ]
        self.spark.createDataFrame(
            lineage_rows,
            "superstep INT, partition_id INT, edge_count BIGINT, delta_norm DOUBLE, wall_time_sec DOUBLE",
        ).coalesce(1).write.mode("append").parquet(os.path.join(self.base_dir, "lineage"))
        # marker last: a superstep is resumable only once fully durable
        with open(self._marker_path(superstep), "w") as f:
            json.dump(
                {
                    "superstep": superstep,
                    "delta_norm": stats.delta_norm,
                    "active_vertices": stats.active_vertices,
                    "wall_time_sec": stats.wall_time_sec,
                    "committed_at": time.time(),
                },
                f,
            )

    def last_committed(self) -> int | None:
        """Newest superstep with a commit marker, or None."""
        if not self.base_dir:
            return None
        best = None
        for name in os.listdir(self.base_dir):
            if name.startswith("_committed_") and name.endswith(".json"):
                k = int(name[len("_committed_") : -len(".json")])
                best = k if best is None else max(best, k)
        return best

    def load_state(self, superstep: int) -> DataFrame:
        return self.spark.read.parquet(self._state_path(superstep))

    def lineage_df(self) -> DataFrame | None:
        if not self.base_dir:
            return None
        return self.spark.read.parquet(os.path.join(self.base_dir, "lineage"))
