"""Temporal edge storage partitioned by arrival step — SURVEY P5's
partition-pruned temporal slices, delivered at the STORAGE layer.

The incremental/streaming replay loops filter ``edges.where(ts <= cut)``
once per arriving bucket. Over an unpartitioned table every step re-scans
the full edge set just to discard most of it; at 100 TB that is the
dominant per-step cost. Writing the edge table ``partitionBy(ts)`` turns
those filters into partition pruning: the scan for step k reads exactly
the k+1 ts directories (``PartitionFilters`` in the plan, fewer
``inputFiles``), so replay I/O grows with the replayed prefix instead of
rescanning everything per step — and the per-bucket filter
``ts == cut`` reads ONE directory.

The reference replays its dynamic datasets from a single CSV re-filtered
per step (``incremental/query_call.py:180-258``); this is the
Spark-native equivalent of materializing its per-step buckets.

No custom reader: ``load_ts_partitioned`` returns a plain DataFrame and
every downstream ``where(ts <= cut)`` — incremental_pagerank,
incremental_components, incremental_pattern_match, the streaming replay —
prunes automatically. Tests pin the pruning (inputFiles shrink and the
plan carries PartitionFilters) and result equality with the
unpartitioned path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_ts_partitioned(
    edges: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write an edge table partitioned by its arrival-step column."""
    edges.write.partitionBy(ts_col).mode(mode).parquet(path)


def load_ts_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a ts-partitioned edge table; ``where(ts <= cut)`` on the
    result is partition-pruned (the point of this layout)."""
    return spark.read.parquet(path)
