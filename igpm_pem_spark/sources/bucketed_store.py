"""Bucketed edge storage — the cross-run answer to the adjacency shuffle.

The kernels shuffle the edge table by ``src`` once per RUN
(``partitioned_adjacency``). At 100 TB that one shuffle is still the
single largest cost of every job that touches the graph. Writing the edge
table ``bucketBy(src)`` moves it to WRITE TIME: every later run's
src-keyed join or aggregation reads the bucket layout straight off
storage — Catalyst plans them with NO Exchange on the bucketed side
(plan-pinned by tests). This is the Spark-native equivalent of the
reference's persisted METIS partitioning (``subgraph/divide.py:8-30``):
partition once, reuse forever.

Works through the session catalog's managed parquet tables (no Hive
needed); on a real deployment the same call shape targets an Iceberg
table with a bucket partition transform.

When to use which store:
* ``temporal_store``  — replay/streaming reads sliced by ``ts`` →
  partitionBy(ts) directory pruning.
* ``bucketed_store``  — iterative kernels / src-keyed analytics over a
  stable graph → bucketBy(src) shuffle elision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_edges(
    edges: DataFrame, table: str, num_buckets: int, sort: bool = True
) -> None:
    """Persist an edge table bucketed (and optionally sorted) by ``src``.

    ``num_buckets`` should match the kernels' ``num_partitions`` so the
    on-disk layout IS the layout every superstep aggregates into."""
    w = edges.write.format("parquet").bucketBy(num_buckets, "src")
    if sort:
        w = w.sortBy("src")
    w.mode("overwrite").saveAsTable(table)


def load_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed edge table; src-keyed joins/aggregations over the
    result run without an Exchange on this side."""
    return spark.table(table)
