"""P5 at the storage layer: ts-partitioned edge tables must partition-prune
temporal slice filters, and the incremental replay must run through the
partitioned layout unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from igpm_pem_spark.sources.fixtures import ba_graph
from igpm_pem_spark.sources.temporal_store import (
    load_ts_partitioned,
    save_ts_partitioned,
)


def _dyn_edges(spark):
    _, edges, _ = ba_graph(spark, 120, 3, seed=3)
    return edges.withColumn("ts", (F.col("src") % 4).cast("int"))


def test_ts_slice_is_partition_pruned(spark, tmp_path):
    edges = _dyn_edges(spark)
    path = str(tmp_path / "edges_by_ts")
    save_ts_partitioned(edges, path)
    stored = load_ts_partitioned(spark, path)

    def files_read(df):
        # files actually touched at execution (inputFiles() reports the
        # pre-pruning FileIndex and would not show the pruning)
        return {r.f for r in df.select(F.input_file_name().alias("f")).distinct().collect()}

    all_files = files_read(stored)
    f0 = files_read(stored.where(F.col("ts") <= 0))
    f2 = files_read(stored.where(F.col("ts") <= 2))
    # pruning: early slices read strictly fewer files, monotonically
    assert f0 < f2 < all_files
    # and only the matching ts directories
    assert all("ts=0" in f for f in f0)
    # the plan carries the filter as PartitionFilters, not a row filter
    slice2 = stored.where(F.col("ts") <= 2)
    plan = spark._jvm.PythonSQLUtils.explainString(
        slice2._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].splitlines()[0]
    assert "ts" in pf and "2" in pf


def test_incremental_replay_through_partitioned_store(spark, tmp_path):
    from igpm_pem_spark.operators.incremental import incremental_components

    edges = _dyn_edges(spark)
    path = str(tmp_path / "edges_by_ts2")
    save_ts_partitioned(edges, path)
    stored = load_ts_partitioned(spark, path)

    got = incremental_components(spark, stored, base_steps=1)
    want = incremental_components(spark, edges, base_steps=1)
    g = {r.id: r.component for r in got.state.collect()}
    w = {r.id: r.component for r in want.state.collect()}
    assert g == w
    assert [s.n_total_edges for s in got.steps] == [
        s.n_total_edges for s in want.steps
    ]
