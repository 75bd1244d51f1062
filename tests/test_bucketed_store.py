"""Bucketed edge store: src-keyed plans over the stored table must skip
the Exchange on the bucketed side — the write-time shuffle elision that
partitioned_adjacency otherwise pays per run."""

from __future__ import annotations

from pyspark.sql import functions as F

from igpm_pem_spark.sources.bucketed_store import (
    load_bucketed_edges,
    save_bucketed_edges,
)
from igpm_pem_spark.sources.fixtures import ba_graph


def _plan(df):
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_groupby_has_no_exchange(spark):
    _, edges, _ = ba_graph(spark, 80, 3, seed=9)
    save_bucketed_edges(edges.select("src", "dst"), "e_bucketed", 4)
    try:
        stored = load_bucketed_edges(spark, "e_bucketed")
        agg = stored.groupBy("src").agg(F.count("*").alias("deg"))
        plan = _plan(agg)
        assert "Exchange" not in plan, plan[:1500]
        # values identical to the unbucketed aggregation
        got = {r.src: r.deg for r in agg.collect()}
        want = {
            r.src: r.deg
            for r in edges.groupBy("src").agg(F.count("*").alias("deg")).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed")


def test_bucketed_join_shuffles_only_probe_side(spark):
    _, edges, _ = ba_graph(spark, 80, 3, seed=10)
    save_bucketed_edges(edges.select("src", "dst"), "e_bucketed2", 4)
    try:
        stored = load_bucketed_edges(spark, "e_bucketed2")
        state = spark.range(80).select(
            F.col("id").alias("src"), (F.col("id") * 0.01).alias("rank")
        )
        j = stored.join(state.hint("merge"), "src")
        plan = _plan(j)
        # exactly one Exchange node (each node appears twice in formatted
        # output: tree + detail header): the state side re-buckets to the
        # stored layout; the edge side reads its buckets off storage
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]
        assert "SelectedBucketsCount" in plan
        assert j.count() == edges.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed2")
