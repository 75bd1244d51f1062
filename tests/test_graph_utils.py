"""Graph utility operators: sinks (S5), salted aggregation (O9),
component bin-packing (W5)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from igpm_pem_spark.operators.graph import bin_pack_components, salted_count
from igpm_pem_spark.sources.fixtures import fixture_graph
from igpm_pem_spark.sources.node_link import (
    load_graph_parquet,
    load_node_link,
    save_graph_parquet,
    save_node_link,
)


def test_node_link_roundtrip(spark, tmp_path):
    verts, edges, directed = fixture_graph(spark, "dynamic_test1")
    p = str(tmp_path / "g.json")
    save_node_link(verts, edges, p, directed)
    obj = json.load(open(p))
    v2, e2, d2 = load_node_link(spark, obj)
    assert d2 == directed
    assert sorted(r.id for r in v2.collect()) == sorted(r.id for r in verts.collect())
    a = sorted((r.src, r.dst, r.label, r.ts) for r in edges.collect())
    b = sorted((r.src, r.dst, r.label, r.ts) for r in e2.collect())
    assert a == b


def test_graph_parquet_roundtrip(spark, tmp_path):
    verts, edges, _ = fixture_graph(spark, "test1")
    save_graph_parquet(verts, edges, str(tmp_path / "g"))
    v2, e2 = load_graph_parquet(spark, str(tmp_path / "g"))
    assert v2.count() == verts.count()
    assert sorted((r.src, r.dst) for r in e2.collect()) == sorted(
        (r.src, r.dst) for r in edges.collect()
    )


def test_salted_count_equals_plain_groupby(spark):
    # skewed input: key 0 is a hub
    rows = [(0,)] * 500 + [(i % 7,) for i in range(200)]
    df = spark.createDataFrame(rows, "k BIGINT")
    got = {r.k: r.cnt for r in salted_count(df, "k", n_salts=8).collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_count_tolerates_map_columns(spark):
    # vertices carry a props map; Spark hash functions reject MapType, so
    # the salt must be derived from the non-map columns only
    df = spark.createDataFrame(
        [(i % 3, {"k": str(i)}) for i in range(30)],
        "k BIGINT, props MAP<STRING,STRING>",
    )
    got = {r.k: r.cnt for r in salted_count(df, "k", n_salts=4).collect()}
    assert got == {0: 10, 1: 10, 2: 10}


def test_bin_pack_components(spark):
    sizes = spark.createDataFrame(
        [(1, 100), (2, 90), (3, 50), (4, 40), (5, 10), (6, 5)],
        "component BIGINT, size BIGINT",
    )
    packed = {r.component: r.worker for r in bin_pack_components(sizes, 2).collect()}
    # round-robin over size-desc: 100→w0, 90→w1, 50→w0, 40→w1, 10→w0, 5→w1
    assert packed == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0, 6: 1}


def test_bipartite_projection(spark):
    from igpm_pem_spark.operators.graph import bipartite_projection

    rows = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 10), (3, 11),
        (4, 20),
    ]
    df = spark.createDataFrame(rows, "g BIGINT, item BIGINT")
    un = {(r.src, r.dst) for r in
          bipartite_projection(df, "g", "item").collect()}
    assert un == {(10, 11), (10, 12), (11, 12)}
    wt = {(r.src, r.dst): r.w for r in
          bipartite_projection(df, "g", "item", weighted=True).collect()}
    assert wt == {(10, 11): 3.0, (10, 12): 1.0, (11, 12): 1.0}
    wt2 = {(r.src, r.dst): r.w for r in
           bipartite_projection(df, "g", "item", weighted=True,
                                min_weight=2).collect()}
    assert wt2 == {(10, 11): 3.0}
