"""d-hop halo (ghost overlap) partitions: completeness of the replicated
ball, ownership disjointness, and partition-local results equal to the
global computation (the reference's overlap.py trade, proven not assumed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from igpm_pem_spark.operators.graph import simple_edges
from igpm_pem_spark.operators.halo import (
    halo_partitions,
    halo_replication_factor,
    halo_two_hop_counts,
    owner_expr,
)

SF = "/root/testdata/sf0.001"


def _edges(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


def test_halo_two_hop_equals_global(spark):
    """Partition-local ≤2-hop counts from the depth-2 halo must equal the
    global two-join computation vertex for vertex — the completeness
    proof for the replicated ball."""
    e = _edges(spark)
    halo = halo_partitions(e, num_partitions=4, depth=2)
    local = {r.id: r.n2 for r in halo_two_hop_counts(halo).collect()}

    sym = simple_edges(e, directed=False)
    one = sym.select(F.col("src").alias("id"), F.col("dst").alias("w"))
    two = (
        sym.alias("a")
        .join(sym.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("id"), F.col("b.dst").alias("w"))
    )
    global_n2 = {
        r.id: r.n2
        for r in one.unionByName(two)
        .where(F.col("id") != F.col("w"))
        .distinct()
        .groupBy("id")
        .agg(F.count("*").alias("n2"))
        .collect()
    }
    assert local == global_n2


def test_halo_ownership_partition_and_replication(spark):
    """Every vertex is owned by exactly one partition; owned rows carry
    the owner's part; the replication factor is >= 1 (halo supersets the
    partition-disjoint edge split) and finite."""
    e = _edges(spark)
    k = 4
    halo = halo_partitions(e, num_partitions=k, depth=2).persist()
    owned_rows = halo.where("src_owned").select("part", "src").distinct()
    # src_owned must agree with the hash rule everywhere
    mism = halo.where(
        F.col("src_owned") != (owner_expr(F.col("src"), k) == F.col("part"))
    ).count()
    assert mism == 0
    # one owner per vertex
    multi = owned_rows.groupBy("src").agg(F.count("*").alias("c")).where("c > 1")
    assert multi.count() == 0
    # every non-isolated vertex is owned somewhere
    n_owned = owned_rows.count()
    n_verts = simple_edges(e).select("src").distinct().count()
    assert n_owned == n_verts
    rf = halo_replication_factor(halo, e)
    assert rf >= 1.0
    halo.unpersist()


def test_halo_depth_validation(spark):
    e = _edges(spark)
    import pytest

    with pytest.raises(ValueError):
        halo_partitions(e, num_partitions=4, depth=0)


def test_halo_build_leaves_no_registered_caches(spark):
    """halo_partitions persists sym/ball intermediates during the build;
    they must be RELEASED before it returns. A cache left registered in
    the CacheManager is silently substituted into later queries' plans
    (exact-subtree match on the simple_edges chain), and the accurate
    in-memory stats flip shuffle joins to broadcast — under which any
    superstep loop that unions state-derived branches inherits
    (branches)^round partition growth (the measured halo→onion
    3.6M-task stage storm). The halo itself must come back materialized
    so consumers never recompute through the released caches."""
    spark.catalog.clearCache()
    e = _edges(spark)
    halo = halo_partitions(e, num_partitions=4, depth=2)
    assert halo.count() > 0
    jcache = spark._jsparkSession.sharedState().cacheManager()
    assert jcache.isEmpty(), "halo build leaked registered caches"


def test_onion_partitions_bounded_under_poisoned_cache(spark):
    """Run the onion peel with the symmetrized-edge subtree CACHED in the
    session (what a leaky earlier query would leave behind): the
    state's checkpointed partition count must stay pinned at
    num_partitions every round — the coalesce bound in the in-memory
    commit path — instead of inheriting broadcast-join partitioning and
    growing 3^round."""
    import networkx as nx

    from igpm_pem_spark.operators.graph import simple_edges

    g = nx.barabasi_albert_graph(200, 3, seed=7)
    df = _pairs_df(spark, list(g.edges()))
    # poison: register the exact simple_edges subtree the kernel builds
    poisoned = simple_edges(df, directed=False)
    poisoned.persist().count()
    try:
        from igpm_pem_spark.operators.kcore import onion_layers

        res = onion_layers(spark, df, num_partitions=4)
        assert res.converged
        assert res.layers.rdd.getNumPartitions() <= 4
        want = nx.onion_layers(g)
        got = {r["id"]: r["layer"] for r in res.layers.collect()}
        assert got == dict(want)
    finally:
        poisoned.unpersist()
        spark.catalog.clearCache()


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src BIGINT, dst BIGINT"
    )
