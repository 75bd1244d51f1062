"""Session-9 batch 4: dedup cluster-size census consistency, core
distance profile vs networkx, ANN bucket stats consistency, degree-Zipf
OLS replica."""

from __future__ import annotations

import math
from collections import Counter

import networkx as nx

from igpm_pem_spark.queries._common import G_SPARSE_SQL, edges
from igpm_pem_spark.queries.metricsq11 import (
    _CORE_HOPS,
    _CORE_HUBS,
    _DZ_TOP,
    _q_ann_bucket_stats,
    _q_core_distance_hist,
    _q_dedup_cluster_sizes,
    _q_degree_zipf,
)

SF = "/root/testdata/sf0.001"


def test_dedup_cluster_sizes_census(spark):
    from igpm_pem_spark.operators.dedup import dedup_clusters
    from igpm_pem_spark.queries._common import docs

    rows = _q_dedup_cluster_sizes(spark, SF).collect()
    d = docs(spark, SF)
    cl = Counter(
        r.canonical for r in dedup_clusters(spark, d, threshold=0.1).collect()
    )
    want = Counter(cl.values())
    assert {r.cluster_size: r.n_clusters for r in rows} == dict(want)
    # mass conservation: Σ n_docs = corpus size
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_core_distance_hist_vs_networkx(spark):
    got = {r.dist: r.n_vertices for r in _q_core_distance_hist(spark, SF).collect()}
    e = [(r.src, r.dst) for r in edges(spark, SF, G_SPARSE_SQL).collect()]
    G = nx.Graph()
    G.add_edges_from(e)
    hubs = sorted(G.nodes(), key=lambda v: (-G.degree[v], v))[:_CORE_HUBS]
    dist = {}
    for layer, nodes in enumerate(
        nx.bfs_layers(G, hubs)
    ):
        if layer > _CORE_HOPS:
            break
        for v in nodes:
            dist[v] = layer
    want = Counter(dist.values())
    want[-1] = len(G) - len(dist)
    if want[-1] == 0:
        del want[-1]
    assert got == dict(want)


def test_ann_bucket_stats_consistency(spark):
    from igpm_pem_spark.functions.hashing import ANN_MAX_BUCKET, ANN_PLANES, ANN_TABLES
    from igpm_pem_spark.operators.similarity import hyperplane_buckets
    from igpm_pem_spark.queries._common import emb

    rows = _q_ann_bucket_stats(spark, SF).collect()
    n_vec = emb(spark, SF).count()
    # every (vector, table) row lands in exactly one bucket
    assert sum(r.sz * r.n_buckets for r in rows) == n_vec * ANN_TABLES
    for r in rows:
        assert r.dropped == (r.sz > ANN_MAX_BUCKET)
    sigs = hyperplane_buckets(
        emb(spark, SF), n_tables=ANN_TABLES, n_planes=ANN_PLANES
    )
    want = Counter(
        Counter((r.tbl, r.sig) for r in sigs.collect()).values()
    )
    assert {r.sz: r.n_buckets for r in rows} == dict(want)


def test_degree_zipf_vs_python_ols(spark):
    row = _q_degree_zipf(spark, SF).collect()[0]
    e = [(r.src, r.dst) for r in edges(spark, SF).collect()]
    G = nx.Graph()
    G.add_edges_from(e)
    top = sorted(((G.degree[v], v) for v in G), key=lambda t: (-t[0], t[1]))[:_DZ_TOP]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(d) for d, _ in top]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    mxy = sum(x * y for x, y in zip(xs, ys)) / n
    mxx = sum(x * x for x in xs) / n
    slope = (mxy - mx * my) / (mxx - mx * mx)
    assert row.n_top == n
    assert abs(row.slope6 - round(slope, 6)) < 2e-6
    assert row.slope6 < 0  # heavy tail: degree falls with rank
