"""Session-10 batch 7: walk-return probability replica, IVF list-size
consistency, new-vs-returning replica."""

from __future__ import annotations

from collections import Counter, defaultdict

import networkx as nx

from igpm_pem_spark.queries._common import G_SPARSE_SQL, edges
from igpm_pem_spark.queries.metricsq13 import (
    _WR_SEEDS,
    _q_ivf_list_sizes,
    _q_new_returning,
    _q_walk_return,
)

SF = "/root/testdata/sf0.001"


def test_walk_return_vs_networkx(spark):
    got = {r.id: (r.p2_6, r.p3_6) for r in _q_walk_return(spark, SF).collect()}
    e = [(r.src, r.dst) for r in edges(spark, SF, G_SPARSE_SQL).collect()]
    G = nx.Graph()
    G.add_edges_from(e)
    seeds = sorted(G.nodes())[:_WR_SEEDS]
    for s in seeds:
        p2 = sum(1.0 / (G.degree[s] * G.degree[u]) for u in G[s])
        p3 = sum(
            1.0 / (G.degree[s] * G.degree[u] * G.degree[w])
            for u in G[s]
            for w in G[u]
            if s in G[w]
        )
        assert abs(got[s][0] - round(p2, 6)) < 2e-6, s
        assert abs(got[s][1] - round(p3, 6)) < 2e-6, s
    # p3 > 0 exactly when the seed sits in a triangle
    for s in seeds:
        in_tri = any(G.has_edge(u, w) for u in G[s] for w in G[s] if u < w)
        assert (got[s][1] > 0) == in_tri, s


def test_ivf_list_sizes_consistency(spark):
    from igpm_pem_spark.operators.clustering import kmeans_assign
    from igpm_pem_spark.queries._common import emb

    rows = _q_ivf_list_sizes(spark, SF).collect()
    n = emb(spark, SF).count()
    assert sum(r.list_size for r in rows) == n
    res = kmeans_assign(spark, emb(spark, SF), k=8, iters=2)
    want = Counter(r.cluster for r in res.assignments.collect())
    assert {r.cluster: r.list_size for r in rows} == dict(want)
    for r in rows:
        assert r.imbalance_micro == (r.list_size * 8 * 1000000) // n or \
            r.imbalance_micro == int(r.list_size * 8 * 1000000 / n)


def test_new_returning_vs_python(spark):
    got = {r.day: (r.n_new, r.n_returning)
           for r in _q_new_returning(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    ud = defaultdict(set)
    for r in ev:
        ud[r.user_id].add(str(r.ts.date()))
    want = defaultdict(lambda: [0, 0])
    for u, days in ud.items():
        first = min(days)
        for d in days:
            want[d][0 if d == first else 1] += 1
    assert got == {d: tuple(v) for d, v in want.items()}
    # every user is new exactly once
    assert sum(v[0] for v in got.values()) == len(ud)
