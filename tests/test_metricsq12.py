"""Session-9 batch 5: s-core peel replica, line-degree identity checks,
int8 distance-histogram replica, active-days census replica."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import networkx as nx

from igpm_pem_spark.queries._common import G_SPARSE_SQL, edges
from igpm_pem_spark.queries.metricsq12 import (
    _G_WINT_SQL,
    _SCORE_S,
    _q_active_days,
    _q_dist_histogram,
    _q_line_degree_hist,
    _q_s_core,
)

SF = "/root/testdata/sf0.001"


def test_s_core_vs_python_peel(spark):
    got = {r.id for r in _q_s_core(spark, SF).collect()}
    w = {(r.src, r.dst): r.w for r in edges(spark, SF, _G_WINT_SQL).collect()}
    adj = defaultdict(dict)
    for (a, b), ww in w.items():
        adj[a][b] = ww
        adj[b][a] = ww
    alive = set(adj)
    while True:
        drop = {v for v in alive
                if sum(adj[v][u] for u in adj[v] if u in alive) < _SCORE_S}
        if not drop:
            break
        alive -= drop
    # python peel keeps vertices with >= 1 surviving neighbor
    alive = {v for v in alive if any(u in alive for u in adj[v])}
    assert got == alive
    assert 0 < len(got) < len(adj)  # s=8 peels something, keeps something


def test_line_degree_hist_identities(spark):
    got = {r.dl: r.n_edges for r in _q_line_degree_hist(spark, SF).collect()}
    e = [(r.src, r.dst) for r in edges(spark, SF, G_SPARSE_SQL).collect()]
    G = nx.Graph()
    G.add_edges_from(e)
    want = Counter(G.degree[u] + G.degree[v] - 2 for u, v in G.edges())
    assert got == dict(want)
    # sum of line-degrees = 2 |E(L)| = 2 * wedge count
    wedges = sum(d * (d - 1) // 2 for _, d in G.degree())
    assert sum(k * n for k, n in got.items()) == 2 * wedges


def test_dist_histogram_vs_python(spark):
    got = {r.bucket: r.n_pairs for r in _q_dist_histogram(spark, SF).collect()}
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()

    def quant(vec):
        am = max(abs(x) for x in vec)
        if am <= 0:
            return [0] * len(vec)
        s = 127.0 / am
        return [math.floor(x * s + 0.5) for x in vec]

    qv = {r.vec_id: quant([float(x) for x in r.embedding])
          for r in rows if r.vec_id % 4 == 0}
    ids = sorted(qv)
    want = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d2 = sum((x - y) * (x - y) for x, y in zip(qv[a], qv[b]))
            want[len(bin(d2)) - 2 if d2 > 0 else 1] += 1
    assert got == dict(want)


def test_active_days_vs_python(spark):
    got = {r.n_days: r.n_users for r in _q_active_days(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    days = defaultdict(set)
    for r in ev:
        days[r.user_id].add(r.ts.date())
    want = Counter(len(s) for s in days.values())
    assert got == dict(want)
    assert sum(got.values()) == len(days)
