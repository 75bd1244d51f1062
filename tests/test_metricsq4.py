"""Session-8 batch 1 query-level parity: bidirectional s-t distance vs
NetworkX and TextRank vs a pure-python 8-round replay, both on synthetic
parquet through the real query callables."""

from __future__ import annotations

import collections

import networkx as nx

from igpm_pem_spark.queries.metricsq4 import _q_st_distance, _q_textrank


def _write_lineitem(spark, tmp_path, pairs):
    rows = [(50 * (i + 1), a, b) for i, (a, b) in enumerate(pairs)]
    li = [(o, a, 1) for o, a, b in rows] + [(o, b, 2) for o, a, b in rows]
    spark.createDataFrame(
        li, "l_orderkey LONG, l_partkey LONG, l_linenumber LONG"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))


def test_st_distance_path_graph(spark, tmp_path):
    # path 1-2-3-4-5-6-7: s=1, t=7, true distance 6 (3+3 meet at 4)
    pairs = [(i, i + 1) for i in range(1, 7)]
    _write_lineitem(spark, tmp_path, pairs)
    r = _q_st_distance(spark, str(tmp_path)).collect()[0]
    G = nx.Graph()
    G.add_edges_from(pairs)
    assert (r.src_id, r.dst_id) == (1, 7)
    assert r.dist == nx.shortest_path_length(G, 1, 7) == 6
    assert r.n_witnesses == 1  # only vertex 4 sits at 3+3


def test_st_distance_unreachable_within_horizon(spark, tmp_path):
    # path of length 8: beyond the 3+3 horizon -> (-1, 0)
    pairs = [(i, i + 1) for i in range(1, 9)]
    _write_lineitem(spark, tmp_path, pairs)
    r = _q_st_distance(spark, str(tmp_path)).collect()[0]
    assert (r.src_id, r.dst_id, r.dist, r.n_witnesses) == (1, 9, -1, 0)


def test_textrank_python_replay(spark, tmp_path):
    docs = [
        (1, "spark joins data and data joins spark quickly"),
        (2, "data joins data and spark shuffles data"),
        (3, "quickly spark shuffles and joins data"),
    ]
    spark.createDataFrame(docs, "doc_id LONG, text STRING").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = [(r.token, r.rank7) for r in _q_textrank(spark, str(tmp_path)).collect()]

    # python replay: same vocab rule, same adjacency, same 8 rounds
    adj = collections.defaultdict(dict)
    toks_all = []
    for _, t in docs:
        toks = [x for x in t.lower().split(" ") if x]
        toks_all.extend(toks)
        for a, b in zip(toks, toks[1:]):
            if a != b:
                lo, hi = min(a, b), max(a, b)
                adj[lo][hi] = adj[lo].get(hi, 0) + 1
    cnt = collections.Counter(toks_all)
    vocab = {t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]}
    g = collections.defaultdict(dict)
    for a, nbrs in adj.items():
        for b, w in nbrs.items():
            if a in vocab and b in vocab:
                g[a][b] = g[a].get(b, 0) + w
                g[b][a] = g[b].get(a, 0) + w
    N = len(g)
    r = {v: 1.0 / N for v in g}
    W = {v: sum(g[v].values()) for v in g}
    for _ in range(8):
        r = {
            v: 0.15 / N + 0.85 * sum(r[u] * g[u][v] / W[u] for u in g[v])
            for v in g
        }
    ref = sorted(
        ((t, round(x, 7)) for t, x in r.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    assert got == ref
