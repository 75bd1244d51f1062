"""Session-9 batch: edge-betweenness brute-force parity, greedy
dominating-set hand replica, mutual-kNN backbone replica, decayed
PageRank python power-iteration parity, n-gram novelty hand trace,
day-of-week seasonality replica, survivor-quality consistency."""

from __future__ import annotations

from collections import Counter, defaultdict

import networkx as nx

from igpm_pem_spark.queries.metricsq8 import (
    _BB_TOPK,
    _q_dominating_greedy,
    _q_edge_betweenness,
    _q_knn_backbone_cc,
    _q_pagerank_decay,
)

SF = "/root/testdata/sf0.001"


def _write_lineitem(spark, tmp_path, pairs):
    # sparse graph keeps l_orderkey % 50 == 0: one order per edge
    rows = [(50 * (i + 1), a, b) for i, (a, b) in enumerate(pairs)]
    li = [(o, a, 1) for o, a, b in rows] + [(o, b, 2) for o, a, b in rows]
    spark.createDataFrame(
        li, "l_orderkey LONG, l_partkey LONG, l_linenumber LONG"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))


_PAIRS = [
    # two triangles bridged by a path, plus a pendant — asymmetric enough
    # that edge scores differ and some shortest paths split
    (1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7), (5, 7),
    (7, 8), (2, 9), (9, 4),
]


def test_edge_betweenness_vs_bruteforce(spark, tmp_path):
    _write_lineitem(spark, tmp_path, _PAIRS)
    got = {(r.u, r.v): r.ebc6 for r in _q_edge_betweenness(spark, str(tmp_path)).collect()}

    G = nx.Graph()
    G.add_edges_from(_PAIRS)
    seeds = sorted(G.nodes())[:5]
    acc: dict[tuple, float] = defaultdict(float)
    for s in seeds:
        dist = nx.single_source_shortest_path_length(G, s, cutoff=3)
        for t, d in dist.items():
            if t == s or d == 0:
                continue
            paths = list(nx.all_shortest_paths(G, s, t))
            for p in paths:
                for a, b in zip(p, p[1:]):
                    acc[(min(a, b), max(a, b))] += 1.0 / len(paths)
    want = {e: round(v, 6) for e, v in acc.items()}
    assert set(got) == set(want)
    for e in want:
        assert abs(got[e] - want[e]) < 2e-6, (e, got[e], want[e])


def test_dominating_greedy_hand_replica(spark, tmp_path):
    _write_lineitem(spark, tmp_path, _PAIRS)
    got = [(r.rank, r.id, r.gain) for r in
           _q_dominating_greedy(spark, str(tmp_path)).orderBy("rank").collect()]

    G = nx.Graph()
    G.add_edges_from(_PAIRS)
    closed = {v: set(G[v]) | {v} for v in G}
    uncovered = set(G.nodes())
    want = []
    for rnd in range(1, 6):
        if not uncovered:
            break
        gains = {v: len(closed[v] & uncovered) for v in G}
        gains = {v: g for v, g in gains.items() if g > 0}
        if not gains:
            break
        pick = min(gains, key=lambda v: (-gains[v], v))
        want.append((rnd, pick, gains[pick]))
        uncovered -= closed[pick]
    assert got == want
    # the tiny graph is dominated in < 5 picks — the early stop must fire
    assert len(got) < 5


def test_knn_backbone_vs_python_replica(spark, tmp_path):
    _write_lineitem(spark, tmp_path, _PAIRS)
    got = {r.id: r.comp for r in _q_knn_backbone_cc(spark, str(tmp_path)).collect()}

    G = nx.Graph()
    G.add_edges_from(_PAIRS)
    score = {}
    for a, b in G.edges():
        sup = len(set(G[a]) & set(G[b]))
        den = max(G.degree[a] + G.degree[b] - 2 - sup, 1)
        score[(a, b)] = score[(b, a)] = sup / den
    kept = set()
    for v in G:
        ranked = sorted(G[v], key=lambda nb: (-score[(v, nb)], nb))[:_BB_TOPK]
        kept |= {(v, nb) for nb in ranked}
    mutual = [(a, b) for a, b in kept if a < b and (b, a) in kept]
    H = nx.Graph()
    H.add_nodes_from(G.nodes())
    H.add_edges_from(mutual)
    want = {v: min(c) for c in nx.connected_components(H) for v in c}
    assert got == want


def test_pagerank_decay_vs_python_power_iteration(spark):
    got = {r.id: r.rank7 for r in _q_pagerank_decay(spark, SF).collect()}

    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    orders = {r.o_orderkey: r.o_orderdate
              for r in spark.read.parquet(f"{SF}/orders.parquet").collect()}
    by_order = defaultdict(list)
    for r in li:
        if r.l_orderkey % 10 == 0:
            by_order[r.l_orderkey].append(r.l_partkey)
    inst = set()
    for o, parts in by_order.items():
        m = orders[o].year * 12 + orders[o].month
        for a in parts:
            for b in parts:
                if a < b:
                    inst.add((a, b, m))
    mx = max(m for _, _, m in inst)
    w = defaultdict(float)
    for a, b, m in inst:
        w[(a, b)] += 2.0 ** (-min(mx - m, 20))
    sym = defaultdict(dict)
    for (a, b), ww in w.items():
        sym[a][b] = sym[a].setdefault(b, 0) + ww
        sym[b][a] = sym[b].setdefault(a, 0) + ww
    nodes = sorted(sym)
    n = len(nodes)
    d = {v: sum(sym[v].values()) for v in nodes}
    r = {v: 1.0 / n for v in nodes}
    for _ in range(8):
        nxt = {v: 0.15 / n for v in nodes}
        for u in nodes:
            for v, ww in sym[u].items():
                nxt[v] += 0.85 * r[u] * ww / d[u]
        r = nxt
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - round(r[v], 7)) < 2e-7, (v, got[v], r[v])


def test_ngram_novelty_hand_trace(spark):
    from igpm_pem_spark.functions.text import ngram_novelty

    d = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # 2 distinct 5-grams, both first
            (2, "a b c d e"),            # 1 shingle, seen in doc 1 -> 0.0
            (3, "x y z w q a b c d e"),  # 6 shingles, 1 old (a b c d e)
            (4, "too short"),            # < 5 words -> absent
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: (r.n_shingles, r.novel_frac) for r in ngram_novelty(d).collect()}
    assert got == {
        1: (2, 1.0),
        2: (1, 0.0),
        3: (6, round(5 / 6, 6)),
    }


def test_seasonality_dow_vs_python(spark):
    from igpm_pem_spark.queries.pipeline12 import _q_seasonality_dow

    got = {(r.event_type, r.dow): (r.n, r.idx6)
           for r in _q_seasonality_dow(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    per = Counter()
    tot = Counter()
    for r in ev:
        dow = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days % 7
        per[(r.event_type, dow)] += 1
        tot[r.event_type] += 1
    want = {k: (n, round(7 * n / tot[k[0]], 6)) for k, n in per.items()}
    assert got == want


def test_survivor_quality_partitions_the_corpus(spark):
    from igpm_pem_spark.operators.dedup import dedup_clusters
    from igpm_pem_spark.queries._common import docs
    from igpm_pem_spark.queries.pipeline12 import _q_survivor_quality

    rows = _q_survivor_quality(spark, SF).collect()
    d = docs(spark, SF)
    by_lang = Counter(r.lang for r in d.select("lang").collect())
    got_lang = Counter()
    for r in rows:
        got_lang[r.lang] += r.n_docs
        assert 0.0 <= r.avg_quality6 <= 1.0
    assert got_lang == by_lang
    # keep counts must agree with the dedup pipeline itself
    cl = dedup_clusters(spark, d, threshold=0.1)
    n_keep = cl.where("keep").count()
    assert sum(r.n_docs for r in rows if r.keep) == n_keep
