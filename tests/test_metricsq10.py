"""Session-9 batch 3: hitting-time value-iteration replica, triangle
closure-delay replica, event-chain stationary replica, MinHash
calibration grouping replica."""

from __future__ import annotations

from collections import Counter, defaultdict

import networkx as nx

from igpm_pem_spark.queries._common import edges
from igpm_pem_spark.queries.metricsq10 import (
    _CLOSURE_EDGES_SQL,
    _HT_HUBS,
    _HT_ITERS,
    _ST_ITERS,
    _q_event_stationary,
    _q_hitting_time,
    _q_minhash_calibration,
    _q_triangle_closure,
)

SF = "/root/testdata/sf0.001"


def _write_lineitem(spark, tmp_path, pairs):
    rows = [(50 * (i + 1), a, b) for i, (a, b) in enumerate(pairs)]
    li = [(o, a, 1) for o, a, b in rows] + [(o, b, 2) for o, a, b in rows]
    spark.createDataFrame(
        li, "l_orderkey LONG, l_partkey LONG, l_linenumber LONG"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))


def test_hitting_time_vs_value_iteration(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7), (5, 7),
             (7, 8), (2, 9), (9, 4), (8, 10)]
    _write_lineitem(spark, tmp_path, pairs)
    got = {r.id: r.h6 for r in _q_hitting_time(spark, str(tmp_path)).collect()}

    G = nx.Graph()
    G.add_edges_from(pairs)
    hubs = set(sorted(G.nodes(), key=lambda v: (-G.degree[v], v))[:_HT_HUBS])
    h = {v: 0.0 for v in G}
    for _ in range(_HT_ITERS):
        h = {
            v: 0.0 if v in hubs
            else 1.0 + sum(h[u] for u in G[v]) / G.degree[v]
            for v in G
        }
    assert set(got) == set(G.nodes())
    for v in G:
        assert abs(got[v] - round(h[v], 6)) < 2e-6, (v, got[v], h[v])
    # hubs sit at 0; the pendant chain end is the farthest from the core
    assert all(got[v] == 0.0 for v in hubs)
    assert max(got, key=got.get) == 10


def test_triangle_closure_delay_vs_python(spark):
    got = {r.delay_months: r.n_triangles
           for r in _q_triangle_closure(spark, SF).collect()}
    em = {(r.src, r.dst): r.em
          for r in edges(spark, SF, _CLOSURE_EDGES_SQL).collect()}
    want = Counter()
    nodes = sorted({v for e in em for v in e})
    adj = defaultdict(set)
    for a, b in em:
        adj[a].add(b)  # canonical a < b
    for a in nodes:
        for b in adj[a]:
            for c in adj[b]:
                if c in adj[a]:
                    ms = (em[(a, b)], em[(b, c)], em[(a, c)])
                    want[max(ms) - min(ms)] += 1
    assert got == dict(want)
    assert sum(got.values()) > 0


def test_event_stationary_vs_python(spark):
    got = {r.event_type: r.pi6 for r in _q_event_stationary(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    outc = Counter()
    for (a, _), c in trans.items():
        outc[a] += c
    states = sorted(outc)
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(_ST_ITERS):
        nxt = defaultdict(float)
        for (a, b), c in trans.items():
            if a in pi:
                nxt[b] += pi[a] * c / outc[a]
        pi = dict(nxt)
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - round(pi.get(s, 0.0), 6)) < 2e-6
    # mass leaks only into observed states; total stays ~1 on this corpus
    assert abs(sum(got.values()) - 1.0) < 0.05


def test_minhash_calibration_grouping(spark):
    from igpm_pem_spark.functions.hashing import NUM_PERM
    from igpm_pem_spark.operators.dedup import lsh_jaccard_pairs, minhash_signatures
    from igpm_pem_spark.queries._common import docs

    got = {r.est_matches: (r.n_pairs, r.avg_jac6)
           for r in _q_minhash_calibration(spark, SF).collect()}
    d = docs(spark, SF)
    sig = {r.doc_id: [r[f"mh{i}"] for i in range(NUM_PERM)]
           for r in minhash_signatures(d).collect()}
    groups = defaultdict(list)
    for r in lsh_jaccard_pairs(d, threshold=0.1).collect():
        est = sum(a == b for a, b in zip(sig[r.doc_a], sig[r.doc_b]))
        groups[est].append(round(r.jaccard * 1e6))
    want = {
        e: (len(js), round(sum(js) / len(js) / 1e6, 6)) for e, js in groups.items()
    }
    assert set(got) == set(want)
    for e in want:
        assert got[e][0] == want[e][0]
        assert abs(got[e][1] - want[e][1]) < 2e-6
    # higher estimate buckets should not have lower mean exact Jaccard
    ks = sorted(want)
    means = [want[k][1] for k in ks]
    assert means == sorted(means)
