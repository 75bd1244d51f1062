"""Session-9 batch 2: int8 k-center python replica, WL snapshot
similarity hash-level replica, knn(k) curve vs networkx, gap histogram
hand replica."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import networkx as nx

from igpm_pem_spark.queries._common import G_SPARSE_SQL, edges
from igpm_pem_spark.queries.metricsq9 import (
    _SNAP_A_SQL,
    _SNAP_B_SQL,
    _WLS_ROUNDS,
    _q_gap_histogram,
    _q_kcenter_int8,
    _q_knn_curve,
    _q_wl_snapshot_sim,
)

SF = "/root/testdata/sf0.001"


def _quantize(vec):
    am = max(abs(x) for x in vec)
    if am <= 0:
        return [0] * len(vec)
    s = 127.0 / am
    return [math.floor(x * s + 0.5) for x in vec]


def test_kcenter_int8_vs_python_replica(spark):
    got = [(r.rank, r.vec_id, r.d2sel)
           for r in _q_kcenter_int8(spark, SF).orderBy("rank").collect()]

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    qv = {r.vec_id: _quantize([float(x) for x in r.embedding]) for r in rows}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    first = min(qv)
    picks = [(1, first, 0)]
    dmin = {v: d2(qv[v], qv[first]) for v in qv}
    for rnd in range(2, 9):
        far = min(dmin, key=lambda v: (-dmin[v], v))
        if dmin[far] == 0:
            break
        picks.append((rnd, far, dmin[far]))
        for v in qv:
            dmin[v] = min(dmin[v], d2(qv[v], qv[far]))
    assert got == picks
    # covering radius² must be monotone non-increasing past rank 1
    sel = [p[2] for p in picks[1:]]
    assert sel == sorted(sel, reverse=True)


def _wl_hist(pairs, rounds):
    G = nx.Graph()
    G.add_edges_from(pairs)
    color = {v: str(G.degree[v]) for v in G}
    for _ in range(rounds):
        nxt = {}
        for v in G:
            runs = Counter(color[u] for u in G[v])
            sig = ";".join(
                s for s in sorted(f"{c}x{n}" for c, n in runs.items())
            )
            nxt[v] = hashlib.md5(
                f"{color[v]}|{sig}".encode()
            ).hexdigest()[:16]
        color = nxt
    return Counter(color.values())


def test_wl_snapshot_sim_vs_hash_replica(spark):
    row = _q_wl_snapshot_sim(spark, SF).collect()[0]
    ea = [(r.src, r.dst) for r in edges(spark, SF, _SNAP_A_SQL).collect()]
    eb = [(r.src, r.dst) for r in edges(spark, SF, _SNAP_B_SQL).collect()]
    ha, hb = _wl_hist(ea, _WLS_ROUNDS), _wl_hist(eb, _WLS_ROUNDS)
    allc = set(ha) | set(hb)
    minsum = sum(min(ha.get(c, 0), hb.get(c, 0)) for c in allc)
    maxsum = sum(max(ha.get(c, 0), hb.get(c, 0)) for c in allc)
    assert (row.n_colors_a, row.n_colors_b) == (len(ha), len(hb))
    assert (row.minsum, row.maxsum) == (minsum, maxsum)
    assert abs(row.jac6 - round(minsum / maxsum, 6)) < 2e-6
    # the half-history snapshot is a strict subgraph: histograms differ
    assert row.jac6 < 1.0


def test_knn_curve_vs_networkx(spark):
    got = {r.k: (r.n_vertices, r.knn6) for r in _q_knn_curve(spark, SF).collect()}
    e = [(r.src, r.dst) for r in edges(spark, SF, G_SPARSE_SQL).collect()]
    G = nx.Graph()
    G.add_edges_from(e)
    by_k = defaultdict(list)
    for v in G:
        by_k[G.degree[v]].append(sum(G.degree[u] for u in G[v]))
    want = {
        k: (len(ss), round(sum(ss) / (k * len(ss)), 6)) for k, ss in by_k.items()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 2e-6


def test_gap_histogram_vs_python(spark):
    got = {r.bucket: r.n_gaps for r in _q_gap_histogram(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id))
    want = Counter()
    for seq in by_user.values():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            d = b - a
            gap_us = (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
            want[len(bin(gap_us)) - 2] += 1  # strip python's '0b' prefix
    assert got == dict(want)
