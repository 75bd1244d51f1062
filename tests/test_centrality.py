"""Truncated Katz + seeded bounded-distance betweenness: NetworkX /
pure-Python parity and invariants."""

from __future__ import annotations

import networkx as nx
import pytest

from .conftest import edges_df

PAIRS = [
    (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6), (6, 7), (2, 8),
]


def _nx(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return g


def _katz_python(pairs, k, alpha, directed=False):
    """Walk-count recursion with the same left-associative float sum."""
    adj: dict[int, list[int]] = {}
    nodes = set()
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        nodes.update((a, b))
        if not directed:
            adj.setdefault(b, []).append(a)
    w = {v: 1 for v in nodes}
    levels = []
    for _ in range(k):
        nw: dict[int, int] = {}
        for u, outs in adj.items():
            for v in outs:
                nw[v] = nw.get(v, 0) + w.get(u, 0)
        levels.append(nw)
        w = nw
    out = {}
    for v in nodes:
        acc = None
        for j, lev in enumerate(levels, start=1):
            t = alpha ** j * float(lev.get(v, 0))
            acc = t if acc is None else acc + t
        out[v] = acc
    return out


def test_katz_matches_python(spark):
    from igpm_pem_spark.operators.centrality import katz_truncated

    got = {
        r.id: r.katz
        for r in katz_truncated(edges_df(spark, PAIRS), k=4, alpha=0.05).collect()
    }
    want = _katz_python(PAIRS, 4, 0.05)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=0)  # bit-identical


def test_katz_directed_unreached_is_zero(spark):
    from igpm_pem_spark.operators.centrality import katz_truncated

    # 1 -> 2 -> 3: vertex 1 has no in-edges, katz(1) = 0
    got = {
        r.id: r.katz
        for r in katz_truncated(
            edges_df(spark, [(1, 2), (2, 3)]), k=3, alpha=0.1, directed=True
        ).collect()
    }
    assert got[1] == 0.0
    assert got[2] == pytest.approx(0.1, abs=0)
    # walks ending at 3: len1 (2->3), len2 (1->2->3) — same α**j floats
    assert got[3] == pytest.approx(0.1 + 0.1 ** 2, abs=1e-18)


def test_katz_rejects_bad_params(spark):
    from igpm_pem_spark.operators.centrality import katz_truncated

    e = edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        katz_truncated(e, k=0)
    with pytest.raises(ValueError):
        katz_truncated(e, alpha=1.5)


def _brandes_truncated(pairs, seeds, max_hops):
    """Reference truncated Brandes: per-seed BFS to max_hops, backward
    dependency accumulation, summed over seeds, endpoints excluded."""
    g = _nx(pairs)
    bc = {v: 0.0 for v in g}
    for s in seeds:
        # forward
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for ell in range(max_hops):
            nxt: dict[int, int] = {}
            for u in levels[ell]:
                for v in g[u]:
                    if v in dist and dist[v] <= ell:
                        continue
                    nxt[v] = nxt.get(v, 0) + sigma[u]
            if not nxt:
                break
            for v, sg in nxt.items():
                dist[v] = ell + 1
                sigma[v] = sg
            levels.append(sorted(nxt))
        # backward
        delta = {v: 0.0 for v in dist}
        for ell in range(len(levels) - 1, 0, -1):
            for v in levels[ell]:
                if ell + 1 < len(levels):
                    for w in g[v]:
                        if dist.get(w) == ell + 1:
                            delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
                if v != s:
                    bc[v] += delta[v]
    return bc


def test_betweenness_seeded_matches_reference(spark):
    from igpm_pem_spark.operators.centrality import betweenness_seeded

    seeds = sorted({v for p in PAIRS for v in p})[:3]
    got = {
        r.id: r.bc
        for r in betweenness_seeded(
            spark, edges_df(spark, PAIRS), n_seeds=3, max_hops=3
        ).collect()
    }
    want = _brandes_truncated(PAIRS, seeds, 3)
    # operator emits every vertex it reached (possibly bc=0); reference
    # dict covers all non-seed vertices — compare on the operator's keys
    # and require every positive reference value to be present
    for v, x in want.items():
        if x > 0:
            assert got[v] == pytest.approx(x, abs=1e-9), v
    for v, x in got.items():
        assert x == pytest.approx(want.get(v, 0.0), abs=1e-9), v


def test_betweenness_full_horizon_matches_networkx(spark):
    """All seeds + horizon ≥ diameter → exactly 2× NetworkX's
    unnormalized undirected betweenness (ordered-pair convention)."""
    from igpm_pem_spark.operators.centrality import betweenness_seeded

    g = _nx(PAIRS)
    n = g.number_of_nodes()
    got = {
        r.id: r.bc
        for r in betweenness_seeded(
            spark, edges_df(spark, PAIRS), n_seeds=n, max_hops=10
        ).collect()
    }
    want = nx.betweenness_centrality(g, normalized=False)
    for v, x in want.items():
        assert got.get(v, 0.0) == pytest.approx(2 * x, abs=1e-9), v


def test_betweenness_rejects_bad_hops(spark):
    from igpm_pem_spark.operators.centrality import betweenness_seeded

    with pytest.raises(ValueError):
        betweenness_seeded(spark, edges_df(spark, [(1, 2)]), max_hops=0)
