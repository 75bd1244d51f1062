"""Session-8 operators: densest-subgraph greedy peel, 1-WL color
refinement, bootstrap-percolation cascade — parity vs brute-force /
python oracles on handcrafted and random graphs."""

from __future__ import annotations

import collections
import itertools
import random

import pytest

from igpm_pem_spark.operators.cascade import bootstrap_percolation
from igpm_pem_spark.operators.densest import densest_subgraph_peel
from igpm_pem_spark.operators.wl import wl_colors, wl_histogram


# ---- python references ---------------------------------------------------
def _peel_reference(pairs):
    """Python replay of the eps=1/2 greedy peel; returns (stats, best)."""
    E = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    V = {v for e in E for v in e}
    stats, r = [], 0
    best = (0, 1, -1)  # (round, V, E) with density -1
    while V:
        nv, ne = len(V), len(E)
        stats.append((r, nv, ne))
        if ne * best[1] > best[2] * nv:
            best = (r, nv, ne)
        deg = collections.Counter(itertools.chain.from_iterable(E))
        V = {v for v in V if deg.get(v, 0) * nv > 3 * ne}
        E = {e for e in E if e[0] in V and e[1] in V}
        r += 1
    return stats, best[0]


def _wl_reference(pairs, rounds):
    """Pure-python 1-WL with the SAME portable hash string format."""
    import hashlib

    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color = {v: str(len(adj[v])) for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            runs = collections.Counter(color[u] for u in adj[v])
            sig = ";".join(
                sorted(f"{c}x{n}" for c, n in runs.items())
            )
            new[v] = hashlib.md5(f"{color[v]}|{sig}".encode()).hexdigest()[:16]
        color = new
    return color


def _cascade_reference(pairs, seeds, theta):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    active = {s: 0 for s in seeds}
    r = 0
    while True:
        cnt = collections.Counter(
            u for v in active for u in adj[v] if u not in active
        )
        new = sorted(u for u, c in cnt.items() if c >= theta)
        if not new:
            return active, r
        r += 1
        for u in new:
            active[u] = r


def _random_pairs(seed, n=40, m=120):
    rng = random.Random(seed)
    return list({
        (a, b)
        for a, b in (
            sorted(rng.sample(range(n), 2)) for _ in range(m)
        )
    })


# ---- densest --------------------------------------------------------------
def test_densest_clique_plus_path(spark):
    # K5 (density 2.0) with a pendant path: peel strips the path first,
    # the best round is the one whose snapshot is (close to) the clique
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    path = [(4, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(k5 + path, "src long, dst long")
    res = densest_subgraph_peel(spark, e)
    assert res.converged
    stats = {r.round: (r.n_vertices, r.n_edges) for r in res.stats.collect()}
    ref_stats, ref_best = _peel_reference(k5 + path)
    assert stats == {r: (v, m) for r, v, m in ref_stats}
    assert res.best_round == ref_best
    best = {r.id for r in res.best_vertices.collect()}
    # the K5 must survive into the best snapshot
    assert {0, 1, 2, 3, 4} <= best


@pytest.mark.parametrize("seed", [1, 2])
def test_densest_random_parity(spark, seed):
    pairs = _random_pairs(seed)
    e = spark.createDataFrame(pairs, "src long, dst long")
    res = densest_subgraph_peel(spark, e)
    assert res.converged
    ref_stats, ref_best = _peel_reference(pairs)
    got = sorted(
        (r.round, r.n_vertices, r.n_edges) for r in res.stats.collect()
    )
    assert got == sorted(ref_stats)
    assert res.best_round == ref_best


# ---- 1-WL ------------------------------------------------------------------
def test_wl_distinguishes_path_from_star(spark):
    # P4 and K1,3 have the same degree multiset {1,1,2,2} vs {1,1,1,3} —
    # actually distinguishable at round 0 already; use C6 vs 2xC3:
    # same degree sequence (all 2), split by round-1 refinement? No —
    # 1-WL cannot split C6 from 2xC3 (classic counterexample): equal
    # histograms expected. Pin BOTH behaviors.
    c6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]
    two_c3 = [(10, 11), (11, 12), (12, 10), (20, 21), (21, 22), (22, 20)]
    h1 = {
        (r.color, r.n_vertices)
        for r in wl_histogram(
            spark.createDataFrame(c6, "src long, dst long"), rounds=3
        ).collect()
    }
    h2 = {
        (r.color, r.n_vertices)
        for r in wl_histogram(
            spark.createDataFrame(two_c3, "src long, dst long"), rounds=3
        ).collect()
    }
    assert h1 == h2  # the known 1-WL blind spot — regular graphs
    # a path P6 (not regular) must differ from C6
    p6 = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    h3 = {
        (r.color, r.n_vertices)
        for r in wl_histogram(
            spark.createDataFrame(p6, "src long, dst long"), rounds=3
        ).collect()
    }
    assert h3 != h1


@pytest.mark.parametrize("seed", [3])
def test_wl_python_parity(spark, seed):
    pairs = _random_pairs(seed)
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.id: r.color for r in wl_colors(e, rounds=3).collect()}
    assert got == _wl_reference(pairs, 3)


def test_wl_isomorphic_relabel_same_histogram(spark):
    pairs = _random_pairs(7)
    remap = {v: v * 13 + 5 for e in pairs for v in e}
    relabeled = [(remap[a], remap[b]) for a, b in pairs]
    h1 = sorted(
        (r.color, r.n_vertices)
        for r in wl_histogram(
            spark.createDataFrame(pairs, "src long, dst long")
        ).collect()
    )
    h2 = sorted(
        (r.color, r.n_vertices)
        for r in wl_histogram(
            spark.createDataFrame(relabeled, "src long, dst long")
        ).collect()
    )
    assert h1 == h2


# ---- cascade ----------------------------------------------------------------
def test_cascade_hand_trace(spark):
    # seeds {0,1}; 2 needs two active neighbors -> round 1;
    # 3 adjacent to 2 only -> never (threshold 2); 4 adjacent to 2 and 0
    # -> round 2 (only after 2 activates).
    pairs = [(0, 2), (1, 2), (2, 3), (2, 4), (0, 4)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    res = bootstrap_percolation(spark, e, seeds, threshold=2)
    got = {r.id: r.round for r in res.activated.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 4: 2}
    assert res.converged and res.rounds == 2


@pytest.mark.parametrize("seed,theta", [(11, 2), (12, 3)])
def test_cascade_random_parity(spark, seed, theta):
    pairs = _random_pairs(seed, n=30, m=140)
    seeds = sorted({v for e in pairs for v in e})[:4]
    e = spark.createDataFrame(pairs, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    res = bootstrap_percolation(spark, e, sdf, threshold=theta)
    got = {r.id: r.round for r in res.activated.collect()}
    ref, ref_rounds = _cascade_reference(pairs, seeds, theta)
    assert got == ref
    assert res.converged and res.rounds == ref_rounds


def test_cascade_threshold_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    s = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError, match="threshold"):
        bootstrap_percolation(spark, e, s, threshold=0)
