"""Jones-Plassmann coloring: properness + greedy-color bound + coverage.
ANF-KMV: exact regime (k > ball size) equals true reach counts."""

from __future__ import annotations

import networkx as nx
import pytest

from pyspark.sql import functions as F

from igpm_pem_spark.operators.coloring import jp_coloring
from igpm_pem_spark.operators.sketch import anf_kmv

from .conftest import edges_df


def _color_check(spark, pairs, rounds=16):
    g = nx.Graph()
    g.add_edges_from(pairs)
    res = jp_coloring(spark, edges_df(spark, pairs), rounds=rounds)
    got = {r.id: r.color for r in res.colored.collect()}
    # proper: no edge monochromatic among colored endpoints
    for a, b in g.edges():
        if a in got and b in got:
            assert got[a] != got[b], (a, b)
    # greedy bound: color(v) <= deg(v)
    for v, c in got.items():
        assert 0 <= c <= g.degree(v)
    return res, got, g


def test_jp_coloring_path_and_cycles(spark):
    res, got, g = _color_check(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert res.converged and set(got) == set(g.nodes())
    _color_check(spark, [(i, (i + 1) % 7) for i in range(7)])  # odd cycle


def test_jp_coloring_clique_needs_k_colors(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    res, got, g = _color_check(spark, pairs, rounds=8)
    assert res.converged and sorted(got.values()) == [0, 1, 2, 3, 4]


def test_jp_coloring_random_graphs(spark):
    import random

    for seed in (5, 11):
        rng = random.Random(seed)
        pairs = list({(rng.randrange(18), rng.randrange(18)) for _ in range(50)})
        pairs = [(a, b) for a, b in pairs if a != b]
        res, got, g = _color_check(spark, pairs, rounds=20)
        assert res.converged and set(got) == set(g.nodes())


def test_anf_exact_regime_matches_reach_counts(spark):
    # two components: a 5-path and a triangle; k=32 >> any ball, so every
    # sketch is exact and n_reach_est IS the true |ball(v, h)|
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10)]
    g = nx.Graph()
    g.add_edges_from(pairs)
    out = anf_kmv(spark, edges_df(spark, pairs), hops=3, k=32)
    got = {(r.id, r.h): r.n_reach_est for r in out.collect()}
    for v in g.nodes():
        for h in (1, 2, 3):
            want = len(nx.single_source_shortest_path_length(g, v, cutoff=h))
            assert got[(v, h)] == want, (v, h)


def test_anf_estimator_regime_is_sane(spark):
    # star with 60 leaves, k=8: hub's 1-hop ball (61) is estimated, not
    # exact — the estimate must be within the textbook ~1/sqrt(k-2) band
    pairs = [(0, i) for i in range(1, 61)]
    out = anf_kmv(spark, edges_df(spark, pairs), hops=1, k=8)
    hub = next(r for r in out.collect() if r.id == 0)
    assert hub.k_used == 8
    assert 25 <= hub.n_reach_est <= 160  # 61 within a few sigma


def test_anf_effective_diameter_curve_path_graph(spark):
    """Reach-curve composition (queries/graphq.py::_q_eff_diameter
    semantics) in the exact regime (k > every ball): path 0-..-6, the
    h-hop ball sizes are known in closed form and the 90% threshold
    lands where hand arithmetic says."""
    pairs = [(i, i + 1) for i in range(6)]  # path on 7 vertices
    out = anf_kmv(spark, edges_df(spark, pairs), hops=6, k=32)
    curve = {
        r.h: r.total
        for r in out.groupBy("h")
        .agg(F.sum("n_reach_est").alias("total"))
        .collect()
    }
    # ball sizes on a 7-path: |ball(v,h)| = min(v,h) + min(6-v,h) + 1
    want = {
        h: sum(min(v, h) + min(6 - v, h) + 1 for v in range(7))
        for h in range(1, 7)
    }
    assert curve == want
    sat = want[6]
    reaches90 = {h: curve[h] * 10 >= sat * 9 for h in curve}
    # 90% of 49 = 44.1; totals: h=4 -> 43 (False), h=5 -> 47 (True)
    assert reaches90 == {1: False, 2: False, 3: False, 4: False, 5: True, 6: True}
