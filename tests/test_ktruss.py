"""k-truss vs networkx.k_truss on fixture and random graphs."""

from __future__ import annotations

import networkx as nx
import pytest

from igpm_pem_spark.operators.ktruss import k_truss
from igpm_pem_spark.sources.fixtures import ba_graph

from .conftest import edges_df


def _check(spark, pairs, k):
    g = nx.Graph()
    g.add_edges_from(pairs)
    res = k_truss(spark, edges_df(spark, pairs), k)
    assert res.converged
    got = {(r.src, r.dst) for r in res.edges.collect()}
    want = {
        (min(a, b), max(a, b)) for a, b in nx.k_truss(g, k).edges
    }
    assert got == want
    return res


def test_ktruss_triangle_plus_tail(spark):
    # two triangles sharing an edge + a dangling path
    pairs = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    res = _check(spark, pairs, 3)
    assert res.dropped_per_round[0] > 0


def test_ktruss_k4_random(spark):
    import random

    rng = random.Random(9)
    pairs = list({
        tuple(sorted((rng.randrange(20), rng.randrange(20))))
        for _ in range(120)
    })
    pairs = [(a, b) for a, b in pairs if a != b]
    _check(spark, pairs, 4)


def test_ktruss_ba(spark):
    _, edges, _ = ba_graph(spark, 50, 4, seed=2)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    _check(spark, pairs, 3)


def test_ktruss_rejects_small_k(spark):
    with pytest.raises(ValueError):
        k_truss(spark, edges_df(spark, [(1, 2)]), 1)


def _nx_trussness(pairs):
    """Per-edge trussness: max k with e ∈ k_truss(g, k); min 2."""
    g = nx.Graph()
    g.add_edges_from(pairs)
    t = {tuple(sorted(e)): 2 for e in g.edges}
    k = 3
    while True:
        sub = nx.k_truss(g, k)
        if sub.number_of_edges() == 0:
            return t
        for e in sub.edges:
            t[tuple(sorted(e))] = k
        k += 1


@pytest.mark.parametrize("seed,n,m", [(9, 20, 120), (3, 40, 200)])
def test_trussness_hindex_matches_networkx(spark, seed, n, m):
    import random

    from igpm_pem_spark.operators.ktruss import trussness_hindex

    rng = random.Random(seed)
    pairs = [
        (a, b)
        for a, b in {
            tuple(sorted((rng.randrange(n), rng.randrange(n)))) for _ in range(m)
        }
        if a != b
    ]
    res = trussness_hindex(spark, edges_df(spark, pairs))
    assert res.converged
    got = {(r.src, r.dst): r.trussness for r in res.trussness.collect()}
    assert got == _nx_trussness(pairs)


def test_trussness_hindex_ba(spark):
    from igpm_pem_spark.operators.ktruss import trussness_hindex

    _, edges, _ = ba_graph(spark, 50, 4, seed=2)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    res = trussness_hindex(spark, edges_df(spark, pairs))
    assert res.converged
    got = {(r.src, r.dst): r.trussness for r in res.trussness.collect()}
    assert got == _nx_trussness(pairs)
