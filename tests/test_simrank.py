"""SimRank seed-pair scores vs the textbook all-pairs iteration."""

from __future__ import annotations

import pytest

from igpm_pem_spark.operators.simrank import simrank_pairs

C = 0.8


def _brute_simrank2(edge_list):
    """Textbook SimRank: s0 = identity, two full iterations over all
    vertex pairs. Returns (indeg, s1, s2) dicts."""
    nodes = sorted({v for e in edge_list for v in e})
    preds = {v: sorted({s for (s, d) in edge_list if d == v and s != d}) for v in nodes}

    def step(prev):
        cur = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    cur[(a, b)] = 1.0
                elif preds[a] and preds[b]:
                    tot = sum(prev[(u, v)] for u in preds[a] for v in preds[b])
                    cur[(a, b)] = C * tot / (len(preds[a]) * len(preds[b]))
                else:
                    cur[(a, b)] = 0.0
        return cur

    s0 = {(a, b): 1.0 if a == b else 0.0 for a in nodes for b in nodes}
    s1 = step(s0)
    s2 = step(s1)
    return preds, s1, s2


def _run(spark, edge_list, n_seeds):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_list], "src BIGINT, dst BIGINT"
    )
    return {
        (r["a"], r["b"]): r for r in simrank_pairs(df, n_seeds=n_seeds).collect()
    }


def _check(spark, edge_list, n_seeds):
    preds, s1, s2 = _brute_simrank2(edge_list)
    got = _run(spark, edge_list, n_seeds)
    # seed selection: top in-degree among vertices WITH in-edges, ties by id
    # (a zero-in-degree vertex scores 0 against everything — never a seed)
    cand = [v for v in preds if preds[v]]
    seeds = sorted(cand, key=lambda v: (-len(preds[v]), v))[:n_seeds]
    want_pairs = {(a, b) for a in seeds for b in seeds if a < b}
    assert set(got) == want_pairs
    for (a, b), r in got.items():
        assert r["na"] == len(preds[a]) and r["nb"] == len(preds[b])
        assert r["common"] == len(set(preds[a]) & set(preds[b]))
        assert r["s1"] == pytest.approx(s1[(a, b)], abs=2e-6)
        assert r["s2"] == pytest.approx(s2[(a, b)], abs=2e-6)


def test_diamond_with_shared_grandparents(spark):
    # 1 and 2 both cite into 3 and 4; 3,4 feed 5,6 — classic two-level case
    edges = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 6), (2, 5), (7, 6), (7, 5)]
    _check(spark, edges, n_seeds=4)


def test_no_shared_inneighbors_but_similar_parents(spark):
    # 5 and 6 share NO in-neighbor (s1 = 0) but their parents 3 and 4
    # share both of theirs, so s2 > 0 — the case the two-hop term exists for
    edges = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 6)]
    preds, s1, s2 = _brute_simrank2(edges)
    assert s1[(5, 6)] == 0.0 and s2[(5, 6)] > 0.0
    _check(spark, edges, n_seeds=6)


def test_cycle_and_reciprocal_edges(spark):
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3), (4, 1), (4, 2)]
    _check(spark, edges, n_seeds=3)


def test_validation():
    with pytest.raises(ValueError):
        simrank_pairs(None, n_seeds=1)
