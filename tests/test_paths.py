"""EXTRACT parity: materialized best paths (reference extract.py:82-96
getPath + gray_multiple.py:446-449 bridge), not just reachability."""

from __future__ import annotations

from igpm_pem_spark.operators.paths import path_closure, shortest_paths
from igpm_pem_spark.sources.fixtures import fixture_graph


def _paths(spark, graph, **kw):
    _, edges, directed = fixture_graph(spark, graph)
    kw.setdefault("directed", directed)
    return {
        (r.src, r.dst): (r.hops, list(r.path))
        for r in shortest_paths(edges, **kw).collect()
    }


def test_shortest_paths_on_line(spark):
    got = _paths(spark, "line")
    assert got[(0, 3)] == (3, [0, 1, 2, 3])
    assert got[(3, 0)] == (3, [3, 2, 1, 0])
    assert got[(0, 2)] == (2, [0, 1, 2])
    assert got[(1, 2)] == (1, [1, 2])


def test_shortest_paths_on_cycle_tiebreak(spark):
    # test0p is the 4-cycle 0-1-2-3-0 (reference case 4-3's graph): the
    # two opposite corners have two 2-hop paths; the lexicographically
    # smaller vertex array must be the deterministic representative
    got = _paths(spark, "test0p")
    assert got[(0, 2)] == (2, [0, 1, 2])  # not [0, 3, 2]
    assert got[(1, 3)] == (2, [1, 0, 3])  # not [1, 2, 3]
    assert got[(0, 1)] == (1, [0, 1])


def test_shortest_paths_respect_labels(spark):
    # test1p has a 'no'-labeled edge 1-3: with label='yes' the direct hop
    # disappears and the best 1→3 path must route around it
    got = _paths(spark, "test1p", label="yes")
    hops, path = got[(1, 3)]
    assert hops == 2 and path[0] == 1 and path[-1] == 3 and len(path) == 3
    # every consecutive pair in every path is a real 'yes' edge
    _, edges, _ = fixture_graph(spark, "test1p")
    yes = {
        (r.src, r.dst)
        for r in edges.where("label = 'yes'").select("src", "dst").collect()
    }
    yes |= {(b, a) for a, b in yes}
    for (s, d), (h, p) in got.items():
        assert len(p) == h + 1 and p[0] == s and p[-1] == d
        for a, b in zip(p, p[1:]):
            assert (a, b) in yes


def test_shortest_paths_agree_with_closure(spark):
    # hop counts must equal path_closure's (the join-relation spec)
    _, edges, _ = fixture_graph(spark, "test1")
    cl = {(r.src, r.dst): r.hops for r in path_closure(edges).collect()}
    sp = {(r.src, r.dst): r.hops for r in shortest_paths(edges).collect()}
    assert sp == cl


def test_shortest_paths_directed(spark):
    _, edges, _ = fixture_graph(spark, "test1d")
    got = {
        (r.src, r.dst): list(r.path)
        for r in shortest_paths(edges, directed=True).collect()
    }
    # 0→5 needs 0→4→5 (directed); 5 has no out-edges, so no (5, x) rows
    assert got[(0, 5)] == [0, 4, 5]
    assert not any(s == 5 for s, _ in got)


def test_path_closure_delta_equals_closure_diff(spark):
    """The seeded delta closure must equal the brute diff
    closure(old ∪ new) − closure(old) exactly, directed and not."""
    from igpm_pem_spark.operators.paths import path_closure, path_closure_delta
    from igpm_pem_spark.sources.fixtures import ba_graph

    _, edges, _ = ba_graph(spark, 40, 2, seed=6)
    old = edges.where("src % 5 != 0")
    new = edges.where("src % 5 = 0")
    for directed in (False, True):
        got = {
            (r.src, r.dst)
            for r in path_closure_delta(old, new, 3, directed).collect()
        }
        cum_p = {
            (r.src, r.dst)
            for r in path_closure(edges, 3, directed).collect()
        }
        old_p = {
            (r.src, r.dst)
            for r in path_closure(old, 3, directed).collect()
        }
        assert got == cum_p - old_p, directed


def test_path_closure_from_restricts_sources(spark):
    from igpm_pem_spark.operators.paths import path_closure, path_closure_from
    from igpm_pem_spark.sources.fixtures import ba_graph

    _, edges, _ = ba_graph(spark, 40, 2, seed=7)
    seeds = spark.createDataFrame([(1,), (5,)], "id BIGINT")
    got = {
        (r.src, r.dst, r.hops)
        for r in path_closure_from(edges, seeds, 3).collect()
    }
    full = {
        (r.src, r.dst, r.hops)
        for r in path_closure(edges, 3).collect()
        if r.src in (1, 5)
    }
    assert got == full
