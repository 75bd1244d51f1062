"""Handshake maximal matching: matching/maximality invariants vs a pure
NetworkX check, determinism across partitionings, and Spark≡DuckDB parity
of the fixed-round form (the driver-oracle contract)."""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest

from igpm_pem_spark.operators.matching import (
    handshake_matching,
    matching_oracle_sql,
)

from .conftest import edges_df


def _ba_pairs(n=60, m=3, seed=7):
    g = nx.barabasi_albert_graph(n, m, seed=seed)
    return [(int(a), int(b)) for a, b in g.edges()]


def test_handshake_matching_is_maximal_matching(spark):
    pairs = _ba_pairs()
    res = handshake_matching(spark, edges_df(spark, pairs), rounds=30)
    matched = [(r.src, r.dst) for r in res.matched.collect()]
    assert res.converged
    # a matching: no vertex appears twice
    verts = [v for e in matched for v in e]
    assert len(verts) == len(set(verts))
    # maximal: every edge touches a matched vertex
    vs = set(verts)
    for a, b in pairs:
        assert a in vs or b in vs, (a, b)


def test_handshake_matching_deterministic_across_partitioning(spark):
    pairs = _ba_pairs(n=40, m=2, seed=11)
    r1 = handshake_matching(spark, edges_df(spark, pairs).repartition(1), rounds=8)
    r2 = handshake_matching(spark, edges_df(spark, pairs).repartition(7), rounds=8)
    m1 = sorted((r.src, r.dst, r.rnd) for r in r1.matched.collect())
    m2 = sorted((r.src, r.dst, r.rnd) for r in r2.matched.collect())
    assert m1 == m2 and len(m1) > 0


def test_handshake_matching_matches_duckdb_oracle(spark):
    pairs = _ba_pairs(n=50, m=2, seed=3)
    res = handshake_matching(spark, edges_df(spark, pairs), rounds=4)
    got = sorted((r.src, r.dst, r.rnd) for r in res.matched.collect())
    con = duckdb.connect()
    rows = ", ".join(f"({a}, {b})" for a, b in pairs)
    g_sql = f"SELECT src, dst FROM (VALUES {rows}) AS t(src, dst)"
    want = sorted(
        tuple(r) for r in con.sql(matching_oracle_sql(g_sql, rounds=4)).fetchall()
    )
    assert got == want and len(got) > 0


def test_handshake_matching_empty_graph(spark):
    res = handshake_matching(
        spark, spark.createDataFrame([], "src BIGINT, dst BIGINT"), rounds=3
    )
    assert res.matched.count() == 0 and res.converged


@pytest.mark.parametrize("rounds", [1, 2])
def test_handshake_matching_fixed_rounds_prefix_property(spark, rounds):
    """The k-round result is a prefix of the (k+1)-round result — rounds
    only ever add matches over the shrinking live graph."""
    pairs = _ba_pairs(n=30, m=2, seed=5)
    small = handshake_matching(spark, edges_df(spark, pairs), rounds=rounds)
    big = handshake_matching(spark, edges_df(spark, pairs), rounds=rounds + 1)
    ms = {(r.src, r.dst, r.rnd) for r in small.matched.collect()}
    mb = {(r.src, r.dst, r.rnd) for r in big.matched.collect()}
    assert ms <= mb


def test_luby_mis_is_maximal_independent_set(spark):
    from igpm_pem_spark.operators.matching import luby_mis

    pairs = _ba_pairs(n=60, m=3, seed=9)
    res = luby_mis(spark, edges_df(spark, pairs), rounds=30)
    assert res.converged
    mis = {r.id for r in res.matched.collect()}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independent: no edge inside the set
    for a, b in pairs:
        assert not (a in mis and b in mis), (a, b)
    # maximal: every non-member has a member neighbor
    for v in set(adj) - mis:
        assert adj[v] & mis, v


def test_luby_mis_matches_duckdb_oracle(spark):
    from igpm_pem_spark.operators.matching import luby_mis, mis_oracle_sql

    pairs = _ba_pairs(n=40, m=2, seed=13)
    res = luby_mis(spark, edges_df(spark, pairs), rounds=4)
    got = sorted((r.id, r.rnd) for r in res.matched.collect())
    con = duckdb.connect()
    rows = ", ".join(f"({a}, {b})" for a, b in pairs)
    g_sql = f"SELECT src, dst FROM (VALUES {rows}) AS t(src, dst)"
    want = sorted(tuple(r) for r in con.sql(mis_oracle_sql(g_sql, rounds=4)).fetchall())
    assert got == want and len(got) > 0


def test_coarsen_once_halves_and_matches_oracle(spark):
    from igpm_pem_spark.operators.matching import coarsen_once, coarsen_oracle_sql

    pairs = _ba_pairs(n=40, m=2, seed=17)
    coarse = coarsen_once(spark, edges_df(spark, pairs), rounds=8)
    got = sorted((r.src, r.dst) for r in coarse.collect())
    con = duckdb.connect()
    rows = ", ".join(f"({a}, {b})" for a, b in pairs)
    g_sql = f"SELECT src, dst FROM (VALUES {rows}) AS t(src, dst)"
    want = sorted(
        tuple(r) for r in con.sql(coarsen_oracle_sql(g_sql, rounds=8)).fetchall()
    )
    assert got == want
    # contraction shrinks the vertex set (matching is non-trivial on BA graphs)
    n_coarse = len({v for e in got for v in e})
    n_orig = len({v for e in pairs for v in e})
    assert n_coarse < n_orig


def test_multilevel_coarsening_shrinks_and_preserves_components(spark):
    """Two coarsening levels (the METIS multilevel loop): each level
    shrinks the vertex set; contraction never splits or merges
    components (every contracted edge lies inside one component)."""
    from igpm_pem_spark.operators.matching import coarsen_once

    pairs = _ba_pairs(n=80, m=2, seed=23)
    g0 = nx.Graph(pairs)
    lvl1 = coarsen_once(spark, edges_df(spark, pairs), rounds=16)
    p1 = [(r.src, r.dst) for r in lvl1.collect()]
    lvl2 = coarsen_once(spark, edges_df(spark, p1), rounds=16)
    p2 = [(r.src, r.dst) for r in lvl2.collect()]

    n0 = len({v for e in pairs for v in e})
    n1 = len({v for e in p1 for v in e})
    n2 = len({v for e in p2 for v in e})
    assert n1 < n0 and n2 < n1
    # component count is invariant (BA graphs are connected, and no
    # component here collapses to an isolated supervertex)
    assert (
        nx.number_connected_components(nx.Graph(p1))
        == nx.number_connected_components(g0)
    )
    assert (
        nx.number_connected_components(nx.Graph(p2))
        == nx.number_connected_components(g0)
    )


def test_lpa_partitions_strategies(spark):
    """Window (spec) and hash (scale-fallback) packing both produce a
    total assignment into k parts; window balances within one community
    size of even."""
    from igpm_pem_spark.operators.partition import edge_cut_summary, lpa_partitions

    pairs = _ba_pairs(n=60, m=2, seed=29)
    e = edges_df(spark, pairs)
    for strategy in ("window", "hash"):
        a = lpa_partitions(spark, e, k=3, strategy=strategy)
        rows = a.collect()
        assert len(rows) == 60
        assert {r.part for r in rows} <= {0, 1, 2}
    s = edge_cut_summary(e, lpa_partitions(spark, e, k=3), k=3).first()
    assert s.n_edges > 0 and 0 <= s.cut_lpa <= s.n_edges
    assert s.n_parts_used <= 3
