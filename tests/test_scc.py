"""SCC kernel vs nx.strongly_connected_components: hand graphs, random
digraphs, DAGs (all-singleton), single big cycle."""

from __future__ import annotations

import networkx as nx
import pytest

from igpm_pem_spark.operators.scc import strongly_connected_components

from .conftest import edges_df


def _check(spark, pairs):
    g = nx.DiGraph()
    g.add_edges_from(pairs)
    res = strongly_connected_components(spark, edges_df(spark, pairs))
    got = {}
    for r in res.components.collect():
        got.setdefault(r.scc, set()).add(r.id)
    want = {min(c): set(c) for c in nx.strongly_connected_components(g)}
    assert got == want
    return res


def test_scc_two_cycles_and_bridge(spark):
    # 1->2->3->1 and 5->6->5, bridged 3->5, plus a tail 6->7
    pairs = [(1, 2), (2, 3), (3, 1), (5, 6), (6, 5), (3, 5), (6, 7)]
    res = _check(spark, pairs)
    assert res.converged


def test_scc_dag_all_singletons(spark):
    pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    res = _check(spark, pairs)
    # a pure DAG is entirely periphery: the trim pass peels every vertex
    # before a single coloring phase runs
    assert res.phases == 0


def test_scc_one_big_cycle(spark):
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    res = _check(spark, pairs)
    assert res.phases == 1


def test_scc_random_digraphs(spark):
    import random

    for seed in (3, 7):
        rng = random.Random(seed)
        pairs = list({
            (rng.randrange(15), rng.randrange(15)) for _ in range(45)
        })
        pairs = [(a, b) for a, b in pairs if a != b]
        _check(spark, pairs)


def test_condensation_levels_vs_networkx(spark):
    from igpm_pem_spark.operators.scc import condensation_levels

    # cycle {1,2,3} -> 4 -> cycle {5,6} -> 7; plus source 8 -> 4
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5), (6, 7), (8, 4)]
    g = nx.DiGraph()
    g.add_edges_from(pairs)
    got = {
        r.scc: r.level
        for r in condensation_levels(spark, edges_df(spark, pairs)).collect()
    }
    cond = nx.condensation(g)
    # longest path from a source, per condensation node (same recurrence)
    want_lv = {}
    for n in nx.topological_sort(cond):
        preds = list(cond.predecessors(n))
        want_lv[n] = 0 if not preds else 1 + max(want_lv[p] for p in preds)
    want = {min(cond.nodes[n]["members"]): lv for n, lv in want_lv.items()}
    assert got == want
