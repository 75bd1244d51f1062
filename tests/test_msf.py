"""Borůvka minimum spanning forest vs NetworkX."""

from __future__ import annotations

import networkx as nx

from igpm_pem_spark.operators.msf import minimum_spanning_forest


def _df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        "src BIGINT, dst BIGINT, w BIGINT",
    )


def _check(spark, triples):
    res = minimum_spanning_forest(spark, _df(spark, triples))
    assert res.converged
    forest = [(r["a"], r["b"], r["w"]) for r in res.forest.collect()]
    comp = {r["id"]: r["comp"] for r in res.components.collect()}

    g = nx.Graph()
    for a, b, w in triples:
        if a != b and (not g.has_edge(a, b) or g[a][b]["weight"] > w):
            g.add_edge(a, b, weight=w)
    want = list(nx.minimum_spanning_edges(g, algorithm="kruskal", data=True))
    # same vertex partition as the graph's components
    for cc in nx.connected_components(g):
        labels = {comp[v] for v in cc}
        assert len(labels) == 1 and min(cc) in labels
    # per-component edge count and total weight match (tie-independent)
    def agg(edges_iter, lab):
        out: dict = {}
        for a, b, w in edges_iter:
            c = lab[a]
            n, s = out.get(c, (0, 0))
            out[c] = (n + 1, s + w)
        return out

    got_agg = agg(forest, comp)
    want_agg = agg(((a, b, d["weight"]) for a, b, d in want), comp)
    assert got_agg == want_agg
    # forest edges exist in the input with the collapsed min weight
    emin = {}
    for a, b, w in triples:
        if a != b:
            k = (min(a, b), max(a, b))
            emin[k] = min(emin.get(k, w), w)
    for a, b, w in forest:
        assert emin[(a, b)] == w
    # n_edges = n_vertices - 1 per component (it is a spanning tree)
    from collections import Counter

    sizes = Counter(comp.values())
    for c, (n_e, _) in got_agg.items():
        assert n_e == sizes[c] - 1


def test_triangle_with_heavy_edge(spark):
    _check(spark, [(1, 2, 1), (2, 3, 1), (1, 3, 5)])


def test_two_components_and_parallel_edges(spark):
    _check(spark, [
        (1, 2, 3), (2, 1, 1), (2, 3, 2), (1, 3, 2),
        (10, 11, 7), (11, 12, 1), (10, 12, 1),
    ])


def test_uniform_weights_ties(spark):
    # all ties: forest weight = n-1 per component regardless of choice
    _check(spark, [(a, b, 1) for a in range(6) for b in range(a + 1, 6)])


def test_random_weighted_graph(spark):
    import random

    rng = random.Random(5)
    triples = [
        (rng.randrange(30), rng.randrange(30), rng.randrange(1, 9))
        for _ in range(120)
    ]
    _check(spark, [(a, b, w) for a, b, w in triples if a != b])


def test_chain_needs_multiple_rounds(spark):
    # long path: Borůvka still terminates in O(log V) rounds
    triples = [(i, i + 1, (i % 3) + 1) for i in range(32)]
    res = minimum_spanning_forest(spark, _df(spark, triples))
    assert res.converged and res.rounds <= 6
    _check(spark, triples)


def test_msf_resume_matches_uninterrupted(spark, tmp_path):
    import random

    rng = random.Random(9)
    triples = [
        (rng.randrange(40), rng.randrange(40), rng.randrange(1, 9))
        for _ in range(100)
    ]
    triples = [(a, b, w) for a, b, w in triples if a != b]
    df = _df(spark, triples)
    ckpt = str(tmp_path / "msf")

    full = minimum_spanning_forest(spark, df)
    assert full.converged and full.rounds >= 2
    want_forest = {(r["a"], r["b"], r["w"]) for r in full.forest.collect()}
    want_comp = {r["id"]: r["comp"] for r in full.components.collect()}

    partial = minimum_spanning_forest(spark, df, max_rounds=1, checkpoint_dir=ckpt)
    assert not partial.converged and partial.rounds == 1

    resumed = minimum_spanning_forest(spark, df, checkpoint_dir=ckpt)
    assert resumed.resumed_from == 0
    assert resumed.converged and resumed.rounds == full.rounds
    got_forest = {(r["a"], r["b"], r["w"]) for r in resumed.forest.collect()}
    got_comp = {r["id"]: r["comp"] for r in resumed.components.collect()}
    assert got_forest == want_forest  # deterministic tie order -> same forest
    assert got_comp == want_comp
