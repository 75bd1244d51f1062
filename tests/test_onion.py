"""Onion decomposition: NetworkX parity + coreness cross-check."""

from __future__ import annotations

import networkx as nx
import pytest

from igpm_pem_spark.operators.kcore import coreness_hindex, onion_layers


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src BIGINT, dst BIGINT"
    )


def _check_nx(spark, pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    want_layers = nx.onion_layers(g)
    want_core = nx.core_number(g)
    res = onion_layers(spark, _edges_df(spark, pairs))
    assert res.converged
    got = {r["id"]: (r["layer"], r["onion_core"]) for r in res.layers.collect()}
    assert set(got) == set(want_layers)
    for v, (layer, core) in got.items():
        assert layer == want_layers[v], (v, layer, want_layers[v])
        assert core == want_core[v], (v, core, want_core[v])


def test_path_graph(spark):
    _check_nx(spark, [(i, i + 1) for i in range(8)])


def test_clique_with_pendant_chain(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(4, 10), (10, 11), (11, 12)]
    _check_nx(spark, pairs)


def test_two_cores_and_star(spark):
    # triangle core, a 4-clique core, and a star periphery
    pairs = [(1, 2), (2, 3), (3, 1)]
    pairs += [(a, b) for a in (20, 21, 22, 23) for b in (20, 21, 22, 23) if a < b]
    pairs += [(1, 30), (1, 31), (1, 32), (20, 30)]
    _check_nx(spark, pairs)


def test_random_graph_parity(spark):
    import random

    rng = random.Random(7)
    pairs = {(rng.randrange(40), rng.randrange(40)) for _ in range(120)}
    pairs = [(a, b) for a, b in pairs if a != b]
    _check_nx(spark, pairs)


def test_onion_core_equals_hindex_coreness(spark):
    import random

    rng = random.Random(11)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(200)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = _edges_df(spark, pairs)
    onion = {
        r["id"]: r["onion_core"]
        for r in onion_layers(spark, df).layers.collect()
    }
    core = {
        r["id"]: r["coreness"]
        for r in coreness_hindex(spark, df).coreness.collect()
    }
    assert onion == core


def test_layers_refine_cores(spark):
    # within one graph: layer order never contradicts core order
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)] + [
        (0, 10), (10, 11), (5, 11),
    ]
    res = onion_layers(spark, _edges_df(spark, pairs))
    rows = res.layers.collect()
    for r1 in rows:
        for r2 in rows:
            if r1["onion_core"] < r2["onion_core"]:
                assert r1["layer"] < r2["layer"]


def test_onion_resume_matches_uninterrupted(spark, tmp_path):
    import random

    from igpm_pem_spark.operators.kcore import onion_layers

    rng = random.Random(3)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(160)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = _edges_df(spark, pairs)
    ckpt = str(tmp_path / "onion")

    full = onion_layers(spark, df)
    assert full.converged and full.rounds >= 3
    want = {r["id"]: (r["layer"], r["onion_core"]) for r in full.layers.collect()}

    # "killed" after 2 peel rounds
    partial = onion_layers(spark, df, max_rounds=2, checkpoint_dir=ckpt)
    assert not partial.converged and partial.rounds == 2

    resumed = onion_layers(spark, df, checkpoint_dir=ckpt)
    assert resumed.resumed_from == 1
    assert resumed.converged and resumed.rounds == full.rounds
    got = {r["id"]: (r["layer"], r["onion_core"]) for r in resumed.layers.collect()}
    assert got == want
