"""Two-sweep diameter lower bound vs NetworkX ground truth."""

from __future__ import annotations

import networkx as nx

from igpm_pem_spark.queries._common import G_SPARSE_SQL, edges
from igpm_pem_spark.queries.graphq import _q_diameter_2sweep

SF = "/root/testdata/sf0.001"


def test_two_sweep_matches_networkx(spark):
    row = _q_diameter_2sweep(spark, SF).collect()[0]
    e = edges(spark, SF, G_SPARSE_SQL).collect()
    g = nx.Graph()
    g.add_edges_from((r["src"], r["dst"]) for r in e)
    # seed = max-degree vertex, ties by id
    seed = min(g.degree, key=lambda kv: (-kv[1], kv[0]))[0]
    assert row["seed"] == seed
    dist1 = nx.single_source_shortest_path_length(g, seed)
    assert row["n_reach"] == len(dist1)
    assert row["ecc_seed"] == max(dist1.values())
    far = min(dist1, key=lambda v: (-dist1[v], v))
    assert row["far"] == far
    ecc_far = max(nx.single_source_shortest_path_length(g, far).values())
    assert row["diameter_lb"] == ecc_far
    # the bound is a true lower bound on the giant component's diameter
    comp = g.subgraph(dist1.keys())
    assert row["diameter_lb"] <= nx.diameter(comp)
