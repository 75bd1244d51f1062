"""Reference-mirror fixture graphs (FIXTURES.md §3).

Data *values* copied from the reference's committed sample graphs
(``/root/reference/sample/static/*.json``, ``sample/dynamic/test1.json``)
so our kernels are tested on the exact graphs the reference tests on
(``query_test.py:10-50``). Node-link shape → (nodes, links, directed).

``ba_graph`` regenerates the Barabási–Albert scale/skew fixture family
(``generator.py:20-37``, seeded) via networkx when available; tests skip
otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .node_link import load_node_link

GRAPHS: dict[str, dict] = {
    # sample/static/test1.json — 6 cyan nodes, 8 'yes' edges
    "test1": {
        "directed": False,
        "nodes": [{"id": i, "label": "cyan"} for i in range(6)],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 0, "target": 3, "label": "yes"},
            {"source": 0, "target": 4, "label": "yes"},
            {"source": 1, "target": 3, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 2, "target": 4, "label": "yes"},
            {"source": 2, "target": 5, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
        ],
    },
    # sample/static/test1d.json — same edges, directed
    "test1d": {
        "directed": True,
        "nodes": [{"id": i, "label": "cyan"} for i in range(6)],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 0, "target": 3, "label": "yes"},
            {"source": 0, "target": 4, "label": "yes"},
            {"source": 1, "target": 3, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 2, "target": 4, "label": "yes"},
            {"source": 2, "target": 5, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
        ],
    },
    # sample/static/test1p.json — score props, mixed yes/no labels
    "test1p": {
        "directed": False,
        "nodes": [
            {"id": 0, "label": "cyan", "score": 1.0},
            {"id": 1, "label": "cyan", "score": 2.0},
            {"id": 2, "label": "cyan", "score": 1.0},
            {"id": 3, "label": "cyan", "score": 2.0},
            {"id": 4, "label": "cyan", "score": 3.0},
            {"id": 5, "label": "cyan", "score": 2.0},
        ],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 0, "target": 3, "label": "yes"},
            {"source": 0, "target": 4, "label": "yes"},
            {"source": 1, "target": 3, "label": "no"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 2, "target": 4, "label": "no"},
            {"source": 3, "target": 4, "label": "yes"},
            {"source": 2, "target": 5, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
        ],
    },
    # sample/static/test1a.json shape — score props stored as STRINGS
    # ("1","2"…): the reference coerces digit-strings to float at condition
    # eval (ConditionParser.py:77-80,118-127); our props map is
    # MAP<STRING,STRING>, so this exercises the cast path
    "test1a": {
        "directed": False,
        "nodes": [
            {"id": 0, "label": "cyan", "score": "1"},
            {"id": 1, "label": "cyan", "score": "2"},
            {"id": 2, "label": "cyan", "score": "1"},
            {"id": 3, "label": "cyan", "score": "2"},
            {"id": 4, "label": "cyan", "score": "3"},
            {"id": 5, "label": "cyan", "score": "2"},
        ],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 0, "target": 3, "label": "yes"},
            {"source": 0, "target": 4, "label": "yes"},
            {"source": 1, "target": 3, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 2, "target": 4, "label": "yes"},
            {"source": 2, "target": 5, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
        ],
    },
    # sample/static/test2.json — cyan/magenta labels
    "test2": {
        "directed": False,
        "nodes": [
            {"id": 0, "label": "cyan"},
            {"id": 1, "label": "magenta"},
            {"id": 2, "label": "cyan"},
            {"id": 3, "label": "magenta"},
            {"id": 4, "label": "cyan"},
            {"id": 5, "label": "magenta"},
        ],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 0, "target": 3, "label": "yes"},
            {"source": 0, "target": 4, "label": "yes"},
            {"source": 1, "target": 3, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 2, "target": 4, "label": "yes"},
            {"source": 2, "target": 5, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
        ],
    },
    # sample/static/test2d.json — cyan/magenta labels, directed (case 2-2)
    "test2d": {
        "directed": True,
        "nodes": [
            {"id": 0, "label": "cyan"},
            {"id": 1, "label": "magenta"},
            {"id": 2, "label": "cyan"},
            {"id": 3, "label": "magenta"},
            {"id": 4, "label": "cyan"},
            {"id": 5, "label": "magenta"},
        ],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 0, "target": 3, "label": "yes"},
            {"source": 0, "target": 4, "label": "yes"},
            {"source": 1, "target": 3, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 2, "target": 4, "label": "yes"},
            {"source": 2, "target": 5, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
        ],
    },
    # sample/static/test0p.json — 4-cycle, path-closing case 4-3
    "test0p": {
        "directed": False,
        "nodes": [{"id": i, "label": "cyan"} for i in range(4)],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 1, "target": 2, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 3, "target": 0, "label": "yes"},
        ],
    },
    # sample/static/test4.json — multigraph: parallel 0-1 edges yes+no
    "test4": {
        "directed": False,
        "nodes": [
            {"id": 0, "label": "cyan"},
            {"id": 1, "label": "magenta"},
            {"id": 2, "label": "cyan"},
            {"id": 3, "label": "magenta"},
            {"id": 4, "label": "cyan"},
            {"id": 5, "label": "magenta"},
            {"id": 6, "label": "cyan"},
        ],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 0, "target": 1, "label": "no"},
            {"source": 0, "target": 3, "label": "yes"},
            {"source": 0, "target": 4, "label": "yes"},
            {"source": 1, "target": 3, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
            {"source": 2, "target": 4, "label": "yes"},
            {"source": 2, "target": 5, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
            {"source": 4, "target": 6, "label": "yes"},
            {"source": 5, "target": 6, "label": "yes"},
        ],
    },
    # sample/static/line.json — 4-node path
    "line": {
        "directed": False,
        "nodes": [{"id": i, "label": "cyan"} for i in range(4)],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 1, "target": 2, "label": "yes"},
            {"source": 2, "target": 3, "label": "yes"},
        ],
    },
    # sample/dynamic/test1.json — test1 with add ∈ {0,1,2}
    "dynamic_test1": {
        "directed": False,
        "nodes": [{"id": i, "label": "cyan"} for i in range(6)],
        "links": [
            {"source": 0, "target": 1, "label": "yes", "add": 0},
            {"source": 0, "target": 3, "label": "yes", "add": 0},
            {"source": 0, "target": 4, "label": "yes", "add": 1},
            {"source": 1, "target": 3, "label": "yes", "add": 0},
            {"source": 2, "target": 3, "label": "yes", "add": 1},
            {"source": 2, "target": 4, "label": "yes", "add": 2},
            {"source": 2, "target": 5, "label": "yes", "add": 1},
            {"source": 4, "target": 5, "label": "yes", "add": 1},
        ],
    },
    # two components + an isolated pair — CC fixture (ours)
    "two_comp": {
        "directed": False,
        "nodes": [{"id": i, "label": "cyan"} for i in range(9)],
        "links": [
            {"source": 0, "target": 1, "label": "yes"},
            {"source": 1, "target": 2, "label": "yes"},
            {"source": 2, "target": 0, "label": "yes"},
            {"source": 3, "target": 4, "label": "yes"},
            {"source": 4, "target": 5, "label": "yes"},
            {"source": 7, "target": 8, "label": "yes"},
        ],
    },
}


def fixture_graph(
    spark: SparkSession, name: str
) -> tuple[DataFrame, DataFrame, bool]:
    g = GRAPHS[name]
    obj = {
        "directed": g["directed"],
        "nodes": g["nodes"],
        "links": g["links"],
    }
    return load_node_link(spark, obj)


def _nx_fixture(spark: SparkSession, g):
    obj = {
        "directed": False,
        "nodes": [{"id": int(v), "label": "cyan"} for v in g.nodes()],
        "links": [
            {"source": int(u), "target": int(v), "label": "yes"} for u, v in g.edges()
        ],
    }
    return load_node_link(spark, obj)


def ba_graph(spark: SparkSession, n: int = 100, m: int = 4, seed: int = 0):
    """Barabási–Albert scale/skew fixture (mirrors the reference's
    ``generator.py:20-37`` BA family, ``sample/large/barabasi_albert-100_4.json``).
    Returns (vertices, edges, directed=False)."""
    import networkx as nx

    return _nx_fixture(spark, nx.barabasi_albert_graph(n, m, seed=seed))


def powerlaw_cluster_graph(
    spark: SparkSession, n: int = 100, m: int = 4, p: float = 0.2, seed: int = 0
):
    """Powerlaw-cluster fixture — the reference's second generator family
    (``generator.py:40-85``, its hard-coded p=0.2 is the default here).
    Returns (vertices, edges, directed=False)."""
    import networkx as nx

    return _nx_fixture(spark, nx.powerlaw_cluster_graph(n, m, p, seed=seed))


def random_regular_graph(
    spark: SparkSession, n: int = 100, d: int = 4, seed: int = 0
):
    """Random d-regular fixture (``generator.py:88-133``).
    Returns (vertices, edges, directed=False)."""
    import networkx as nx

    return _nx_fixture(spark, nx.random_regular_graph(d, n, seed=seed))
