"""NetworkX parity for the structural-metric ring: HITS, clustering
coefficient, assortativity, avg neighbor degree, Jaccard link prediction,
weighted SSSP."""

from __future__ import annotations

import math

import networkx as nx
import pytest

from igpm_pem_spark.operators.hits import hits, salsa
from igpm_pem_spark.operators.metrics import (
    avg_neighbor_degree,
    clustering_coefficient,
    degree_assortativity,
    link_prediction_jaccard,
)
from igpm_pem_spark.operators.sssp import sssp
from igpm_pem_spark.sources.fixtures import ba_graph

from .conftest import edges_df

# a small graph with hubs, leaves, and a triangle
PAIRS = [
    (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6), (6, 7),
    (7, 8), (2, 8), (1, 9),
]


def _nx(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return g


def _ba(spark):
    _, edges, _ = ba_graph(spark, 60, 3, seed=1)
    return edges, [(r.src, r.dst) for r in edges.collect()]


def test_clustering_matches_networkx(spark):
    e = edges_df(spark, PAIRS)
    got = {r.id: r.lcc for r in clustering_coefficient(e).collect()}
    want = nx.clustering(_nx(PAIRS))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_clustering_matches_networkx_ba(spark):
    edges, pairs = _ba(spark)
    got = {r.id: r.lcc for r in clustering_coefficient(edges).collect()}
    want = nx.clustering(_nx(pairs))
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_assortativity_matches_networkx(spark):
    edges, pairs = _ba(spark)
    got = degree_assortativity(edges)
    want = nx.degree_assortativity_coefficient(_nx(pairs))
    assert got == pytest.approx(want, abs=1e-9)


def test_avg_neighbor_degree_matches_networkx(spark):
    e = edges_df(spark, PAIRS)
    got = {r.id: r.avg_nbr_deg for r in avg_neighbor_degree(e).collect()}
    want = nx.average_neighbor_degree(_nx(PAIRS))
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_link_prediction_matches_networkx(spark):
    e = edges_df(spark, PAIRS)
    got = {
        (r.a, r.b): (r.cn, r.jaccard)
        for r in link_prediction_jaccard(e, min_common=1).collect()
    }
    g = _nx(PAIRS)
    non_edges = [
        (min(a, b), max(a, b))
        for a, b in nx.non_edges(g)
        if len(list(nx.common_neighbors(g, a, b))) >= 1
    ]
    want = {
        (a, b): s for a, b, s in nx.jaccard_coefficient(g, non_edges)
    }
    assert got.keys() == want.keys()
    for k, (cn, j) in got.items():
        assert j == pytest.approx(want[k], abs=1e-12)
        assert cn == len(list(nx.common_neighbors(g, *k)))


def test_hits_matches_networkx_directed(spark):
    # directed chain+fan graph: hubs point into shared authorities
    pairs = [(1, 4), (2, 4), (3, 4), (1, 5), (2, 5), (4, 6), (5, 6), (6, 1)]
    e = edges_df(spark, pairs)
    res = hits(spark, e, max_iter=60)
    got = {r.id: (r.hub, r.auth) for r in res.scores.collect()}
    # pure-Python HITS power iteration (nx.hits needs scipy, absent in
    # this container); L1-normalized per round, converged to 1e-14
    ids = sorted({v for p in pairs for v in p})
    h = {v: 1.0 for v in ids}
    a = {v: 1.0 for v in ids}
    for _ in range(2000):
        a_new = {v: 0.0 for v in ids}
        for s, d in pairs:
            a_new[d] += h[s]
        h_new = {v: 0.0 for v in ids}
        for s, d in pairs:
            h_new[s] += a_new[d]
        sa, sh = sum(a_new.values()), sum(h_new.values())
        a_new = {v: x / sa for v, x in a_new.items()}
        h_new = {v: x / sh for v, x in h_new.items()}
        if max(abs(h_new[v] - h[v]) + abs(a_new[v] - a[v]) for v in ids) < 1e-14:
            h, a = h_new, a_new
            break
        h, a = h_new, a_new
    for k in h:
        assert got[k][0] == pytest.approx(h[k], abs=1e-6)
        assert got[k][1] == pytest.approx(a[k], abs=1e-6)


def test_hits_rows_and_l1(spark):
    e = edges_df(spark, PAIRS)
    res = hits(spark, e, max_iter=8)
    rows = res.scores.collect()
    ids = {r.id for r in rows}
    assert ids == {v for p in PAIRS for v in p}
    assert math.isclose(sum(r.hub for r in rows), 1.0, abs_tol=1e-9)
    assert math.isclose(sum(r.auth for r in rows), 1.0, abs_tol=1e-9)


def test_salsa_matches_python_recurrence(spark):
    """SALSA (degree-normalized HITS): fixed-8 Jacobi iterate must equal
    the dict recurrence exactly (final L1 normalization only)."""
    pairs = [(1, 4), (2, 4), (3, 4), (1, 5), (2, 5), (4, 6), (5, 6), (6, 1)]
    e = edges_df(spark, pairs)
    res = salsa(spark, e, max_iter=8)
    got = {r.id: (r.hub, r.auth) for r in res.scores.collect()}
    ids = sorted({v for p in pairs for v in p})
    od = {v: 0 for v in ids}
    idg = {v: 0 for v in ids}
    for s_, d in pairs:
        od[s_] += 1
        idg[d] += 1
    h = {v: 1.0 for v in ids}
    a = {v: 1.0 for v in ids}
    for _ in range(8):
        a_new = {v: 0.0 for v in ids}
        h_new = {v: 0.0 for v in ids}
        for s_, d in pairs:  # simultaneous (Jacobi) update
            a_new[d] += h[s_] / od[s_]
            h_new[s_] += a[d] / idg[d]
        h, a = h_new, a_new
    sh, sa = sum(h.values()), sum(a.values())
    for v in ids:
        assert got[v][0] == pytest.approx(h[v] / sh, abs=1e-12)
        assert got[v][1] == pytest.approx(a[v] / sa, abs=1e-12)


def test_salsa_rows_and_l1(spark):
    e = edges_df(spark, PAIRS)
    res = salsa(spark, e, max_iter=8)
    rows = res.scores.collect()
    assert {r.id for r in rows} == {v for p in PAIRS for v in p}
    assert math.isclose(sum(r.hub for r in rows), 1.0, abs_tol=1e-9)
    assert math.isclose(sum(r.auth for r in rows), 1.0, abs_tol=1e-9)


def test_sssp_matches_networkx_weighted(spark):
    pairs_w = [
        (1, 2, 4.0), (1, 3, 1.0), (3, 2, 1.0), (2, 4, 2.0), (3, 4, 6.0),
        (4, 5, 1.0), (6, 7, 1.0),  # 6,7 unreachable from 1
    ]
    e = spark.createDataFrame(pairs_w, "src BIGINT, dst BIGINT, w DOUBLE")
    res = sssp(spark, e, 1, weight_col="w", directed=False)
    assert res.converged
    got = {r.id: r.dist for r in res.distances.collect()}
    g = nx.Graph()
    g.add_weighted_edges_from(pairs_w)
    want = nx.single_source_dijkstra_path_length(g, 1, weight="weight")
    assert got == pytest.approx(want)
    assert 6 not in got and 7 not in got


def test_sssp_directed_and_parallel_edges(spark):
    # parallel edges keep the min weight; direction respected
    pairs_w = [(1, 2, 5.0), (1, 2, 2.0), (2, 3, 1.0), (3, 1, 9.0)]
    e = spark.createDataFrame(pairs_w, "src BIGINT, dst BIGINT, w DOUBLE")
    res = sssp(spark, e, 1, weight_col="w", directed=True)
    got = {r.id: r.dist for r in res.distances.collect()}
    assert got == {1: 0.0, 2: 2.0, 3: 3.0}


def test_sssp_rejects_negative_weights(spark):
    e = spark.createDataFrame(
        [(1, 2, -1.0)], "src BIGINT, dst BIGINT, w DOUBLE"
    )
    with pytest.raises(ValueError, match="non-negative"):
        sssp(spark, e, 1, weight_col="w")


def test_square_count_matches_bruteforce(spark):
    from itertools import combinations

    from igpm_pem_spark.operators.metrics import square_count

    edges, pairs = _ba(spark)
    g = _nx(pairs)
    nodes = list(g.nodes)
    want = 0
    for quad in combinations(nodes, 4):
        a, b, c, d = quad
        for order in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            w, x, y, z = order
            if (g.has_edge(w, x) and g.has_edge(x, y)
                    and g.has_edge(y, z) and g.has_edge(z, w)):
                want += 1
    assert square_count(edges) == want
    assert want > 0


def test_incremental_sssp_equals_batch(spark):
    import random

    from pyspark.sql import functions as F

    from igpm_pem_spark.operators.incremental import incremental_sssp
    from igpm_pem_spark.operators.sssp import sssp

    rng = random.Random(11)
    rows = [
        (rng.randrange(40), rng.randrange(40), float(rng.randrange(1, 9)),
         rng.randrange(3))
        for _ in range(150)
    ]
    rows = [(s, d, w, t) for s, d, w, t in rows if s != d]
    e = spark.createDataFrame(rows, "src BIGINT, dst BIGINT, w DOUBLE, ts INT")
    src = min(r[0] for r in rows)
    inc = incremental_sssp(spark, e, src, base_steps=1)
    batch = sssp(spark, e, src, weight_col="w")
    got = {r.id: r.dist for r in inc.state.collect()}
    want = {r.id: r.dist for r in batch.distances.collect()}
    assert got == want
    assert len(inc.steps) == 3
    # per-step work decays with the perturbation: later steps converge in
    # far fewer supersteps than a cold batch run would need
    assert all(s.supersteps <= 100 for s in inc.steps)


def test_harmonic_seeds_matches_networkx(spark):
    import networkx as nx

    from igpm_pem_spark.operators.graph import vertex_ids
    from igpm_pem_spark.operators.paths import path_closure_from
    from pyspark.sql import functions as F

    edges, pairs = _ba(spark)
    g = _nx(pairs)
    seeds = sorted(g.nodes)[:5]
    sdf = vertex_ids(edges).orderBy("id").limit(5)
    cl = path_closure_from(edges, sdf, max_hops=3, directed=False)
    got = {
        r.id: r.h for r in cl.groupBy(F.col("dst").alias("id"))
        .agg(F.sum(1.0 / F.col("hops")).alias("h")).collect()
    }
    want = {}
    for s in seeds:
        for v, d in nx.single_source_shortest_path_length(g, s, cutoff=3).items():
            if v != s:
                want[v] = want.get(v, 0.0) + 1.0 / d
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_modularity_matches_networkx(spark):
    from networkx.algorithms.community import modularity as nx_modularity

    from igpm_pem_spark.operators.metrics import modularity

    edges, pairs = _ba(spark)
    g = _nx(pairs)
    # a deterministic 3-way partition by id residue
    labels = spark.createDataFrame(
        [(n, n % 3) for n in g.nodes], "id BIGINT, label BIGINT"
    )
    comms = [
        {n for n in g.nodes if n % 3 == r} for r in range(3)
    ]
    got = modularity(edges, labels)
    want = nx_modularity(g, comms)
    assert got == pytest.approx(want, abs=1e-12)


def test_eigencentrality_matches_power_iteration(spark):
    from igpm_pem_spark.operators.eigencentrality import eigenvector_centrality

    res = eigenvector_centrality(spark, edges_df(spark, PAIRS), max_iter=60)
    got = {r.id: r.score for r in res.scores.collect()}
    # pure-python power iteration with final L1 normalization
    adj = {}
    for a, b in PAIRS:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    x = {v: 1.0 for v in adj}
    for _ in range(60):
        x2 = {v: sum(x[u] for u in adj[v]) for v in adj}
        s = sum(x2.values())
        x = {v: val / s for v, val in x2.items()}
    for k in x:
        assert got[k] == pytest.approx(x[k], abs=1e-9)


def test_eigencentrality_keeps_zero_indegree_rows(spark):
    from igpm_pem_spark.operators.eigencentrality import eigenvector_centrality

    # directed chain: vertex 1 has no in-edges — must appear with score 0
    res = eigenvector_centrality(
        spark, edges_df(spark, [(1, 2), (2, 3)]), max_iter=4, directed=True
    )
    got = {r.id: r.score for r in res.scores.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == 0.0


def test_local_move_improves_modularity_two_cliques(spark):
    """Two 4-cliques bridged by one edge, seeded with a deliberately bad
    partition (one vertex swapped across the bridge): the local-move
    round must pull the strays home and strictly raise Q."""
    from igpm_pem_spark.operators.labelprop import modularity_local_move
    from igpm_pem_spark.operators.metrics import modularity

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    e = edges_df(spark, c1 + c2 + [(3, 10)])
    bad = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(4)]
        + [(i, 1) for i in range(10, 14)], "id BIGINT, label BIGINT"
    )
    # vertex 0 mislabeled into community... swap one: relabel vertex 0 to 1
    bad = spark.createDataFrame(
        [(0, 1)] + [(i, 0) for i in (1, 2, 3)] + [(i, 1) for i in range(10, 14)],
        "id BIGINT, label BIGINT",
    )
    q0 = modularity(e, bad)
    moved = modularity_local_move(spark, e, bad, rounds=1)
    q1 = modularity(e, moved)
    assert q1 > q0
    got = {r.id: r.label for r in moved.collect()}
    assert got[0] == 0  # the stray returns to its clique


def test_local_move_deterministic_across_partitionings(spark):
    from igpm_pem_spark.operators.labelprop import (
        label_propagation,
        modularity_local_move,
    )
    import networkx as nx

    e = edges_df(spark, list(nx.barabasi_albert_graph(60, 3, seed=7).edges()))
    lab = label_propagation(spark, e, max_iter=3).labels
    a = {r.id: r.label for r in modularity_local_move(spark, e.repartition(3), lab, rounds=1).collect()}
    b = {r.id: r.label for r in modularity_local_move(spark, e.repartition(17), lab, rounds=1).collect()}
    assert a == b


def test_local_move_never_decreases_q_on_random_graphs(spark):
    from igpm_pem_spark.operators.labelprop import (
        label_propagation,
        modularity_local_move,
    )
    import networkx as nx

    from igpm_pem_spark.operators.metrics import modularity

    for seed in (1, 5):
        e = edges_df(spark, list(nx.barabasi_albert_graph(50, 2, seed=seed).edges()))
        lab = label_propagation(spark, e, max_iter=3).labels
        q0 = modularity(e, lab)
        q1 = modularity(e, modularity_local_move(spark, e, lab, rounds=1))
        assert q1 >= q0 - 1e-12


def test_adamic_adar_matches_networkx(spark):
    from igpm_pem_spark.operators.metrics import link_prediction_adamic_adar

    e = edges_df(spark, PAIRS)
    got = {
        (r.a, r.b): (r.cn, r.aa, r.ra)
        for r in link_prediction_adamic_adar(e, min_common=1).collect()
    }
    g = _nx(PAIRS)
    want_aa = {
        tuple(sorted((u, v))): s
        for u, v, s in nx.adamic_adar_index(g)
        if s > 0
    }
    want_ra = {
        tuple(sorted((u, v))): s
        for u, v, s in nx.resource_allocation_index(g)
        if s > 0
    }
    assert got.keys() == want_aa.keys()
    for k in want_aa:
        cn, aa, ra = got[k]
        assert cn == len(list(nx.common_neighbors(g, *k)))
        assert aa == pytest.approx(want_aa[k], abs=1e-9)
        assert ra == pytest.approx(want_ra[k], abs=1e-9)


def test_adamic_adar_excludes_adjacent_and_min_common(spark):
    from igpm_pem_spark.operators.metrics import link_prediction_adamic_adar

    e = edges_df(spark, PAIRS)
    rows = link_prediction_adamic_adar(e, min_common=2).collect()
    adjacent = {tuple(sorted(p)) for p in PAIRS}
    for r in rows:
        assert (r.a, r.b) not in adjacent
        assert r.cn >= 2


def test_rich_club_matches_networkx(spark):
    from igpm_pem_spark.operators.metrics import rich_club
    from igpm_pem_spark.sources.fixtures import ba_graph

    import networkx as nx

    _, edges, _ = ba_graph(spark, 60, 4, seed=5)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    g = nx.Graph()
    g.add_edges_from(pairs)
    want = nx.rich_club_coefficient(g, normalized=False)
    out = {r.k: r for r in rich_club(edges_df(spark, pairs)).collect()}
    for k, row in out.items():
        if k in want:
            assert abs(row.phi6 - round(want[k], 6)) < 2e-6, k
        else:  # k >= max degree: no rich club of size >= 2
            assert row.phi6 is None or row.n_nodes < 2


def test_jaccard_sparsify_matches_python(spark):
    from igpm_pem_spark.operators.metrics import jaccard_sparsify

    import networkx as nx

    _, edges, _ = ba_graph(spark, 50, 4, seed=7)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    g = nx.Graph()
    g.add_edges_from(pairs)
    out = {(r.src, r.dst): r for r in jaccard_sparsify(edges_df(spark, pairs)).collect()}
    assert set(out) == {tuple(sorted(e)) for e in g.edges}
    for (u, v), row in out.items():
        inter = len(set(g[u]) & set(g[v]))
        union = len((set(g[u]) | set(g[v])) - {u, v})
        assert row.sup == inter
        want_kept = 10 * inter >= union  # threshold 1/10, integer compare
        assert row.kept == want_kept, (u, v)
    # the sparsifier keeps a nontrivial strict subset on a BA graph
    kept = sum(1 for r in out.values() if r.kept)
    assert 0 < kept


def test_widest_path_matches_networkx(spark):
    """Bottleneck widths vs a python max-min fixpoint on a weighted BA
    graph (networkx has no direct widest-path; the replay is simple)."""
    from igpm_pem_spark.operators.sssp import widest_path

    import random

    rng = random.Random(4)
    _, edges, _ = ba_graph(spark, 60, 3, seed=4)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    wpairs = [(a, b, float(rng.randint(1, 9))) for a, b in pairs]
    e = spark.createDataFrame(wpairs, "src BIGINT, dst BIGINT, w DOUBLE")
    res = widest_path(spark, e, 0)
    assert res.converged
    got = {r.id: r.width for r in res.distances.collect()}

    from collections import defaultdict
    adj = defaultdict(dict)
    for a, b, w in wpairs:
        adj[a][b] = max(adj[a].get(b, 0.0), w)
        adj[b][a] = max(adj[b].get(a, 0.0), w)
    width = {0: float("inf")}
    for _ in range(200):
        nxt = dict(width)
        for u, wu in width.items():
            for v, w in adj[u].items():
                c = min(wu, w)
                if c > nxt.get(v, 0.0):
                    nxt[v] = c
        if nxt == width:
            break
        width = nxt
    assert got == width


def test_local_bridges_have_no_common_neighbor(spark):
    from igpm_pem_spark.operators.ktruss import _edge_support
    from igpm_pem_spark.operators.graph import canonical_undirected

    import networkx as nx

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    e = canonical_undirected(edges_df(spark, pairs))
    bridges = {(r.src, r.dst) for r in
               _edge_support(e).where("sup = 0").select("src", "dst").collect()}
    g = nx.Graph(); g.add_edges_from(pairs)
    want = {tuple(sorted((u, v))) for u, v in g.edges
            if not (set(g[u]) & set(g[v]))}
    assert bridges == want == {(3, 4)}


def test_cocitation_coupling_matches_bruteforce(spark):
    from collections import defaultdict
    from itertools import combinations

    from igpm_pem_spark.operators.metrics import cocitation_coupling

    dir_pairs = [
        (1, 2), (1, 3), (4, 2), (4, 3), (2, 5), (3, 5), (2, 6), (3, 6),
        (7, 2), (5, 1), (6, 7), (1, 6),
    ]
    got = {
        (r.a, r.b): (r.cocitation, r.coupling)
        for r in cocitation_coupling(
            edges_df(spark, dir_pairs), min_count=2
        ).collect()
    }
    ins, outs = defaultdict(set), defaultdict(set)
    for s, d in dir_pairs:
        ins[d].add(s)
        outs[s].add(d)
    verts = sorted(ins.keys() | outs.keys())
    want = {}
    for a, b in combinations(verts, 2):
        cc = len(ins[a] & ins[b])
        bc = len(outs[a] & outs[b])
        if cc >= 2 or bc >= 2:
            want[(a, b)] = (cc, bc)
    assert got == want
