"""Kernel correctness vs oracles on the reference-mirror fixture graphs
(FIXTURES.md §3-4): PageRank allclose 1e-6, components/labels/triangles
exact — the north-rule correctness gate."""

from __future__ import annotations

import networkx as nx
import pytest

from igpm_pem_spark.operators.components import (
    connected_components,
    median_component_size,
)
from igpm_pem_spark.operators.graph import degrees
from igpm_pem_spark.operators.labelprop import label_propagation
from igpm_pem_spark.operators.pagerank import pagerank
from igpm_pem_spark.operators.triangles import (
    star_count,
    triangle_count,
    triangles_per_vertex,
)
from igpm_pem_spark.sources.fixtures import ba_graph, fixture_graph

from .conftest import edges_df
from .oracles import (
    components_oracle,
    lpa_oracle,
    nx_graph,
    pagerank_oracle,
    triangles_oracle,
)


def _pairs(name_or_pairs, spark):
    if isinstance(name_or_pairs, str):
        if name_or_pairs == "ba100":
            _, edges, directed = ba_graph(spark, 100, 4, seed=0)
        else:
            _, edges, directed = fixture_graph(spark, name_or_pairs)
        pairs = [(r.src, r.dst) for r in edges.collect()]
        return edges, pairs, directed
    df = edges_df(spark, name_or_pairs)
    return df, name_or_pairs, False


@pytest.mark.parametrize("graph", ["test1", "test1d", "line", "ba100"])
def test_pagerank_exact_matches_networkx(spark, graph):
    edges, pairs, directed = _pairs(graph, spark)
    res = pagerank(spark, edges, directed=directed, tol=1e-8, max_iter=300)
    assert res.converged
    got = {r.id: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(pairs, directed)
    assert set(got) == set(want)
    assert max(abs(got[k] - want[k]) for k in want) < 1e-6
    # every superstep recorded lineage stats
    assert len(res.stats) == res.supersteps
    assert all(s.partition_stats for s in res.stats)


@pytest.mark.parametrize("graph", ["test1", "ba100"])
def test_pagerank_delta_mode_matches_exact_fixpoint(spark, graph):
    edges, pairs, directed = _pairs(graph, spark)
    res = pagerank(spark, edges, directed=directed, tol=1e-8, max_iter=300, mode="delta")
    assert res.converged
    got = {r.id: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(pairs, directed)
    assert max(abs(got[k] - want[k]) for k in want) < 1e-6
    # the frontier shrinks: late supersteps are cheaper than early ones
    actives = [s.active_vertices for s in res.stats]
    assert actives[-1] <= actives[0]


@pytest.mark.parametrize("graph", ["test1", "line", "ba100"])
@pytest.mark.parametrize("mode", ["exact", "delta"])
def test_personalized_pagerank_matches_oracle(spark, graph, mode):
    """Seeded RWR (reference rwr.py:149-180, restart 0.7 ⇔ alpha 0.3):
    restart mass lands on the seed set; both kernels must hit the
    NetworkX-personalization fixpoint."""
    edges, pairs, directed = _pairs(graph, spark)
    seeds = sorted({a for a, _ in pairs})[:2]
    pers = {seeds[0]: 2.0, seeds[1]: 1.0}
    res = pagerank(
        spark, edges, directed=directed, alpha=0.3, tol=1e-9, max_iter=300,
        mode=mode, personalization=pers,
    )
    assert res.converged
    got = {r.id: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(pairs, directed, alpha=0.3, personalization=pers)
    assert set(got) == set(want)
    assert max(abs(got[k] - want[k]) for k in want) < 1e-6


def test_personalized_pagerank_directed_dangling(spark):
    # dangling vertex 3: its mass must restart ∝ p, not uniformly
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (2, 3)]
    edges = edges_df(spark, pairs)
    pers = {1: 1.0}
    res = pagerank(
        spark, edges, directed=True, alpha=0.85, tol=1e-10, max_iter=500,
        personalization=pers,
    )
    got = {r.id: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(pairs, directed=True, personalization=pers)
    assert max(abs(got[k] - want[k]) for k in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_directed_dangling(spark):
    # dangling vertex 3 (no out-edges): mass must be redistributed uniformly
    pairs = [(0, 1), (1, 2), (2, 0), (0, 3), (2, 3)]
    edges = edges_df(spark, pairs)
    res = pagerank(spark, edges, directed=True, tol=1e-9, max_iter=300)
    got = {r.id: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(pairs, directed=True)
    assert max(abs(got[k] - want[k]) for k in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.parametrize("graph", ["two_comp", "ba100", "line"])
def test_connected_components_exact(spark, graph):
    edges, pairs, _ = _pairs(graph, spark)
    res = connected_components(spark, edges)
    assert res.converged
    got = {r.id: r.component for r in res.components.collect()}
    want = components_oracle(pairs)
    assert got == want


def test_median_component_size(spark):
    edges, pairs, _ = _pairs("two_comp", spark)
    res = connected_components(spark, edges)
    # components: {0,1,2} {3,4,5} {7,8} → sizes 3,3,2 → median 3
    assert median_component_size(res.components) == 3.0


@pytest.mark.parametrize("graph", ["test1", "two_comp", "ba100"])
def test_label_propagation_matches_pinned_oracle(spark, graph):
    edges, pairs, _ = _pairs(graph, spark)
    res = label_propagation(spark, edges, max_iter=10)
    got = {r.id: r.label for r in res.labels.collect()}
    want = lpa_oracle(pairs, max_iter=10)
    assert got == want


@pytest.mark.parametrize("graph", ["test1", "test4", "ba100", "line"])
def test_triangles_exact(spark, graph):
    edges, pairs, _ = _pairs(graph, spark)
    per_vertex_want, total_want = triangles_oracle(pairs)
    assert triangle_count(edges) == total_want
    got = {r.id: r.triangles for r in triangles_per_vertex(edges).collect()}
    assert got == per_vertex_want


@pytest.mark.parametrize("graph", ["test1", "ba100", "two_comp"])
def test_degree_oriented_triangles_equal_plain(spark, graph):
    from igpm_pem_spark.operators.triangles import triangle_count_degree_oriented

    edges, pairs, _ = _pairs(graph, spark)
    _, total_want = triangles_oracle(pairs)
    assert triangle_count_degree_oriented(edges) == total_want


@pytest.mark.parametrize("graph,k", [("test1", 2), ("ba100", 3), ("ba100", 5), ("two_comp", 2)])
def test_kcore_matches_networkx(spark, graph, k):
    from igpm_pem_spark.operators.kcore import k_core

    edges, pairs, _ = _pairs(graph, spark)
    res = k_core(spark, edges, k)
    assert res.converged
    got = {r.id for r in res.vertices.collect()}
    g = nx_graph(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    want = set(nx.k_core(g, k).nodes())
    assert got == want
    # peeling strictly shrinks until stable
    assert res.peeled_per_round[-1] == 0
    assert all(p >= 0 for p in res.peeled_per_round)


def test_star_count_matches_reference_rule(spark):
    # reference counts vertices with degree >= 4 as 5-node stars
    # (gray_incremental.py:194,202)
    edges, pairs, _ = _pairs("ba100", spark)
    g = nx_graph(pairs)
    want = sum(1 for _, d in g.degree() if d >= 4)
    assert star_count(edges, 4) == want


def test_degrees_match_networkx(spark):
    edges, pairs, _ = _pairs("test4", spark)  # parallel edges collapse
    g = nx_graph(pairs)
    got = {r.id: r.degree for r in degrees(edges).collect()}
    assert got == dict(g.degree())


@pytest.mark.parametrize("graph", ["test1", "ba100", "two_comp"])
def test_triangle_plans_all_agree(spark, graph):
    edges, pairs, _ = _pairs(graph, spark)
    _, total_want = triangles_oracle(pairs)
    for plan in ("adaptive", "id_ordered", "degree_oriented"):
        assert triangle_count(edges, plan=plan) == total_want, plan


def test_adaptive_triangle_probe_handles_hub(spark):
    # star graph: hub degree n-1 ≫ sqrt(E) → adaptive must take the
    # degree-oriented path and still count 0 triangles; add one closing
    # edge → 1 triangle
    from tests.conftest import edges_df

    star = [(0, i) for i in range(1, 200)]
    assert triangle_count(edges_df(spark, star)) == 0
    assert triangle_count(edges_df(spark, star + [(1, 2)])) == 1


def _weighted_pr_oracle(wpairs, directed, alpha=0.85, tol=1e-13, iters=3000):
    """Pure-python weighted power iteration (nx.pagerank(weight=...) with
    MultiGraph weight summing)."""
    w = {}
    verts = set()
    for a, b, wt in wpairs:
        if a == b:
            continue
        verts |= {a, b}
        w[(a, b)] = w.get((a, b), 0.0) + wt
        if not directed:
            w[(b, a)] = w.get((b, a), 0.0) + wt
    outw = {}
    succ = {}
    for (a, b), wt in w.items():
        outw[a] = outw.get(a, 0.0) + wt
        succ.setdefault(a, []).append((b, wt))
    n = len(verts)
    x = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        nxt = dict.fromkeys(verts, 0.0)
        dangle = sum(x[v] for v in verts if v not in outw)
        for v, lst in succ.items():
            for u, wt in lst:
                nxt[u] += x[v] * wt / outw[v]
        nxt = {
            v: (1 - alpha) / n + alpha * (nxt[v] + dangle / n) for v in verts
        }
        err = sum(abs(nxt[v] - x[v]) for v in verts)
        x = nxt
        if err < tol:
            return x
    raise RuntimeError("weighted oracle did not converge")


@pytest.mark.parametrize("directed,mode", [
    (False, "exact"), (False, "delta"), (True, "exact"), (True, "delta"),
])
def test_weighted_pagerank_matches_oracle(spark, directed, mode):
    # parallel edge (0,1) appears twice -> weights must SUM; vertex 4 is a
    # sink in the directed view (dangling)
    wpairs = [
        (0, 1, 1.0), (0, 1, 2.0), (1, 2, 5.0), (2, 0, 1.0),
        (2, 3, 0.5), (3, 0, 2.0), (1, 4, 4.0),
    ]
    edges = spark.createDataFrame(
        wpairs, "src BIGINT, dst BIGINT, wt DOUBLE"
    )
    res = pagerank(
        spark, edges, directed=directed, mode=mode, tol=1e-10,
        weight_col="wt", steps_per_commit=3,
    )
    got = {r.id: r["rank"] for r in res.ranks.collect()}
    want = _weighted_pr_oracle(wpairs, directed)
    assert max(abs(got[k] - want[k]) for k in want) < 1e-7
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_spam_mass_composition_matches_python_oracle(spark):
    """TrustRank spam mass (queries/graphq.py::_q_spam_mass semantics):
    (pr - tr)/pr from two exact 8-round runs must match the pure-python
    recurrence, seeds must carry negative (trusted) mass and the vertex
    farthest from the seeds the largest."""
    edges, pairs, _ = _pairs("ba100", spark)
    seeds = sorted({s for s, _ in pairs} | {d for _, d in pairs})[:5]
    pr = pagerank(spark, edges, tol=0.0, max_iter=8, mode="exact")
    tr = pagerank(
        spark, edges, tol=0.0, max_iter=8, mode="exact",
        personalization={s: 1.0 for s in seeds},
    )
    got_pr = {r.id: r["rank"] for r in pr.ranks.collect()}
    got_tr = {r.id: r["rank"] for r in tr.ranks.collect()}
    want_pr = pagerank_oracle(pairs, False, tol=0.0, max_iter=8)
    want_tr = pagerank_oracle(
        pairs, False, tol=0.0, max_iter=8,
        personalization={s: 1.0 for s in seeds},
    )
    mass_got = {v: (got_pr[v] - got_tr[v]) / got_pr[v] for v in got_pr}
    mass_want = {v: (want_pr[v] - want_tr[v]) / want_pr[v] for v in want_pr}
    assert set(mass_got) == set(mass_want)
    assert max(abs(mass_got[v] - mass_want[v]) for v in mass_want) < 1e-6
    # trusted seeds absorb restart mass: strictly negative spam mass
    assert all(mass_got[s] < 0 for s in seeds)


@pytest.mark.parametrize("graph", ["test1", "ba100"])
def test_coreness_hindex_matches_networkx(spark, graph):
    """Full core decomposition by h-index iteration must equal
    networkx.core_number exactly, for every vertex."""
    from igpm_pem_spark.operators.kcore import coreness_hindex

    edges, pairs, _ = _pairs(graph, spark)
    res = coreness_hindex(spark, edges)
    assert res.converged
    got = {r.id: r.coreness for r in res.coreness.collect()}
    want = nx.core_number(nx_graph(pairs, False))
    assert got == {k: v for k, v in want.items()}


@pytest.mark.parametrize("graph", ["test1", "ba100"])
def test_k4_count_matches_networkx(spark, graph):
    from igpm_pem_spark.operators.triangles import k4_count

    edges, pairs, _ = _pairs(graph, spark)
    got = k4_count(edges)
    g = nx_graph(pairs, False)
    want = sum(1 for q in nx.enumerate_all_cliques(g) if len(q) == 4)
    assert got == want


def test_weighted_lpa_prefers_heavy_edge(spark):
    """Two communities joined by one light bridge: weighted votes must
    follow the heavy edges, and a heavy bridge flips the assignment."""
    from igpm_pem_spark.operators.labelprop import label_propagation_weighted

    rows = [(1, 2, 5.0), (1, 3, 5.0), (2, 3, 5.0), (3, 4, 1.0),
            (4, 5, 5.0), (4, 6, 5.0), (5, 6, 5.0)]
    e = spark.createDataFrame(rows, "src BIGINT, dst BIGINT, w DOUBLE")
    labels = {
        r.id: r.label
        for r in label_propagation_weighted(spark, e, max_iter=3).collect()
    }
    # the two triangles stay separate communities despite the bridge
    assert labels[1] == labels[2] == labels[3]
    assert labels[4] == labels[5] == labels[6]
    assert labels[1] != labels[4]


def test_forward_push_matches_python_replay_and_stays_local(spark):
    """Synchronous forward push: exact python replay parity, mass
    conservation, and frontier locality (single seed on a BA graph must
    not touch the whole vertex set at tight eps)."""
    from igpm_pem_spark.operators.push import forward_push_ppr

    edges, pairs, _ = _pairs("ba100", spark)
    alpha, eps, rounds, seeds = 0.15, 1e-2, 4, [0]
    out = {r.id: (r.p6, r.r6) for r in forward_push_ppr(
        spark, edges, seeds, alpha=alpha, eps=eps, rounds=rounds
    ).collect()}

    # python replay of the same recurrence
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b); adj[b].add(a)
    p = defaultdict(float)
    r = defaultdict(float, {s: 1.0 / len(seeds) for s in seeds})
    for _ in range(rounds):
        active = [v for v in adj if r[v] > eps * len(adj[v])]
        nr = defaultdict(float)
        for v in adj:
            if v not in set(active):
                nr[v] = r[v]
        for v in active:
            p[v] += alpha * r[v]
            share = (1.0 - alpha) * r[v] / len(adj[v])
            for u in adj[v]:
                nr[u] += share
        r = nr
    want = {
        v: (round(p[v], 6), round(r[v], 6))
        for v in adj
        if round(p[v], 6) != 0.0 or round(r[v], 6) != 0.0
    }
    assert out.keys() == want.keys()
    for v in want:
        assert abs(out[v][0] - want[v][0]) < 2e-6
        assert abs(out[v][1] - want[v][1]) < 2e-6
    # locality + conservation
    assert len(out) < len(adj)
    mass = sum(a + b for a, b in out.values())
    assert abs(mass - 1.0) < 1e-4
