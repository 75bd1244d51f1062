"""Property-based kernel checks (hypothesis): random edge lists, exact
parity with NetworkX / pure-python oracles. Few examples, no deadline —
each example spins Spark jobs; the point is adversarial SHAPES (self
loops, parallel edges, disconnected scraps, singleton-heavy graphs), not
volume."""

from __future__ import annotations

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from igpm_pem_spark.operators.components import connected_components
from igpm_pem_spark.operators.metrics import square_count
from igpm_pem_spark.operators.sssp import sssp
from igpm_pem_spark.operators.triangles import triangle_count

_spark = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(pairs):
    return _spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src BIGINT, dst BIGINT"
    )


def _g(pairs):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    return g


@PROP
@given(pairs=edge_lists)
def test_prop_components_match_networkx(pairs):
    g = _g(pairs)
    if g.number_of_edges() == 0:
        return
    res = connected_components(_spark, _df(pairs))
    got = {}
    for r in res.components.collect():
        got.setdefault(r.component, set()).add(r.id)
    want = {min(c): set(c) for c in nx.connected_components(g)}
    # kernel sees only non-loop endpoints
    want = {k: v for k, v in want.items() if len(v) > 1 or g.degree(k) > 0}
    assert set(map(frozenset, got.values())) == set(map(frozenset, want.values()))


@PROP
@given(pairs=edge_lists)
def test_prop_triangles_match_networkx(pairs):
    g = _g(pairs)
    want = sum(nx.triangles(g).values()) // 3
    assert triangle_count(_df(pairs)) == want


@PROP
@given(pairs=edge_lists)
def test_prop_squares_match_bruteforce(pairs):
    from itertools import combinations

    g = _g(pairs)
    want = 0
    for quad in combinations(sorted(g.nodes), 4):
        a, b, c, d = quad
        for w, x, y, z in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            if (g.has_edge(w, x) and g.has_edge(x, y)
                    and g.has_edge(y, z) and g.has_edge(z, w)):
                want += 1
    assert square_count(_df(pairs)) == want


@PROP
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10), st.integers(1, 7)),
        min_size=1,
        max_size=30,
    )
)
def test_prop_sssp_matches_networkx(pairs):
    pairs = [(a, b, w) for a, b, w in pairs if a != b]
    if not pairs:
        return
    g = nx.Graph()
    # parallel edges: keep the min weight, as the kernel does
    for a, b, w in pairs:
        if g.has_edge(a, b):
            g[a][b]["weight"] = min(g[a][b]["weight"], w)
        else:
            g.add_edge(a, b, weight=w)
    src = min(a for a, _, _ in pairs)
    e = _spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in pairs],
        "src BIGINT, dst BIGINT, w DOUBLE",
    )
    res = sssp(_spark, e, src, weight_col="w")
    assert res.converged
    got = {r.id: r.dist for r in res.distances.collect()}
    want = nx.single_source_dijkstra_path_length(g, src, weight="weight")
    assert got == pytest.approx(want)


@PROP
@given(pairs=edge_lists)
def test_prop_dominating_greedy_matches_python(pairs):
    from igpm_pem_spark.operators.centrality import dominating_set_greedy

    g = _g(pairs)
    if g.number_of_edges() == 0:
        return
    got = [
        (r.rank, r.id, r.gain)
        for r in dominating_set_greedy(_spark, _df(pairs), k=4)
        .orderBy("rank").collect()
    ]
    # kernel universe is every edge endpoint INCLUDING loop-only vertices
    # (multigraph model); loops add nothing to closed neighborhoods
    univ = {v for e in pairs for v in e}
    closed = {v: ({v} | set(g[v]) if v in g else {v}) for v in univ}
    uncovered = set(univ)
    want = []
    for rnd in range(1, 5):
        gains = {v: len(closed[v] & uncovered) for v in univ}
        gains = {v: x for v, x in gains.items() if x > 0}
        if not gains:
            break
        pick = min(gains, key=lambda v: (-gains[v], v))
        want.append((rnd, pick, gains[pick]))
        uncovered -= closed[pick]
    assert got == want


@PROP
@given(pairs=edge_lists, s=st.integers(1, 5))
def test_prop_s_core_matches_python(pairs, s):
    from igpm_pem_spark.operators.kcore import s_core

    # multiplicity-weighted: parallel (a,b) entries fold into weight
    from collections import Counter

    w = Counter(
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    )
    if not w:
        return
    wdf = _spark.createDataFrame(
        [(int(a), int(b), int(c)) for (a, b), c in w.items()],
        "src BIGINT, dst BIGINT, w BIGINT",
    )
    got = {r.id for r in s_core(_spark, wdf, s=s).vertices.collect()}
    from collections import defaultdict

    adj = defaultdict(dict)
    for (a, b), c in w.items():
        adj[a][b] = c
        adj[b][a] = c
    alive = set(adj)
    while True:
        drop = {
            v for v in alive
            if sum(adj[v][u] for u in adj[v] if u in alive) < s
        }
        if not drop:
            break
        alive -= drop
    assert got == alive


@PROP
@given(pairs=edge_lists)
def test_prop_edge_betweenness_seed_sums(pairs):
    """Σ over edges of EBC equals Σ over (seed, target≤3 hops) of the
    path length — every unit of dependency lies on exactly dist(s,t)
    edges (Brandes flow conservation, truncated)."""
    from igpm_pem_spark.operators.centrality import edge_betweenness_seeded

    g = _g(pairs)
    if g.number_of_edges() == 0:
        return
    rows = edge_betweenness_seeded(_spark, _df(pairs), n_seeds=3, max_hops=3).collect()
    total = sum(r.ebc for r in rows)
    # seed pool is the kernel's vertex universe (loop-only vertices
    # included; their BFS reaches nothing and contributes 0)
    univ = sorted({v for e in pairs for v in e})
    want = 0
    for s in univ[:3]:
        if s not in g:
            continue
        dist = nx.single_source_shortest_path_length(g, s, cutoff=3)
        want += sum(d for t, d in dist.items() if t != s)
    assert abs(total - want) < 1e-6


@PROP
@given(pairs=edge_lists)
def test_prop_hitting_time_matches_value_iteration(pairs):
    from igpm_pem_spark.operators.centrality import hitting_time_truncated

    g = _g(pairs)
    if g.number_of_edges() == 0:
        return
    got = {r.id: r.h for r in hitting_time_truncated(
        _spark, _df(pairs), n_hubs=2, iters=4
    ).collect()}
    # replica models the kernel's MULTIGRAPH view exactly: symmetrize()
    # keeps parallel rows (each weights the neighbor sum) and emits a
    # self-loop twice; degree is the sym row count, not the simple degree
    from collections import Counter

    univ = {v for e in pairs for v in e}
    mult = Counter()
    for a, b in pairs:
        if a == b:
            mult[(a, a)] += 2
        else:
            mult[(min(a, b), max(a, b))] += 1
    deg = {v: 0 for v in univ}
    nbrs = {v: set() for v in univ}
    for (a, b), c in mult.items():
        if a == b:
            deg[a] += c
            nbrs[a] |= {a}
        else:
            deg[a] += c
            deg[b] += c
            nbrs[a] |= {b}
            nbrs[b] |= {a}
    hubs = set(sorted(univ, key=lambda v: (-deg[v], v))[:2])
    h = {v: 0.0 for v in univ}
    for _ in range(4):
        nh = {}
        for v in univ:
            if v in hubs:
                nh[v] = 0.0
            else:
                s = sum(
                    mult[(min(v, u), max(v, u))] * h[u]
                    for u in nbrs[v]
                )
                nh[v] = 1.0 + s / deg[v]
        h = nh
    assert set(got) == set(univ)
    for v in univ:
        assert abs(got[v] - h[v]) < 1e-9, (v, got[v], h[v])


@PROP
@given(
    vecs=st.lists(
        st.lists(st.integers(-50, 50), min_size=3, max_size=3),
        min_size=2,
        max_size=10,
        unique_by=lambda v: tuple(v),
    )
)
def test_prop_kcenter_int8_matches_python(vecs):
    import math

    from igpm_pem_spark.operators.clustering import kcenter_greedy_int8

    emb = _spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    got = [(r.rank, r.vec_id, r.d2sel)
           for r in kcenter_greedy_int8(_spark, emb, k=4).orderBy("rank").collect()]

    def quant(v):
        am = max(abs(x) for x in v)
        if am <= 0:
            return [0] * len(v)
        s = 127.0 / am
        return [math.floor(x * s + 0.5) for x in v]

    qv = {i: quant([float(x) for x in v]) for i, v in enumerate(vecs)}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    first = min(qv)
    want = [(1, first, 0)]
    dmin = {i: d2(qv[i], qv[first]) for i in qv}
    for rnd in range(2, 5):
        far = min(dmin, key=lambda i: (-dmin[i], i))
        if dmin[far] == 0:
            break
        want.append((rnd, far, dmin[far]))
        for i in qv:
            dmin[i] = min(dmin[i], d2(qv[i], qv[far]))
    assert got == want
