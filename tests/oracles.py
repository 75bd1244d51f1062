"""Pure-Python / NetworkX oracles (FIXTURES.md §4).

NetworkX is pinned as the oracle exactly as the reference itself uses it
for ground truth (``patternmatching/gray/incremental/gray_incremental.py:193-202``).
LPA has no NetworkX equivalent with our pinned deterministic semantics, so
its oracle is reimplemented here independently of the Spark code.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import networkx as nx


def nx_graph(pairs, directed=False):
    g = nx.DiGraph() if directed else nx.Graph()
    g.add_edges_from((int(a), int(b)) for a, b in pairs if a != b)
    return g


def pagerank_oracle(
    pairs, directed=False, alpha=0.85, tol=1e-12, max_iter=2000,
    personalization=None,
):
    """Pure-Python power iteration with NetworkX ``pagerank`` semantics
    (uniform start, dangling mass spread ∝ the personalization vector —
    uniform when none, L1 convergence below n*tol). Pure dict
    implementation — the in-repo networkx build lacks scipy, and an
    independent oracle is stronger anyway."""
    g = nx_graph(pairs, directed)
    verts = list(g.nodes())
    n = len(verts)
    if n == 0:
        return {}
    if personalization is None:
        p = {v: 1.0 / n for v in verts}
    else:
        tot = sum(personalization.values())
        p = {v: personalization.get(v, 0.0) / tot for v in verts}
    succ = {v: list(g.successors(v)) if directed else list(g.neighbors(v)) for v in verts}
    outdeg = {v: len(succ[v]) for v in verts}
    x = {v: 1.0 / n for v in verts}
    for _ in range(max_iter):
        nxt = dict.fromkeys(verts, 0.0)
        dangle = sum(x[v] for v in verts if outdeg[v] == 0)
        for v in verts:
            if outdeg[v]:
                share = x[v] / outdeg[v]
                for u in succ[v]:
                    nxt[u] += share
        nxt = {
            v: (1.0 - alpha) * p[v] + alpha * (nxt[v] + dangle * p[v])
            for v in verts
        }
        err = sum(abs(nxt[v] - x[v]) for v in verts)
        x = nxt
        if tol > 0.0 and err < n * tol:
            return x
    if tol == 0.0:  # fixed-iteration mode: exactly max_iter rounds
        return x
    raise RuntimeError("oracle pagerank failed to converge")


def components_oracle(pairs):
    g = nx_graph(pairs, directed=False)
    out = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def triangles_oracle(pairs):
    g = nx_graph(pairs, directed=False)
    per_vertex = nx.triangles(g)
    return per_vertex, sum(per_vertex.values()) // 3


def lpa_oracle(pairs, max_iter=10, stop_on_stable=True):
    """Deterministic synchronous LPA, pinned semantics (see labelprop.py):
    label'(v) = most frequent neighbor label, ties → smallest label,
    isolated vertices keep their label. Synchronous update from the full
    previous labeling; stops early when nothing changed."""
    nbrs = defaultdict(set)
    verts = set()
    for a, b in pairs:
        a, b = int(a), int(b)
        verts.add(a)
        verts.add(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            if nbrs[v]:
                counts = Counter(labels[u] for u in nbrs[v])
                best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                new[v] = best
            else:
                new[v] = labels[v]
        if stop_on_stable and new == labels:
            break
        labels = new
    return labels
