"""Session-10 final batch: degree-coreness correlation replica, C4
breakdown replica, JSON props histogram replica."""

from __future__ import annotations

import json
import math
import re
from collections import Counter

import networkx as nx

from igpm_pem_spark.queries._common import G_SPARSE_SQL, edges
from igpm_pem_spark.queries.metricsq14 import (
    _C4_MIN_WORDS,
    _q_c4_breakdown,
    _q_degree_core_corr,
    _q_props_k_histogram,
)

SF = "/root/testdata/sf0.001"


def test_degree_core_corr_vs_networkx(spark):
    row = _q_degree_core_corr(spark, SF).collect()[0]
    e = [(r.src, r.dst) for r in edges(spark, SF, G_SPARSE_SQL).collect()]
    G = nx.Graph()
    G.add_edges_from(e)
    core = nx.core_number(G)
    d = [G.degree[v] for v in G]
    c = [core[v] for v in G]
    n = len(d)
    sd, sc = sum(d), sum(c)
    sdc = sum(x * y for x, y in zip(d, c))
    sdd, scc = sum(x * x for x in d), sum(y * y for y in c)
    r = (n * sdc - sd * sc) / (
        math.sqrt(n * sdd - sd * sd) * math.sqrt(n * scc - sc * sc)
    )
    assert row.n_vertices == n
    assert abs(row.r6 - round(r, 6)) < 2e-6
    assert row.r6 > 0  # degree and core depth positively related here


def test_c4_breakdown_vs_python(spark):
    got = {r.reason: r.n_docs for r in _q_c4_breakdown(spark, SF).collect()}
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    want = Counter()
    for r in rows:
        ws = [w for w in r.text.lower().split(" ") if w]
        n = len(ws)
        tc = sum(len(w) for w in ws)
        mf = max(Counter(ws).values()) if ws else 0
        nd = len(set(ws))
        if n < _C4_MIN_WORDS:
            want["too_short"] += 1
        if tc < 3 * n:
            want["words_too_short"] += 1
        if tc > 8 * n:
            want["words_too_long"] += 1
        if mf * 5 > n:
            want["repetition"] += 1
        if nd * 10 < 3 * n:
            want["low_diversity"] += 1
        if (n >= _C4_MIN_WORDS and 3 * n <= tc <= 8 * n
                and mf * 5 <= n and nd * 10 >= 3 * n):
            want["kept"] += 1
    for k in ("too_short", "words_too_short", "words_too_long",
              "repetition", "low_diversity", "kept"):
        assert got.get(k, 0) == want.get(k, 0), k
    # a non-kept doc violates at least one rule
    n_docs = len(rows)
    violated = sum(v for k, v in want.items() if k != "kept")
    assert violated >= n_docs - want["kept"]


def test_props_k_histogram_vs_python(spark):
    got = {r.k_bucket: r.n_events for r in _q_props_k_histogram(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    want = Counter()
    for r in ev:
        k = json.loads(r.props).get("k")
        if k is not None:
            want[int(k) - int(k) % 10] += 1
    assert got == dict(want)
