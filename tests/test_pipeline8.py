"""pipeline8 query semantics pinned against pure-python references."""

from __future__ import annotations

import hashlib
import math

import networkx as nx

from igpm_pem_spark.queries._common import G_SPARSE_SQL, edges
from igpm_pem_spark.queries.pipeline8 import (
    _FAIL_CUT,
    _PMI_MIN_SUPPORT,
    _PMI_TOP_PAIRS,
    _q_pmi_top,
    _q_robustness_random,
)

SF = "/root/testdata/sf0.001"


def _bucket(v: int, salt: str = "fail") -> int:
    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16) % 1_000_000


def test_robustness_random_vs_networkx(spark):
    row = _q_robustness_random(spark, SF).collect()[0]
    e = edges(spark, SF, G_SPARSE_SQL).collect()
    g = nx.Graph()
    for r in e:
        if _bucket(r["src"]) >= _FAIL_CUT and _bucket(r["dst"]) >= _FAIL_CUT:
            g.add_edge(r["src"], r["dst"])
    comps = sorted((len(c) for c in nx.connected_components(g)), reverse=True)
    assert row["n_vertices"] == sum(comps)
    assert row["n_components"] == len(comps)
    assert row["giant_size"] == comps[0]
    assert abs(row["giant_share6"] - round(comps[0] / sum(comps), 6)) < 2e-6


def test_pmi_vs_pure_python(spark):
    got = _q_pmi_top(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n = len(docs)
    per_doc = [set(t for t in d["text"].lower().split(" ") if t) for d in docs]
    df: dict[str, int] = {}
    for s in per_doc:
        for t in s:
            df[t] = df.get(t, 0) + 1
    top = set(sorted(df, key=lambda t: (-df[t], t))[:100])
    co: dict[tuple, int] = {}
    for s in per_doc:
        keep = sorted(s & top)
        for i, a in enumerate(keep):
            for b in keep[i + 1:]:
                co[(a, b)] = co.get((a, b), 0) + 1
    cand = [
        (round(math.log((c * n) / (df[a] * df[b])), 6), a, b, c)
        for (a, b), c in co.items()
        if c >= _PMI_MIN_SUPPORT
    ]
    cand.sort(key=lambda x: (-x[0], x[1], x[2]))
    want = cand[:_PMI_TOP_PAIRS]
    assert len(got) == len(want)
    for r, (pmi, a, b, c) in zip(got, want):
        assert (r["tok_a"], r["tok_b"], r["n_ab"]) == (a, b, c)
        assert abs(r["pmi6"] - pmi) < 2e-6
        assert r["df_a"] == df[a] and r["df_b"] == df[b]


def test_vocab_growth_vs_pure_python(spark):
    from igpm_pem_spark.queries.pipeline8 import _q_vocab_growth

    got = {r["decile"]: r for r in _q_vocab_growth(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n = max(d["doc_id"] for d in docs) + 1
    dec = lambda i: min(i * 10 // n, 9)
    seen: set = set()
    docs_c = toks_c = 0
    want = {}
    for k in range(10):
        for d in sorted(docs, key=lambda r: r["doc_id"]):
            if dec(d["doc_id"]) == k:
                toks = [t for t in d["text"].lower().split(" ") if t]
                docs_c += 1
                toks_c += len(toks)
                seen.update(toks)
        want[k] = (docs_c, toks_c, len(seen))
    for k in range(10):
        r = got[k]
        assert (r["docs_cum"], r["tokens_cum"], r["vocab_cum"]) == want[k]
    # Heaps: vocabulary grows monotonically and sublinearly vs tokens
    assert all(got[k]["vocab_cum"] <= got[k + 1]["vocab_cum"] for k in range(9))


def test_conductance_arithmetic_from_labels(spark):
    from igpm_pem_spark.queries._common import graph_nparts
    from igpm_pem_spark.queries.graphq import _q_conductance_lpa
    from igpm_pem_spark.operators.labelprop import label_propagation

    got = {r["label"]: r for r in _q_conductance_lpa(spark, SF).collect()}
    e = [(r["src"], r["dst"]) for r in edges(spark, SF).collect()]
    lab = {
        r["id"]: r["label"]
        for r in label_propagation(
            spark, edges(spark, SF), max_iter=3,
            num_partitions=graph_nparts(spark, SF),
        ).labels.collect()
    }
    m = len(e)
    vol: dict = {}
    cut: dict = {}
    size: dict = {}
    for v, l in lab.items():
        size[l] = size.get(l, 0) + 1
    for a, b in e:
        vol[lab[a]] = vol.get(lab[a], 0) + 1
        vol[lab[b]] = vol.get(lab[b], 0) + 1
        if lab[a] != lab[b]:
            cut[lab[a]] = cut.get(lab[a], 0) + 1
            cut[lab[b]] = cut.get(lab[b], 0) + 1
    top = sorted(size, key=lambda l: (-size[l], l))[:10]
    assert set(got) == set(top)
    for l in top:
        r = got[l]
        assert r["size"] == size[l] and r["vol"] == vol.get(l, 0)
        assert r["cut"] == cut.get(l, 0)
        den = min(vol[l], 2 * m - vol[l])
        want = 0.0 if den <= 0 else round(cut.get(l, 0) / den, 6)
        assert abs(r["phi6"] - want) < 2e-6


def test_dim_truncation_recall_bounds_and_self(spark):
    from pyspark.sql import functions as F

    from igpm_pem_spark.operators.similarity import cosine_topk
    from igpm_pem_spark.queries.pipeline8 import _q_dim_truncation_recall

    rows = _q_dim_truncation_recall(spark, SF).collect()
    assert rows and all(0 <= r["n_common"] <= 10 for r in rows)
    for r in rows:
        assert abs(r["recall6"] - round(r["n_common"] / 10, 6)) < 1e-9
    # degenerate truncation (all 64 dims) must be identical to full
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    full = cosine_topk(e, k=10, query_mod=25)
    tr = cosine_topk(
        e.select("vec_id", F.slice("embedding", 1, 64).alias("embedding")),
        k=10, query_mod=25,
    )
    assert full.exceptAll(tr).count() == 0 and tr.exceptAll(full).count() == 0


def test_daily_anomaly_vs_pure_python(spark):
    import math
    from collections import Counter

    from igpm_pem_spark.queries.pipeline8 import _q_daily_anomaly

    got = _q_daily_anomaly(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = Counter(str(r["ts"].date()) for r in ev)
    nn = len(daily)
    sx = sum(daily.values())
    sxx = sum(v * v for v in daily.values())
    z = {d: round((v * nn - sx) / math.sqrt(nn * sxx - sx * sx), 6) for d, v in daily.items()}
    want = sorted(z.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:5]
    assert [(r["day"], r["z6"]) for r in got] == want
    assert all(r["n"] == daily[r["day"]] for r in got)
