"""Session-10 batch 6: Heaps-slope OLS replica, quality-dup correlation
replica, int8 norm histogram replica."""

from __future__ import annotations

import math
from collections import Counter

from igpm_pem_spark.queries.pipeline13 import (
    _q_heaps_slope,
    _q_norm_histogram,
    _q_quality_dup_corr,
)

SF = "/root/testdata/sf0.001"


def test_heaps_slope_vs_python_ols(spark):
    from igpm_pem_spark.queries.pipeline8 import _q_vocab_growth

    row = _q_heaps_slope(spark, SF).collect()[0]
    pts = [(r.tokens_cum, r.vocab_cum) for r in _q_vocab_growth(spark, SF).collect()]
    xs = [math.log(t) for t, _ in pts]
    ys = [math.log(v) for _, v in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    mxy = sum(x * y for x, y in zip(xs, ys)) / n
    mxx = sum(x * x for x in xs) / n
    slope = (mxy - mx * my) / (mxx - mx * mx)
    assert row.n_points == n == 10
    assert abs(row.slope6 - round(slope, 6)) < 2e-6
    # Heaps: sublinear. The synthetic corpus draws from a closed
    # vocabulary, so β saturates to ~0 — exactly the "re-crawling
    # itself" verdict the audit exists to deliver.
    assert 0.0 <= row.slope6 < 1.0


def test_quality_dup_corr_vs_python(spark):
    from igpm_pem_spark.functions.text import quality_score
    from igpm_pem_spark.operators.dedup import dedup_clusters
    from igpm_pem_spark.queries._common import docs

    row = _q_quality_dup_corr(spark, SF).collect()[0]
    d = docs(spark, SF)
    keep = {r.doc_id: r.keep for r in dedup_clusters(spark, d, threshold=0.1).collect()}
    qm = {r.doc_id: round(r.quality * 1e6) for r in quality_score(d).collect()}
    n = len(qm)
    dups = [i for i in qm if not keep[i]]
    nd = len(dups)
    s1 = sum(qm.values())
    s2 = sum(v * v for v in qm.values())
    sd = sum(qm[i] for i in dups)
    md, mk = sd / nd, (s1 - sd) / (n - nd)
    sdev = math.sqrt(s2 / n - (s1 / n) ** 2)
    r = (md - mk) / sdev * math.sqrt(nd * (n - nd) / (n * n))
    assert (row.n_docs, row.n_dups) == (n, nd)
    assert abs(row.r6 - round(r, 6)) < 2e-6


def test_norm_histogram_vs_python(spark):
    got = {r.bucket: r.n_vectors for r in _q_norm_histogram(spark, SF).collect()}
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    want = Counter()
    for r in rows:
        vec = [float(x) for x in r.embedding]
        am = max(abs(x) for x in vec)
        q = [math.floor(x * (127.0 / am) + 0.5) for x in vec] if am > 0 else [0] * len(vec)
        n2 = sum(v * v for v in q)
        want[len(bin(n2)) - 2] += 1
    assert got == dict(want)
    assert sum(got.values()) == len(rows)
