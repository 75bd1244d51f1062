"""Tests for product quantization (operators/pq.py) and DSIR importance
weights (operators/importance.py) — numpy/python reference parity plus
guard-rail behavior."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from igpm_pem_spark.operators.importance import dsir_weights
from igpm_pem_spark.operators.pq import pq_encode


def _vecs(n: int, dim: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).astype(np.float32).tolist()


def _ref_pq(vecs, m, k, iters):
    """Pure-numpy replica of pq_encode's recurrence: per-subspace Lloyd
    from the k lowest-id seeds, argmin ties to the lower code, empty
    clusters keep their previous centroid."""
    v = np.asarray(vecs, dtype=np.float64)
    n, dim = v.shape
    sub = dim // m
    codes = np.zeros((n, m), dtype=int)
    d2s = np.zeros((n, m))
    for j in range(m):
        x = v[:, j * sub : (j + 1) * sub]
        cent = x[:k].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # np argmin ties → lowest index
            for c in range(len(cent)):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
        d2s[:, j] = d2.min(axis=1)
    return codes, d2s.sum(axis=1) / dim


def test_pq_codes_match_numpy(spark):
    vecs = _vecs(60, 8)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    res = pq_encode(spark, df, m=2, k=4, iters=2)
    got = {
        int(r.vec_id): ((r.code_0, r.code_1), r.mse4)
        for r in res.codes.collect()
    }
    codes, mse = _ref_pq(vecs, m=2, k=4, iters=2)
    for i in range(60):
        assert got[i][0] == (codes[i, 0], codes[i, 1]), i
        assert got[i][1] == pytest.approx(mse[i], abs=2e-4), i
    assert len(res.codebooks) == 2 and all(len(b) == 4 for b in res.codebooks)


def test_pq_compression_beats_coarser(spark):
    # more codes per subspace can only reduce (or tie) reconstruction MSE
    vecs = _vecs(80, 8, seed=11)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    mse_k2 = pq_encode(spark, df, m=2, k=2, iters=2).codes.agg(
        F.sum("mse4")
    ).first()[0]
    mse_k8 = pq_encode(spark, df, m=2, k=8, iters=2).codes.agg(
        F.sum("mse4")
    ).first()[0]
    assert mse_k8 < mse_k2


def test_pq_guards(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(spark, df, m=2)
    empty = df.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        pq_encode(spark, empty, m=3)


def test_ivfpq_topk_recall_and_shape(spark):
    from igpm_pem_spark.operators.pq import ivfpq_topk

    # 3 well-separated gaussian blobs: IVF-PQ must recover same-blob
    # neighbors for every query
    rng = np.random.RandomState(3)
    centers = np.array([[6.0] * 8, [-6.0] * 8, [6.0, -6.0] * 4])
    vecs = np.concatenate(
        [c + 0.3 * rng.randn(30, 8) for c in centers]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    out = ivfpq_topk(
        spark, df, k=3, n_clusters=3, iters=2, nprobe=1, query_mod=10,
        m=2, pq_k=8,
    ).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        assert r.adc4 >= 0.0
        by_q.setdefault(int(r.query_id), []).append(r)
    assert set(by_q) == {i for i in range(90) if i % 10 == 0}
    blob = lambda i: i // 30
    for qid, rows in by_q.items():
        assert len(rows) == 3
        # every retrieved neighbor comes from the query's blob
        assert all(blob(int(r.neighbor_id)) == blob(qid) for r in rows), (
            qid, [(r.neighbor_id, r.adc4) for r in rows])


def test_cms_heavy_hitters(spark):
    from igpm_pem_spark.operators.sketch import cms_heavy_hitters

    rows = [
        (0, "apple apple apple banana"),
        (1, "apple banana cherry"),
        (2, "apple date cherry cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = cms_heavy_hitters(df, topn=10).collect()
    by_tok = {r.token: (r.est, r.exact) for r in out}
    assert by_tok["apple"][1] == 5
    assert by_tok["cherry"][1] == 3
    assert by_tok["banana"][1] == 2
    assert by_tok["date"][1] == 1
    for est, exact in by_tok.values():
        assert est >= exact  # CMS never undercounts
    # ranked by estimate desc then token — apple must lead
    assert out[0].token == "apple"


def _tid(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % 1_000_000_007


def _ref_dsir(rows, target_langs, n_buckets):
    toks = [
        (i, _tid(t) % n_buckets)
        for i, (text, _lang) in enumerate(rows)
        for t in text.lower().split(" ")
        if t
    ]
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    target = {i for i, (_t, lang) in enumerate(rows) if lang in target_langs}
    for i, b in toks:
        rc[b] = rc.get(b, 0) + 1
        if i in target:
            tc[b] = tc.get(b, 0) + 1
    out = {}
    for i, _ in enumerate(rows):
        mine = [b for d, b in toks if d == i]
        th = sum(tc.get(b, 0) for b in mine)
        rh = sum(rc.get(b, 0) for b in mine)
        out[i] = (th, rh, len(mine), round((th + 1) / (rh + 1), 6))
    return out


def test_dsir_weights_match_reference(spark):
    rows = [
        ("the quick brown fox", "en"),
        ("the lazy dog sleeps", "en"),
        ("der schnelle braune fuchs", "de"),
        ("le renard brun rapide", "fr"),
        ("the fox and the dog", "en"),
        ("", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(rows)],
        "doc_id BIGINT, text STRING, lang STRING",
    )
    got = {
        int(r.doc_id): (r.t_hits, r.r_hits, r.n_tokens, r.ratio6)
        for r in dsir_weights(df, F.col("lang") == "en", n_buckets=16).collect()
    }
    ref = _ref_dsir(rows, {"en"}, 16)
    # the empty doc has no tokens → no output row (matches the oracle,
    # which also only emits docs with >= 1 token)
    assert set(got) == {i for i in ref if ref[i][2] > 0}
    for i in got:
        assert got[i] == ref[i], i
    # an English doc sharing buckets with other English docs outscores a
    # lone-language doc on the ratio
    assert got[4][3] > got[3][3]
