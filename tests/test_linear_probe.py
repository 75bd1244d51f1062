"""logreg_probe: the fixed-step GD recurrence matches an independent
numpy replay exactly (same start, same step count), the probe separates
a linearly-separable corpus, and guards reject bad input."""

from __future__ import annotations

import numpy as np
import pytest

from igpm_pem_spark.operators.linear_probe import (
    logreg_probe_accuracy,
    logreg_probe_weights,
)


def _corpus(n=200, dim=6, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim))
    # label 0 iff a noisy linear score is positive — linearly separable-ish
    direction = rng.normal(size=dim)
    y = (x @ direction + rng.normal(scale=0.3, size=n) > 0).astype(int)
    labels = np.where(y == 1, 0, 1 + (np.arange(n) % 3))  # class 0 vs rest
    return x, labels


def _numpy_fit(x, labels, iters, lr, target_label):
    n, dim = x.shape
    y = (labels == target_label).astype(float)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        m = b + x @ w
        g = 1.0 / (1.0 + np.exp(-m)) - y
        w = w - lr / n * (x.T @ g)
        b = b - lr / n * g.sum()
    return w, b


def _df(spark, x, labels):
    return spark.createDataFrame(
        [
            (i, [float(v) for v in row], int(labels[i]))
            for i, row in enumerate(x)
        ],
        "vec_id INT, embedding ARRAY<DOUBLE>, label INT",
    )


def test_weights_match_numpy_replay(spark):
    x, labels = _corpus()
    out = (
        logreg_probe_weights(_df(spark, x, labels), dim=6, iters=4)
        .toPandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    w, b = _numpy_fit(x, labels, iters=4, lr=1.0, target_label=0)
    want = [round(b, 6)] + [round(float(v), 6) for v in w]
    got = out["w6"].tolist()
    assert np.allclose(got, want, rtol=0, atol=2e-6)


def test_probe_learns_separable_corpus(spark):
    x, labels = _corpus()
    row = logreg_probe_accuracy(
        _df(spark, x, labels), dim=6, iters=30, lr=2.0
    ).collect()[0]
    assert row.n_rows == len(x)
    assert row.n_pos == int((labels == 0).sum())
    # linear-separable-ish corpus: a linear probe must beat the base rate
    base = max(row.n_pos, row.n_rows - row.n_pos)
    assert row.n_correct > base


def test_rejects_bad_args(spark):
    x, labels = _corpus(n=5)
    df = _df(spark, x, labels)
    with pytest.raises(ValueError):
        logreg_probe_weights(df, dim=0)
    with pytest.raises(ValueError):
        logreg_probe_weights(df.where("vec_id < 0"), dim=6)


def _auc_bruteforce(scores, y):
    """Pair-counting AUC with half credit for ties (the definition the
    rank-sum formula must reproduce)."""
    pos = [s for s, t in zip(scores, y) if t == 1]
    neg = [s for s, t in zip(scores, y) if t == 0]
    u = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    return u / (len(pos) * len(neg))


def test_auc_matches_pair_counting(spark):
    from igpm_pem_spark.operators.linear_probe import logreg_probe_auc

    x, labels = _corpus()
    df = _df(spark, x, labels)
    row = logreg_probe_auc(df, dim=6, iters=4).collect()[0]
    # replicate the engine's scoring (numpy replay gives the same w/b),
    # round to the same 1e-6 grid, then brute-force pair counting
    w, b = _numpy_fit(x, labels, iters=4, lr=1.0, target_label=0)
    scores = np.round(b + x @ w, 6)
    y = (labels == 0).astype(int)
    want = _auc_bruteforce(scores.tolist(), y.tolist())
    assert row.n_pos == int(y.sum())
    assert row.n_neg == int((1 - y).sum())
    assert abs(row.auc6 - round(want, 6)) <= 1e-6
    # the probe orders a separable-ish corpus well above chance
    assert row.auc6 > 0.8


def test_auc_tie_group_half_credit(spark):
    from igpm_pem_spark.operators.linear_probe import logreg_probe_auc

    # all-zero vectors → every margin identical → one tie group → 0.5
    x = np.zeros((40, 6))
    labels = np.array([0, 1] * 20)
    row = logreg_probe_auc(_df(spark, x, labels), dim=6, iters=2).collect()[0]
    assert row.auc6 == 0.5
