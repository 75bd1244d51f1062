"""Session-8 batch 4: spectral-gap recurrence parity vs numpy, n-gram
containment hand-cases, WAU sliding-window hand-trace."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from igpm_pem_spark.operators.dedup import containment_pairs
from igpm_pem_spark.operators.spectral import spectral_gap


def _numpy_replay(pairs, rounds=8):
    """Exact numpy replay of the deflated power recurrence."""
    nodes = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1
        A[idx[b], idx[a]] = 1
    d = A.sum(1)
    pi = d / d.sum()
    v = np.array([1.0 if u % 2 == 1 else -1.0 for u in nodes])
    prev = None
    for r in range(rounds):
        v = v - (pi @ v)
        if r == rounds - 1:
            prev = float(v @ v)
        v = (v / d) @ A  # (P v)(x) = sum_{u~x} v(u)/d(u)
    lam = (float(v @ v) / prev) ** 0.5
    return round(lam, 6), round(1.0 - lam, 6)


def _true_lambda2(pairs):
    nodes = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1
        A[idx[b], idx[a]] = 1
    P = A / A.sum(1)[:, None]
    mags = sorted(np.abs(np.linalg.eigvals(P)))[::-1]
    return float(mags[1])


@pytest.mark.parametrize("seed", [5])
def test_spectral_gap_numpy_replay(spark, seed):
    import random

    rng = random.Random(seed)
    pairs = list({
        tuple(sorted(rng.sample(range(30), 2))) for _ in range(140)
    })
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = spectral_gap(spark, e, rounds=8).collect()[0]
    lam6, gap6 = _numpy_replay(pairs, 8)
    assert got.n_vertices == len({v for p in pairs for v in p})
    assert got.lambda2_abs6 == pytest.approx(lam6, abs=2e-6)
    assert got.gap6 == pytest.approx(gap6, abs=2e-6)
    # on a well-gapped random graph 8 rounds sit near the true value
    assert abs(got.lambda2_abs6 - _true_lambda2(pairs)) < 0.1


def test_spectral_gap_two_cliques_barely_bridged(spark):
    # K6 and K7 joined by one edge: lambda2 near 1 (strong cluster
    # structure). Asymmetric sizes/labels on purpose — a label-symmetric
    # pair puts the pinned parity start EXACTLY orthogonal to the
    # cluster eigenvector (the documented non-generic-start caveat).
    k = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    k2 = [(a, b) for a in range(11, 18) for b in range(a + 1, 18)]
    pairs = k + k2 + [(0, 11)]
    got = spectral_gap(spark, spark.createDataFrame(pairs, "src long, dst long")).collect()[0]
    assert got.lambda2_abs6 > 0.85  # near-disconnected -> tiny gap
    lam6, _ = _numpy_replay(pairs, 8)
    assert got.lambda2_abs6 == pytest.approx(lam6, abs=2e-6)


def test_containment_wrapper_detection(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    wrapper = "header junk words " + base + " footer junk"
    other = "completely different text with unrelated tokens here now"
    docs = spark.createDataFrame(
        [(1, base), (2, wrapper), (3, other)], "doc_id long, text string"
    )
    got = containment_pairs(docs, threshold=0.9).collect()
    rows = {(r.doc_a, r.doc_b): r for r in got}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    # every 3-gram of the base appears in the wrapper -> cont_a == 1.0
    assert r.cont_a6 == 1.0 and r.cont_b6 < 1.0
    assert r.n_inter == r.sz_a
    assert not any(3 in (a, b) for a, b in rows)


def test_wau_hand_trace(spark, tmp_path):
    from igpm_pem_spark.queries.metricsq6 import _q_wau

    t = datetime.datetime
    rows = [
        # user 1 active day 1 and day 5; user 2 active day 1 only
        (0, t(2024, 1, 1, 9), 1, "view", 1.0, "{}"),
        (1, t(2024, 1, 1, 10), 2, "view", 1.0, "{}"),
        (2, t(2024, 1, 5, 9), 1, "click", 1.0, "{}"),
        (3, t(2024, 1, 20, 9), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.day: (r.dau, r.wau) for r in _q_wau(spark, str(tmp_path)).collect()}
    assert got == {
        "2024-01-01": (2, 2),          # both active that day
        "2024-01-05": (1, 2),          # user 1 today + user 2 within 7d
        "2024-01-20": (1, 1),
    }
