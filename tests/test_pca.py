"""pca_top_component: power iteration converges to numpy's top
eigenvector of the sample covariance (sign pinned by the positive
start vector), and guards reject degenerate input."""

from __future__ import annotations

import math

import numpy as np
import pytest

from igpm_pem_spark.operators.pca import pca_top_component


def _corpus(n=300, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    # dominant direction with a 10x variance gap so 12 iterations converge
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    coords = rng.normal(scale=10.0, size=(n, 1)) * direction
    noise = rng.normal(scale=1.0, size=(n, dim))
    return coords + noise


def test_matches_numpy_eigenvector(spark):
    x = _corpus()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    out = (
        pca_top_component(df, dim=8, iters=12)
        .toPandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    if top.sum() < 0:  # power iteration's sign is set by the all-ones start
        top = -top
    assert np.allclose(out["mu6"].values, np.round(mu, 6))
    assert np.allclose(out["loading6"].values, top, atol=1e-4)
    assert math.isclose(float((out["loading6"] ** 2).sum()), 1.0, rel_tol=1e-4)


def test_project_matches_numpy(spark):
    x = _corpus()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    from igpm_pem_spark.operators.pca import pca_project

    out = (
        pca_project(df, dim=8, iters=12)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu)
    _, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    if top.sum() < 0:
        top = -top
    expected = (x - mu) @ top
    assert len(out) == len(x)
    assert np.allclose(out["score6"].values, expected, atol=1e-3)


def test_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id INT, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="iters and dim"):
        pca_top_component(df, dim=2, iters=0)
    with pytest.raises(ValueError, match="degenerate"):
        pca_top_component(df, dim=2, iters=2)


def _corpus2(n=400, dim=8, seed=11):
    """Two dominant directions with 100x / 25x variance over noise so 14
    deflated iterations converge to the true second eigenvector."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    d1, d2 = q[:, 0], q[:, 1]
    return (
        rng.normal(scale=10.0, size=(n, 1)) * d1
        + rng.normal(scale=5.0, size=(n, 1)) * d2
        + rng.normal(scale=1.0, size=(n, dim))
    )


def test_second_component_matches_numpy(spark):
    from igpm_pem_spark.operators.pca import pca_second_component

    x = _corpus2()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    out = (
        pca_second_component(df, dim=8, iters=14)
        .toPandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu)
    _, vecs = np.linalg.eigh(cov)
    v2 = vecs[:, -2]
    got = out["loading2_6"].values
    if np.dot(got, v2) < 0:
        v2 = -v2
    assert np.allclose(got, v2, atol=1e-3)
    # orthogonality to the returned top direction and unit norm
    assert abs(float((out["loading1_6"] * out["loading2_6"]).sum())) < 1e-4
    assert math.isclose(float((out["loading2_6"] ** 2).sum()), 1.0, rel_tol=1e-4)
