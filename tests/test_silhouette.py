"""silhouette_by_cluster: centroid-based silhouette against a hand
computation on a fixture where the 2-round Lloyd outcome is obvious."""

from __future__ import annotations

import math

import pytest

from igpm_pem_spark.operators.clustering import silhouette_by_cluster


def _dist(a, b):
    return math.sqrt(sum((x - y) * (x - y) for x, y in zip(a, b)))


def test_silhouette_matches_hand_computation(spark):
    # two well-separated pairs; seeds (lowest ids) = one per pair, so
    # both Lloyd rounds keep the same assignment and the final centroids
    # are the pair means
    vecs = {
        1: [0.0, 0.0],
        2: [10.0, 10.0],
        3: [0.5, 0.0],
        4: [10.0, 10.5],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        r.cluster: (r.n, r.silhouette6)
        for r in silhouette_by_cluster(spark, df, k=2, iters=2).collect()
    }
    cents = {0: [0.25, 0.0], 1: [10.0, 10.25]}
    s_by_cluster = {0: [], 1: []}
    for i, v in vecs.items():
        c = 0 if i in (1, 3) else 1
        a = _dist(v, cents[c])
        b = _dist(v, cents[1 - c])
        s_by_cluster[c].append((b - a) / max(a, b))
    for c in (0, 1):
        n, s6 = got[c]
        assert n == 2
        assert abs(s6 - round(sum(s_by_cluster[c]) / 2, 6)) < 1e-9


def test_silhouette_identical_points_is_zero(spark):
    # all vectors identical: both seed centroids coincide, every point
    # ties to cluster 0 (lower j), a = b = 0 -> s defined as 0
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(3)], "vec_id long, embedding array<double>"
    )
    rows = silhouette_by_cluster(spark, df, k=2, iters=2).collect()
    assert len(rows) == 1
    assert (rows[0].cluster, rows[0].n, rows[0].silhouette6) == (0, 3, 0.0)


def test_silhouette_k1_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k must be >= 2"):
        silhouette_by_cluster(spark, df, k=1)
