"""Degree-skew measurement operators: histogram-exact Gini and the
adaptive hub salt plan (the two pre-launch numbers an iterative kernel
reads before choosing its shuffle layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from igpm_pem_spark.operators.metrics import degree_gini
from igpm_pem_spark.operators.partition import skew_salt_plan


def _gini_direct(degs: list[int]) -> float:
    """Textbook per-item rank formula on a plain Python list."""
    d = sorted(degs)
    n = len(d)
    t = sum(d)
    s = sum((i + 1) * v for i, v in enumerate(d))
    return (2.0 * s - (n + 1.0) * t) / ((n * 1.0) * t)


def test_degree_gini_matches_direct_rank_formula(spark):
    # star + path: strongly unequal degrees, plenty of rank ties
    edges = [(0, i) for i in range(1, 8)] + [(10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_gini(df).collect()[0]
    degs = {}
    for a, b in edges:
        degs[a] = degs.get(a, 0) + 1
        degs[b] = degs.get(b, 0) + 1
    assert row.n_vertices == len(degs)
    assert row.deg_total == sum(degs.values())
    assert abs(row.gini6 - round(_gini_direct(list(degs.values())), 6)) < 1e-9


def test_degree_gini_uniform_is_zero(spark):
    # 4-cycle: every vertex degree 2 → perfect equality
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert degree_gini(df).collect()[0].gini6 == 0.0


def test_salt_plan_matches_plain_groupby_ceil(spark):
    rows = [("hub", i) for i in range(25)] + [("warm", i) for i in range(9)] + [
        ("cold", i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r.id: (r.cnt, r.n_splits) for r in skew_salt_plan(df, "k", 8).collect()}
    # only keys with cnt > 8 appear; splits = ceil(cnt/8)
    assert got == {"hub": (25, 4), "warm": (9, 2)}


def test_salt_plan_no_hubs_is_empty(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    assert skew_salt_plan(df, "k", 8).count() == 0
