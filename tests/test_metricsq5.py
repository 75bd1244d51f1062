"""Session-8 metrics ring: butterfly census and monthly-triangle
hand-traces / python parity on synthetic parquet."""

from __future__ import annotations

import datetime
import itertools

from pyspark.sql import functions as F

from igpm_pem_spark.queries.metricsq5 import (
    _q_butterflies,
    _q_monthly_triangles,
)


def _write(spark, tmp_path, orders, lineitem):
    spark.createDataFrame(
        orders, "o_orderkey LONG, o_custkey LONG, o_orderdate DATE"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem, "l_orderkey LONG, l_partkey LONG, l_linenumber LONG"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))


def _butterfly_reference(pairs):
    """Count 2x2 bicliques by brute force over customer pairs."""
    from collections import defaultdict

    parts = defaultdict(set)
    for c, p in pairs:
        parts[c].add(p)
    b = 0
    for c1, c2 in itertools.combinations(sorted(parts), 2):
        w = len(parts[c1] & parts[c2])
        b += w * (w - 1) // 2
    return b


def test_butterflies_k22_plus(spark, tmp_path):
    d = datetime.date(2024, 1, 1)
    # customers 1,2 both buy parts 10,11 (one butterfly); customer 3
    # shares only part 10 with each (wedges, no butterfly)
    orders = [(1, 1, d), (2, 2, d), (3, 3, d)]
    lineitem = [
        (1, 10, 1), (1, 11, 2),
        (2, 10, 1), (2, 11, 2),
        (3, 10, 1), (3, 12, 2),
    ]
    _write(spark, tmp_path, orders, lineitem)
    r = _q_butterflies(spark, str(tmp_path)).collect()[0]
    pairs = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 12)]
    assert r.n_butterflies == _butterfly_reference(pairs) == 1
    # connected customer pairs: (1,2) via 10&11, (1,3) via 10, (2,3) via 10
    assert r.n_connected_pairs == 3
    assert r.n_wedges == 2 + 1 + 1


def test_monthly_triangles_split_by_month(spark, tmp_path):
    jan, feb = datetime.date(2024, 1, 15), datetime.date(2024, 2, 15)
    # order 10 (jan): parts {1,2,3} -> one jan triangle
    # order 20 (feb): parts {1,2} and order 30 (feb): parts {2,3} -> no
    # feb triangle (edge (1,3) only exists in jan)
    orders = [(10, 1, jan), (20, 2, feb), (30, 3, feb)]
    lineitem = [
        (10, 1, 1), (10, 2, 2), (10, 3, 3),
        (20, 1, 1), (20, 2, 2),
        (30, 2, 1), (30, 3, 2),
    ]
    _write(spark, tmp_path, orders, lineitem)
    got = {
        r.mi: r.n_triangles
        for r in _q_monthly_triangles(spark, str(tmp_path)).collect()
    }
    assert got == {2024 * 12 + 1: 1}
