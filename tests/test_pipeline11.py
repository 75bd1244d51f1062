"""Session-8 pipeline ring: MMR greedy hand-traces, JL projection
properties, attribution hand-trace, triangle-significance arithmetic."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from igpm_pem_spark.operators.similarity import mmr_greedy
from igpm_pem_spark.queries.pipeline11 import (
    _q_attribution,
    _rp_sign_sql,
)


# ---- MMR greedy -------------------------------------------------------------
def test_mmr_hand_trace():
    # query-sims: a .9, b .8, c .7; a,b near-dups (sim .95), c far (.1)
    simq = {1: 0.9, 2: 0.8, 3: 0.7}
    psim = {
        (1, 2): 0.95, (2, 1): 0.95,
        (1, 3): 0.1, (3, 1): 0.1,
        (2, 3): 0.1, (3, 2): 0.1,
    }
    got = mmr_greedy(simq, psim, 3, lam=0.5)
    # round 1: a (0.45); round 2: b scores .4-.475<0, c scores .35-.05=.30
    # -> c jumps the near-dup b; round 3: b
    assert [(r, v) for r, v, _ in got] == [(1, 1), (2, 3), (3, 2)]
    assert got[0][2] == pytest.approx(0.45)
    assert got[1][2] == pytest.approx(0.30)


def test_mmr_tie_breaks_by_id_and_k_clamps():
    simq = {5: 0.5, 2: 0.5}
    psim = {(5, 2): 0.0, (2, 5): 0.0}
    got = mmr_greedy(simq, psim, 10)
    assert [v for _, v, _ in got] == [2, 5]  # tie -> ascending id; k clamps
    with pytest.raises(ValueError, match="k must be"):
        mmr_greedy(simq, psim, 0)


# ---- JL sign family ----------------------------------------------------------
def test_rp_signs_balanced_and_portable(spark):
    rows = (
        spark.range(16).withColumnRenamed("id", "k")
        .crossJoin(spark.range(64).withColumnRenamed("id", "j"))
        .withColumn("s", F.expr(_rp_sign_sql("k", "j")))
        .collect()
    )
    vals = {(r.k, r.j): r.s for r in rows}
    assert set(vals.values()) == {1.0, -1.0}
    # roughly balanced overall (the hash family is equidistributed)
    pos = sum(1 for v in vals.values() if v > 0)
    assert 0.35 * 1024 < pos < 0.65 * 1024
    # rows are not all identical (distinct projection directions)
    row_sigs = {tuple(vals[(k, j)] for j in range(64)) for k in range(16)}
    assert len(row_sigs) == 16
    # portable: duckdb evaluates the same text to the same signs
    import duckdb

    dd = duckdb.connect().execute(
        f"SELECT k.range, j.range, {_rp_sign_sql('k.range', 'j.range')}"
        " FROM range(0,16) k CROSS JOIN range(0,64) j"
    ).fetchall()
    assert {(k, j): s for k, j, s in dd} == vals


# ---- last-touch attribution ---------------------------------------------------
def test_attribution_hand_trace(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, user, typ):
        return (i, t0 + datetime.timedelta(minutes=i), user, typ, 1.0, "{}")

    rows = [
        ev(0, 1, "view"), ev(1, 1, "purchase"),          # -> view
        ev(2, 2, "purchase"),                              # -> none (first touch)
        ev(3, 3, "view"), ev(4, 3, "click"), ev(5, 3, "purchase"),  # -> click
        ev(6, 3, "purchase"),                              # -> click (carried)
        ev(7, 4, "error"), ev(8, 4, "purchase"),          # -> none (error ignored)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    got = {
        r.attributed_to: r.n_purchases
        for r in _q_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {"view": 1, "click": 2, "none": 2}


# ---- configuration-model expectation -------------------------------------------
def test_triangle_significance_formula(spark, tmp_path):
    # triangle 1-2-3 with pendant 3-4: T=1, degrees (2,2,3,1)
    # S1=8, S2=2+2+6+0=10 -> E[T]=(10/8)^3/6
    import duckdb

    li = [
        # order 1 -> parts {1,2,3} (triangle), order 2 -> {3,4} (pendant)
        (1, 1), (1, 2), (1, 3), (2, 3), (2, 4),
    ]
    # sparse graph keeps orderkey % 50 == 0 -> use keys 50 and 100
    rows = [(50 if o == 1 else 100, p) for o, p in li]
    df = spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG")
    p = str(tmp_path / "lineitem.parquet")
    df.write.parquet(p)
    from igpm_pem_spark.queries.pipeline11 import _q_triangle_significance

    r = _q_triangle_significance(spark, str(tmp_path)).collect()[0]
    assert (r.n_triangles, r.s1, r.s2) == (1, 8, 10)
    assert r.expected_t6 == pytest.approx(round((10 / 8) ** 3 / 6, 6))
    assert r.ratio6 == pytest.approx(round(1 / ((10 / 8) ** 3 / 6), 6))
