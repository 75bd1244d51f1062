"""Session-7 operators: market-basket lift, Zipf slope, class
separation, inter-arrival burstiness — handcrafted-input parity against
pure-python references."""

from __future__ import annotations

import math
import statistics

from pyspark.sql import functions as F

from igpm_pem_spark.operators.corpus import zipf_slope
from igpm_pem_spark.operators.features import class_separation
from igpm_pem_spark.operators.market import copurchase_lift
from igpm_pem_spark.operators.temporal import interarrival_burstiness


def test_copurchase_lift_handcrafted(spark):
    # baskets: 1:{A,B}, 2:{A,B}, 3:{A,C}, 4:{B}, 5:{A,B,C}
    rows = [
        (1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"),
        (4, "B"), (5, "A"), (5, "B"), (5, "C"),
        (5, "C"),  # duplicate membership must not double-count
    ]
    b = spark.createDataFrame(rows, "basket BIGINT, item STRING")
    got = {
        (r.item_a, r.item_b): (r.n_pair, r.support6, r.lift6)
        for r in copurchase_lift(b).collect()
    }
    # N=5, n_A=4, n_B=4, n_C=2; AB=3, AC=2, BC=1
    assert got[("A", "B")] == (3, 0.6, round(3 * 5 / (4 * 4), 6))
    assert got[("A", "C")] == (2, 0.4, round(2 * 5 / (4 * 2), 6))
    assert got[("B", "C")] == (1, 0.2, round(1 * 5 / (4 * 2), 6))


def test_copurchase_topk_deterministic(spark):
    # two pairs with identical lift — tie broken by (item_a, item_b)
    rows = [(1, "A"), (1, "B"), (2, "C"), (2, "D")]
    b = spark.createDataFrame(rows, "basket BIGINT, item STRING")
    out = copurchase_lift(b, top_k=1).collect()
    assert [(out[0].item_a, out[0].item_b)] == [("A", "B")]


def test_zipf_slope_matches_numpy_ols(spark):
    # corpus where frequencies are known: 'x' 8 times, 'y' 4, 'z' 2, 'w' 1
    text = " ".join(["x"] * 8 + ["y"] * 4 + ["z"] * 2 + ["w"])
    docs = spark.createDataFrame(
        [(1, text, "en")], "doc_id BIGINT, text STRING, lang STRING"
    )
    row = zipf_slope(docs, top_n=50).collect()[0]
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    mx, my = statistics.fmean(xs), statistics.fmean(ys)
    mxy = statistics.fmean(x * y for x, y in zip(xs, ys))
    mxx = statistics.fmean(x * x for x in xs)
    slope = (mxy - mx * my) / (mxx - mx * mx)
    assert row.n_top == 4
    assert abs(row.slope6 - round(slope, 6)) < 1e-9
    assert abs(row.intercept6 - round(my - slope * mx, 6)) < 1e-9


def test_zipf_two_stage_topk_is_exact(spark):
    # 80 distinct tokens with descending counts; top_n=10 must pick the
    # 10 globally most frequent even though candidates come from 64
    # hash buckets (bucket top-k union is a superset of the global top-k)
    words = []
    for i in range(80):
        words += [f"t{i:02d}"] * (80 - i)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en")], "doc_id BIGINT, text STRING, lang STRING"
    )
    row = zipf_slope(docs, top_n=10).collect()[0]
    xs = [math.log(r) for r in range(1, 11)]
    ys = [math.log(80 - i) for i in range(10)]
    mx, my = statistics.fmean(xs), statistics.fmean(ys)
    mxy = statistics.fmean(x * y for x, y in zip(xs, ys))
    mxx = statistics.fmean(x * x for x in xs)
    slope = (mxy - mx * my) / (mxx - mx * mx)
    assert row.n_top == 10
    assert abs(row.slope6 - round(slope, 6)) < 1e-9


def test_class_separation_orthogonal_classes(spark):
    # label 0 vectors on e1, label 1 on e2 — intra cos 1, inter cos 0
    rows = [
        (1, 0, [1.0, 0.0]), (2, 0, [2.0, 0.0]),
        (3, 1, [0.0, 1.0]), (4, 1, [0.0, 3.0]),
    ]
    e = spark.createDataFrame(
        rows, "vec_id BIGINT, label BIGINT, embedding ARRAY<DOUBLE>"
    )
    got = {r.label: r for r in class_separation(e).collect()}
    for lbl in (0, 1):
        assert got[lbl].n_vecs == 2
        assert got[lbl].intra_cos6 == 1.0
        assert got[lbl].max_inter_cos6 == 0.0
        assert got[lbl].margin6 == 1.0


def test_class_separation_mixed(spark):
    # label 0: e1 and the diagonal; centroid (0.75, 0.25)
    rows = [
        (1, 0, [1.0, 0.0]), (2, 0, [0.5, 0.5]),
        (3, 1, [0.0, 1.0]),
    ]
    e = spark.createDataFrame(
        rows, "vec_id BIGINT, label BIGINT, embedding ARRAY<DOUBLE>"
    )
    got = {r.label: r for r in class_separation(e).collect()}
    c0 = (0.75, 0.25)
    n0 = math.hypot(*c0)
    cos1 = 0.75 / n0  # e1 . c0 / (1 * |c0|)
    v2n = math.hypot(0.5, 0.5)
    cos2 = (0.5 * 0.75 + 0.5 * 0.25) / (v2n * n0)
    assert abs(got[0].intra_cos6 - round((cos1 + cos2) / 2, 6)) < 1e-9
    inter = 0.25 / n0  # c0 . e2 / (|c0| * 1)
    assert abs(got[0].max_inter_cos6 - round(inter, 6)) < 1e-9
    assert abs(got[1].max_inter_cos6 - round(inter, 6)) < 1e-9


def test_burstiness_metronome_and_bursty(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: perfectly regular 10s gaps -> sd=0 -> B=-1
    for i in range(6):
        rows.append((i, t0 + dt.timedelta(seconds=10 * i), 1))
    # user 2: gaps 1,1,1,1,100 -> bursty, B in (0, 1)
    acc = 0
    gaps = [0, 1, 1, 1, 1, 100]
    for i, g in enumerate(gaps):
        acc += g
        rows.append((10 + i, t0 + dt.timedelta(seconds=acc), 2))
    # user 3: only 3 events (2 gaps) -> filtered by min_gaps=4
    for i in range(3):
        rows.append((20 + i, t0 + dt.timedelta(seconds=5 * i), 3))
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    )
    got = {r.user_id: r for r in interarrival_burstiness(ev).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_gaps == 5
    assert got[1].burstiness6 == -1.0
    g2 = [1.0, 1.0, 1.0, 1.0, 100.0]
    m = statistics.fmean(g2)
    sd = statistics.stdev(g2)
    assert abs(got[2].burstiness6 - round((sd - m) / (sd + m), 6)) < 1e-6
    assert got[2].burstiness6 > 0


def test_burstiness_tie_break_on_event_id(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # two events at the identical timestamp: gap sequence must still be
    # deterministic (ordered by event_id) and contain a zero gap
    rows = [
        (1, t0, 7),
        (2, t0, 7),
        (3, t0 + dt.timedelta(seconds=4), 7),
        (4, t0 + dt.timedelta(seconds=8), 7),
        (5, t0 + dt.timedelta(seconds=12), 7),
    ]
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
    )
    r = interarrival_burstiness(ev).collect()[0]
    g = [0.0, 4.0, 4.0, 4.0]
    m, sd = statistics.fmean(g), statistics.stdev(g)
    assert r.n_gaps == 4
    assert abs(r.mean_gap_s6 - round(m, 6)) < 1e-9
    assert abs(r.burstiness6 - round((sd - m) / (sd + m), 6)) < 1e-6
