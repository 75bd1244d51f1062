"""as-of / range join semantics: inclusive ties, deterministic dup-ts
choice, bucket-boundary coverage vs a brute-force oracle."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from igpm_pem_spark.operators.timejoin import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )


def test_asof_basic_latest_prior(spark):
    left = _events(spark, [
        (1, 7, _ts("2024-01-01 10:00:00"), 0.0),
        (2, 7, _ts("2024-01-01 12:00:00"), 0.0),
        (3, 8, _ts("2024-01-01 12:00:00"), 0.0),   # other key
    ])
    right = _events(spark, [
        (100, 7, _ts("2024-01-01 09:00:00"), 1.0),
        (101, 7, _ts("2024-01-01 11:30:00"), 2.0),
        (102, 9, _ts("2024-01-01 08:00:00"), 3.0),  # key with no left rows
    ])
    out = {r.event_id: r for r in asof_join(
        left, right, keys=["user_id"], right_cols=["event_id", "value"]
    ).collect()}
    assert (out[1].r_event_id, out[1].r_value) == (100, 1.0)
    assert (out[2].r_event_id, out[2].r_value) == (101, 2.0)
    assert out[3].r_event_id is None and out[3].r_value is None
    # left columns preserved
    assert set(out[1].asDict()) == {
        "event_id", "user_id", "ts", "value", "r_event_id", "r_value"
    }


def test_asof_equal_ts_inclusive_and_dup_right(spark):
    t = _ts("2024-01-01 10:00:00")
    left = _events(spark, [(1, 7, t, 0.0)])
    right = _events(spark, [
        (100, 7, t, 1.0),  # same instant: inclusive
        (101, 7, t, 2.0),  # duplicate ts: max right id (101) wins
    ])
    row = asof_join(
        left, right, keys=["user_id"], right_cols=["event_id", "value"]
    ).collect()[0]
    assert (row.r_event_id, row.r_value) == (101, 2.0)


def test_range_join_matches_bruteforce(spark):
    import random

    rng = random.Random(5)
    base = 1_700_000_000_000_000  # epoch micros
    left = _events(spark, [
        (i, rng.randrange(3), datetime.utcfromtimestamp(
            (base + rng.randrange(0, 3_000_000_000)) / 1e6), 0.0)
        for i in range(40)
    ])
    right = _events(spark, [
        (1000 + i, rng.randrange(3), datetime.utcfromtimestamp(
            (base + rng.randrange(0, 3_000_000_000)) / 1e6), 0.0)
        for i in range(40)
    ])
    tol = 200_000_000  # 200 s
    got = {
        (r.event_id, r.r_event_id, r.delta_us)
        for r in range_join(
            left, right, keys=["user_id"], tol_us=tol
        ).collect()
    }
    lc = [(r.event_id, r.user_id, r.ts) for r in left.collect()]
    rc = [(r.event_id, r.user_id, r.ts) for r in right.collect()]
    want = set()
    for lid, lu, lt in lc:
        for rid, ru, rt in rc:
            if lu == ru:
                d = round((rt - lt).total_seconds() * 1e6)
                if abs(d) <= tol:
                    want.add((lid, rid, d))
    assert got == want
    assert len(want) > 0


def test_range_join_no_crossjoin_in_plan(spark):
    left = _events(spark, [(1, 7, _ts("2024-01-01 10:00:00"), 0.0)])
    right = _events(spark, [(2, 7, _ts("2024-01-01 10:01:00"), 0.0)])
    plan = range_join(
        left, right, keys=["user_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_null_right_column_carried_atomically(spark):
    """A NULL in a right column of the matched row must surface as NULL —
    never back-filled from an OLDER right row (the torn-row bug: carrying
    each column independently with last(ignorenulls) mixes two rows)."""
    left = _events(spark, [(1, 7, _ts("2024-01-01 12:00:00"), 0.0)])
    right = spark.createDataFrame(
        [
            (100, 7, _ts("2024-01-01 09:00:00"), 1.0),
            (101, 7, _ts("2024-01-01 11:00:00"), None),  # matched row, NULL value
        ],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    row = asof_join(
        left, right, keys=["user_id"], right_cols=["event_id", "value"]
    ).collect()[0]
    assert row.r_event_id == 101
    assert row.r_value is None  # NOT 1.0 from the older row


def test_asof_guards(spark):
    import pytest

    left = _events(spark, [(1, 7, _ts("2024-01-01 12:00:00"), 0.0)])
    right = left.select("user_id", "ts")
    with pytest.raises(ValueError, match="right_cols is empty"):
        asof_join(left, right, keys=["user_id"])
    # prefixed output collides with an existing left column
    right2 = _events(spark, [(9, 7, _ts("2024-01-01 09:00:00"), 1.0)])
    left2 = left.withColumn("r_value", F.lit(5.0))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right2, keys=["user_id"], right_cols=["value"])
