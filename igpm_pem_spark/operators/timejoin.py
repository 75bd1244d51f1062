"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of shuffles Spark already does well —
no inequality nested-loop, no crossJoin, no UDF — so they keep working at
event-log scale:

* ``asof_join``: per key, match each left row to the LATEST right row with
  ``right_ts <= left_ts``. Plan: tag + union both inputs, one window per
  key ordered by (ts, side, right-id) carrying the last-seen right row
  forward as ONE struct (``last(struct(...), ignorenulls)``), then keep
  left rows. ONE shuffle on the key — the same cost as any per-key
  window; no per-row probing. The struct carry is atomic: all right
  columns come from the SAME matched right row even when some of its
  fields are NULL (a per-column carry would backfill NULL fields from
  older rows — a torn result). Right rows sort before left rows at equal
  ts (ties are inclusive), and among equal-ts right rows the largest
  right id wins (deterministic).

* ``range_join``: all (left, right) pairs with the same key whose
  timestamps differ by at most ``tol``. Plan: quantize time into
  ``tol``-wide buckets and explode the RIGHT side into its bucket ±1, so
  every qualifying pair shares an exact (key, bucket) join key; an
  equi-join + |Δ| filter finishes. Join fan-in per bucket is bounded by
  the events that fall inside a 3·tol window — the classic symmetric
  interval-join bucketing (what stream-stream interval joins do with
  watermarks; this is the batch shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left rows + ``prefix``-renamed columns of the as-of matched right
    row (null when no right row precedes). ``right_cols`` defaults to all
    non-key, non-ts right columns; the FIRST entry is also the
    deterministic tie-breaker among equal-ts right rows (max wins), so it
    should be a unique id."""
    if right_cols is None:
        skip = set(keys) | {right_ts}
        right_cols = [c for c in right.columns if c not in skip]
    if not right_cols:
        raise ValueError(
            "asof_join: right_cols is empty — the right side has no non-key, "
            "non-ts columns to carry (and no tie-break column)"
        )
    reserved = {"_ts", "_side", "_r_row"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: left columns collide with internals: {sorted(clash)}")
    out_clash = {f"{prefix}{c}" for c in right_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"asof_join: prefixed output columns collide with left columns: "
            f"{sorted(out_clash)} — pass a different prefix"
        )
    l_tag = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn(
            "_r_row",
            F.lit(None).cast(
                "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
            ),
        )
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r_row"),
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # equal-ts right rows: order by the whole struct — its first field is
    # the caller-designated tie-break id, so max struct == max id
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_r_row")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("_r_row", ignorenulls=True).over(w).alias("_r_match"),
    )
    return carried.where(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_r_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tol_us: int = 300_000_000,
    prefix: str = "r_",
) -> DataFrame:
    """All same-key (left, right) pairs with |left_ts − right_ts| ≤ tol_us
    (microseconds). Output = left columns + prefixed right columns +
    ``delta_us`` (right − left, exact integer micros)."""
    reserved = {"_lus", "_rus", "_bucket"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"range_join: input columns collide with internals: {sorted(clash)}")
    if "delta_us" in left.columns:
        raise ValueError("range_join: left already has a 'delta_us' column")
    out_clash = {f"{prefix}{c}" for c in right.columns if c not in set(keys)} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"range_join: prefixed output columns collide with left columns: "
            f"{sorted(out_clash)} — pass a different prefix"
        )
    # cast handles TIMESTAMP_NTZ parquet columns; the engine pins the
    # session timezone to UTC (session.py), so the epoch is deterministic
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lb = left.select(
        *left.columns,
        l_us.alias("_lus"),
        F.floor(l_us / F.lit(tol_us)).alias("_bucket"),
    )
    skip = set(keys)
    r_cols = [c for c in right.columns if c not in skip]
    rb = right.select(
        *keys,
        r_us.alias("_rus"),
        F.explode(
            F.array(
                F.floor(r_us / F.lit(tol_us)) - 1,
                F.floor(r_us / F.lit(tol_us)),
                F.floor(r_us / F.lit(tol_us)) + 1,
            )
        ).alias("_bucket"),
        *[F.col(c).alias(f"{prefix}{c}") for c in r_cols],
    )
    joined = lb.join(rb, [*keys, "_bucket"]).where(
        F.abs(F.col("_rus") - F.col("_lus")) <= tol_us
    )
    # each (left, right) pair joins exactly once: the left row holds one
    # bucket value and the right row explodes to three DISTINCT buckets,
    # so no dedup pass is needed
    return joined.select(
        *left.columns,
        *[f"{prefix}{c}" for c in r_cols],
        (F.col("_rus") - F.col("_lus")).alias("delta_us"),
    )
