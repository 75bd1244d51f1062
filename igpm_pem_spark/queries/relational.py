"""Relational operator coverage (SURVEY.md §2.2 filters/projections, §2.3
joins, §2.4 aggregations, §2.5 windows, §2.6 set ops, §2.7 scalar
functions) expressed through the DataFrame API, each with a plain-SQL
DuckDB oracle. These are the reference's query-surface operators (P1-P6,
J1/J3, A1-A3/A7/A9, W1-W3, SO1-3, F1/F3) exercised on the TPC-H-ish
driver tables."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._common import register


def _q_filter_project(spark, sf_dir):
    """P1/P4/P5 + F1: predicate + projection + computed column — Catalyst
    pushes the filter and prunes columns at the parquet scan."""
    register(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("net_price"),
        )
    )


def _q_group_agg(spark, sf_dir):
    """A1/A2: the five reference aggregates (COUNT/MIN/MAX/SUM/AVG,
    gray/aggregator.py:30-52) under a GROUP BY."""
    register(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


def _q_join_dims(spark, sf_dir):
    """J1-style star join: fact ⋈ broadcast dims with pre-join filters
    (O5: selectivity filter before expansion)."""
    register(spark, sf_dir)
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    return (
        o.where(F.col("o_orderstatus") == "F")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


def _q_semi_anti(spark, sf_dir):
    """J3/SO2/SO3: existence joins — per segment, customers with at least
    one 'F' order (left_semi) and with none (left_anti; the reference's
    set difference, rwr.py:88)."""
    register(spark, sf_dir)
    c = spark.table("customer")
    o = spark.table("orders").where(F.col("o_orderstatus") == "F")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without"))
    )
    return (
        semi.join(anti, "c_mktsegment", "full_outer")
        .na.fill(0, ["n_with", "n_without"])
        .select("c_mktsegment", "n_with", "n_without")
    )


def _q_window_topk(spark, sf_dir):
    """W1/A9: per-customer top order by totalprice — window argmax with
    deterministic tie-break (the reference's rank list, rwr.py:169-172)."""
    register(spark, sf_dir)
    o = spark.table("orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


def _q_argmax_ties(spark, sf_dir):
    """A9 exactly: keep ALL candidates within ε of the group max — the
    reference's 1e-5 tie tolerance (gray_multiple.py:436-441), which rank
    cannot express but max-over-window + filter can."""
    register(spark, sf_dir)
    li = spark.table("lineitem")
    w = Window.partitionBy("l_orderkey")
    return (
        li.withColumn("mx", F.max("l_extendedprice").over(w))
        .where(F.col("l_extendedprice") >= F.col("mx") - 1e-5)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def _q_setops(spark, sf_dir):
    """SO1-3: union / intersect / except over derived key sets."""
    register(spark, sf_dir)
    li = spark.table("lineitem")
    hi = li.where(F.col("l_quantity") >= 45).select("l_partkey").distinct()
    lo = li.where(F.col("l_quantity") <= 5).select("l_partkey").distinct()
    u = hi.union(lo).distinct().select(F.lit("union").alias("op"), "l_partkey")
    i = hi.intersect(lo).select(F.lit("intersect").alias("op"), "l_partkey")
    d = hi.exceptAll(lo).distinct().select(F.lit("except").alias("op"), "l_partkey")
    return u.unionByName(i).unionByName(d)


def _q_median(spark, sf_dir):
    """A7: exact interpolated median per group (the reference's
    statistics.median, gray_incremental.py:92-96)."""
    register(spark, sf_dir)
    o = spark.table("orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.count("*").alias("n_orders"),
    )


def _q_temporal_bucket(spark, sf_dir):
    """F3/S3 semantics: event-time day bucketing (epoch → day, rebased) —
    the reference's timestamp loader (load_edgelist_timestamp.py:20-42)."""
    register(spark, sf_dir)
    e = spark.table("events")
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def _q_sessionize(spark, sf_dir):
    """Per-user sessionization with a 30-minute inactivity gap — Spark's
    built-in ``session_window`` (the streaming-native stateful op, usable
    identically on a stream with a watermark). Oracle: the classic
    lag/gap-flag/cumulative-sum rewrite."""
    register(spark, sf_dir)
    e = spark.table("events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def _q_condition_expr(spark, sf_dir):
    """P6: the reference's boolean/arithmetic condition grammar compiled
    to a Catalyst expression (ConditionParser.py:20-54) — evaluated here
    over event rows: "value * 2 - 6 > 300 AND NOT event_type == 'error'"."""
    register(spark, sf_dir)
    from ..plans.condition import compile_condition

    e = spark.table("events")
    cond = compile_condition("value * 2 - 6 > 300 AND NOT event_type == 'error'")
    return e.where(cond).select("event_id", "user_id", "event_type", "value")


QUERIES = {
    "rel_filter_project": (
        _q_filter_project,
        """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS net_price
        FROM lineitem
        WHERE l_shipdate >= '1997-01-01' AND l_discount > 0.05
        """,
    ),
    "rel_group_agg": (
        _q_group_agg,
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
               round(sum(l_extendedprice), 4) AS sum_price,
               round(avg(l_discount), 6) AS avg_disc
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
    ),
    "rel_join_dims": (
        _q_join_dims,
        """
        SELECT n_name, c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
        GROUP BY n_name, c_mktsegment
        """,
    ),
    "rel_semi_anti": (
        _q_semi_anti,
        """
        SELECT c_mktsegment,
               CAST(sum(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
               CAST(sum(CASE WHEN ex THEN 0 ELSE 1 END) AS BIGINT) AS n_without
        FROM (
          SELECT c_mktsegment,
                 EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS ex
          FROM customer
        ) GROUP BY c_mktsegment
        """,
    ),
    "rel_window_topk": (
        _q_window_topk,
        """
        SELECT o_custkey, o_orderkey, rn FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders
        ) WHERE rn <= 2
        """,
    ),
    "rel_argmax_ties": (
        _q_argmax_ties,
        """
        SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
          SELECT l_orderkey, l_linenumber, l_extendedprice,
                 max(l_extendedprice) OVER (PARTITION BY l_orderkey) AS mx
          FROM lineitem
        ) WHERE l_extendedprice >= mx - 0.00001
        """,
    ),
    "rel_setops": (
        _q_setops,
        """
        WITH hi AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 45),
             lo AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity <= 5)
        SELECT 'union' AS op, l_partkey FROM (SELECT * FROM hi UNION SELECT * FROM lo)
        UNION ALL
        SELECT 'intersect', l_partkey FROM (SELECT * FROM hi INTERSECT SELECT * FROM lo)
        UNION ALL
        SELECT 'except', l_partkey FROM (SELECT * FROM hi EXCEPT SELECT * FROM lo)
        """,
    ),
    "rel_median": (
        _q_median,
        """
        SELECT o_orderpriority,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
                 AS median_price,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
        """,
    ),
    "rel_temporal_bucket": (
        _q_temporal_bucket,
        """
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY strftime(ts, '%Y-%m-%d')
        """,
    ),
    "rel_sessionize": (
        _q_sessionize,
        """
        WITH marked AS (
          SELECT user_id, ts, value,
                 -- new session when the gap reaches 30 min (session_window's
                 -- end is exclusive: next >= prev + gap starts a new one)
                 CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
          SELECT user_id, ts, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        -- floor, not cast: Spark's unix_timestamp truncates sub-second parts
        SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
               count(*) AS n_events, round(sum(value), 4) AS total_value
        FROM sess GROUP BY user_id, sid
        """,
    ),
    "rel_condition_expr": (
        _q_condition_expr,
        """
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE value * 2 - 6 > 300 AND NOT event_type = 'error'
        """,
    ),
}


def _q_asof_purchase(spark, sf_dir):
    """As-of join (temporal operator Spark lacks natively): each click
    event matched to the same user's LATEST purchase at or before it —
    one per-key window shuffle, no inequality nested-loop
    (operators/timejoin.py::asof_join)."""
    from ..operators.timejoin import asof_join

    register(spark, sf_dir)
    ev = spark.table("events")
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    purch = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purch, keys=["user_id"], right_cols=["event_id", "value"],
        prefix="p_",
    )
    # sentinel-fill unmatched clicks: null-bearing float columns make
    # value-hash comparison fragile (NaN != NaN), and -1 is unambiguous here
    return out.select(
        "event_id", "user_id",
        F.coalesce("p_event_id", F.lit(-1)).alias("p_event_id"),
        F.coalesce(F.round("p_value", 4), F.lit(-1.0)).alias("p_value4"),
    )


def _q_range_pairs(spark, sf_dir):
    """Range join: same-user (click, error) event pairs within ±5 min —
    bucketed interval join (explode right into bucket±1, equi-join,
    |Δ| filter), never a cross/theta join
    (operators/timejoin.py::range_join)."""
    from ..operators.timejoin import range_join

    register(spark, sf_dir)
    ev = spark.table("events")
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    errors = ev.where("event_type = 'error'").select("event_id", "user_id", "ts")
    out = range_join(
        clicks, errors, keys=["user_id"], tol_us=300_000_000, prefix="e_"
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("e_event_id").alias("error_id"),
        "delta_us",
    )


QUERIES["rel_asof_purchase"] = (
    _q_asof_purchase,
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
    purch AS (SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'purchase'),
    ranked AS (
      SELECT c.event_id, c.user_id,
             coalesce(p.event_id, -1) AS p_event_id,
             coalesce(round(p.value, 4), -1.0) AS p_value4,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY p.ts DESC, p.event_id DESC) AS rn
      FROM clicks c LEFT JOIN purch p
        ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT event_id, user_id, p_event_id, p_value4
    FROM ranked WHERE rn = 1
    """,
)

QUERIES["rel_range_pairs"] = (
    _q_range_pairs,
    """
    SELECT c.event_id AS click_id, c.user_id, e.event_id AS error_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS delta_us
    FROM events c JOIN events e
      ON e.user_id = c.user_id
     AND c.event_type = 'click' AND e.event_type = 'error'
     AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 300000000
    """,
)


def _q_rollup(spark, sf_dir):
    """Hierarchical subtotals via ROLLUP (A1/A2 over grouping sets) —
    one pass computes (status, priority), per-status, and grand totals;
    null grouping keys are coalesced to 'ALL' so the value-hash compare
    never sees engine-specific null ordering."""
    register(spark, sf_dir)
    o = spark.table("orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


QUERIES["rel_rollup"] = (
    _q_rollup,
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)


def _q_pivot(spark, sf_dir):
    """PIVOT: order counts and revenue by priority, statuses spread to
    columns — Spark's groupBy().pivot() with the value list PINNED (an
    unpinned pivot runs an extra distinct-scan job and its column order
    depends on data; never do that at scale)."""
    register(spark, sf_dir)
    o = spark.table("orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


QUERIES["rel_pivot"] = (
    _q_pivot,
    """
    SELECT o_orderpriority AS priority,
           count(*) FILTER (o_orderstatus = 'F') AS n_f,
           count(*) FILTER (o_orderstatus = 'O') AS n_o,
           count(*) FILTER (o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)


def _q_cube(spark, sf_dir):
    """CUBE: all four grouping combinations of (status, priority) in one
    pass — the full-lattice sibling of rel_rollup; same coalesce-to-'ALL'
    discipline so the hash compare never sees null grouping keys."""
    register(spark, sf_dir)
    o = spark.table("orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


QUERIES["rel_cube"] = (
    _q_cube,
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)


# explicit GROUPING SETS: the two one-dimension marginals plus the grand
# total, WITHOUT the (status, priority) cross — the set rollup/cube can't
# express. The SQL text is identical ANSI in Spark and DuckDB, so the
# Spark side runs the same string the oracle does.
_GROUPING_SETS_SQL = """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def _q_grouping_sets(spark, sf_dir):
    register(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


QUERIES["rel_grouping_sets"] = (_q_grouping_sets, _GROUPING_SETS_SQL)
