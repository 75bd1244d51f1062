"""S2/S3 — edge-list scans with arrival-step stamping.

* ``load_edge_list`` mirrors the reference's whitespace CSV loader that
  stamps ``add = rownum // tm_size`` and labels every vertex ``cyan``
  (``load_edgelist.py:6-41``).
* ``load_timestamped_edge_list`` mirrors the epoch-seconds variant:
  ``add`` = days since the minimum timestamp
  (``load_edgelist_timestamp.py:20-42``; datetime-string flavor
  ``load_edgelist_dataverse.py:9-46``).

Scale note: row-number stamping needs a total order, but NOT a global
sort: ``monotonically_increasing_id`` embeds (partition_index << 33) +
local row index, so a tiny per-partition count job yields cumulative
offsets and the global row number is pure arithmetic per row — zero
shuffles, no single-partition window. For multi-file inputs at scale,
arrival order should come from the data (timestamps), not file position —
which is the S3 variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_edge_list(
    spark: SparkSession, path: str, tm_size: int = 1000, sep: str = " "
) -> tuple[DataFrame, DataFrame]:
    """→ (vertices(id,label,props), edges(src,dst,label,ts));
    ts = rownum // tm_size in file order, labels 'cyan'/'yes'."""
    raw = (
        spark.read.option("sep", sep)
        .option("comment", "#")
        .schema("src BIGINT, dst BIGINT")
        .csv(path)
        .withColumn("_ord", F.monotonically_increasing_id())
        # pin the scan BEFORE the count job: the offset map below is only
        # valid against the exact file splits it was computed from, and an
        # uncached re-scan is not contractually obliged to reproduce them
        .localCheckpoint(eager=True)
    )
    # global row number via partition-local arithmetic: mid = (pid << 33) +
    # local_index with local indexes contiguous from 0, so one small count
    # job (one row per partition) gives each partition's offset and
    # rn = offset[pid] + (mid & (2^33 - 1)). The pid is decoded from the
    # mid itself, so the two jobs cannot disagree about partitioning.
    pid = F.shiftright(F.col("_ord"), 33)
    local = F.col("_ord") - F.shiftleft(pid, 33)
    counts = sorted(
        (r["pid"], r["c"])
        for r in raw.groupBy(pid.alias("pid")).agg(F.count("*").alias("c")).collect()
    )
    offsets, run = {}, 0
    for p, c in counts:
        offsets[p] = run
        run += c
    pairs = [
        x
        for p, off in offsets.items()
        for x in (F.lit(p).cast("bigint"), F.lit(off).cast("bigint"))
    ]
    off_map = (
        F.create_map(*pairs) if pairs else F.create_map().cast("map<bigint,bigint>")
    )
    # a pid absent from the offset map means the scan diverged from the
    # count job's view of it — fail loudly instead of emitting null ts
    rn_raw = F.element_at(off_map, pid.cast("bigint"))
    edges = raw.withColumn(
        "rn",
        F.when(
            rn_raw.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("edge-list partition "),
                    pid.cast("string"),
                    F.lit(" missing from the row-offset map"),
                )
            ).cast("bigint"),
        ).otherwise(rn_raw + local),
    ).select(
        "src",
        "dst",
        F.lit("yes").alias("label"),
        (F.col("rn") / F.lit(tm_size)).cast("int").alias("ts"),
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            "id",
            F.lit("cyan").alias("label"),
            F.create_map().cast("map<string,string>").alias("props"),
        )
    )
    return vertices, edges


def load_datetime_edge_list(
    spark: SparkSession,
    path: str,
    fmt: str = "yyyy-MM-dd HH:mm:ss",
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Datetime-string CSV flavor (ts_str, src, dst) → ts = days since the
    minimum timestamp — the reference's dataverse loader
    (``load_edgelist_dataverse.py:9-46``: strptime → epoch days, rebased
    to the min day). Quote characters (single or double) around fields are
    stripped, mirroring its ``quotechar="'"`` + ``replace('\"')``."""
    raw = (
        spark.read.option("sep", sep)
        .option("comment", "#")
        .schema("ts_raw STRING, src_raw STRING, dst_raw STRING")
        .csv(path)
    )
    unq = lambda c: F.regexp_replace(F.trim(F.col(c)), "[\"']", "")  # noqa: E731
    # naive calendar-day arithmetic (datediff on the parsed date), exactly
    # the reference's strptime→(t-epoch)//86400 — NOT unix_timestamp, whose
    # local-tz instant conversion can shift rows across midnight
    days = raw.select(
        unq("src_raw").cast("bigint").alias("src"),
        unq("dst_raw").cast("bigint").alias("dst"),
        F.datediff(
            F.to_date(F.to_timestamp(unq("ts_raw"), fmt)), F.lit("1970-01-01")
        ).cast("bigint").alias("day"),
    )
    min_day = days.agg(F.min("day").alias("m"))
    edges = days.crossJoin(F.broadcast(min_day)).select(
        "src",
        "dst",
        F.lit("yes").alias("label"),
        (F.col("day") - F.col("m")).cast("int").alias("ts"),
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            "id",
            F.lit("cyan").alias("label"),
            F.create_map().cast("map<string,string>").alias("props"),
        )
    )
    return vertices, edges


def load_timestamped_edge_list(
    spark: SparkSession, path: str, sep: str = " "
) -> tuple[DataFrame, DataFrame]:
    """(src, dst, epoch_sec) rows → ts = epoch day rebased to min day
    (min computed distributed; no driver-side pass)."""
    raw = (
        spark.read.option("sep", sep)
        .option("comment", "#")
        .schema("src BIGINT, dst BIGINT, epoch BIGINT")
        .csv(path)
    )
    days = raw.withColumn("day", F.floor(F.col("epoch") / F.lit(86400)))
    min_day = days.agg(F.min("day").alias("m"))
    edges = (
        days.crossJoin(F.broadcast(min_day))
        .select(
            "src",
            "dst",
            F.lit("yes").alias("label"),
            (F.col("day") - F.col("m")).cast("int").alias("ts"),
        )
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            "id",
            F.lit("cyan").alias("label"),
            F.create_map().cast("map<string,string>").alias("props"),
        )
    )
    return vertices, edges
