"""S2/S3 — edge-list scans with arrival-step stamping.

* ``load_edge_list`` mirrors the reference's whitespace CSV loader that
  stamps ``add = rownum // tm_size`` and labels every vertex ``cyan``
  (``load_edgelist.py:6-41``).
* ``load_timestamped_edge_list`` mirrors the epoch-seconds variant:
  ``add`` = days since the minimum timestamp
  (``load_edgelist_timestamp.py:20-42``; datetime-string flavor
  ``load_edgelist_dataverse.py:9-46``).

Scale note: row-number stamping needs a total order; we use a zipWithIndex-
free ``row_number`` over a monotonic file-position key
(``monotonically_increasing_id`` is partition-ordered within a single file
scan, which is exactly the reference's "file order" semantics). For
multi-file inputs at scale, arrival order should come from the data
(timestamps), not file position — which is the S3 variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


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
    )
    w = Window.orderBy("_ord")
    edges = raw.withColumn("rn", F.row_number().over(w) - 1).select(
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
