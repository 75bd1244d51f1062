"""Corpus-level token statistics: Zipf's-law slope per group.

A standard corpus-quality diagnostic for LLM training data: natural text
has a log-log token rank/frequency slope near -1; templated, spammy, or
machine-generated corpora drift toward flatter or steeper fits. Computed
as an exact OLS fit of ln(freq) on ln(rank) over the top-N tokens per
group.

Scale shape: the candidate-generation step is a two-stage EXACT top-k —
a per-(group, hash-bucket) row_number window first (each window sees
~vocab/buckets rows, so no single fat partition even for a 100 M-token
vocabulary), then a global per-group window over the ≤ buckets·top_n
survivors. The global top-N is a subset of the union of per-bucket
top-Ns, so the two-stage cut is lossless. The OLS reduction is a plain
map-side-combinable aggregate over ≤ top_n rows per group; the ordering
tie-break (count desc, token asc) is total, so ranks are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zipf_slope(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 50,
    buckets: int = 64,
) -> DataFrame:
    """Per-group Zipf fit: ``(group, n_top, slope6, intercept6)``.

    slope/intercept are the OLS fit of y = ln(count) against
    x = ln(rank) over the group's ``top_n`` most frequent whitespace
    tokens (rank 1 = most frequent; ties broken by token ascending).
    """
    from ..functions.text import tokens

    tok = tokens(docs.select(id_col, text_col), id_col=id_col, text_col=text_col)
    grp = docs.select(F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp"))
    counts = (
        tok.join(grp, "doc_id")
        .groupBy("grp", "token")
        .agg(F.count("*").alias("cnt"))
    )

    bucketed = counts.withColumn(
        "bkt", F.pmod(F.xxhash64("token"), F.lit(buckets))
    )
    w_local = Window.partitionBy("grp", "bkt").orderBy(
        F.desc("cnt"), F.asc("token")
    )
    survivors = (
        bucketed.withColumn("rn", F.row_number().over(w_local))
        .where(F.col("rn") <= top_n)
        .drop("rn", "bkt")
    )
    w_global = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("token"))
    top = (
        survivors.withColumn("rank", F.row_number().over(w_global))
        .where(F.col("rank") <= top_n)
    )

    xy = top.select(
        "grp",
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    fit = xy.groupBy("grp").agg(
        F.count("*").alias("n_top"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
    )
    slope = (F.col("mxy") - F.col("mx") * F.col("my")) / (
        F.col("mxx") - F.col("mx") * F.col("mx")
    )
    return fit.select(
        F.col("grp").alias(group_col),
        F.col("n_top").cast("bigint").alias("n_top"),
        F.round(slope, 6).alias("slope6"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept6"),
    )
