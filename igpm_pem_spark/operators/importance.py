"""DSIR-style hashed-n-gram importance weighting for data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public method; implementation original): score every raw document by how
much its hashed-unigram profile looks like a *target* distribution
(e.g. a trusted high-quality subset) relative to the raw pool, then
resample the raw pool by that weight. This engine's deterministic,
oracle-checkable variant:

1. bucket(token) = portable_token_id(token) % ``n_buckets`` — the same
   md5-prefix arithmetic hash the dedup/fingerprint family uses, so an
   independent SQL engine reproduces every bucket id exactly;
2. per-bucket counts over the target subset and over the full pool —
   two bounded aggregates (``n_buckets`` rows each, broadcastable);
3. per-doc score = (Σ_tokens target_count(bucket) + 1)
                 / (Σ_tokens raw_count(bucket) + 1)
   — sums of exact integers with ONE final division, so the float is
   bit-identical across engines (a product-of-ratios form would
   accumulate rounding engine-differently; the ratio-of-sums keeps the
   same ordering signal: docs whose buckets are relatively heavier in
   the target pool score higher).

Scale shape: tokenize → inline bucket id (no vocab, no join) →
repartition-free aggregate to ``n_buckets`` rows → broadcast-join the
tiny bucket table back onto the token stream → one per-doc sum. The
corpus is scanned twice (count, score) and never shuffled by anything
wider than doc_id; the bucket tables are O(n_buckets) regardless of
corpus size — exactly the DSIR paper's hashed-feature trick, which is
what makes it run at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import token_id, tokens


def dsir_weights(
    docs: DataFrame,
    target_filter: Column,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    ratio_digits: int = 6,
) -> DataFrame:
    """(doc_id, t_hits, r_hits, n_tokens, ratio{d}) for every document.

    ``target_filter``: boolean Column selecting the target subset (e.g.
    ``F.col("lang") == "en"``). t_hits / r_hits are the exact integer
    bucket-count sums; ratio = (t_hits+1)/(r_hits+1) rounded to
    ``ratio_digits`` is the importance weight a resampling step keeps
    the top quantile of."""
    toks = tokens(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", (token_id("token") % F.lit(n_buckets)).alias("bucket")
    )
    target_ids = docs.where(target_filter).select(F.col(id_col).alias("doc_id"))
    raw_counts = toks.groupBy("bucket").agg(F.count("*").alias("rc"))
    target_counts = (
        toks.join(F.broadcast(target_ids), "doc_id")
        .groupBy("bucket")
        .agg(F.count("*").alias("tc"))
    )
    buckets = raw_counts.join(target_counts, "bucket", "left").na.fill(
        0, ["tc"]
    )
    scored = (
        toks.join(F.broadcast(buckets), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tc").alias("t_hits"),
            F.sum("rc").alias("r_hits"),
            F.count("*").alias("n_tokens"),
        )
    )
    return scored.select(
        "doc_id",
        "t_hits",
        "r_hits",
        "n_tokens",
        F.round(
            (F.col("t_hits") + 1).cast("double")
            / (F.col("r_hits") + 1).cast("double"),
            ratio_digits,
        ).alias(f"ratio{ratio_digits}"),
    )
