"""Sequence packing: assign documents to fixed-capacity token bins.

The pretraining-data operation the reference's pipeline stops short of:
once a corpus is filtered, deduped and split, the documents must be
packed into fixed-length context windows (the "sequence packing" step of
an LLM data pipeline).  The packing rule here is next-fit over a
size-decreasing order (NFD): documents are sorted by token count
descending, walked once, and a new bin is opened whenever the current
document no longer fits — a one-pass rule with a 2x worst-case bound
that, unlike first-fit, needs no per-bin search state and therefore
streams.

Scale design
------------
Packing is inherently sequential *within a stream*, so the parallel unit
must be the stream, not the corpus: the operator groups by
``group_cols`` plus an optional hash ``shard`` (portable md5 bucket of
the doc id, the same construction as ``sampling.split_by_hash``), and
packs each group independently inside ``applyInPandas``.  At 100 TB the
shard count bounds every group to a constant number of documents per
task — the shuffle is one hash exchange on (group, shard), the Python
loop per group is O(docs-in-group), and bins are numbered per (group,
shard) so no cross-shard coordination exists.  This mirrors how real
pretraining pipelines pack per output shard rather than globally.

Token counting is a row-local JVM expression (lowercase, split on
space, drop empties — the same tokenizer as ``functions.text.tokens``);
a document longer than the capacity is truncated to exactly one full
bin (``least(n_tok, capacity)``), the standard context-window truncation
semantics.

Reference parity: the reference has no packing operator; this extends
its pipeline ring per the build brief (training-data operations as
first-class components).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pack_group(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Next-fit-decreasing walk over one (group, shard) stream.

    Plain Python loop over the sorted group — bounded by the shard size,
    executor-side, Arrow-batched in and out. The recurrence (bin, fill)
    is sequential by definition; everything around it is vectorized."""
    pdf = pdf.sort_values(["n_tok", "doc_id"], ascending=[False, True], kind="mergesort")
    bins, fills = [], []
    bin_id, fill = 0, 0
    first = True
    for tok in pdf["n_tok"].to_numpy():
        t = int(tok)
        if first:
            bin_id, fill, first = 0, t, False
        elif fill + t <= capacity:
            fill += t
        else:
            bin_id += 1
            fill = t
        bins.append(bin_id)
        fills.append(fill)
    out = pdf.copy()
    out["bin"] = pd.Series(bins, index=pdf.index, dtype="int64")
    out["fill"] = pd.Series(fills, index=pdf.index, dtype="int64")
    return out


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    group_cols: tuple[str, ...] = ("lang",),
    shards: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group_cols..., doc_id, n_tok, bin, fill): next-fit-decreasing
    packing of each group's documents into ``capacity``-token bins.

    ``n_tok`` is the capped token count actually packed, ``bin`` the
    0-based bin index within the (group, shard) stream, ``fill`` the
    bin's running token total immediately after this document was
    placed (so ``max(fill) per bin`` = the bin's final load, always
    <= capacity).

    ``shards > 1`` splits every group into that many hash shards
    (portable md5 bucket of the id) packed independently — the knob that
    bounds per-task work at corpus scale; bins are then per (group,
    shard) and the shard column is kept in the output.
    """
    if capacity <= 0:
        raise ValueError(f"pack_sequences: capacity must be positive, got {capacity}")
    if shards < 1:
        raise ValueError(f"pack_sequences: shards must be >= 1, got {shards}")
    gcols = list(group_cols)
    n_tok = F.least(
        F.size(F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit(""))),
        F.lit(capacity),
    ).cast("bigint")
    base = docs.select(
        *gcols, F.col(id_col).cast("bigint").alias("doc_id"), n_tok.alias("n_tok")
    )
    keys = gcols
    if shards > 1:
        shard = (
            F.conv(F.substring(F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("bigint") % shards
        ).cast("int")
        base = base.withColumn("shard", shard)
        keys = gcols + ["shard"]
    gtypes = {f.name: f.dataType.simpleString() for f in base.schema.fields}
    schema = ", ".join(
        [f"{c} {gtypes[c]}" for c in gcols]
        + (["shard int"] if shards > 1 else [])
        + ["doc_id bigint", "n_tok bigint", "bin bigint", "fill bigint"]
    )
    cap = capacity
    return base.groupBy(*keys).applyInPandas(
        lambda pdf: _pack_group(pdf, cap), schema=schema
    )
