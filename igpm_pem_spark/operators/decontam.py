"""Benchmark decontamination — the train/eval n-gram overlap scan every
LLM training-data pipeline runs before a corpus ships (an eval question
leaking into the training set invalidates the benchmark).

Semantics: a training document is *contaminated* if it shares at least
``min_shared`` distinct word n-grams with the evaluation set; the report
carries how many distinct n-grams leak and how many distinct eval
documents they touch, so downstream policy (drop vs flag) has the
evidence.

Scale shape: the eval/benchmark side is tiny (thousands of documents)
against a 100 TB training corpus, so the eval n-gram relation is
broadcast — the training side streams map-side through the overlap join
with no shuffle of the corpus; the only shuffle is the per-train-doc
groupBy of the (rare) surviving overlap rows. The n-gram construction is
the same lead()-window expression as the dedup ring
(operators/dedup.word_ngrams), so the DuckDB oracle mirrors every value.

Generalizes the reference's subtract-into-affected-subgraph idea
(reference: patternmatching/gray/incremental/query_call.py — restrict
expensive work to the affected region): here the affected region is the
n-gram intersection, never the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import word_ngrams


def contamination_report(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, n_shared, n_eval_docs) for every contaminated training
    document: distinct leaked n-grams and distinct eval documents hit.

    ``broadcast_eval`` (default) pins the eval n-gram relation as the
    broadcast build side — correct whenever the benchmark set is
    man-sized (the normal case); pass False if the 'eval' side is itself
    a corpus and let AQE pick the join strategy."""
    tg = word_ngrams(train_docs, n, id_col, text_col)
    eg = word_ngrams(eval_docs, n, id_col, text_col).select(
        F.col("doc_id").alias("eval_doc"), "ngram"
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    hits = tg.join(eg, "ngram")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("ngram").alias("n_shared"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
        .where(F.col("n_shared") >= min_shared)
    )
