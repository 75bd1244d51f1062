"""bm25_topk: hand-computed scores on a 3-doc corpus."""

from __future__ import annotations

import math

import pytest

from igpm_pem_spark.functions.text import bm25_topk


def test_bm25_matches_hand_computation(spark):
    corpus = {
        1: "apple apple banana",
        2: "apple cherry",
        3: "banana banana banana apple",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    # df: apple 3, banana 2, cherry 1 -> query = [apple, banana, cherry]
    got = {r.doc_id: r.bm25_6 for r in bm25_topk(df, k=10, n_query_terms=3).collect()}

    n, k1, b = 3, 1.2, 0.75
    lens = {d: len(t.split()) for d, t in corpus.items()}
    avgdl = sum(lens.values()) / n
    dfs = {"apple": 3, "banana": 2, "cherry": 1}
    tfs = {
        1: {"apple": 2, "banana": 1},
        2: {"apple": 1, "cherry": 1},
        3: {"banana": 3, "apple": 1},
    }

    def idf(t):
        return math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)

    for d in corpus:
        s = sum(
            idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[d] / avgdl))
            for t, tf in tfs[d].items()
        )
        assert abs(got[d] - round(s, 6)) < 1e-9, d


def test_bm25_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(df)
