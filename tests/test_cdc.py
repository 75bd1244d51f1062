"""Content-defined chunking: partition correctness and the property the
operator exists for — chunk fingerprints are stable under an insertion
(only the edit's neighborhood re-chunks), unlike fixed-size chunking."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from igpm_pem_spark.functions.text import cdc_chunks, tokens


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id BIGINT, text STRING"
    )


def _words(rng, n):
    return [
        "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randrange(2, 8)))
        for _ in range(n)
    ]


def test_cdc_partitions_the_token_sequence(spark):
    rng = random.Random(2)
    text = " ".join(_words(rng, 300))
    d = _docs(spark, [(1, text)])
    ch = cdc_chunks(d, k=4, divisor=16).orderBy("chunk_idx").collect()
    n_tok = tokens(d).count()
    assert sum(r["n_tokens"] for r in ch) == n_tok
    assert [r["chunk_idx"] for r in ch] == list(range(len(ch)))
    # chunks tile the position space: each starts right after the prior
    ends = [r["start_pos"] + r["n_tokens"] for r in ch]
    starts = [r["start_pos"] for r in ch]
    assert starts[0] == 1
    assert starts[1:] == ends[:-1]
    # expected chunk length ~ divisor: sanity that boundaries fired
    assert len(ch) >= 5


def test_cdc_fingerprints_stable_under_insertion(spark):
    rng = random.Random(9)
    words = _words(rng, 400)
    edited = words[:5] + ["INSERTED"] + words[5:]
    d = _docs(spark, [(1, " ".join(words)), (2, " ".join(edited))])
    ch = cdc_chunks(d, k=4, divisor=16)
    fps = {
        r["doc_id"]: r["fps"]
        for r in ch.groupBy("doc_id")
        .agg(F.collect_list("chunk_fp").alias("fps"))
        .collect()
    }
    a, b = set(fps[1]), set(fps[2])
    # all but the edit-neighborhood chunks (a handful at the head) are
    # bit-identical — the Rabin property; fixed-size chunking would
    # share zero suffix chunks after a 1-token shift
    assert len(a & b) >= len(a) - 4
    assert len(a) >= 15


def test_cdc_deterministic_and_validates(spark):
    import pytest

    d = _docs(spark, [(1, "alpha beta gamma delta " * 40)])
    r1 = sorted(map(tuple, cdc_chunks(d).collect()))
    r2 = sorted(map(tuple, cdc_chunks(d).collect()))
    assert r1 == r2
    with pytest.raises(ValueError):
        cdc_chunks(d, divisor=1)
