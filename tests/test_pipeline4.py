"""Unit tests for the round-4 second-wave ops: token chunking, C4-style
quality gate (boundary cases the sf tables don't exercise: empty docs,
exact threshold hits, tail chunks)."""

from __future__ import annotations

import pytest

from igpm_pem_spark.functions.text import c4_quality_flags, chunk_tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_chunk_tokens_windows_and_tail(spark):
    # 10 tokens, chunk 4, stride 3 -> starts 0,3,6,9; last chunk length 1
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_tokens(
        _docs(spark, [(1, text)]), chunk_size=4, stride=3
    ).orderBy("chunk_id").collect()
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    assert [r.n_tokens for r in out] == [4, 4, 4, 1]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[3].chunk_text == "t9"
    # every token appears in >= 1 chunk
    covered = set()
    for r in out:
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_tokens_empty_and_whitespace(spark):
    out = chunk_tokens(
        _docs(spark, [(1, ""), (2, "   "), (3, "one")]), chunk_size=4, stride=3
    ).collect()
    assert len(out) == 1 and out[0].doc_id == 3 and out[0].chunk_text == "one"


def test_chunk_tokens_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_tokens(_docs(spark, [(1, "a")]), chunk_size=0)
    with pytest.raises(ValueError):
        chunk_tokens(_docs(spark, [(1, "a")]), stride=-1)


def test_c4_flags_keep_logic(spark):
    good = " ".join(f"word{i:02d}" for i in range(40))  # 40 distinct 6-char words
    short = "tiny doc"
    repetitive = " ".join(["dup"] * 35)  # max_freq*5 > n, distinct floor fails
    rows = [(1, good), (2, short), (3, repetitive), (4, "")]
    out = {r.doc_id: r for r in c4_quality_flags(_docs(spark, rows)).collect()}
    assert out[1].keep and out[1].n_words == 40 and out[1].n_distinct == 40
    assert not out[2].keep  # below the 30-word floor
    assert not out[3].keep and out[3].max_word_freq == 35
    assert not out[4].keep and out[4].n_words == 0 and out[4].max_word_freq == 0


def test_c4_flags_terminal_punct(spark):
    rows = [(1, "ends with a period."), (2, "no terminal mark here")]
    out = {r.doc_id: r for r in c4_quality_flags(_docs(spark, rows)).collect()}
    assert out[1].ends_terminal and not out[2].ends_terminal


def test_span_duplicates_cross_doc(spark):
    from igpm_pem_spark.functions.text import span_duplicates

    shared = " ".join(f"s{i}" for i in range(16))
    rows = [
        (1, shared + " tailA"),             # span at offset 0
        (2, shared + " tailB"),             # same span, different doc
        (3, " ".join(f"u{i}" for i in range(20))),  # unique doc
        (4, shared + " " + shared),         # same span twice in ONE doc
    ]
    out = span_duplicates(
        _docs(spark, rows), span=16, min_docs=2
    ).collect()
    # exactly one 16-token span is shared across >= 2 docs
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 3          # docs 1, 2, 4
    assert r.n_spans == 4         # doc 4 contributes two occurrences
    assert r.min_doc_id == 1
    # doc 3's tokens never collide; spans are full-width only (tails drop)


def test_span_duplicates_rejects_min_docs_1(spark):
    from igpm_pem_spark.functions.text import span_duplicates

    with pytest.raises(ValueError):
        span_duplicates(_docs(spark, [(1, "a b")]), min_docs=1)
