"""Sequence packing (next-fit-decreasing into token bins)."""

from __future__ import annotations

import pytest

from igpm_pem_spark.operators.packing import pack_sequences

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING"
    )


def _pack_ref(items, capacity):
    """Pure-python next-fit-decreasing over (doc_id, n_tok) pairs."""
    out = {}
    bin_id, fill = 0, 0
    for i, (doc_id, tok) in enumerate(
        sorted(items, key=lambda x: (-x[1], x[0]))
    ):
        t = min(tok, capacity)
        if i == 0:
            bin_id, fill = 0, t
        elif fill + t <= capacity:
            fill += t
        else:
            bin_id, fill = bin_id + 1, t
        out[doc_id] = (t, bin_id, fill)
    return out


def test_handcrafted_next_fit(spark):
    # tokens: a=4, b=3, c=3, d=2, e=1 — capacity 6
    # NFD order: a(4) b(3) c(3) d(2) e(1)
    # bin0: a(4)+?b would make 7 -> bin1: b(3)+c(3)=6 -> d opens bin2: d(2)+e(1)=3
    rows = [
        (1, "w w w w", "en"),
        (2, "x x x", "en"),
        (3, "y y y", "en"),
        (4, "z z", "en"),
        (5, "q", "en"),
    ]
    got = {
        r["doc_id"]: (r["n_tok"], r["bin"], r["fill"])
        for r in pack_sequences(_docs(spark, rows), capacity=6).collect()
    }
    assert got == {1: (4, 0, 4), 2: (3, 1, 3), 3: (3, 1, 6), 4: (2, 2, 2), 5: (1, 2, 3)}


def test_truncation_and_empty(spark):
    rows = [
        (1, "t " * 10, "en"),   # 10 tokens > capacity 4 -> capped to 4, own bin
        (2, "", "en"),           # 0 tokens
        (3, "a b", "en"),
    ]
    got = {
        r["doc_id"]: (r["n_tok"], r["bin"])
        for r in pack_sequences(_docs(spark, rows), capacity=4).collect()
    }
    assert got[1] == (4, 0)
    assert got[3] == (2, 1)
    assert got[2][0] == 0  # empty doc packs for free into the current bin
    assert got[2][1] == 1


def test_groups_pack_independently(spark):
    rows = [(i, "w w w", "en" if i % 2 else "de") for i in range(1, 9)]
    df = pack_sequences(_docs(spark, rows), capacity=6)
    rows_out = df.collect()
    # each lang has 4 docs of 3 tokens -> 2 per bin, bins 0 and 1 per lang
    for lang in ("en", "de"):
        bins = sorted(r["bin"] for r in rows_out if r["lang"] == lang)
        assert bins == [0, 0, 1, 1]


def test_invariants_and_reference_parity_real_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, capacity=512).collect()
    toks = {
        (r["lang"], r["doc_id"]): r["n_tok"] for r in out
    }
    # reference parity per lang
    by_lang: dict[str, list] = {}
    for (lang, doc_id), tok in toks.items():
        by_lang.setdefault(lang, []).append((doc_id, tok))
    ref = {}
    for lang, items in by_lang.items():
        for doc_id, (t, b, f) in _pack_ref(items, 512).items():
            ref[(lang, doc_id)] = (t, b, f)
    got = {(r["lang"], r["doc_id"]): (r["n_tok"], r["bin"], r["fill"]) for r in out}
    assert got == ref
    # fill never exceeds capacity; bin loads = max fill per bin
    assert all(f <= 512 for (_, _, f) in got.values())


def test_sharded_covers_all_docs_once(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, capacity=512, shards=4)
    assert "shard" in out.columns
    rows = out.collect()
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    assert all(0 <= r["shard"] < 4 for r in rows)
    assert all(r["fill"] <= 512 for r in rows)


def test_validation():
    with pytest.raises(ValueError):
        pack_sequences(None, capacity=0)
    with pytest.raises(ValueError):
        pack_sequences(None, shards=0)
