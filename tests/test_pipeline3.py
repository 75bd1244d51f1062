"""Round-4 pipeline ring: decontamination, repetition metrics, KMV
sketch, stratified sampling, neighbor feature aggregation — pure-Python
parity + invariant tests."""

from __future__ import annotations

import math

import pytest

from .conftest import edges_df


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id BIGINT, text STRING"
    )


def _trigrams(text):
    ws = [w for w in text.lower().split(" ") if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_contamination_report_matches_python(spark):
    from igpm_pem_spark.operators.decontam import contamination_report

    train = ["the cat sat on the mat", "a b c d e", "no overlap here at all"]
    ev = ["cat sat on a bench", "x y z a b c d", "the cat sat quietly"]
    tdf = _docs(spark, train)
    edf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ev)], "doc_id BIGINT, text STRING"
    )
    got = {
        r.doc_id: (r.n_shared, r.n_eval_docs)
        for r in contamination_report(tdf, edf, n=3).collect()
    }
    want = {}
    for i, t in enumerate(train):
        tg = _trigrams(t)
        shared = set()
        hit_docs = set()
        for j, e in enumerate(ev):
            inter = tg & _trigrams(e)
            if inter:
                shared |= inter
                hit_docs.add(100 + j)
        if shared:
            want[i] = (len(shared), len(hit_docs))
    assert got == want


def test_contamination_min_shared_filters(spark):
    from igpm_pem_spark.operators.decontam import contamination_report

    tdf = _docs(spark, ["p q r s", "a b c x y"])
    edf = spark.createDataFrame(
        [(9, "p q r s"), (10, "a b c")], "doc_id BIGINT, text STRING"
    )
    rows = contamination_report(tdf, edf, n=3, min_shared=2).collect()
    assert {r.doc_id for r in rows} == {0}  # doc 0 shares 2 trigrams, doc 1 only 1


def test_repetition_stats_matches_python(spark):
    from igpm_pem_spark.functions.text import repetition_stats

    texts = [
        "a a a a a",                # maximal repetition
        "the cat sat the cat ran",  # repeated bigram 'the cat'
        "all distinct words here",
        "one",                      # <2 tokens: drops out
    ]
    got = {
        r.doc_id: (r.n_tokens, r.n_bigrams, r.top_bigram_n, r.n_distinct_bigrams)
        for r in repetition_stats(_docs(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        ws = t.split(" ")
        bigs = list(zip(ws, ws[1:]))
        if not bigs:
            assert i not in got
            continue
        from collections import Counter

        c = Counter(bigs)
        assert got[i] == (len(ws), len(bigs), max(c.values()), len(c))


def test_kmv_exact_below_k(spark):
    """Fewer distinct keys than k → the sketch degrades to an exact count."""
    from igpm_pem_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(i % 17,) for i in range(200)], "k BIGINT")
    row = kmv_distinct(df, "k", k=64).collect()[0]
    assert (row.k_used, row.est_distinct) == (17, 17)


def test_kmv_estimator_accuracy_and_partition_independence(spark):
    from igpm_pem_spark.operators.sketch import kmv_distinct

    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "k BIGINT")
    a = kmv_distinct(df.repartition(2), "k", k=256).collect()[0]
    b = kmv_distinct(df.repartition(13), "k", k=256).collect()[0]
    assert tuple(a) == tuple(b)  # deterministic across partitionings
    # textbook ~1/sqrt(k-2) relative error; allow 4 sigma
    assert abs(a.est_distinct - n) / n < 4 / math.sqrt(254)


def test_kmv_rejects_tiny_k(spark):
    from igpm_pem_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(1,)], "k BIGINT")
    with pytest.raises(ValueError):
        kmv_distinct(df, "k", k=2)


def test_stratified_sample_deterministic_and_append_stable(spark):
    from igpm_pem_spark.operators.sampling import sample_stratified

    rows = [(i, "en" if i % 3 == 0 else "es" if i % 3 == 1 else "de") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING")
    rates = {"en": 0.5, "es": 0.2}
    kept = {
        r.doc_id
        for r in sample_stratified(df, "doc_id", "lang", rates, 0.1).collect()
    }
    # same sample from any partitioning
    kept2 = {
        r.doc_id
        for r in sample_stratified(
            df.repartition(7), "doc_id", "lang", rates, 0.1
        ).collect()
    }
    assert kept == kept2
    # append-stable: a row's fate never changes when the corpus grows
    half = spark.createDataFrame(rows[:300], "doc_id BIGINT, lang STRING")
    kept_half = {
        r.doc_id
        for r in sample_stratified(half, "doc_id", "lang", rates, 0.1).collect()
    }
    assert kept_half == {i for i in kept if i < 300}
    # rates land in the right ballpark per stratum
    n_en = sum(1 for i in kept if i % 3 == 0)
    assert 0.35 < n_en / 200 < 0.65


def test_stratified_sample_rejects_bad_rates(spark):
    from igpm_pem_spark.operators.sampling import sample_stratified

    df = spark.createDataFrame([(1, "en")], "doc_id BIGINT, lang STRING")
    with pytest.raises(ValueError):
        sample_stratified(df, "doc_id", "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        sample_stratified(df, "doc_id", "lang", {}, default_rate=-0.1)


def test_neighbor_mean_matches_python(spark):
    from igpm_pem_spark.operators.features import neighbor_mean_embedding

    pairs = [(1, 2), (1, 3), (2, 3), (4, 1)]
    vecs = {1: [1.0, 0.0], 2: [0.0, 2.0], 3: [3.0, 3.0], 4: [5.0, -1.0]}
    e = edges_df(spark, pairs)
    emb = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    got = {
        r.id: (r.n_neighbors, list(r.mean_emb))
        for r in neighbor_mean_embedding(e, emb).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, ns in adj.items():
        emb_ns = [vecs[n] for n in ns if n in vecs]
        want = [sum(xs) / len(emb_ns) for xs in zip(*emb_ns)]
        assert got[v][0] == len(emb_ns)
        assert got[v][1] == pytest.approx(want, abs=1e-12)


def test_neighbor_mean_inner_semantics(spark):
    """A vertex whose only neighbor lacks an embedding row drops out."""
    from igpm_pem_spark.operators.features import neighbor_mean_embedding

    e = edges_df(spark, [(1, 99)])
    emb = spark.createDataFrame([(1, [1.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    rows = neighbor_mean_embedding(e, emb).collect()
    # 99 has neighbor 1 (embedded) → kept; 1's only neighbor 99 has no row → dropped
    assert {r.id for r in rows} == {99}


def test_winnow_guarantee_and_density(spark):
    """Winnowing guarantee: two docs sharing a run of w+k-1 = 7 tokens
    share at least one selected fingerprint; unrelated docs don't."""
    from igpm_pem_spark.functions.text import winnow_fingerprints, winnow_pairs

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    rows = [
        (1, f"intro words here {shared} closing remarks one"),
        (2, f"totally different opening {shared} and another tail"),
        (3, "nothing in common with the others at all whatsoever today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    fp = winnow_fingerprints(docs, k=4, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    pairs = {(r.doc_a, r.doc_b) for r in winnow_pairs(docs, min_shared=1).collect()}
    assert (1, 2) in pairs and len(pairs) == 1
    # density: selected fingerprints per doc ≤ number of full windows
    for d, fps in by_doc.items():
        assert 1 <= len(fps) <= 12
