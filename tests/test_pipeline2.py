"""Unit tests for the second pipeline ring: TF-IDF top terms, redaction,
end-to-end dedup clustering, k-means assignment."""

from __future__ import annotations

import hashlib
import math

import pytest

from igpm_pem_spark.functions.text import redact, tfidf_top_terms
from igpm_pem_spark.operators.clustering import kmeans_assign
from igpm_pem_spark.operators.dedup import dedup_clusters


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )


def test_tfidf_top_terms_exact(spark):
    texts = [
        "apple apple banana",   # apple tf=2
        "banana cherry",
        "cherry cherry cherry dates",
    ]
    out = tfidf_top_terms(_docs(spark, texts), k=2).collect()
    n = 3.0
    # doc 0: apple tf=2 df=1, banana tf=1 df=2
    want0 = {
        "apple": round(2 * math.log(n / 1), 6),
        "banana": round(1 * math.log(n / 2), 6),
    }
    got0 = {r.token: r.tfidf6 for r in out if r.doc_id == 0}
    assert got0 == pytest.approx(want0)
    # ranks are 1-based, score-desc then token asc
    rnk0 = {r.token: r.rnk for r in out if r.doc_id == 0}
    assert rnk0 == {"apple": 1, "banana": 2}
    # k=2 cap holds everywhere
    assert all(r.rnk <= 2 for r in out)


def test_redact_counts_and_hash(spark):
    rows = [
        (1, "mail me at a.b@test.org or see https://x.io/page 42 times"),
        (2, "no pii here"),
        (3, "123 456"),
    ]
    df = spark.createDataFrame(rows, "event_id BIGINT, props STRING")
    out = {r.id: r for r in redact(df, "event_id", "props").collect()}
    assert (out[1].n_email, out[1].n_url, out[1].n_num) == (1, 1, 1)
    assert (out[2].n_email, out[2].n_url, out[2].n_num) == (0, 0, 0)
    assert (out[3].n_email, out[3].n_url, out[3].n_num) == (0, 0, 2)
    scrub1 = "mail me at <EMAIL> or see <URL> <NUM> times"
    assert out[1].scrub_md5 == hashlib.md5(scrub1.encode()).hexdigest()
    assert out[2].scrub_md5 == hashlib.md5(b"no pii here").hexdigest()


def test_dedup_clusters_collapse_and_transitivity(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    texts = [
        base,                      # 0
        base + "tail one",         # 1 ≈ 0
        base + "tail one two",     # 2 ≈ 1 (and ≈ 0 transitively)
        "completely different words entirely here nothing shared at all "
        "zebra yak xylophone wombat vulture unicorn " * 5,  # 3
    ]
    out = {r.doc_id: r for r in
           dedup_clusters(spark, _docs(spark, texts), threshold=0.3).collect()}
    assert len(out) == 4
    # 0,1,2 collapse to canonical 0; 3 is a singleton
    assert out[0].canonical == out[1].canonical == out[2].canonical == 0
    assert out[3].canonical == 3
    assert [out[i].keep for i in range(4)] == [True, False, False, True]


def test_kmeans_separated_blobs(spark):
    # two tight blobs around (0,0) and (10,10); seeds = 2 lowest ids, one
    # from each blob
    vecs = [
        (0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.05, 0.05]),
        (1, [10.0, 10.1]), (3, [10.1, 10.0]), (5, [9.9, 10.0]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    res = kmeans_assign(spark, df, k=2, iters=2)
    got = {r.vec_id: r.cluster for r in res.assignments.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    # centroids converged to the blob means
    assert res.centroids[0] == pytest.approx([0.05, 0.05])
    assert res.centroids[1] == pytest.approx([10.0, 10.033333], abs=1e-5)


def test_kmeans_deterministic_ties(spark):
    # one point exactly equidistant from both seeds -> lower cluster wins
    vecs = [(0, [0.0]), (1, [2.0]), (2, [1.0])]
    df = spark.createDataFrame(vecs, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    res = kmeans_assign(spark, df, k=2, iters=1)
    got = {r.vec_id: r.cluster for r in res.assignments.collect()}
    assert got[2] == 0


def test_bigram_logprob_matches_python(spark):
    """Add-one bigram LM score vs a direct Python recomputation over a
    tiny corpus with repeated transitions."""
    from igpm_pem_spark.functions.text import bigram_logprob

    texts = ["the cat sat", "the cat ran", "a dog sat", "single"]
    got = {
        r.doc_id: (r.n_bigrams, r.avg_lp)
        for r in bigram_logprob(_docs(spark, texts)).collect()
    }

    toks = [t.lower().split() for t in texts]
    bigs = [list(zip(ws, ws[1:])) for ws in toks]
    allb = [b for doc in bigs for b in doc]
    c12: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    for w1, w2 in allb:
        c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
        c1[w1] = c1.get(w1, 0) + 1
    vocab = len({w for ws in toks for w in ws})
    for i, doc in enumerate(bigs):
        if not doc:
            assert i not in got  # <2 tokens: no bigram row
            continue
        want = sum(
            math.log((c12[b] + 1) / (c1[b[0]] + vocab)) for b in doc
        ) / len(doc)
        assert got[i][0] == len(doc)
        assert got[i][1] == pytest.approx(want, abs=1e-12)


def test_kmeans_broadcast_matches_literal(spark):
    """The broadcast nested-loop assignment path must produce the exact
    same clusters as the literal-expression path (same distances, same
    lower-cluster tie rule)."""
    rows = [
        (i, [float(i % 5) + 10.0 * (i % 3), float(i % 7)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    lit = kmeans_assign(spark, emb, k=4, iters=2, strategy="literal")
    bc = kmeans_assign(spark, emb, k=4, iters=2, strategy="broadcast")
    a = {r.vec_id: r.cluster for r in lit.assignments.collect()}
    b = {r.vec_id: r.cluster for r in bc.assignments.collect()}
    assert a == b
    for ca, cb in zip(lit.centroids, bc.centroids):
        assert ca == pytest.approx(cb, abs=1e-12)


def test_kmeans_rejects_unknown_strategy(spark):
    emb = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="strategy"):
        kmeans_assign(spark, emb, k=2, strategy="nope")
