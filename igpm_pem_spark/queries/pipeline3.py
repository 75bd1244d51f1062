"""Driver queries: decontamination, repetition metrics, KMV cardinality
sketch, stratified sampling, neighborhood feature aggregation — the
round-4 training-pipeline ring. Every query is oracle-paired; all
arithmetic is the repo's portable family (md5-prefix hashes, integer
counts, round-6 floats) so DuckDB reproduces each value exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import sample_case_sql, split_case_sql
from ..operators.sketch import KMV_DOMAIN, kmv_hash_sql
from ._common import G_SPARSE_SQL, SYM_SQL, docs, edges, emb
from .pipeline import _TOK_CTE

# word-trigram CTE over tok (same lead() construction as the Spark side's
# dedup.word_ngrams; identical to pipeline._NGRAM_SQL's ng block)
_NG_CTE = """
ng AS MATERIALIZED (
  SELECT DISTINCT doc_id, ngram FROM (
    SELECT doc_id,
           token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS ngram
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE ngram IS NOT NULL
)
"""


def _q_decontaminate(spark, sf_dir):
    """Train/eval n-gram leakage scan: the hash split carves a 5% 'test'
    benchmark out of the documents table, and every 'train' document
    sharing a word-trigram with it is reported with leak evidence."""
    from ..operators.decontam import contamination_report
    from ..operators.sampling import split_by_hash

    d = split_by_hash(docs(spark, sf_dir), "doc_id")
    return contamination_report(
        d.where(F.col("split") == "train"),
        d.where(F.col("split") == "test"),
        n=3,
    )


_DECONTAM_SQL = (
    _TOK_CTE
    + ", "
    + _NG_CTE
    + f"""
, sp AS (SELECT doc_id, {split_case_sql("doc_id")} AS split FROM documents)
, tg AS (SELECT ng.doc_id, ng.ngram FROM ng JOIN sp USING (doc_id) WHERE sp.split = 'train')
, eg AS (SELECT ng.doc_id AS eval_doc, ng.ngram FROM ng JOIN sp USING (doc_id) WHERE sp.split = 'test')
SELECT tg.doc_id, count(DISTINCT tg.ngram) AS n_shared,
       count(DISTINCT eg.eval_doc) AS n_eval_docs
FROM tg JOIN eg ON eg.ngram = tg.ngram
GROUP BY tg.doc_id
"""
)


def _q_repetition(spark, sf_dir):
    from ..functions.text import repetition_stats

    return repetition_stats(docs(spark, sf_dir))


_REPETITION_SQL = (
    _TOK_CTE
    + """
, big AS MATERIALIZED (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, token AS w1,
           lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok
  ) WHERE w2 IS NOT NULL
)
, per AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY doc_id, w1, w2)
, reps AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_bigram_n,
         count(*) AS n_distinct_bigrams
  FROM per GROUP BY doc_id
)
, ntok AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id)
SELECT n.doc_id, n.n_tokens, r.n_bigrams, r.top_bigram_n, r.n_distinct_bigrams
FROM ntok n JOIN reps r USING (doc_id)
"""
)


def _kmv_sql(key_sql: str, from_sql: str, k: int, salt: str, prefix: str = "WITH ") -> str:
    """KMV estimator tail; ``prefix`` lets callers splice it after an
    existing WITH chain (pass ", " to continue one)."""
    h = kmv_hash_sql(key_sql, salt)
    return f"""
{prefix}hs AS (SELECT DISTINCT {h} AS h FROM {from_sql}),
mins AS (SELECT h FROM hs ORDER BY h LIMIT {k})
SELECT count(*) AS k_used, max(h) AS kth_hash,
       CASE WHEN count(*) < {k} THEN count(*)
            ELSE CAST(floor(({float(k - 1)} * {float(KMV_DOMAIN)}) / CAST(max(h) AS DOUBLE)) AS BIGINT)
       END AS est_distinct
FROM mins
"""


def _q_vocab_kmv(spark, sf_dir):
    """Corpus vocabulary size by KMV sketch (k=16 < the synthetic
    vocab of 31, so the estimator branch — not the exact-degrade path —
    is what the oracle checks here; rel_kmv_users covers the other)."""
    from ..functions.text import tokens
    from ..operators.sketch import kmv_distinct

    return kmv_distinct(tokens(docs(spark, sf_dir)), "token", k=16)


def _q_users_kmv(spark, sf_dir):
    """Distinct-user estimate over the events stream — the classic
    'unique visitors without a countDistinct shuffle' sketch."""
    from ..operators.sketch import kmv_distinct
    from ._common import register

    register(spark, sf_dir)
    return kmv_distinct(spark.table("events"), "user_id", k=128)


def _q_sample_stratified(spark, sf_dir):
    """Mixture-weighted corpus subsample: 50% of 'en', 25% of 'es', 10%
    of everything else — deterministic, append-stable, filter-only."""
    from ..operators.sampling import sample_stratified

    return sample_stratified(
        docs(spark, sf_dir), "doc_id", "lang",
        {"en": 0.5, "es": 0.25}, default_rate=0.1,
    ).select("doc_id", "lang")


_SAMPLE_SQL = (
    "SELECT doc_id, lang FROM documents WHERE "
    + sample_case_sql("doc_id", "lang", {"en": 0.5, "es": 0.25}, default_rate=0.1)
)


def _q_neighbor_mean(spark, sf_dir):
    """One GNN-style feature-propagation round over the co-occurrence
    graph: each vertex averages its neighbors' embedding vectors. The
    driver projection explodes the vector so the comparator checks every
    one of the 64 positions as scalar columns."""
    from ..operators.features import neighbor_mean_embedding

    nm = neighbor_mean_embedding(
        edges(spark, sf_dir, G_SPARSE_SQL), emb(spark, sf_dir)
    )
    return nm.select(
        "id",
        "n_neighbors",
        F.posexplode("mean_emb").alias("pos0", "m"),
    ).select(
        "id",
        "n_neighbors",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.round("m", 6).alias("m6"),
    )


_NEIGHBOR_MEAN_SQL = f"""
WITH g AS ({G_SPARSE_SQL}),
sym AS ({SYM_SQL}),
ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
msgs AS (
  SELECT s.src AS id, CAST(r.i AS BIGINT) AS pos, ev.v[CAST(r.i AS INT)] AS val
  FROM sym s JOIN ev ON ev.vec_id = s.dst
  JOIN range(1, 4097) r(i) ON r.i <= len(ev.v)
)
SELECT id,
       CAST(count(*) AS BIGINT) AS n_neighbors,
       pos,
       round(avg(val), 6) AS m6
FROM msgs
GROUP BY id, pos
"""


QUERIES = {
    "doc_decontaminate": (_q_decontaminate, _DECONTAM_SQL),
    "doc_repetition": (_q_repetition, _REPETITION_SQL),
    "doc_vocab_kmv": (
        _q_vocab_kmv,
        _TOK_CTE + _kmv_sql("token", "tok", 16, "kmv", prefix=", "),
    ),
    "rel_kmv_users": (_q_users_kmv, _kmv_sql("user_id", "events", 128, "kmv")),
    "doc_sample_stratified": (_q_sample_stratified, _SAMPLE_SQL),
    "graph_neighbor_mean": (_q_neighbor_mean, _NEIGHBOR_MEAN_SQL),
}


def _q_postings(spark, sf_dir):
    """Inverted-index build: df + capped posting-list head per token."""
    from ..functions.text import inverted_postings

    return inverted_postings(docs(spark, sf_dir), cap=10)


_POSTINGS_SQL = (
    _TOK_CTE
    + """
, dtok AS (SELECT DISTINCT doc_id, token FROM tok)
, dfs AS (SELECT token, count(*) AS df FROM dtok GROUP BY token)
, heads AS (
  SELECT token,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings_csv
  FROM (
    SELECT doc_id, token,
           row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
    FROM dtok
  ) WHERE rn <= 10 GROUP BY token
)
SELECT d.token, d.df, h.postings_csv FROM dfs d JOIN heads h USING (token)
"""
)

QUERIES["doc_postings"] = (_q_postings, _POSTINGS_SQL)


def _q_vocab_kmv_by_lang(spark, sf_dir):
    """Per-language vocabulary-size sketch: the KMV estimator composed
    under GROUP BY — per-group distinct counts without shuffling every
    (lang, token) key to one reducer."""
    from ..functions.text import tokens
    from ..operators.sketch import kmv_distinct_by

    d = docs(spark, sf_dir)
    t = tokens(d).join(d.select("doc_id", "lang"), "doc_id")
    return kmv_distinct_by(t, "lang", "token", k=16)


def _q_reservoir_lang(spark, sf_dir):
    """Fixed-count deterministic sample: 5 docs per language by
    smallest portable hash (fixed-COUNT sibling of the fixed-RATE
    doc_sample_stratified)."""
    from ..operators.sampling import reservoir_per_group

    return reservoir_per_group(
        docs(spark, sf_dir), "doc_id", "lang", n=5
    ).select("doc_id", "lang")


def _kmv_by_lang_sql() -> str:
    from ..operators.sketch import kmv_by_sql

    # join tok back to documents for lang, then the group-wise tail
    return (
        _TOK_CTE
        + """
, tl AS (SELECT t.doc_id, t.token, d.lang FROM tok t JOIN documents d USING (doc_id))
"""
        + kmv_by_sql("lang", "token", "tl", k=16).replace("WITH hs", ", hs", 1)
    )


def _reservoir_lang_sql() -> str:
    from ..operators.sampling import reservoir_case_sql

    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         {reservoir_case_sql("doc_id", "lang", 5)} AS keep
  FROM documents
) WHERE keep
"""


QUERIES["doc_vocab_kmv_by_lang"] = (_q_vocab_kmv_by_lang, _kmv_by_lang_sql())
QUERIES["doc_reservoir_lang"] = (_q_reservoir_lang, _reservoir_lang_sql())
