"""Training-data pipeline queries over documents/embeddings with DuckDB
oracles mirroring the exact arithmetic (functions/hashing.py constants are
interpolated into the oracle SQL so the two engines cannot drift)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import (
    FP_A, FP_B, NUM_BANDS, NUM_PERM, P, ROWS_PER_BAND, perm_coeffs, token_id_sql,
)
from ..functions.text import LANG_MARKERS, STOPWORDS
from ._common import docs, emb

_MAX_TOKENS = 20000

# shared DuckDB CTE prelude: tokens with raw-array 1-based positions
# (empty tokens dropped, mirroring functions/text.tokens); tid is the same
# portable md5-prefix hash the Spark plan computes inline (token_id_sql)
_TOK_CTE = f"""
WITH toks_raw AS (
  SELECT doc_id, string_split(lower(text), ' ') AS xs FROM documents
),
tok AS (
  SELECT t.doc_id, CAST(r.i AS BIGINT) AS pos, t.xs[CAST(r.i AS INT)] AS token
  FROM toks_raw t JOIN range(1, {_MAX_TOKENS + 1}) r(i) ON r.i <= len(t.xs)
  WHERE t.xs[CAST(r.i AS INT)] <> ''
),
dt AS (SELECT DISTINCT doc_id, {token_id_sql("token")} AS tid FROM tok)
"""


def _in_list(vals) -> str:
    return ", ".join(f"'{v}'" for v in vals)


# ----------------------------------------------------------------- queries
def _q_exact_dedup(spark, sf_dir):
    from ..operators.dedup import exact_duplicates

    return exact_duplicates(docs(spark, sf_dir))


def _q_token_stats(spark, sf_dir):
    from ..functions.text import token_stats

    return token_stats(docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    from ..functions.text import quality_score

    return quality_score(docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    from ..functions.text import lang_id

    return lang_id(docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    from ..functions.text import fingerprint

    return fingerprint(docs(spark, sf_dir))


def _q_minhash(spark, sf_dir):
    from ..operators.dedup import minhash_signatures

    return minhash_signatures(docs(spark, sf_dir))


def _q_lsh_pairs(spark, sf_dir):
    from ..operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(docs(spark, sf_dir))


def _q_simhash(spark, sf_dir):
    from ..operators.dedup import simhash

    return simhash(docs(spark, sf_dir))


def _q_ngram_jaccard(spark, sf_dir):
    from ..operators.dedup import ngram_jaccard_consecutive

    return ngram_jaccard_consecutive(docs(spark, sf_dir))


def _q_lsh_jaccard(spark, sf_dir):
    from ..operators.dedup import lsh_jaccard_pairs

    return lsh_jaccard_pairs(docs(spark, sf_dir), threshold=0.1)


def _q_simhash_near_dup(spark, sf_dir):
    from ..operators.dedup import simhash_near_dup

    return simhash_near_dup(docs(spark, sf_dir), max_hamming=2)


def _q_top_tokens(spark, sf_dir):
    from ..functions.text import top_tokens

    return top_tokens(docs(spark, sf_dir), k=20)


def _q_token_stats_bpe(spark, sf_dir):
    from ..functions.text import token_stats_bpe

    return token_stats_bpe(docs(spark, sf_dir))


def _q_split_assign(spark, sf_dir):
    from ..operators.sampling import split_by_hash

    return split_by_hash(docs(spark, sf_dir), "doc_id").select("doc_id", "split")


def _q_cosine_topk(spark, sf_dir):
    from ..operators.similarity import cosine_topk

    return cosine_topk(emb(spark, sf_dir))


def _q_near_dups(spark, sf_dir):
    from ..operators.similarity import near_dup_pairs

    return near_dup_pairs(emb(spark, sf_dir), threshold=0.3)


def _q_ann_lsh(spark, sf_dir):
    from ..functions.hashing import ANN_PLANES
    from ..operators.similarity import ann_lsh_topk

    # n_planes pinned to the constant the STATIC oracle SQL interpolates —
    # the adaptive default would match today (500-row table -> 4) but must
    # not silently diverge if the testdata is ever regenerated larger
    return ann_lsh_topk(emb(spark, sf_dir), n_planes=ANN_PLANES)


def _q_ann_near_dup(spark, sf_dir):
    from ..functions.hashing import ANN_PLANES
    from ..operators.similarity import near_dup_pairs_ann

    return near_dup_pairs_ann(
        emb(spark, sf_dir), threshold=0.3, n_planes=ANN_PLANES
    )


# ----------------------------------------------------------------- oracles
def _minhash_select() -> str:
    cols = []
    for i in range(NUM_PERM):
        a, b = perm_coeffs(i)
        cols.append(f"min(({a} * tid + {b}) % {P}) AS mh{i}")
    return ", ".join(cols)


def _band_union() -> str:
    parts = []
    for band in range(NUM_BANDS):
        lo = band * ROWS_PER_BAND
        key = "0"
        for r in range(ROWS_PER_BAND):
            key = f"({key} * {P} + mh{lo + r})"
        parts.append(f"SELECT doc_id, {band} AS band, {key} AS key FROM sig")
    return " UNION ALL ".join(parts)


def _simhash_sums() -> str:
    a, b = perm_coeffs(0)
    h = f"(({a} * tid + {b}) % {P})"
    return ", ".join(
        f"sum(CASE WHEN ({h} // {2**k}) % 2 = 1 THEN 1 ELSE -1 END) AS s{k}"
        for k in range(16)
    )


def _simhash_fold() -> str:
    return " + ".join(f"(CASE WHEN s{k} > 0 THEN {2**k} ELSE 0 END)" for k in range(16))


_QUALITY_SQL = f"""
{_TOK_CTE},
per_doc AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN token IN ({_in_list(STOPWORDS)}) THEN 1 ELSE 0 END) AS n_stop
  FROM tok GROUP BY doc_id
),
base AS (
  SELECT doc_id, length(text) AS n_chars,
         length(text) - length(replace(text, ',', '')) AS n_commas
  FROM documents
)
SELECT b.doc_id, b.n_chars,
       round(coalesce(p.n_stop, 0) / greatest(coalesce(p.n_tokens, 0), 1), 6) AS stop_ratio,
       round(b.n_commas / greatest(b.n_chars, 1), 6) AS comma_ratio,
       round(
         0.5 * least(coalesce(p.n_tokens, 0) / 100.0, 1.0)
         + 0.3 * (1.0 - abs(coalesce(p.n_stop, 0) / greatest(coalesce(p.n_tokens, 0), 1) - 0.4))
         + 0.2 * (1.0 - least(b.n_commas / greatest(b.n_chars, 1) * 10, 1.0)),
       6) AS quality
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""

_LANG_SQL = f"""
{_TOK_CTE},
votes AS (
  SELECT doc_id,
         sum(CASE WHEN token IN ({_in_list(LANG_MARKERS["en"])}) THEN 1 ELSE 0 END) AS v_en,
         sum(CASE WHEN token IN ({_in_list(LANG_MARKERS["es"])}) THEN 1 ELSE 0 END) AS v_es,
         sum(CASE WHEN token IN ({_in_list(LANG_MARKERS["fr"])}) THEN 1 ELSE 0 END) AS v_fr
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       CASE
         WHEN coalesce(v_en,0) >= coalesce(v_es,0) AND coalesce(v_en,0) >= coalesce(v_fr,0)
              AND coalesce(v_en,0) > 0 THEN 'en'
         WHEN coalesce(v_es,0) >= coalesce(v_fr,0) AND coalesce(v_es,0) > 0 THEN 'es'
         WHEN coalesce(v_fr,0) > 0 THEN 'fr'
         ELSE 'unknown'
       END AS lang_guess
FROM documents d LEFT JOIN votes USING (doc_id)
"""

_NGRAM_SQL = f"""
{_TOK_CTE},
ng AS (
  SELECT DISTINCT doc_id, ngram FROM (
    SELECT doc_id,
           token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS ngram
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE ngram IS NOT NULL
),
sizes AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, count(*) AS n_inter
  FROM ng a JOIN ng b ON b.doc_id = a.doc_id + 1 AND b.ngram = a.ngram
  GROUP BY a.doc_id
)
SELECT sa.doc_id AS doc_a, sa.doc_id + 1 AS doc_b,
       round(coalesce(i.n_inter, 0) / (sa.sz + sb.sz - coalesce(i.n_inter, 0)), 6) AS jaccard
FROM sizes sa JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
LEFT JOIN inter i ON i.doc_a = sa.doc_id
"""

_LSH_SQL = f"""
{_TOK_CTE},
sig AS (SELECT doc_id, {_minhash_select()} FROM dt GROUP BY doc_id),
bands AS ({_band_union()}),
sized AS (
  SELECT b.* FROM bands b
  JOIN (SELECT band, key, count(*) AS sz FROM bands GROUP BY band, key) s
    USING (band, key)
  WHERE s.sz <= 50
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sized a JOIN sized b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""

_COSINE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS e1
  FROM embeddings WHERE vec_id % 25 = 0
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.e1, c.embedding::DOUBLE[]), 4) AS cos4
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos4 FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC) <= 3
"""

_LSH_JACCARD_SQL = f"""
{_TOK_CTE},
sig AS (SELECT doc_id, {{minhash}} FROM dt GROUP BY doc_id),
bands AS ({{bands}}),
sized AS (
  SELECT b.* FROM bands b
  JOIN (SELECT band, key, count(*) AS sz FROM bands GROUP BY band, key) s
    USING (band, key)
  WHERE s.sz <= 50
),
prs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sized a JOIN sized b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
ng AS (
  SELECT DISTINCT doc_id, ngram FROM (
    SELECT doc_id,
           token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS ngram
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE ngram IS NOT NULL
),
sizes AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM prs p JOIN ng x ON x.doc_id = p.doc_a
             JOIN ng y ON y.doc_id = p.doc_b AND y.ngram = x.ngram
  GROUP BY p.doc_a, p.doc_b
)
SELECT * FROM (
  SELECT p.doc_a, p.doc_b,
         round(coalesce(i.n_inter, 0)
               / (sa.sz + sb.sz - coalesce(i.n_inter, 0)), 6) AS jaccard
  FROM prs p JOIN sizes sa ON sa.doc_id = p.doc_a
             JOIN sizes sb ON sb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
) WHERE jaccard >= 0.1
"""


def _simhash_near_dup_sql(max_hamming: int = 2, bits: int = 16) -> str:
    """Exact SQL mirror of operators/dedup.simhash_near_dup (pigeonhole
    bands + bit_count(xor) verify)."""
    n_bands = max_hamming + 1
    width = (bits + n_bands - 1) // n_bands
    bands = []
    for k in range(n_bands):
        off = k * width
        w = min(width, bits - off)
        bands.append(
            f"SELECT doc_id, simhash, {k} AS bk, "
            f"(simhash >> {off}) % {2 ** w} AS bv FROM sh"
        )
    banded = " UNION ALL ".join(bands)
    return (
        _TOK_CTE
        + f""",
sums AS (SELECT doc_id, {_simhash_sums()} FROM dt GROUP BY doc_id),
sh AS (SELECT doc_id, CAST({_simhash_fold()} AS BIGINT) AS simhash FROM sums),
banded AS ({banded})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM banded a JOIN banded b
  ON a.bk = b.bk AND a.bv = b.bv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""
    )


def _ann_sigs_union() -> str:
    """Per-table signature SELECTs over e(vec_id, emb) — the exact SQL
    mirror of operators/similarity.hyperplane_buckets."""
    from ..functions.hashing import ANN_PLANES, ANN_TABLES, ann_weight_sql

    parts = []
    for t in range(ANN_TABLES):
        bits = " + ".join(
            f"(CASE WHEN list_sum(list_transform(range(1, len(emb) + 1), "
            f"i -> emb[i] * {ann_weight_sql(t, p, '(i - 1)')})) > 0 "
            f"THEN {2 ** p} ELSE 0 END)"
            for p in range(ANN_PLANES)
        )
        parts.append(f"SELECT vec_id, {t} AS tbl, ({bits}) AS sig FROM e")
    return " UNION ALL ".join(parts)


_ANN_PRELUDE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
sigs AS ({sigs})
"""


def _ann_sized_cte() -> str:
    """Degenerate-bucket cap CTE — the exact SQL mirror of
    operators/similarity._capped_signatures (buckets wider than
    ANN_MAX_BUCKET dropped before the candidate self-join)."""
    from ..functions.hashing import ANN_MAX_BUCKET

    return f"""
, sized AS (
  SELECT s.* FROM sigs s
  JOIN (SELECT tbl, sig, count(*) AS sz FROM sigs GROUP BY tbl, sig) z
    USING (tbl, sig)
  WHERE z.sz <= {ANN_MAX_BUCKET}
)"""


def _ann_topk_sql() -> str:
    return (
        _ANN_PRELUDE.format(sigs=_ann_sigs_union())
        + _ann_sized_cte()
        + """
, cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sized q JOIN sized c ON q.tbl = c.tbl AND q.sig = c.sig
  WHERE q.vec_id % 25 = 0 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id,
       round(list_cosine_similarity(a.emb, b.emb), 4) AS cos4
FROM cand JOIN e a ON a.vec_id = query_id JOIN e b ON b.vec_id = neighbor_id
QUALIFY row_number() OVER (
  PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC) <= 3
"""
    )


def _ann_near_dup_sql() -> str:
    return (
        _ANN_PRELUDE.format(sigs=_ann_sigs_union())
        + _ann_sized_cte()
        + """
, cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM sized x JOIN sized y ON x.tbl = y.tbl AND x.sig = y.sig
  WHERE x.vec_id < y.vec_id
)
SELECT id_a, id_b, round(list_cosine_similarity(a.emb, b.emb), 4) AS cos4
FROM cand JOIN e a ON a.vec_id = id_a JOIN e b ON b.vec_id = id_b
WHERE round(list_cosine_similarity(a.emb, b.emb), 4) >= 0.3
"""
    )


_NEAR_DUP_SQL = """
WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id % 4 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.e, b.e), 4) AS cos4
FROM s a JOIN s b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.e, b.e), 4) >= 0.3
"""

def _q_bigram_lm(spark, sf_dir):
    """Corpus bigram-LM fluency score per document (add-one smoothing) —
    the count-based language-model signal next to doc_quality's
    heuristics. Integer counts throughout; one ln at the end."""
    from ..functions.text import bigram_logprob

    return bigram_logprob(docs(spark, sf_dir)).select(
        "doc_id", "n_bigrams", F.round("avg_lp", 6).alias("avg_lp6")
    )


_BIGRAM_LM_SQL = (
    _TOK_CTE
    + """
, big AS (
  SELECT doc_id, token AS w1,
         lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
)
, big2 AS MATERIALIZED (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL)
, c12 AS (SELECT w1, w2, count(*) AS c12 FROM big2 GROUP BY w1, w2)
, c1 AS (SELECT w1, count(*) AS c1 FROM big2 GROUP BY w1)
, voc AS (SELECT count(DISTINCT token) AS v FROM tok)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(avg(ln((c12.c12 + 1) * 1.0 / (c1.c1 + voc.v))), 6) AS avg_lp6
FROM big2 b
JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
JOIN c1 ON c1.w1 = b.w1
CROSS JOIN voc
GROUP BY b.doc_id
"""
)


QUERIES = {
    "doc_bigram_lm": (_q_bigram_lm, _BIGRAM_LM_SQL),
    "doc_exact_dedup": (
        _q_exact_dedup,
        "SELECT md5(text) AS sha, count(*) AS n_docs, min(doc_id) AS first_doc "
        "FROM documents GROUP BY md5(text)",
    ),
    "doc_token_stats": (
        _q_token_stats,
        _TOK_CTE
        + "SELECT doc_id, count(*) AS n_tokens, round(avg(length(token)), 6) AS avg_token_len "
        "FROM tok GROUP BY doc_id",
    ),
    "doc_quality": (_q_quality, _QUALITY_SQL),
    "doc_lang_id": (_q_lang_id, _LANG_SQL),
    "doc_fingerprint": (
        _q_fingerprint,
        _TOK_CTE
        + f"SELECT doc_id, CAST(sum(({FP_A} * {token_id_sql('token')} + {FP_B} * pos) % {P}) % {P} AS BIGINT) AS fp "
        "FROM tok GROUP BY doc_id",
    ),
    "doc_minhash_sig": (
        _q_minhash,
        _TOK_CTE + f"SELECT doc_id, {_minhash_select()} FROM dt GROUP BY doc_id",
    ),
    "doc_lsh_pairs": (_q_lsh_pairs, _LSH_SQL),
    "doc_simhash": (
        _q_simhash,
        _TOK_CTE
        + f"SELECT doc_id, CAST({_simhash_fold()} AS BIGINT) AS simhash FROM "
        f"(SELECT doc_id, {_simhash_sums()} FROM dt GROUP BY doc_id)",
    ),
    "doc_ngram_jaccard": (_q_ngram_jaccard, _NGRAM_SQL),
    "doc_lsh_jaccard": (
        _q_lsh_jaccard,
        _LSH_JACCARD_SQL.format(minhash=_minhash_select(), bands=_band_union()),
    ),
    "doc_simhash_near_dup": (_q_simhash_near_dup, _simhash_near_dup_sql()),
    "doc_top_tokens": (
        _q_top_tokens,
        _TOK_CTE
        + """
        SELECT token, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM tok GROUP BY token
        ORDER BY n_occurrences DESC, token ASC LIMIT 20
        """,
    ),
    "doc_token_stats_bpe": (
        _q_token_stats_bpe,
        r"""
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[A-Za-z0-9]+|[^A-Za-z0-9\s]') AS l
          FROM documents
        )
        SELECT doc_id,
               CAST(len(l) AS INTEGER) AS n_tokens,
               CAST(len(list_filter(l, x -> regexp_matches(x, '^[a-z0-9]+$')))
                    AS INTEGER) AS n_alnum,
               CAST(len(l) - len(list_filter(l, x -> regexp_matches(x, '^[a-z0-9]+$')))
                    AS INTEGER) AS n_punct,
               CAST(len(list_distinct(l)) AS INTEGER) AS n_distinct
        FROM t
        """,
    ),
    "doc_split_assign": (
        _q_split_assign,
        None,  # replaced right below (needs the sampling module's builder)
    ),
    "emb_cosine_topk": (_q_cosine_topk, _COSINE_TOPK_SQL),
    "emb_near_dup_pairs": (_q_near_dups, _NEAR_DUP_SQL),
    "emb_ann_lsh_topk": (_q_ann_lsh, _ann_topk_sql()),
    "emb_ann_near_dup": (_q_ann_near_dup, _ann_near_dup_sql()),
}


# hash-split oracle: the exact CASE expression split_by_hash evaluates
from ..operators.sampling import split_case_sql as _split_case_sql  # noqa: E402

QUERIES["doc_split_assign"] = (
    _q_split_assign,
    f"SELECT doc_id, {_split_case_sql('doc_id')} AS split FROM documents",
)


def _q_winnow_fp(spark, sf_dir):
    """Winnowing (MOSS) fingerprints: min-hash-per-window shingle
    selection at guaranteed 2/(w+1) density
    (functions/text.py::winnow_fingerprints)."""
    from ..functions.text import winnow_fingerprints

    return winnow_fingerprints(docs(spark, sf_dir), k=4, w=4)


def _q_winnow_pairs(spark, sf_dir):
    """MOSS match step: document pairs sharing >= 2 winnowing
    fingerprints, stop-shingle-capped (functions/text.py::winnow_pairs)."""
    from ..functions.text import winnow_pairs

    return winnow_pairs(docs(spark, sf_dir), k=4, w=4, min_shared=2)


def _winnow_ctes(k: int = 4, w: int = 4) -> str:
    from ..functions.hashing import FP_A, P

    terms = " + ".join(
        f"({pow(FP_A, j, P)} * "
        + ("tid" if j == 0 else f"lead(tid, {j}) OVER wdoc")
        + f") % {P}"
        for j in range(k)
    )
    return (
        _TOK_CTE
        + f"""
, kt AS MATERIALIZED (
  SELECT doc_id, pos, {token_id_sql("token")} AS tid FROM tok
)
, kg AS MATERIALIZED (
  SELECT doc_id, pos, ({terms}) % {P} AS kh
  FROM kt WINDOW wdoc AS (PARTITION BY doc_id ORDER BY pos)
)
, selw AS MATERIALIZED (
  SELECT doc_id,
         min(kh * 32768 + pos) OVER w2 AS selkey,
         count(*) OVER w2 AS cnt
  FROM kg WHERE kh IS NOT NULL
  WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
)
, wfp AS MATERIALIZED (
  SELECT DISTINCT doc_id, CAST(selkey % 32768 AS BIGINT) AS pos,
         CAST(selkey // 32768 AS BIGINT) AS fp
  FROM selw WHERE cnt = {w}
)"""
    )


QUERIES["doc_winnow_fp"] = (
    _q_winnow_fp,
    _winnow_ctes() + "SELECT doc_id, pos, fp FROM wfp",
)

QUERIES["doc_winnow_pairs"] = (
    _q_winnow_pairs,
    _winnow_ctes()
    + """
, fps AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM wfp)
, szs AS MATERIALIZED (SELECT fp, count(*) AS sz FROM fps GROUP BY fp)
, small AS MATERIALIZED (
  SELECT f.doc_id, f.fp FROM fps f JOIN szs ON szs.fp = f.fp AND szs.sz <= 200
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
FROM small a JOIN small b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
""",
)


def _q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: corpus truth label vs the n-gram
    heuristic's guess — the accuracy evidence for the lang-ID gate."""
    from ..functions.text import lang_id

    d = docs(spark, sf_dir)
    pred = lang_id(d)
    return (
        d.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n_docs"))
    )


QUERIES["doc_lang_confusion"] = (
    _q_lang_confusion,
    f"""
WITH pred AS ({_LANG_SQL})
SELECT d.lang, p.lang_guess, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY d.lang, p.lang_guess
""",
)
