"""Training-data pipeline queries, second ring: TF-IDF terms, end-to-end
dedup clustering, PII/pattern redaction, k-means assignment — each with
an exact DuckDB oracle over the same parquet views."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import REDACT_PATTERNS
from ._common import docs, emb, register
from .pipeline import (
    _LSH_JACCARD_SQL,
    _TOK_CTE,
    _ann_near_dup_sql,
    _band_union,
    _minhash_select,
)

_TFIDF_SQL = f"""
{_TOK_CTE},
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
nn AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * ln((SELECT n FROM nn) * 1.0 / dfq.df), 6) AS tfidf6
  FROM tf JOIN dfq USING (token)
)
SELECT doc_id, token, tf, CAST(rnk AS INTEGER) AS rnk, tfidf6 FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf6 DESC, token ASC) AS rnk
  FROM scored
) WHERE rnk <= 3
"""


def _redact_sql(table: str, id_col: str) -> str:
    counts = []
    scrubbed = "props"
    for name, pat, repl in REDACT_PATTERNS:
        counts.append(
            f"len(regexp_extract_all(props, '{pat}')) AS n_{name}"
        )
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{repl}', 'g')"
    cols = ",\n       ".join(counts)
    return (
        f"SELECT {id_col},\n       {cols},\n"
        f"       md5({scrubbed}) AS scrub_md5\nFROM {table}"
    )


# dedup clustering oracle: the LSH→Jaccard pair query (threshold 0.1)
# feeds a hash-min recursive CTE; every doc left-joins its component.
_DEDUP_CC_ITERS = 20


def _dedup_clusters_sql() -> str:
    pairs = _LSH_JACCARD_SQL.format(
        minhash=_minhash_select(), bands=_band_union()
    )
    return f"""
WITH RECURSIVE pr AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({pairs}) q
),
sympr AS (SELECT doc_a AS src, doc_b AS dst FROM pr
          UNION ALL SELECT doc_b, doc_a FROM pr),
verts AS (SELECT DISTINCT src AS id FROM sympr),
ep AS (SELECT src, dst FROM sympr UNION ALL SELECT id, id FROM verts),
cc(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.dst, min(c.comp)
    FROM cc c JOIN ep e ON e.src = c.id
    WHERE c.iter < {_DEDUP_CC_ITERS}
    GROUP BY c.iter, e.dst
),
canon AS (SELECT id, comp FROM cc WHERE iter = {_DEDUP_CC_ITERS})
SELECT d.doc_id,
       coalesce(c.comp, d.doc_id) AS canonical,
       coalesce(c.comp, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN canon c ON c.id = d.doc_id
"""


# semantic dedup clustering oracle: the ANN near-dup pair query
# (LSH buckets + exact cosine ≥ 0.3) feeds the same hash-min recursive
# CTE as the lexical _dedup_clusters_sql; every vector left-joins its
# component. DuckDB allows a WITH-bearing derived table, so the ANN
# prelude nests verbatim inside the RECURSIVE chain.
def _emb_dedup_clusters_sql() -> str:
    pairs = _ann_near_dup_sql()
    return f"""
WITH RECURSIVE pr AS MATERIALIZED (
  SELECT id_a, id_b FROM ({pairs}) anns
),
sympr AS (SELECT id_a AS src, id_b AS dst FROM pr
          UNION ALL SELECT id_b, id_a FROM pr),
verts AS (SELECT DISTINCT src AS id FROM sympr),
ep AS (SELECT src, dst FROM sympr UNION ALL SELECT id, id FROM verts),
cc(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.dst, min(c.comp)
    FROM cc c JOIN ep e ON e.src = c.id
    WHERE c.iter < {_DEDUP_CC_ITERS}
    GROUP BY c.iter, e.dst
),
canon AS (SELECT id, comp FROM cc WHERE iter = {_DEDUP_CC_ITERS})
SELECT v.vec_id,
       coalesce(c.comp, v.vec_id) AS canonical,
       coalesce(c.comp, v.vec_id) = v.vec_id AS keep
FROM embeddings v LEFT JOIN canon c ON c.id = v.vec_id
"""


# k-means oracle: 2 unrolled Lloyd rounds, seeds = 8 lowest vec_ids,
# squared-L2 argmin with ties to the lower cluster id, element-wise mean
# centroids (empty clusters carry the previous centroid), final assign.
_KM_DIM_BOUND = 4096  # range() upper bound; guarded by r.i <= len(v)


def _km_dist(e: str, c: str) -> str:
    return (
        f"SELECT {e}.vec_id, {c}.cid,\n"
        f"       sum(({e}.v[CAST(r.i AS INT)] - {c}.v[CAST(r.i AS INT)])"
        f" * ({e}.v[CAST(r.i AS INT)] - {c}.v[CAST(r.i AS INT)])) AS d2\n"
        f"FROM e {e}, {c} {c}, range(1, {_KM_DIM_BOUND + 1}) r(i)\n"
        f"WHERE r.i <= len({e}.v)\n"
        f"GROUP BY {e}.vec_id, {c}.cid"
    )


def _km_round(i: int) -> str:
    p = i - 1
    return f"""
, d{i} AS ({_km_dist('e', f'c{p}')})
, a{i} AS (SELECT vec_id, cid AS cluster FROM d{i}
           QUALIFY row_number() OVER (
               PARTITION BY vec_id ORDER BY d2, cid) = 1)
, m{i} AS (
    SELECT a.cluster AS cid, CAST(r.i AS INT) AS pos,
           avg(e.v[CAST(r.i AS INT)]) AS m
    FROM a{i} a JOIN e USING (vec_id), range(1, {_KM_DIM_BOUND + 1}) r(i)
    WHERE r.i <= len(e.v)
    GROUP BY a.cluster, r.i
)
, c{i} AS (
    SELECT cid, list(m ORDER BY pos) AS v FROM m{i} GROUP BY cid
    UNION ALL
    SELECT c.cid, c.v FROM c{p} c
    WHERE c.cid NOT IN (SELECT DISTINCT cluster FROM a{i})
)
"""


_KMEANS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
, c0 AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
)
{_km_round(1)}
{_km_round(2)}
, dfin AS ({_km_dist('e', 'c2')})
SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
  SELECT vec_id, cid AS cluster FROM dfin
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
)
"""


# IVF ANN oracle: the same 2-round Lloyd chain as _KMEANS_SQL, then each
# query (vec_id % 25 = 0) probes its 2 nearest final centroids and ranks
# those inverted lists by exact cosine — mirrors similarity.ann_ivf_topk.
_ANN_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
, c0 AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
)
{_km_round(1)}
{_km_round(2)}
, dfin AS MATERIALIZED ({_km_dist('e', 'c2')})
, afin AS (SELECT vec_id, cid AS cluster FROM dfin
           QUALIFY row_number() OVER (
               PARTITION BY vec_id ORDER BY d2, cid) = 1)
, qp AS (SELECT vec_id AS query_id, cid AS cluster FROM dfin
         WHERE vec_id % 25 = 0
         QUALIFY row_number() OVER (
             PARTITION BY vec_id ORDER BY d2, cid) <= 2)
, cand AS (SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
           FROM qp q JOIN afin a USING (cluster)
           WHERE a.vec_id <> q.query_id)
, scored AS (
    SELECT c.query_id, c.neighbor_id,
           round(list_cosine_similarity(ea.v, eb.v), 4) AS cos4
    FROM cand c JOIN e ea ON ea.vec_id = c.query_id
                JOIN e eb ON eb.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos4 FROM scored
QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY cos4 DESC, neighbor_id ASC) <= 3
"""


def _q_ann_ivf(spark, sf_dir):
    from ..operators.similarity import ann_ivf_topk

    return ann_ivf_topk(spark, emb(spark, sf_dir), k=3, n_clusters=8,
                        iters=2, nprobe=2, query_mod=25)


def _q_tfidf(spark, sf_dir):
    from ..functions.text import tfidf_top_terms

    return tfidf_top_terms(docs(spark, sf_dir), k=3).select(
        "doc_id", "token", "tf", F.col("rnk").cast("int").alias("rnk"), "tfidf6"
    )


def _q_dedup_clusters(spark, sf_dir):
    from ..operators.dedup import dedup_clusters
    from ._common import graph_nparts

    return dedup_clusters(
        spark, docs(spark, sf_dir), threshold=0.1,
        num_partitions=graph_nparts(spark, sf_dir),
    )


def _q_emb_dedup_clusters(spark, sf_dir):
    from ..functions.hashing import ANN_PLANES
    from ..operators.similarity import semantic_dedup_clusters
    from ._common import graph_nparts

    # n_planes pinned to the static-oracle constant (see _q_ann_lsh_topk)
    return semantic_dedup_clusters(
        spark, emb(spark, sf_dir), threshold=0.3, n_planes=ANN_PLANES,
        num_partitions=graph_nparts(spark, sf_dir),
    )


def _q_redact(spark, sf_dir):
    from ..functions.text import redact

    register(spark, sf_dir)
    out = redact(spark.table("events"), "event_id", "props")
    return out.select(
        F.col("id").alias("event_id"),
        *[F.col(f"n_{n}").cast("long").alias(f"n_{n}") for n, _, _ in REDACT_PATTERNS],
        "scrub_md5",
    )


_QUANT_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
         (SELECT max(abs(t.x)) FROM unnest(v) AS t(x)) AS am
  FROM e
)
SELECT vec_id,
       round(CASE WHEN am > 0 THEN 127.0 / am ELSE 0.0 END, 6) AS scale,
       array_to_string(list_transform(
         v,
         x -> CAST(CAST(floor(x * (CASE WHEN am > 0 THEN 127.0 / am ELSE 0.0 END)
                         + 0.5) AS INT) AS VARCHAR)
       ), ',') AS qv_csv
FROM s
"""


def _q_quantize(spark, sf_dir):
    """The driver-facing projection flattens the int8 array to a CSV
    string so the comparator (pandas sort + value hash) sees scalar
    columns only — every element still checked exactly, same discipline
    as doc_minhash_sig's flat mh0..mhN columns."""
    from ..operators.similarity import quantize_int8

    return quantize_int8(emb(spark, sf_dir)).select(
        "vec_id",
        "scale",
        F.array_join(F.transform("qv", lambda x: x.cast("string")), ",").alias(
            "qv_csv"
        ),
    )


def _q_kmeans(spark, sf_dir):
    from ..operators.clustering import kmeans_assign

    res = kmeans_assign(spark, emb(spark, sf_dir), k=8, iters=2)
    return res.assignments.select("vec_id", F.col("cluster").cast("int").alias("cluster"))


def _q_kmeans_bcast(spark, sf_dir):
    """The large-k assignment path (broadcast nested-loop join instead of
    k inline literal expressions) — same distances, same tie rule, so it
    shares emb_kmeans2's oracle verbatim; the driver check proves the
    two physical strategies agree value-exactly."""
    from ..operators.clustering import kmeans_assign

    res = kmeans_assign(
        spark, emb(spark, sf_dir), k=8, iters=2, strategy="broadcast"
    )
    return res.assignments.select("vec_id", F.col("cluster").cast("int").alias("cluster"))


QUERIES = {
    "doc_tfidf_top": (_q_tfidf, _TFIDF_SQL),
    "doc_dedup_clusters": (_q_dedup_clusters, _dedup_clusters_sql()),
    "emb_dedup_clusters": (_q_emb_dedup_clusters, _emb_dedup_clusters_sql()),
    "rel_redact_props": (_q_redact, _redact_sql("events", "event_id")),
    "emb_kmeans2": (_q_kmeans, _KMEANS_SQL),
    "emb_kmeans_bcast": (_q_kmeans_bcast, _KMEANS_SQL),
    "emb_quantize_int8": (_q_quantize, _QUANT_SQL),
    "emb_ann_ivf_topk": (_q_ann_ivf, _ANN_IVF_SQL),
}
