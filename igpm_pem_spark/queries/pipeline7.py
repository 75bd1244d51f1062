"""Round-5 training-data-pipeline additions: product quantization,
DSIR importance weights, hub-removal robustness, temperature mixing.

Each entry pairs the Spark operator with a DuckDB oracle that replays
the identical recurrence/arithmetic (portable md5-prefix token hash,
unrolled Lloyd rounds, bounded hash-min CTE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import token_id_sql
from ._common import G_SPARSE_SQL, SYM_SQL, docs, edges, emb, graph_nparts

_MAX_TOKENS = 20000

# ---------------------------------------------------------------- PQ
_PQ_M, _PQ_K, _PQ_SUB, _PQ_DIM = 4, 8, 16, 64


def _q_pq_codes(spark, sf_dir):
    """Product-quantize the embedding corpus: m=4 subspaces × k=8 codes,
    2 Lloyd rounds per codebook; per-row codes + reconstruction MSE."""
    from ..operators.pq import pq_encode

    return pq_encode(spark, emb(spark, sf_dir), m=_PQ_M, k=_PQ_K, iters=2).codes


def _pq_dist(e: str, c: str, dims: int) -> str:
    """Squared-L2 over ``dims``-long vectors (mirrors pipeline2's
    _km_dist, parameterized for subspace/coarse tables)."""
    return (
        f"SELECT {e}.vec_id, {c}.cid,\n"
        f"       sum(({e}.v[CAST(r.i AS INT)] - {c}.v[CAST(r.i AS INT)])"
        f" * ({e}.v[CAST(r.i AS INT)] - {c}.v[CAST(r.i AS INT)])) AS d2\n"
        f"FROM {e} {e}, {c} {c}, range(1, {dims + 1}) r(i)\n"
        f"GROUP BY {e}.vec_id, {c}.cid"
    )


def _lloyd_round(pfx: str, e: str, i: int, dims: int) -> str:
    """Lloyd round ``i`` over table ``e`` with CTE prefix ``pfx`` — the
    pipeline2 _km_round chain, parameterized."""
    p = f"{pfx}c{i - 1}"
    return f"""
, {pfx}d{i} AS ({_pq_dist(e, p, dims)})
, {pfx}a{i} AS (SELECT vec_id, cid AS cluster FROM {pfx}d{i}
           QUALIFY row_number() OVER (
               PARTITION BY vec_id ORDER BY d2, cid) = 1)
, {pfx}m{i} AS (
    SELECT a.cluster AS cid, CAST(r.i AS INT) AS pos,
           avg(e.v[CAST(r.i AS INT)]) AS m
    FROM {pfx}a{i} a JOIN {e} e USING (vec_id), range(1, {dims + 1}) r(i)
    GROUP BY a.cluster, r.i
)
, {pfx}c{i} AS (
    SELECT cid, list(m ORDER BY pos) AS v FROM {pfx}m{i} GROUP BY cid
    UNION ALL
    SELECT c.cid, c.v FROM {p} c
    WHERE c.cid NOT IN (SELECT DISTINCT cluster FROM {pfx}a{i})
)
"""


def _lloyd_chain(pfx: str, e: str, dims: int, k: int) -> str:
    """Seeds (k lowest vec_ids) + 2 Lloyd rounds + final distances
    ``{pfx}d3`` and argmin codes ``{pfx}fin``."""
    return f"""
, {pfx}c0 AS (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
    FROM (SELECT vec_id, v FROM {e} ORDER BY vec_id LIMIT {k})
)
{_lloyd_round(pfx, e, 1, dims)}
{_lloyd_round(pfx, e, 2, dims)}
, {pfx}d3 AS ({_pq_dist(e, f'{pfx}c2', dims)})
, {pfx}fin AS (
    SELECT vec_id, CAST(cid AS INT) AS code, d2 FROM {pfx}d3
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
)"""


def _pq_subspace_ctes() -> str:
    parts = []
    for j in range(_PQ_M):
        lo, hi = j * _PQ_SUB + 1, (j + 1) * _PQ_SUB
        parts.append(f"""
, e{j} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e00)
{_lloyd_chain(f'p{j}', f'e{j}', _PQ_SUB, _PQ_K)}""")
    return "".join(parts)


def _pq_sql() -> str:
    parts = [
        "WITH e00 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        _pq_subspace_ctes(),
    ]
    sel = ", ".join(f"p{j}fin.code AS code_{j}" for j in range(_PQ_M))
    d2s = " + ".join(f"p{j}fin.d2" for j in range(_PQ_M))
    joins = " ".join(
        f"JOIN p{j}fin ON p{j}fin.vec_id = p0fin.vec_id" for j in range(1, _PQ_M)
    )
    parts.append(f"""
SELECT p0fin.vec_id, {sel},
       round(({d2s}) / {_PQ_DIM}.0, 4) AS mse4
FROM p0fin {joins}""")
    return "".join(parts)


# ----------------------------------------------------------- IVF-PQ
_IVFPQ_K, _IVFPQ_NPROBE, _IVFPQ_QMOD, _IVFPQ_NC = 3, 2, 25, 8


def _q_ivfpq(spark, sf_dir):
    """IVF-PQ ANN: coarse 8-means inverted lists (nprobe=2) ranked by PQ
    asymmetric distance — candidates carry 4 int codes, never vectors."""
    from ..operators.pq import ivfpq_topk

    return ivfpq_topk(
        spark, emb(spark, sf_dir), k=_IVFPQ_K, n_clusters=_IVFPQ_NC,
        iters=2, nprobe=_IVFPQ_NPROBE, query_mod=_IVFPQ_QMOD,
        m=_PQ_M, pq_k=_PQ_K,
    )


def _ivfpq_sql() -> str:
    parts = [
        "WITH e00 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        _pq_subspace_ctes(),
        _lloyd_chain("g", "e00", _PQ_DIM, _IVFPQ_NC),
    ]
    for j in range(_PQ_M):
        parts.append(f"""
, qe{j} AS (SELECT vec_id, v FROM e{j} WHERE vec_id % {_IVFPQ_QMOD} = 0)
, l{j} AS ({_pq_dist(f'qe{j}', f'p{j}c2', _PQ_SUB)})""")
    adc = " + ".join(f"l{j}.d2" for j in range(_PQ_M))
    fjoins = " ".join(
        f"JOIN p{j}fin f{j} ON f{j}.vec_id = c.neighbor_id" for j in range(_PQ_M)
    )
    ljoins = " ".join(
        f"JOIN l{j} ON l{j}.vec_id = c.query_id AND l{j}.cid = f{j}.code"
        for j in range(_PQ_M)
    )
    parts.append(f"""
, qp AS (SELECT vec_id AS query_id, cid AS cluster FROM gd3
         WHERE vec_id % {_IVFPQ_QMOD} = 0
         QUALIFY row_number() OVER (
             PARTITION BY vec_id ORDER BY d2, cid) <= {_IVFPQ_NPROBE})
, afin AS (SELECT vec_id, code AS cluster FROM gfin)
, cand AS (SELECT q.query_id, a.vec_id AS neighbor_id
           FROM qp q JOIN afin a USING (cluster)
           WHERE a.vec_id <> q.query_id)
, scored AS (
    SELECT c.query_id, c.neighbor_id, round({adc}, 4) AS adc4
    FROM cand c {fjoins} {ljoins}
)
SELECT query_id, neighbor_id, adc4 FROM scored
QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY adc4 ASC, neighbor_id ASC) <= {_IVFPQ_K}""")
    return "".join(parts)


# ------------------------------------------------------------- DSIR
_DSIR_BUCKETS = 256


def _q_dsir(spark, sf_dir):
    """DSIR importance weights: target = English docs, 256 hashed-unigram
    buckets; ratio-of-sums weight (exact-integer sums, one division)."""
    from ..operators.importance import dsir_weights

    return dsir_weights(
        docs(spark, sf_dir), F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )


_DSIR_SQL = f"""
WITH toks_raw AS (
  SELECT doc_id, string_split(lower(text), ' ') AS xs FROM documents
),
tok AS (
  SELECT t.doc_id, t.xs[CAST(r.i AS INT)] AS token
  FROM toks_raw t JOIN range(1, {_MAX_TOKENS + 1}) r(i) ON r.i <= len(t.xs)
  WHERE t.xs[CAST(r.i AS INT)] <> ''
),
tb AS (SELECT doc_id, {token_id_sql('token')} % {_DSIR_BUCKETS} AS bucket FROM tok),
rc AS (SELECT bucket, count(*) AS rc FROM tb GROUP BY bucket),
tids AS (SELECT doc_id FROM documents WHERE lang = 'en'),
tc AS (SELECT bucket, count(*) AS tc FROM tb JOIN tids USING (doc_id) GROUP BY bucket),
b AS (SELECT rc.bucket, rc.rc, coalesce(tc.tc, 0) AS tc
      FROM rc LEFT JOIN tc ON tc.bucket = rc.bucket)
SELECT tb.doc_id,
       CAST(sum(b.tc) AS BIGINT) AS t_hits,
       CAST(sum(b.rc) AS BIGINT) AS r_hits,
       count(*) AS n_tokens,
       round(CAST(CAST(sum(b.tc) AS BIGINT) + 1 AS DOUBLE)
             / CAST(CAST(sum(b.rc) AS BIGINT) + 1 AS DOUBLE), 6) AS ratio6
FROM tb JOIN b USING (bucket)
GROUP BY tb.doc_id
"""


# ---------------------------------------------- split-leakage audit
def _q_split_leakage(spark, sf_dir):
    """Cross-split contamination audit: train/test doc pairs sharing >= 2
    winnowing fingerprints — the leak a hash-split cannot prevent when
    near-duplicate documents land on opposite sides of the cut. Composes
    the tested winnow_pairs (fingerprint-bucketed, stop-shingle-capped —
    never all-pairs) with split_by_hash, so the audit scales exactly as
    the MOSS match step does."""
    from ..functions.text import winnow_pairs
    from ..operators.sampling import split_by_hash

    d = docs(spark, sf_dir)
    pairs = winnow_pairs(d, k=4, w=4, min_shared=2)
    sp = split_by_hash(d, "doc_id").select("doc_id", "split")
    j = (
        pairs.join(
            sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .where(
            ((F.col("sa") == "train") & (F.col("sb") == "test"))
            | ((F.col("sa") == "test") & (F.col("sb") == "train"))
        )
    )
    return j.select(
        F.when(F.col("sa") == "train", F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("train_id"),
        F.when(F.col("sa") == "train", F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("test_id"),
        "shared",
    )


def _split_leakage_sql() -> str:
    from ..operators.sampling import split_case_sql

    from .pipeline import _winnow_ctes

    return (
        _winnow_ctes()
        + f"""
, fps AS MATERIALIZED (SELECT DISTINCT doc_id, fp FROM wfp)
, szs AS MATERIALIZED (SELECT fp, count(*) AS sz FROM fps GROUP BY fp)
, small AS MATERIALIZED (
  SELECT f.doc_id, f.fp FROM fps f JOIN szs ON szs.fp = f.fp AND szs.sz <= 200
)
, pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
  FROM small a JOIN small b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
)
, sp AS (SELECT doc_id, {split_case_sql('doc_id')} AS split FROM documents)
SELECT CASE WHEN sa.split = 'train' THEN p.doc_a ELSE p.doc_b END AS train_id,
       CASE WHEN sa.split = 'train' THEN p.doc_b ELSE p.doc_a END AS test_id,
       p.shared
FROM pairs p JOIN sp sa ON sa.doc_id = p.doc_a
             JOIN sp sb ON sb.doc_id = p.doc_b
WHERE (sa.split = 'train' AND sb.split = 'test')
   OR (sa.split = 'test' AND sb.split = 'train')
"""
    )


# ------------------------------------------------- CMS heavy hitters
_CMS_TOPN = 20


def _q_cms(spark, sf_dir):
    """Count-min heavy hitters: top-20 corpus tokens by CMS estimate
    (4×256 integer counters, portable hashes) with exact counts
    alongside — est >= exact always."""
    from ..operators.sketch import cms_heavy_hitters

    return cms_heavy_hitters(docs(spark, sf_dir), topn=_CMS_TOPN)


def _cms_sql() -> str:
    from ..operators.sketch import CMS_DEPTH, cms_bucket_sql

    bucket_cols = ", ".join(
        f"{cms_bucket_sql(d)} AS b{d}" for d in range(CMS_DEPTH)
    )
    counter_units = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, b{d} AS bucket FROM tb" for d in range(CMS_DEPTH)
    )
    cjoins = " ".join(
        f"LEFT JOIN cnt c{d} ON c{d}.d = {d} AND c{d}.bucket = cand.b{d}"
        for d in range(CMS_DEPTH)
    )
    est = "least(" + ", ".join(
        f"coalesce(c{d}.c, 0)" for d in range(CMS_DEPTH)
    ) + ")"
    return f"""
WITH toks_raw AS (
  SELECT doc_id, string_split(lower(text), ' ') AS xs FROM documents
),
tok AS (
  SELECT t.xs[CAST(r.i AS INT)] AS token
  FROM toks_raw t JOIN range(1, {_MAX_TOKENS + 1}) r(i) ON r.i <= len(t.xs)
  WHERE t.xs[CAST(r.i AS INT)] <> ''
),
tt AS (SELECT token, {token_id_sql('token')} AS tid FROM tok),
tb AS (SELECT token, tid, {bucket_cols} FROM tt),
cnt AS (SELECT d, bucket, count(*) AS c FROM ({counter_units}) GROUP BY d, bucket),
cand AS (SELECT token, tid, count(*) AS exact,
                {", ".join(f"min(b{d}) AS b{d}" for d in range(CMS_DEPTH))}
         FROM tb GROUP BY token, tid)
SELECT cand.token, CAST({est} AS BIGINT) AS est, cand.exact
FROM cand {cjoins}
ORDER BY est DESC, cand.token ASC
LIMIT {_CMS_TOPN}
"""


# ------------------------------------------- hub-removal robustness
_ROBUST_HUBS = 20
_ROBUST_CC_ITERS = 50


def _q_robustness(spark, sf_dir):
    """Attack-robustness report: remove the top-20 degree hubs (ties →
    lower id) from the sparse co-occurrence graph, re-run hash-min CC on
    the survivors, report (n_vertices, n_components, giant_size,
    giant_share6). The 100 TB story: hub removal is a broadcast
    anti-join (20 ids), CC re-runs only on the filtered edge set."""
    from ..operators.components import component_sizes, connected_components
    from ..operators.graph import symmetrize

    e = edges(spark, sf_dir, G_SPARSE_SQL)
    deg = (
        symmetrize(e).groupBy("src").agg(F.count("*").alias("d"))
        .select(F.col("src").alias("id"), "d")
    )
    hubs = deg.orderBy(F.desc("d"), F.asc("id")).limit(_ROBUST_HUBS)
    e2 = (
        e.join(F.broadcast(hubs.select(F.col("id").alias("src"))), "src", "left_anti")
        .join(F.broadcast(hubs.select(F.col("id").alias("dst"))), "dst", "left_anti")
    )
    res = connected_components(
        spark, e2, num_partitions=graph_nparts(spark, sf_dir)
    )
    sizes = component_sizes(res.components)
    return (
        sizes.agg(
            F.sum("size").alias("_nv"),
            F.count("*").alias("n_components"),
            F.max("size").alias("giant_size"),
        )
        .select(
            F.col("_nv").cast("bigint").alias("n_vertices"),
            "n_components",
            "giant_size",
            F.round(
                F.col("giant_size").cast("double") / F.col("_nv").cast("double"), 6
            ).alias("giant_share6"),
        )
    )


_ROBUST_SQL = f"""
WITH RECURSIVE g AS ({G_SPARSE_SQL})
, sym0 AS ({SYM_SQL})
, deg AS (SELECT src AS id, count(*) AS d FROM sym0 GROUP BY src)
, hubs AS (SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT {_ROBUST_HUBS})
, g2 AS (
    SELECT src, dst FROM g
    WHERE src NOT IN (SELECT id FROM hubs) AND dst NOT IN (SELECT id FROM hubs)
)
, sym AS (SELECT src, dst FROM g2 UNION ALL SELECT dst AS src, src AS dst FROM g2)
, verts AS (SELECT DISTINCT src AS id FROM sym)
, ep AS (SELECT src, dst FROM sym UNION ALL SELECT id, id FROM verts)
, cc(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.dst, min(c.comp)
    FROM cc c JOIN ep e ON e.src = c.id
    WHERE c.iter < {_ROBUST_CC_ITERS}
    GROUP BY c.iter, e.dst
)
, canon AS (SELECT id, comp FROM cc WHERE iter = {_ROBUST_CC_ITERS})
, sizes AS (SELECT comp, count(*) AS size FROM canon GROUP BY comp)
SELECT CAST(sum(size) AS BIGINT) AS n_vertices,
       count(*) AS n_components,
       CAST(max(size) AS BIGINT) AS giant_size,
       round(CAST(max(size) AS DOUBLE) / CAST(sum(size) AS DOUBLE), 6) AS giant_share6
FROM sizes
"""


# ------------------------------------------- temperature mixing plan
_MIX_ALPHA_SQRT = True  # α = 0.5 — sqrt is IEEE-correctly-rounded, so the
# per-stratum weight is bit-identical across engines (0.7 would hinge on
# each engine's pow libm)
_MIX_BUDGET = 1000


def _q_mix_temperature(spark, sf_dir):
    """Multilingual temperature-mixing plan (α=0.5): per-language doc
    counts → temperature-flattened sampling shares → planned docs for a
    1000-doc budget. One tiny aggregate + two scalar cross joins —
    O(|langs|) state regardless of corpus size."""
    d = docs(spark, sf_dir)
    lc = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = lc.agg(F.sum("n_docs").cast("bigint").alias("_t"))
    w = lc.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs",
        F.sqrt(F.col("n_docs").cast("double") / F.col("_t").cast("double")).alias("_w"),
    )
    z = w.agg(F.sum("_w").alias("_z"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("_w") / F.col("_z"), 6).alias("share6"),
            F.round(F.lit(_MIX_BUDGET) * F.col("_w") / F.col("_z"), 0)
            .cast("bigint")
            .alias("planned_docs"),
        )
    )


_MIX_SQL = f"""
WITH lc AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
, tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM lc)
, w AS (SELECT lang, n_docs,
               sqrt(CAST(n_docs AS DOUBLE) / CAST(tot.t AS DOUBLE)) AS w
        FROM lc, tot)
, z AS (SELECT sum(w) AS z FROM w)
SELECT lang, n_docs, round(w.w / z.z, 6) AS share6,
       CAST(round({_MIX_BUDGET} * w.w / z.z, 0) AS BIGINT) AS planned_docs
FROM w, z
"""


QUERIES = {
    "emb_pq_codes": (_q_pq_codes, _pq_sql()),
    "emb_ann_ivfpq_topk": (_q_ivfpq, _ivfpq_sql()),
    "doc_cms_heavy_hitters": (_q_cms, _cms_sql()),
    "doc_split_leakage": (_q_split_leakage, _split_leakage_sql()),
    "doc_dsir_weights": (_q_dsir, _DSIR_SQL),
    "graph_robustness_hubs": (_q_robustness, _ROBUST_SQL),
    "doc_mix_temperature": (_q_mix_temperature, _MIX_SQL),
}
