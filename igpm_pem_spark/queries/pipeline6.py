"""Round-5 composite queries: the honest end-to-end training-data
pipeline (ingest → C4 quality gate → dedup clustering → split assignment
→ context-window chunking) as ONE driver-oracled query, so cross-operator
plan regressions (cache lifetimes, exchange reuse, survivor joins) are
caught by the same gate that checks the operators individually.

The DuckDB oracle reuses the SAME SQL text the per-stage oracles run —
the C4 gate nests verbatim as a derived table, the LSH→Jaccard pair query
has its ``documents`` source swapped for the gated CTE, and the hash-min
recursive CTE / split CASE / chunk slicing mirror pipeline2/pipeline/
pipeline4 — so the composition cannot drift from the stages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import split_case_sql
from ._common import docs, graph_nparts
from .pipeline import _LSH_JACCARD_SQL, _band_union, _minhash_select
from .pipeline2 import _DEDUP_CC_ITERS
from .pipeline4 import _C4_SQL, _CHUNK, _MAX_TOKENS, _STRIDE


def _q_pipeline_e2e(spark, sf_dir):
    """The composition a training-data run actually executes, stage by
    stage on the engine's own operators:

    1. C4 quality gate (functions/text.c4_quality_flags) — keep only
       documents passing the length / word-shape / repetition /
       diversity rules.
    2. End-to-end dedup clustering over the SURVIVING documents
       (operators/dedup.dedup_clusters: LSH bands → exact Jaccard → CC)
       — keep one canonical document per near-dup cluster.
    3. Hash split assignment (operators/sampling.split_by_hash) —
       deterministic, append-stable train/val/test.
    4. Context-window chunking (functions/text.chunk_tokens, 64/48).

    Output: (doc_id, split, chunk_id, n_tokens) for every chunk of every
    surviving document — every stage's decision is observable in the
    result, so a regression anywhere in the chain flips the value hash.
    """
    from ..functions.text import c4_quality_flags, chunk_tokens
    from ..operators.dedup import dedup_clusters
    from ..operators.sampling import split_by_hash

    d = docs(spark, sf_dir)
    gate = c4_quality_flags(d, min_words=30).where("keep").select("doc_id")
    # left-semi keeps the corpus schema without duplicating gate columns
    kept = d.join(gate, "doc_id", "left_semi")
    clusters = dedup_clusters(
        spark, kept, threshold=0.1,
        num_partitions=graph_nparts(spark, sf_dir),
    )
    surv = kept.join(
        clusters.where("keep").select("doc_id"), "doc_id", "left_semi"
    )
    splits = split_by_hash(surv.select("doc_id"), "doc_id")
    chunks = chunk_tokens(surv, chunk_size=_CHUNK, stride=_STRIDE)
    return chunks.join(splits, "doc_id").select(
        "doc_id", "split", F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


def _pipeline_e2e_sql() -> str:
    # stage 2's pair query, retargeted at the gated corpus: the ONLY
    # change to the shared SQL text is the source relation name (the
    # token CTE reads ``FROM kept`` instead of ``FROM documents``)
    pairs = _LSH_JACCARD_SQL.format(
        minhash=_minhash_select(), bands=_band_union()
    ).replace("FROM documents", "FROM kept")
    return f"""
WITH RECURSIVE
c4 AS (SELECT doc_id, keep FROM ({_C4_SQL}) c4q),
kept AS (
  SELECT d.doc_id, d.text FROM documents d JOIN c4 USING (doc_id) WHERE c4.keep
),
pr AS MATERIALIZED (SELECT doc_a, doc_b FROM ({pairs}) q),
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
canon AS (SELECT id, comp FROM cc WHERE iter = {_DEDUP_CC_ITERS}),
surv AS (
  SELECT k.doc_id, k.text
  FROM kept k LEFT JOIN canon c ON c.id = k.doc_id
  WHERE coalesce(c.comp, k.doc_id) = k.doc_id
),
xs AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS xs
  FROM surv
),
nz AS (SELECT doc_id, xs, len(xs) AS n FROM xs WHERE len(xs) > 0),
chunks AS (
  SELECT doc_id,
         CAST(r.s // {_STRIDE} AS BIGINT) AS chunk_id,
         CAST(len(list_slice(xs, CAST(r.s + 1 AS INT),
              CAST(least(r.s + {_CHUNK}, n) AS INT))) AS INT) AS n_tokens
  FROM nz JOIN range(0, {_MAX_TOKENS}, {_STRIDE}) r(s) ON r.s < n
)
SELECT c.doc_id, s.split, c.chunk_id, c.n_tokens
FROM chunks c
JOIN (SELECT doc_id, {split_case_sql("doc_id")} AS split FROM surv) s
  USING (doc_id)
"""


QUERIES = {
    "pipeline_end_to_end": (_q_pipeline_e2e, _pipeline_e2e_sql()),
}
