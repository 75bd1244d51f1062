"""Round-5 session-5 pipeline additions: sequence packing.

Each entry pairs the Spark operator with a DuckDB oracle replaying the
identical sequential recurrence (here: the next-fit-decreasing packing
walk as a recursive CTE stepping one document per group per iteration).
"""

from __future__ import annotations

from ._common import docs

_PACK_CAP = 512


def _q_seq_packing(spark, sf_dir):
    """Pack each language's documents into 512-token context bins by
    next-fit-decreasing; per-doc (lang, doc_id, n_tok, bin, fill)."""
    from ..operators.packing import pack_sequences

    return pack_sequences(docs(spark, sf_dir), capacity=_PACK_CAP, group_cols=("lang",))


_PACK_SQL = f"""
WITH RECURSIVE t AS (
  SELECT lang, doc_id,
         CAST(LEAST(len(list_filter(string_split(lower(text), ' '),
                                     x -> x <> '')), {_PACK_CAP}) AS BIGINT) AS n_tok
  FROM documents
), o AS (
  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, n_tok,
         row_number() OVER (PARTITION BY lang ORDER BY n_tok DESC, doc_id) AS rn
  FROM t
), pack AS (
  SELECT lang, doc_id, n_tok, rn, CAST(0 AS BIGINT) AS bin, n_tok AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.lang, o.doc_id, o.n_tok, o.rn,
         CASE WHEN p.fill + o.n_tok <= {_PACK_CAP} THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + o.n_tok <= {_PACK_CAP} THEN p.fill + o.n_tok ELSE o.n_tok END
  FROM pack p JOIN o ON o.lang = p.lang AND o.rn = p.rn + 1
)
SELECT lang, doc_id, n_tok, bin, fill FROM pack
"""


QUERIES = {
    "doc_seq_packing": (_q_seq_packing, _PACK_SQL),
}


# ------------------------------------------ random-failure robustness
_FAIL_SHARE = 0.2  # fraction of vertices removed by portable hash
_FAIL_CUT = int(_FAIL_SHARE * 1_000_000)
_FAIL_CC_ITERS = 50


def _q_robustness_random(spark, sf_dir):
    """Random-failure robustness: remove a deterministic 20% hash sample
    of vertices (portable md5 bucket, the split_by_hash construction)
    from the sparse graph, re-run hash-min CC, report the same
    (n_vertices, n_components, giant_size, giant_share6) row as
    graph_robustness_hubs — the classic scale-free contrast: random
    failure barely dents the giant component that targeted hub removal
    shatters. Removal is a row-local filter (no degree pass, no
    broadcast); CC runs only on surviving edges."""
    from pyspark.sql import functions as F

    from ..operators.components import component_sizes, connected_components
    from ..operators.sampling import SPLIT_BUCKETS, split_bucket
    from ._common import G_SPARSE_SQL, edges, graph_nparts

    assert SPLIT_BUCKETS == 1_000_000
    e = edges(spark, sf_dir, G_SPARSE_SQL)
    keep_src = split_bucket(F.col("src"), "fail") >= _FAIL_CUT
    keep_dst = split_bucket(F.col("dst"), "fail") >= _FAIL_CUT
    e2 = e.where(keep_src & keep_dst)
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


def _fail_random_sql() -> str:
    from ..operators.sampling import split_bucket_sql
    from ._common import G_SPARSE_SQL, SYM_SQL

    bs = split_bucket_sql("src", "fail")
    bd = split_bucket_sql("dst", "fail")
    return f"""
WITH RECURSIVE g0 AS ({G_SPARSE_SQL})
, g AS (SELECT src, dst FROM g0 WHERE {bs} >= {_FAIL_CUT} AND {bd} >= {_FAIL_CUT})
, sym AS ({SYM_SQL})
, verts AS (SELECT DISTINCT src AS id FROM sym)
, ep AS (SELECT src, dst FROM sym UNION ALL SELECT id, id FROM verts)
, cc(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.dst, min(c.comp)
    FROM cc c JOIN ep e ON e.src = c.id
    WHERE c.iter < {_FAIL_CC_ITERS}
    GROUP BY c.iter, e.dst
)
, canon AS (SELECT id, comp FROM cc WHERE iter = {_FAIL_CC_ITERS})
, sizes AS (SELECT comp, count(*) AS size FROM canon GROUP BY comp)
SELECT CAST(sum(size) AS BIGINT) AS n_vertices,
       count(*) AS n_components,
       CAST(max(size) AS BIGINT) AS giant_size,
       round(CAST(max(size) AS DOUBLE) / CAST(sum(size) AS DOUBLE), 6) AS giant_share6
FROM sizes
"""


QUERIES["graph_robustness_random"] = (_q_robustness_random, _fail_random_sql())


# ------------------------------------------ PMI word associations
_PMI_TOP_TOKENS = 100
_PMI_MIN_SUPPORT = 5
_PMI_TOP_PAIRS = 20


def _q_pmi_top(spark, sf_dir):
    """Top word associations by pointwise mutual information: PMI of
    token pairs over document co-occurrence, restricted to the 100 most
    frequent tokens — the restriction that bounds the per-doc pair
    expansion to a constant at corpus scale (the unrestricted pair join
    is quadratic in per-doc vocabulary). Exact integer counts, ONE
    division inside the log, rounded-before-rank so both engines order
    identically."""
    from pyspark.sql import functions as F

    from ._common import docs

    d = docs(spark, sf_dir)
    n_docs = d.count()
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), " "), lambda t: t != F.lit(""))
            )
        ).alias("token"),
    )
    dfs = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    top = dfs.orderBy(F.desc("df"), F.asc("token")).limit(_PMI_TOP_TOKENS)
    tt = toks.join(F.broadcast(top), "token")
    a = tt.select("doc_id", F.col("token").alias("tok_a"), F.col("df").alias("df_a"))
    b = tt.select("doc_id", F.col("token").alias("tok_b"), F.col("df").alias("df_b"))
    pr = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "df_a", "df_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= _PMI_MIN_SUPPORT)
    )
    pmi6 = F.round(
        F.log((F.col("n_ab") * F.lit(n_docs)) / (F.col("df_a") * F.col("df_b"))), 6
    ).alias("pmi6")
    return (
        pr.select("tok_a", "tok_b", "n_ab", "df_a", "df_b", pmi6)
        .orderBy(F.desc("pmi6"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(_PMI_TOP_PAIRS)
    )


_PMI_SQL = f"""
WITH t AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split(lower(text), ' '),
                                          x -> x <> ''))) AS token
  FROM documents
), dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY token)
, top AS (SELECT token, df FROM dfs ORDER BY df DESC, token LIMIT {_PMI_TOP_TOKENS})
, tt AS (SELECT t.doc_id, t.token, top.df FROM t JOIN top USING (token))
, pr AS (
    SELECT a.token AS tok_a, b.token AS tok_b, a.df AS df_a, b.df AS df_b,
           CAST(count(*) AS BIGINT) AS n_ab
    FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.token < b.token
    GROUP BY 1, 2, 3, 4
)
SELECT tok_a, tok_b, n_ab, df_a, df_b,
       round(ln((n_ab * (SELECT CAST(count(*) AS BIGINT) FROM documents))
                / (df_a * df_b)), 6) AS pmi6
FROM pr WHERE n_ab >= {_PMI_MIN_SUPPORT}
ORDER BY pmi6 DESC, tok_a, tok_b LIMIT {_PMI_TOP_PAIRS}
"""


QUERIES["doc_pmi_top"] = (_q_pmi_top, _PMI_SQL)


# ------------------------------------------ Heaps-law vocabulary growth
_VOCAB_DECILES = 10


def _q_vocab_growth(spark, sf_dir):
    """Vocabulary growth curve (Heaps' law audit): cumulative distinct
    vocabulary vs cumulative token volume after each corpus decile (by
    doc id). All-integer outputs: per-token first-seen doc is one
    min-aggregate, deciles are a row-local expression off one max scalar,
    and the cumulative window runs over exactly 10 rows — the shape that
    holds at any corpus size (the per-token state is the vocabulary
    table a tokenizer-training run keeps anyway)."""
    from pyspark.sql import Window, functions as F

    from ._common import docs

    d = docs(spark, sf_dir)
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    n = int(max_id) + 1
    dec = lambda c: F.least(
        F.floor(c * _VOCAB_DECILES / F.lit(n)), F.lit(_VOCAB_DECILES - 1)
    ).cast("bigint")
    toks = d.select(
        F.col("doc_id"),
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != F.lit(""))
        ).alias("token"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    per_tok = (
        toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
        .select(dec(F.col("first_doc")).alias("decile"))
        .groupBy("decile").agg(F.count("*").alias("new_vocab"))
    )
    per_dec = (
        toks.select(dec(F.col("doc_id")).alias("decile"))
        .groupBy("decile").agg(F.count("*").alias("toks"))
        .join(per_tok, "decile", "left")
        .join(
            d.select(dec(F.col("doc_id")).alias("decile"))
            .groupBy("decile").agg(F.count("*").alias("n_docs")),
            "decile",
        )
    )
    return per_dec.select(
        "decile",
        F.sum("n_docs").over(w).cast("bigint").alias("docs_cum"),
        F.sum("toks").over(w).cast("bigint").alias("tokens_cum"),
        F.sum(F.coalesce("new_vocab", F.lit(0))).over(w).cast("bigint").alias("vocab_cum"),
    )


_VOCAB_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(least(floor(doc_id * {_VOCAB_DECILES}
                          / (SELECT max(doc_id) + 1 FROM documents)),
                    {_VOCAB_DECILES - 1}) AS BIGINT) AS decile,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
  FROM documents
), toks AS (SELECT doc_id, decile, unnest(l) AS token FROM d)
, pt AS (
    SELECT token, min(decile) AS decile FROM (
      SELECT token,
             CAST(least(floor(first_doc * {_VOCAB_DECILES}
                              / (SELECT max(doc_id) + 1 FROM documents)),
                        {_VOCAB_DECILES - 1}) AS BIGINT) AS decile
      FROM (SELECT token, min(doc_id) AS first_doc FROM toks GROUP BY token)
    ) GROUP BY token
)
, nv AS (SELECT decile, count(*) AS new_vocab FROM pt GROUP BY decile)
, td AS (SELECT decile, count(*) AS toks FROM toks GROUP BY decile)
, nd AS (SELECT decile, count(*) AS n_docs FROM d GROUP BY decile)
SELECT nd.decile,
       CAST(sum(nd.n_docs) OVER w AS BIGINT) AS docs_cum,
       CAST(sum(td.toks) OVER w AS BIGINT) AS tokens_cum,
       CAST(sum(coalesce(nv.new_vocab, 0)) OVER w AS BIGINT) AS vocab_cum
FROM nd JOIN td ON td.decile = nd.decile
LEFT JOIN nv ON nv.decile = nd.decile
WINDOW w AS (ORDER BY nd.decile ROWS UNBOUNDED PRECEDING)
"""


QUERIES["doc_vocab_growth"] = (_q_vocab_growth, _VOCAB_SQL)


# ------------------------------------------ dimension-truncation recall
_TRUNC_DIMS = 32
_TRUNC_K = 10
_TRUNC_QUERY_MOD = 25


def _q_dim_truncation_recall(spark, sf_dir):
    """Matryoshka-style audit: for each query vector, the overlap between
    its exact top-10 cosine neighbors under the full 64 dims and under
    the first 32 dims — the measurement that decides whether truncated
    embeddings are safe for coarse retrieval. Query side is a fixed
    hash-free subset (vec_id % 25), so the scan is seeds × corpus
    (linear, broadcastable), never corpus²."""
    from pyspark.sql import functions as F

    from ..operators.similarity import cosine_topk
    from ._common import emb

    e = emb(spark, sf_dir)
    full = cosine_topk(e, k=_TRUNC_K, query_mod=_TRUNC_QUERY_MOD)
    tr = cosine_topk(
        e.select(
            "vec_id", F.slice("embedding", 1, _TRUNC_DIMS).alias("embedding")
        ),
        k=_TRUNC_K,
        query_mod=_TRUNC_QUERY_MOD,
    )
    hits = (
        full.join(tr, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        full.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_common", F.lit(0)).cast("bigint").alias("n_common"),
            F.round(
                F.coalesce("n_common", F.lit(0)).cast("double") / _TRUNC_K, 6
            ).alias("recall6"),
        )
    )


_TRUNC_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS e1
  FROM embeddings WHERE vec_id % {_TRUNC_QUERY_MOD} = 0
), full_top AS (
  SELECT query_id, c.vec_id AS neighbor_id
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
  QUALIFY row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(list_cosine_similarity(q.e1, c.embedding::DOUBLE[]), 4) DESC,
             c.vec_id ASC) <= {_TRUNC_K}
), tr_top AS (
  SELECT query_id, c.vec_id AS neighbor_id
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
  QUALIFY row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(list_cosine_similarity(
               q.e1[1:{_TRUNC_DIMS}],
               (c.embedding::DOUBLE[])[1:{_TRUNC_DIMS}]), 4) DESC,
             c.vec_id ASC) <= {_TRUNC_K}
), hits AS (
  SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_common
  FROM full_top f JOIN tr_top t
    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
  GROUP BY f.query_id
)
SELECT q.query_id,
       CAST(coalesce(h.n_common, 0) AS BIGINT) AS n_common,
       round(CAST(coalesce(h.n_common, 0) AS DOUBLE) / {_TRUNC_K}, 6) AS recall6
FROM (SELECT DISTINCT query_id FROM full_top) q
LEFT JOIN hits h ON h.query_id = q.query_id
"""


QUERIES["emb_dim_truncation_recall"] = (_q_dim_truncation_recall, _TRUNC_SQL)


# ------------------------------------------ daily event-count anomaly
_ANOM_TOP = 5


def _q_daily_anomaly(spark, sf_dir):
    """Daily event-count anomalies: population z-score of each day's
    event count, computed in EXACT integer sums — z = (n·N − Sx) /
    sqrt(N·Sxx − Sx²), one division and one sqrt over exact bigint
    terms, so the double is bit-identical cross-engine (no stddev_pop
    library variance). Top 5 days by |z|. The daily table is
    day-cardinality; the global sums are one tiny aggregate."""
    from pyspark.sql import functions as F

    from ._common import register

    register(spark, sf_dir)
    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    stats = daily.agg(
        F.count("*").cast("bigint").alias("nn"),
        F.sum("n").cast("bigint").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sxx"),
    )
    z = (
        (F.col("n") * F.col("nn") - F.col("sx")).cast("double")
        / F.sqrt((F.col("nn") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(F.col("day").cast("string").alias("day"), "n", F.round(z, 6).alias("z6"))
        .orderBy(F.abs(F.col("z6")).desc(), F.asc("day"))
        .limit(_ANOM_TOP)
    )


_ANOM_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS nn,
         CAST(sum(n) AS BIGINT) AS sx,
         CAST(sum(n * n) AS BIGINT) AS sxx
  FROM daily
)
SELECT CAST(day AS VARCHAR) AS day, n,
       round(CAST(n * st.nn - st.sx AS DOUBLE)
             / sqrt(CAST(st.nn * st.sxx - st.sx * st.sx AS DOUBLE)), 6) AS z6
FROM daily, st
ORDER BY abs(z6) DESC, day ASC LIMIT {_ANOM_TOP}
"""


QUERIES["rel_daily_anomaly"] = (_q_daily_anomaly, _ANOM_SQL)
