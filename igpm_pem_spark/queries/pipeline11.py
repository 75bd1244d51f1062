"""Sixth pipeline ring: configuration-model triangle significance,
random-projection (JL) distance-distortion audit, MMR diversified
retrieval, cross-split bigram-LM perplexity gate, and last-touch
conversion attribution — each oracle-paired with dtype-exact DuckDB SQL.

Triangle significance compares the measured triangle count to the
configuration-model expectation E[T] ~ (S2/S1)^3/6 computed from exact
integer degree sums — the "is this graph actually clustered?" telemetry
a link-graph pipeline checks before trusting community structure.
The JL audit materializes a deterministic +-1 random projection
(64 -> 16 dims, Achlioptas-style signs from the same portable plane-hash
family the ANN tables use) and reports per-pair distance distortion.
MMR (maximal marginal relevance) is the diversity-aware top-k a
retrieval pipeline runs after ANN. The cross-split perplexity gate
trains the add-one-smoothed bigram LM on the train split ONLY and
scores val docs — the CCNet-style quality filter, with train/val from
the engine's own hash split. Attribution is the classic marketing
funnel query: each purchase credited to the user's last preceding
view/click via one IGNORE NULLS window."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions.hashing import ANN_KNUTH, ANN_W_MOD
from ._common import G_SPARSE_SQL, edges, register
from .graphq import _with_g
from .pipeline import _TOK_CTE


# ---- configuration-model triangle significance --------------------------
def _q_triangle_significance(spark, sf_dir):
    """Observed triangles vs the configuration-model expectation
    E[T] = (S2/S1)^3 / 6 with S1 = sum(d), S2 = sum(d(d-1)) — both exact
    BIGINTs, ONE division then two multiplications, so the float path is
    identical in any engine."""
    from ..operators.graph import degrees
    from ..operators.triangles import triangle_count

    e = edges(spark, sf_dir, G_SPARSE_SQL)
    n = triangle_count(e)
    stats = degrees(e).agg(
        F.sum("degree").cast("long").alias("s1"),
        F.sum(F.col("degree") * (F.col("degree") - 1)).cast("long").alias("s2"),
    )
    q = F.col("s2") / F.col("s1")
    exp_t = q * q * q / F.lit(6)
    return stats.select(
        F.lit(n).cast("long").alias("n_triangles"),
        "s1",
        "s2",
        F.round(exp_t, 6).alias("expected_t6"),
        F.round(F.lit(n) / exp_t, 6).alias("ratio6"),
    )


_TRI_SIG_SQL = _with_g(
    """
, tri AS (
    SELECT CAST(count(*) AS BIGINT) AS t
    FROM g e1 JOIN g e2 ON e2.src = e1.dst
    JOIN g e3 ON e3.src = e1.src AND e3.dst = e2.dst)
, deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src)
, st AS (SELECT CAST(sum(d) AS BIGINT) AS s1,
                CAST(sum(d * (d - 1)) AS BIGINT) AS s2 FROM deg)
SELECT t AS n_triangles, s1, s2,
       round((s2 / s1) * (s2 / s1) * (s2 / s1) / 6, 6) AS expected_t6,
       round(t / ((s2 / s1) * (s2 / s1) * (s2 / s1) / 6), 6) AS ratio6
FROM tri, st
""",
    G_SPARSE_SQL,
)


# ---- random-projection (JL) distortion audit -----------------------------
_RP_TABLE = 9  # plane-family id disjoint from the ANN tables (0..3)


def _rp_sign_sql(k: str, j: str) -> str:
    """+-1 sign of projection row ``k``, input dim ``j`` — the ANN plane
    hash family evaluated at table _RP_TABLE, thresholded at 0; the SAME
    text runs as a Catalyst expression and inside the DuckDB oracle."""
    kk = f"({_RP_TABLE} * 64 + {k})"
    return (
        f"(CASE WHEN (({ANN_KNUTH} * ((2 * {kk} + 3) * ({j} + 1)"
        f" + 7919 * ({kk} + 1))) % {ANN_W_MOD})"
        f" / {ANN_W_MOD}.0 - 0.5 >= 0 THEN 1.0 ELSE -1.0 END)"
    )


def _q_rp_distortion(spark, sf_dir):
    """Johnson-Lindenstrauss audit of a deterministic +-1 random
    projection 64 -> 16 dims (scale 1/sqrt(16) = 0.25, exact in binary):
    for the 5 lowest-id vectors x the next 20, the pairwise L2 distance
    before and after projection and their ratio. The projection itself
    is ONE exploded join against a 1024-row broadcast sign relation —
    the stateless sketch a 100 TB embedding store applies at ingest to
    cut ANN storage 4x."""
    from ._common import emb

    ev = emb(spark, sf_dir).select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).withColumn("x", F.col("x").cast("double"))
    signs = (
        spark.range(16).withColumnRenamed("id", "k")
        .crossJoin(spark.range(64).withColumnRenamed("id", "j"))
        .withColumn("s", F.expr(_rp_sign_sql("k", "j")))
    )
    proj = (
        ev.join(F.broadcast(signs), "j")
        .groupBy("vec_id", "k")
        .agg((F.sum(F.col("s") * F.col("x")) * F.lit(0.25)).alias("y"))
    )

    def pairs(df, vcol, dcol):
        a = df.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("a"), F.col(vcol).alias("ka"), F.col(dcol).alias("va")
        )
        b = df.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 25)).select(
            F.col("vec_id").alias("b"), F.col(vcol).alias("kb"), F.col(dcol).alias("vb")
        )
        return (
            a.join(b, F.col("ka") == F.col("kb"))
            .groupBy("a", "b")
            .agg(F.sqrt(F.sum((F.col("va") - F.col("vb")) ** 2)).alias("dist"))
        )

    d_orig = pairs(ev, "j", "x").withColumnRenamed("dist", "do")
    d_proj = pairs(proj, "k", "y").withColumnRenamed("dist", "dp")
    return (
        d_orig.join(d_proj, ["a", "b"])
        .select(
            "a", "b",
            F.round("do", 4).alias("dist_orig4"),
            F.round("dp", 4).alias("dist_proj4"),
            F.round(F.col("dp") / F.col("do"), 4).alias("distortion4"),
        )
    )


_RP_SQL = f"""
WITH ev AS (
  SELECT vec_id, CAST(r.i - 1 AS BIGINT) AS j, embedding[r.i]::DOUBLE AS x
  FROM embeddings e JOIN range(1, 65) r(i) ON true
),
signs AS (
  SELECT k.range AS k, j.range AS j, {_rp_sign_sql('k.range', 'j.range')} AS s
  FROM range(0, 16) k CROSS JOIN range(0, 64) j
),
proj AS (
  SELECT e.vec_id, p.k, sum(p.s * e.x) * 0.25 AS y
  FROM ev e JOIN signs p ON p.j = e.j GROUP BY e.vec_id, p.k
),
do_ AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         sqrt(sum((a.x - b.x) * (a.x - b.x))) AS dd
  FROM ev a JOIN ev b ON a.j = b.j
  WHERE a.vec_id < 5 AND b.vec_id >= 5 AND b.vec_id < 25
  GROUP BY a.vec_id, b.vec_id
),
dp_ AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         sqrt(sum((a.y - b.y) * (a.y - b.y))) AS dd
  FROM proj a JOIN proj b ON a.k = b.k
  WHERE a.vec_id < 5 AND b.vec_id >= 5 AND b.vec_id < 25
  GROUP BY a.vec_id, b.vec_id
)
SELECT o.a, o.b,
       round(o.dd, 4) AS dist_orig4,
       round(p.dd, 4) AS dist_proj4,
       round(p.dd / o.dd, 4) AS distortion4
FROM do_ o JOIN dp_ p ON o.a = p.a AND o.b = p.b
"""


# ---- MMR diversified top-5 -------------------------------------------------
MMR_LAMBDA = 0.5
MMR_POOL = 20
MMR_K = 5


def _q_mmr(spark, sf_dir):
    """Maximal-marginal-relevance top-5 for query vector 0: candidate
    pool = exact top-20 by rounded cosine, then 5 greedy rounds of
    argmax over lambda*sim(q,c) - (1-lambda)*max_{s in S} sim(c,s).
    Cosines are rounded to 4 decimals BEFORE combining (the corpus-wide
    convention), so with lambda = 1/2 every score is an exact half of a
    1e-4-grid value and the greedy argmax is bit-deterministic in any
    engine. The distributed work is the pool scoring (swap in ANN at
    scale per the similarity-module docstrings); the greedy runs on the
    bounded 20-row pool + 400-row pair matrix."""
    from ..operators.similarity import mmr_greedy, with_cosine
    from ._common import emb

    e = emb(spark, sf_dir)
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    scored = with_cosine(
        e.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q)),
        "embedding", "q_emb",
    ).select("vec_id", F.round("cos", 4).alias("sim"), "embedding")
    pool = scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(MMR_POOL)
    pool.cache()
    simq = {r.vec_id: r.sim for r in pool.select("vec_id", "sim").collect()}
    pa = pool.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    pb = pool.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    cross = with_cosine(
        pa.join(pb, F.col("a") < F.col("b")), "ea", "eb"
    ).select("a", "b", F.round("cos", 4).alias("sim"))
    psim = {}
    for r in cross.collect():
        psim[(r.a, r.b)] = r.sim
        psim[(r.b, r.a)] = r.sim
    pool.unpersist()

    chosen = mmr_greedy(simq, psim, MMR_K, lam=MMR_LAMBDA)
    return spark.createDataFrame(
        chosen, "rank BIGINT, vec_id BIGINT, score DOUBLE"
    ).select("rank", "vec_id", F.round("score", 6).alias("score6"))


def _mmr_round(r: int) -> str:
    p = r - 1
    return f"""
, pick{r} AS MATERIALIZED (
    SELECT vec_id, score FROM (
        SELECT c.vec_id,
               {MMR_LAMBDA} * c.sim - {1 - MMR_LAMBDA} * coalesce((
                   SELECT max(p.sim) FROM cp p
                   JOIN sel{p} s ON s.vec_id = p.b
                   WHERE p.a = c.vec_id), 0.0) AS score
        FROM cq c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{p})
    ) ORDER BY score DESC, vec_id LIMIT 1)
, sel{r} AS MATERIALIZED (
    SELECT vec_id, rank, score FROM sel{p}
    UNION ALL
    SELECT vec_id, CAST({r} AS BIGINT) AS rank, score FROM pick{r})
"""


_MMR_SQL = (
    f"""
WITH q AS (SELECT embedding::DOUBLE[] AS eq FROM embeddings WHERE vec_id = 0)
, cq AS (
    SELECT vec_id, sim, e FROM (
        SELECT c.vec_id,
               round(list_cosine_similarity(q.eq, c.embedding::DOUBLE[]), 4) AS sim,
               c.embedding::DOUBLE[] AS e
        FROM embeddings c, q WHERE c.vec_id <> 0)
    ORDER BY sim DESC, vec_id LIMIT {MMR_POOL})
, cp0 AS (
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(a.e, b.e), 4) AS sim
    FROM cq a JOIN cq b ON a.vec_id < b.vec_id)
, cp AS (SELECT a, b, sim FROM cp0
         UNION ALL SELECT b AS a, a AS b, sim FROM cp0)
, sel0 AS (SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS rank,
                  CAST(NULL AS DOUBLE) AS score WHERE false)
"""
    + "".join(_mmr_round(r) for r in range(1, MMR_K + 1))
    + f"SELECT rank, vec_id, round(score, 6) AS score6 FROM sel{MMR_K}"
)


# ---- cross-split bigram-LM perplexity gate --------------------------------
def _q_xsplit_perplexity(spark, sf_dir):
    """CCNet-style quality gate: add-one-smoothed bigram LM fit on the
    TRAIN hash-split only, scoring every VAL doc — per doc the bigram
    count and mean log-probability. Unseen context degrades to
    ln(1/V_train). Counts are exact integers; each term is one ln of an
    integer ratio, summed per doc then rounded — the engine-portable
    recipe doc_bigram_lm pinned, here with the train/score separation an
    actual filtering pipeline needs (score split never leaks into the
    model)."""
    from ..functions.text import tokens
    from ..operators.sampling import split_by_hash
    from ._common import docs

    d = split_by_hash(docs(spark, sf_dir), "doc_id")
    tok = tokens(d.select("doc_id", "text")).join(
        d.select("doc_id", "split"), "doc_id"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.withColumn("w2", F.lead("token").over(w)).where(
        F.col("w2").isNotNull()
    ).select("doc_id", "split", F.col("token").alias("w1"), "w2")

    train = big.where(F.col("split") == "train")
    c12 = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = train.groupBy("w1").agg(F.count("*").alias("c1"))
    vtrain = (
        tok.where(F.col("split") == "train")
        .select("token").distinct()
        .agg(F.count("*").alias("v"))
    )

    val = big.where(F.col("split") == "val")
    scored = (
        val.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vtrain))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1)
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logp6"),
    )


def _xsplit_sql() -> str:
    from ..operators.sampling import split_case_sql

    split = split_case_sql("doc_id")
    return (
        _TOK_CTE
        + f"""
, spl AS (SELECT doc_id, {split} AS split FROM documents)
, big AS (
    SELECT t.doc_id, s.split, t.token AS w1,
           lead(t.token) OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS w2
    FROM tok t JOIN spl s ON s.doc_id = t.doc_id)
, bigg AS (SELECT doc_id, split, w1, w2 FROM big WHERE w2 IS NOT NULL)
, c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
          FROM bigg WHERE split = 'train' GROUP BY w1, w2)
, c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
         FROM bigg WHERE split = 'train' GROUP BY w1)
, vt AS (SELECT CAST(count(DISTINCT t.token) AS BIGINT) AS v
         FROM tok t JOIN spl s ON s.doc_id = t.doc_id WHERE s.split = 'train')
, scored AS (
    SELECT b.doc_id,
           ln((coalesce(c.c12, 0) + 1) * 1.0
              / (coalesce(d.c1, 0) + (SELECT v FROM vt))) AS lp
    FROM bigg b
    LEFT JOIN c12 c ON c.w1 = b.w1 AND c.w2 = b.w2
    LEFT JOIN c1 d ON d.w1 = b.w1
    WHERE b.split = 'val')
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(lp), 6) AS avg_logp6
FROM scored GROUP BY doc_id
"""
    )


# ---- last-touch conversion attribution -------------------------------------
def _q_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credited to the same user's
    most recent preceding view or click ('none' when the purchase is the
    user's first touch). ONE window pass on the user shuffle key (the
    sessionize/funnel layout — at 100 TB the stream is already bucketed
    by user), then a 3-row aggregate."""
    register(spark, sf_dir)
    ev = spark.table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("view", "click"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("none")).alias("attributed_to"))
        .agg(F.count("*").cast("long").alias("n_purchases"))
    )


_ATTRIBUTION_SQL = """
WITH t AS (
  SELECT event_type,
         last_value(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events)
SELECT coalesce(touch, 'none') AS attributed_to,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM t WHERE event_type = 'purchase'
GROUP BY coalesce(touch, 'none')
"""


QUERIES = {
    "graph_triangle_sig": (_q_triangle_significance, _TRI_SIG_SQL),
    "emb_rp_distortion": (_q_rp_distortion, _RP_SQL),
    "emb_mmr_top5": (_q_mmr, _MMR_SQL),
    "doc_xsplit_perplexity": (_q_xsplit_perplexity, _xsplit_sql()),
    "rel_attribution": (_q_attribution, _ATTRIBUTION_SQL),
}
