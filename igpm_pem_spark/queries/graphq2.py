"""Round-5 structural additions: directed triad census, digraph
reciprocity, temporal graph growth, and char-entropy document quality.

The census/reciprocity pair completes the orientation-aware ring around
the triangle kernel (the reference's flagship pattern ``gray.ini:9`` is
orientation-blind); the growth curve is the vertex/edge-arrival report a
temporal link graph is monitored by; char entropy is the classic cheap
garbage/binary-text gate of a training-data pipeline. Every oracle
replays the identical integer/one-division arithmetic, so the driver's
dtype-sensitive value hash matches bit-for-bit."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ._common import G_SPARSE_SQL, docs, edges, register

# directed co-occurrence by in-order line sequence: part a → part b when
# a ships on an earlier line of the same order. Unlike the parity-mixed
# digraph this produces genuinely reciprocated pairs (the same two parts
# in opposite sequence across orders), which is what reciprocity and the
# mutual triad class need to be non-degenerate.
_G_SEQ_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey
 AND a.l_linenumber < b.l_linenumber
 AND a.l_partkey <> b.l_partkey
"""

# the SCC queries' parity-oriented digraph (metricsq._G_DIRMIX_SQL):
# orientation-deterministic and reciprocal-free, so the closed-triad
# census splits cleanly into cyclic vs transitive
_G_DIRMIX_SQL = f"""
SELECT CASE WHEN (src + dst) % 2 = 0 THEN src ELSE dst END AS src,
       CASE WHEN (src + dst) % 2 = 0 THEN dst ELSE src END AS dst
FROM ({G_SPARSE_SQL})
"""


# ---- directed triad census ------------------------------------------
def _q_triad_census(spark, sf_dir):
    """Closed-triad census (cyclic / transitive / mutual) of the
    parity-oriented sparse digraph — one orientation-folding pass, then
    the canonical two-join wedge plan with the flags carried inline."""
    from ..operators.triangles import directed_triad_census

    return directed_triad_census(edges(spark, sf_dir, _G_DIRMIX_SQL))


_TRIAD_SQL = f"""
WITH g AS ({_G_DIRMIX_SQL})
, e AS (SELECT DISTINCT src, dst FROM g WHERE src <> dst)
, pair AS (
    SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
           CAST(count(*) AS BIGINT) AS ndir, max(src < dst) AS fwd
    FROM e GROUP BY 1, 2
)
, tri AS (
    SELECT p1.ndir AS n_ab, p1.fwd AS d_ab,
           p2.ndir AS n_ac, p2.fwd AS d_ac,
           p3.ndir AS n_bc, p3.fwd AS d_bc
    FROM pair p1
    JOIN pair p2 ON p2.lo = p1.lo AND p2.hi > p1.hi
    JOIN pair p3 ON p3.lo = p1.hi AND p3.hi = p2.hi
)
SELECT CASE
         WHEN n_ab > 1 OR n_ac > 1 OR n_bc > 1 THEN 'mutual'
         WHEN (d_ab AND d_bc AND NOT d_ac)
           OR (NOT d_ab AND NOT d_bc AND d_ac) THEN 'cyclic'
         ELSE 'transitive'
       END AS motif,
       CAST(count(*) AS BIGINT) AS n
FROM tri GROUP BY 1
"""


# ---- digraph reciprocity --------------------------------------------
def _q_reciprocity(spark, sf_dir):
    """Reciprocity of the line-sequence digraph: one self-transpose
    equi-join + one global aggregate; the ratio is a single integer
    division so the double is bit-identical cross-engine."""
    from ..operators.metrics import reciprocity

    return reciprocity(edges(spark, sf_dir, _G_SEQ_SQL))


_RECIP_SQL = f"""
WITH g AS ({_G_SEQ_SQL})
, e AS (SELECT DISTINCT src, dst FROM g WHERE src <> dst)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(r.src) AS BIGINT) AS n_recip,
       CAST(count(r.src) AS DOUBLE) / count(*) AS reciprocity
FROM e LEFT JOIN (SELECT dst AS src, src AS dst FROM e) r
  USING (src, dst)
"""


# ---- temporal graph growth ------------------------------------------
def _q_growth_monthly(spark, sf_dir):
    """Vertex/edge-arrival curve of the temporal order graph: per month
    (integer year·12+month index, engine-portable) the new-customer
    count (first-seen vertices), order count, and the cumulative totals.
    Two keyed aggregates over the fact table; the cumulative window runs
    over month-cardinality rows only (~72 at any scale), never the
    facts — the state a 100 TB growth dashboard keeps is one row per
    month."""
    register(spark, sf_dir)
    o = spark.table("orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("int")
        .alias("mi"),
    )
    pm = o.groupBy("mi").agg(F.count("*").alias("n_orders"))
    nc = (
        o.groupBy("o_custkey")
        .agg(F.min("mi").alias("mi"))
        .groupBy("mi")
        .agg(F.count("*").alias("new_customers"))
    )
    w = Window.orderBy("mi").rowsBetween(Window.unboundedPreceding, 0)
    return (
        pm.join(nc, "mi", "left")
        .select(
            "mi",
            "n_orders",
            F.coalesce("new_customers", F.lit(0))
            .cast("long")
            .alias("new_customers"),
        )
        .select(
            "mi",
            "n_orders",
            "new_customers",
            F.sum("n_orders").over(w).cast("long").alias("cum_orders"),
            F.sum("new_customers").over(w).cast("long").alias("cum_customers"),
        )
    )


_GROWTH_SQL = """
WITH om AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS mi
  FROM orders
), pm AS (
  SELECT mi, CAST(count(*) AS BIGINT) AS n_orders FROM om GROUP BY mi
), nc AS (
  SELECT mi, CAST(count(*) AS BIGINT) AS new_customers
  FROM (SELECT o_custkey, min(mi) AS mi FROM om GROUP BY o_custkey)
  GROUP BY mi
)
SELECT pm.mi, pm.n_orders,
       coalesce(nc.new_customers, 0) AS new_customers,
       CAST(sum(pm.n_orders) OVER w AS BIGINT) AS cum_orders,
       CAST(sum(coalesce(nc.new_customers, 0)) OVER w AS BIGINT)
         AS cum_customers
FROM pm LEFT JOIN nc ON nc.mi = pm.mi
WINDOW w AS (ORDER BY pm.mi ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


# ---- char-entropy document quality ----------------------------------
def _q_char_entropy(spark, sf_dir):
    """Per-document Shannon entropy over characters (bits/char) — the
    cheap garbage/binary gate (natural text sits ~3.5-4.5 bits/char;
    repeated filler and base64 blobs fall far outside). Entirely
    ROW-LOCAL Catalyst array expressions: split → distinct → per-char
    counts → one fold. Zero exchanges, zero Python — the ideal shape for
    a 100 TB scan. Entropy is computed as log2(n) − Σ c·log2(c) / n over
    integer counts so both engines sum the same ~40 finite terms."""
    d = docs(spark, sf_dir).where(F.length("text") > 0)
    return (
        d.withColumn("_cs", F.expr("filter(split(text, ''), x -> x <> '')"))
        .withColumn(
            "_cnt",
            F.expr(
                "transform(array_sort(array_distinct(_cs)),"
                " c -> size(filter(_cs, x -> x = c)))"
            ),
        )
        .select(
            "doc_id",
            F.size("_cs").cast("long").alias("n_chars"),
            F.size("_cnt").cast("long").alias("distinct_chars"),
            F.round(
                F.log2(F.size("_cs"))
                - F.expr(
                    "aggregate(_cnt, CAST(0.0 AS DOUBLE),"
                    " (acc, c) -> acc + c * log2(c))"
                )
                / F.size("_cs"),
                6,
            ).alias("ent6"),
        )
    )


_ENTROPY_SQL = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM documents WHERE length(text) > 0
), cnt AS (
  SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c
)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS distinct_chars,
       round(log2(CAST(sum(k) AS BIGINT)) - sum(k * log2(k)) / sum(k), 6)
         AS ent6
FROM cnt GROUP BY doc_id
"""


QUERIES = {
    "graph_triad_census": (_q_triad_census, _TRIAD_SQL),
    "graph_reciprocity": (_q_reciprocity, _RECIP_SQL),
    "graph_growth_monthly": (_q_growth_monthly, _GROWTH_SQL),
    "doc_char_entropy": (_q_char_entropy, _ENTROPY_SQL),
}


# ---- content-defined chunking ---------------------------------------
_CDC_K, _CDC_DIV = 4, 16


def _q_cdc_chunks(spark, sf_dir):
    """Content-defined (Rabin-style) chunk table of the corpus: boundary
    where the k-token rolling hash ≡ 0 mod 16 — edit-stable chunk
    fingerprints, the dedup-grade chunker (fixed-size ``doc_chunks``
    shifts every chunk after an insertion; CDC re-chunks only the edit's
    neighborhood)."""
    from ..functions.text import cdc_chunks

    return cdc_chunks(docs(spark, sf_dir), k=_CDC_K, divisor=_CDC_DIV)


def _q_cdc_dedup(spark, sf_dir):
    """One-row chunk-level dedup summary over the CDC table: total vs
    distinct chunk fingerprints and the duplicated share — the number a
    chunk-store sizing decision reads. Ratio is one integer division."""
    from ..functions.text import cdc_chunks

    ch = cdc_chunks(docs(spark, sf_dir), k=_CDC_K, divisor=_CDC_DIV)
    return ch.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("chunk_fp").alias("n_distinct_fp"),
    ).select(
        "n_chunks",
        "n_distinct_fp",
        (
            F.lit(1.0)
            - F.col("n_distinct_fp").cast("double") / F.col("n_chunks")
        ).alias("dup_ratio"),
    )


def _cdc_ctes() -> str:
    from ..functions.hashing import FP_A, P, token_id_sql
    from .pipeline import _TOK_CTE

    terms = " + ".join(
        f"({pow(FP_A, j, P)} * "
        + ("tid" if j == 0 else f"lead(tid, {j}) OVER wdoc")
        + f") % {P}"
        for j in range(_CDC_K)
    )
    return (
        _TOK_CTE
        + f"""
, kt AS MATERIALIZED (
  SELECT doc_id, pos, {token_id_sql("token")} AS tid FROM tok
)
, kg AS MATERIALIZED (
  SELECT doc_id, pos, tid, ({terms}) % {P} AS kh
  FROM kt WINDOW wdoc AS (PARTITION BY doc_id ORDER BY pos)
)
, cb AS MATERIALIZED (
  SELECT doc_id, pos, tid,
         sum(CASE WHEN kh IS NOT NULL AND (kh % {P}) % {_CDC_DIV} = 0
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS chunk_raw
  FROM kg
)
, cl AS MATERIALIZED (
  SELECT doc_id, chunk_raw, pos, tid,
         pos - min(pos) OVER (PARTITION BY doc_id, chunk_raw) + 1 AS local
  FROM cb
)
, ch AS MATERIALIZED (
  SELECT doc_id, chunk_raw,
         CAST(min(pos) AS BIGINT) AS start_pos,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum((local * tid) % {P}) % {P} AS BIGINT) AS chunk_fp
  FROM cl GROUP BY doc_id, chunk_raw
)"""
    )


QUERIES["doc_cdc_chunks"] = (
    _q_cdc_chunks,
    _cdc_ctes()
    + """
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos) - 1
            AS BIGINT) AS chunk_idx,
       start_pos, n_tokens, chunk_fp
FROM ch
""",
)

QUERIES["doc_cdc_dedup"] = (
    _q_cdc_dedup,
    _cdc_ctes()
    + """
SELECT CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT chunk_fp) AS BIGINT) AS n_distinct_fp,
       1.0 - CAST(count(DISTINCT chunk_fp) AS DOUBLE) / count(*) AS dup_ratio
FROM ch
""",
)


# ---- probe ROC-AUC ---------------------------------------------------
def _q_logreg_auc(spark, sf_dir):
    """Exact tie-aware ROC-AUC of the linear probe — the threshold-free
    separability eval next to emb_logreg_acc (margins rounded to 1e-6
    before ranking so both engines form identical tie groups)."""
    from ..operators.linear_probe import logreg_probe_auc

    register(spark, sf_dir)
    return logreg_probe_auc(spark.table("embeddings"))


def _logreg_auc_sql():
    from ..operators.linear_probe import logreg_auc_oracle_sql

    return logreg_auc_oracle_sql()


QUERIES["emb_logreg_auc"] = (_q_logreg_auc, _logreg_auc_sql())


# ---- incremental PageRank replay (the PEM headline, driver-oracled) --
def _q_pagerank_incremental(spark, sf_dir):
    """Warm-start PageRank replay over 3 synthetic arrival buckets
    (ts = src % 3) — the reference's partial-execution headline
    (``incremental/gray_incremental.py``, entry point 3): each bucket
    re-converges from the previous fixpoint with delta-restricted
    supersteps instead of recomputing from scratch. With tol=1e-9 the
    final warm-started fixpoint and the batch fixpoint are both ≪ the
    round-6 grid away from the true solution, so the SAME deep
    recursive-CTE oracle as ``pagerank_converged`` checks the entire
    warm-start/replay machinery end-to-end."""
    from ..operators.incremental import incremental_pagerank
    from ._common import graph_nparts

    e = edges(spark, sf_dir).withColumn("ts", (F.col("src") % 3).cast("int"))
    res = incremental_pagerank(
        spark, e, base_steps=1, tol=1e-9,
        num_partitions=graph_nparts(spark, sf_dir),
    )
    return res.state.select("id", F.round("rank", 6).alias("rank6"))


def _pagerank_incremental_sql() -> str:
    from .graphq import _with_g
    from ._common import G_PARTS_SQL

    return _with_g(
        """
        , verts AS (SELECT DISTINCT src AS id FROM sym)
        , deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src)
        , nn AS (SELECT count(*) AS c FROM verts)
        , pr(iter, id, r) AS (
            SELECT 0, id, 1.0 / (SELECT c FROM nn) FROM verts
            UNION ALL
            SELECT p.iter + 1, e.dst,
                   0.15 / (SELECT c FROM nn) + 0.85 * sum(p.r / d.d)
            FROM pr p JOIN sym e ON e.src = p.id JOIN deg d ON d.src = p.id
            WHERE p.iter < 160
            GROUP BY p.iter, e.dst
        )
        SELECT id, round(r, 6) AS rank6 FROM pr WHERE iter = 160
        """,
        G_PARTS_SQL,
        recursive=True,
    )


QUERIES["pagerank_incremental_replay"] = (
    _q_pagerank_incremental, _pagerank_incremental_sql()
)


# ---- co-citation / bibliographic coupling ----------------------------
def _q_cocitation(spark, sf_dir):
    """Directed common-neighbor statistics of the line-sequence digraph:
    co-citation (parts that later lines of the same orders both follow)
    and bibliographic coupling (parts both followed by the same later
    parts) — the Small/Kessler pair, exact-integer oracled."""
    from ..operators.metrics import cocitation_coupling

    return cocitation_coupling(edges(spark, sf_dir, _G_SEQ_SQL), min_count=2)


QUERIES["graph_cocitation"] = (
    _q_cocitation,
    f"""
WITH g AS ({_G_SEQ_SQL})
, e AS (SELECT DISTINCT src, dst FROM g WHERE src <> dst)
, cocit AS (
    SELECT x.dst AS a, y.dst AS b, CAST(count(*) AS BIGINT) AS cocitation
    FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst GROUP BY 1, 2
)
, coup AS (
    SELECT x.src AS a, y.src AS b, CAST(count(*) AS BIGINT) AS coupling
    FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src GROUP BY 1, 2
)
SELECT coalesce(c.a, k.a) AS a, coalesce(c.b, k.b) AS b,
       CAST(coalesce(c.cocitation, 0) AS BIGINT) AS cocitation,
       CAST(coalesce(k.coupling, 0) AS BIGINT) AS coupling
FROM cocit c FULL OUTER JOIN coup k ON c.a = k.a AND c.b = k.b
WHERE coalesce(c.cocitation, 0) >= 2 OR coalesce(k.coupling, 0) >= 2
""",
)


# ---- time-respecting earliest arrival --------------------------------
# temporal edge instances: the line-sequence digraph stamped with the
# order's month index — every (src, dst, month) occurrence is kept
# (repeat co-occurrences at later months are new traversal windows)
_G_TEMPORAL_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst,
       CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) AS ts
FROM lineitem a
JOIN lineitem b ON a.l_orderkey = b.l_orderkey
               AND a.l_linenumber < b.l_linenumber
               AND a.l_partkey <> b.l_partkey
JOIN orders o ON o.o_orderkey = a.l_orderkey
"""

_EA_ORACLE_ITERS = 40  # kernel converges in ≪ this on every test graph
                       # (dense co-occurrence: temporal diameter ~ a few)


def _q_earliest_arrival(spark, sf_dir):
    """Earliest-arrival times from the 3 smallest source parts over the
    month-stamped sequence digraph — time-respecting reachability (an
    edge is traversable only at-or-after the walker's arrival), the
    temporal-graph analogue of SSSP the snapshot replay ring can't
    express. Oracled by a bounded per-level min-merge recursive CTE
    (same dominance argument as the kernel's frontier restriction)."""
    from ..operators.temporal import earliest_arrival
    from ._common import graph_nparts

    te = edges(spark, sf_dir, _G_TEMPORAL_SQL)
    seeds = [
        r.src for r in
        te.select("src").distinct().orderBy("src").limit(3).collect()
    ]
    res = earliest_arrival(
        spark, te, seeds, num_partitions=graph_nparts(spark, sf_dir)
    )
    assert res.converged and res.supersteps < _EA_ORACLE_ITERS
    return res.arrivals.select("id", "arrival")


QUERIES["graph_earliest_arrival"] = (
    _q_earliest_arrival,
    f"""
WITH RECURSIVE te AS ({_G_TEMPORAL_SQL})
, seeds AS (SELECT DISTINCT src AS id FROM te ORDER BY id LIMIT 3)
, ea(iter, id, t) AS (
    SELECT 0, id, CAST(0 AS BIGINT) FROM seeds
    UNION ALL
    SELECT s.iter + 1, e.dst, min(e.ts)
    FROM ea s JOIN te e ON e.src = s.id AND e.ts >= s.t
    WHERE s.iter < {_EA_ORACLE_ITERS}
    GROUP BY s.iter, e.dst
)
SELECT id, CAST(min(t) AS BIGINT) AS arrival FROM ea GROUP BY id
""",
)


# ---- month-over-month edge churn -------------------------------------
def _q_monthly_churn(spark, sf_dir):
    """Snapshot churn of the temporal sequence digraph: for each pair of
    consecutive observed months, the edge-set overlap (exact counts +
    Jaccard) — the month-over-month drift report a temporal link graph
    is monitored by (crawl-to-crawl link stability). The per-month edge
    sets stay distributed; only the month-cardinality summary (≤ ~72
    rows) passes through the ordering window, and the common-edge count
    is one self-equi-join on (src, dst, next-month)."""
    te = edges(spark, sf_dir, _G_TEMPORAL_SQL)
    per_m = te.groupBy("ts").agg(F.count("*").alias("n_edges"))
    w = Window.orderBy("ts")
    pairs = per_m.select(
        "ts",
        "n_edges",
        F.lead("ts").over(w).alias("ts2"),
        F.lead("n_edges").over(w).alias("n_edges2"),
    ).where(F.col("ts2").isNotNull())
    nxt = pairs.select("ts", "ts2")
    common = (
        te.join(nxt, "ts")
        .join(
            te.select(
                F.col("src"), F.col("dst"), F.col("ts").alias("ts2")
            ),
            ["src", "dst", "ts2"],
        )
        .groupBy("ts")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(common, "ts", "left")
        .select(
            "ts",
            "ts2",
            "n_edges",
            "n_edges2",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / (F.col("n_edges") + F.col("n_edges2") - F.coalesce("n_common", F.lit(0)))
            ).alias("jaccard"),
        )
    )


QUERIES["graph_monthly_churn"] = (
    _q_monthly_churn,
    f"""
WITH te AS ({_G_TEMPORAL_SQL})
, per_m AS (
    SELECT ts, CAST(count(*) AS BIGINT) AS n_edges FROM te GROUP BY ts
)
, pairs AS (
    SELECT ts, n_edges,
           lead(ts) OVER (ORDER BY ts) AS ts2,
           lead(n_edges) OVER (ORDER BY ts) AS n_edges2
    FROM per_m QUALIFY ts2 IS NOT NULL
)
, common AS (
    SELECT p.ts, CAST(count(*) AS BIGINT) AS n_common
    FROM pairs p
    JOIN te a ON a.ts = p.ts
    JOIN te b ON b.ts = p.ts2 AND b.src = a.src AND b.dst = a.dst
    GROUP BY p.ts
)
SELECT p.ts, p.ts2, p.n_edges, p.n_edges2,
       CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce(c.n_common, 0) AS DOUBLE)
         / (p.n_edges + p.n_edges2 - coalesce(c.n_common, 0)) AS jaccard
FROM pairs p LEFT JOIN common c ON c.ts = p.ts
""",
)


# ---- SimRank (second iteration, seed pairs) ---------------------------
def _q_simrank2(spark, sf_dir):
    """Second-iteration SimRank for all pairs over the 8 top-in-degree
    vertices of the line-sequence digraph — the recursive "referenced by
    similar pages" measure, computed through the exact inner-product
    factorization in operators/simrank.py (no neighborhood cross
    product, no O(V^2) state)."""
    from ..operators.simrank import simrank_pairs

    return simrank_pairs(edges(spark, sf_dir, _G_SEQ_SQL), n_seeds=8)


QUERIES["graph_simrank2"] = (
    _q_simrank2,
    f"""
WITH g0 AS ({_G_SEQ_SQL})
, e AS (SELECT DISTINCT src, dst FROM g0 WHERE src <> dst)
, indeg AS (SELECT dst AS id, count(*) AS d FROM e GROUP BY dst)
, seeds AS (SELECT id FROM indeg ORDER BY d DESC, id LIMIT 8)
, ia AS (SELECT e.dst AS a, e.src AS u FROM e JOIN seeds s ON s.id = e.dst)
, na AS (SELECT a, count(*) AS n FROM ia GROUP BY a)
, wu AS (SELECT ia.a, ia.u, CAST(1 AS DOUBLE) / indeg.d AS inv_d
         FROM ia JOIN indeg ON indeg.id = ia.u)
, pr AS (SELECT x.a AS a, y.a AS b, CAST(count(*) AS BIGINT) AS common
         FROM ia x JOIN ia y ON x.u = y.u AND x.a < y.a GROUP BY 1, 2)
, dg AS (SELECT x.a AS a, y.a AS b, sum(x.inv_d) AS diag
         FROM wu x JOIN ia y ON x.u = y.u AND x.a < y.a GROUP BY 1, 2)
, gt AS (SELECT w.a, e.src AS w, sum(w.inv_d) AS g
         FROM wu w JOIN e ON e.dst = w.u GROUP BY 1, 2)
, dt AS (SELECT x.a AS a, y.a AS b, sum(x.g * y.g) AS dot
         FROM gt x JOIN gt y ON x.w = y.w AND x.a < y.a GROUP BY 1, 2)
, ap AS (SELECT s1.id AS a, s2.id AS b FROM seeds s1 JOIN seeds s2 ON s1.id < s2.id)
SELECT ap.a, ap.b,
       CAST(xa.n AS BIGINT) AS na, CAST(xb.n AS BIGINT) AS nb,
       CAST(coalesce(pr.common, 0) AS BIGINT) AS common,
       round(CAST(0.8 AS DOUBLE) * coalesce(pr.common, 0) / (xa.n * xb.n), 6) AS s1,
       round(CAST(0.8 AS DOUBLE) / (xa.n * xb.n)
             * (coalesce(pr.common, 0)
                + CAST(0.8 AS DOUBLE)
                  * (coalesce(dt.dot, CAST(0 AS DOUBLE))
                     - coalesce(dg.diag, CAST(0 AS DOUBLE)))), 6) AS s2
FROM ap
JOIN na xa ON xa.a = ap.a
JOIN na xb ON xb.a = ap.b
LEFT JOIN pr ON pr.a = ap.a AND pr.b = ap.b
LEFT JOIN dg ON dg.a = ap.a AND dg.b = ap.b
LEFT JOIN dt ON dt.a = ap.a AND dt.b = ap.b
""",
)


# ---- minimum spanning forest (Borůvka) --------------------------------
# weighted sparse co-occurrence graph: w = number of shared orders
_G_SPARSE_W_SQL = """
SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(count(*) AS BIGINT) AS w
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
WHERE a.l_orderkey % 50 = 0
GROUP BY 1, 2
"""

_MSF_CC_ITERS = 50


def _q_msf(spark, sf_dir):
    """Per-component minimum-spanning-forest summary of the weighted
    sparse graph: component (min vertex id), vertex count, forest edge
    count (= n-1), and total forest weight — tie-independent because
    every MSF shares the same weight multiset. Borůvka rounds
    (operators/msf.py); the oracle recovers the same totals through the
    percolation identity Σ w_i (c_{i-1} - c_i) over the dataset's two
    weight levels, so the Spark side guards that precondition."""
    from pyspark.sql import functions as F

    from ..operators.msf import minimum_spanning_forest
    from ._common import graph_nparts

    e = edges(spark, sf_dir, _G_SPARSE_W_SQL)
    mx = e.agg(F.max("w")).collect()[0][0]
    if mx > 2:
        raise RuntimeError(
            f"graph_msf oracle assumes weight levels {{1,2}}; found max w={mx} "
            "— extend the oracle's percolation levels"
        )
    res = minimum_spanning_forest(
        spark, e, num_partitions=graph_nparts(spark, sf_dir)
    )
    assert res.converged
    sizes = res.components.groupBy("comp").agg(
        F.count("*").cast("bigint").alias("n_vertices")
    )
    fe = (
        res.forest.join(
            res.components.withColumnRenamed("id", "a"), "a"
        )
        .groupBy("comp")
        .agg(
            F.count("*").cast("bigint").alias("n_edges"),
            F.sum("w").cast("bigint").alias("total_weight"),
        )
    )
    return sizes.join(fe, "comp").select(
        "comp", "n_vertices", "n_edges", "total_weight"
    )


QUERIES["graph_msf"] = (
    _q_msf,
    f"""
WITH RECURSIVE g AS ({_G_SPARSE_W_SQL})
, sym AS (SELECT src AS u, dst AS v, w FROM g
          UNION ALL SELECT dst, src, w FROM g)
, verts AS (SELECT DISTINCT u AS id FROM sym)
, ep AS (SELECT u, v FROM sym UNION ALL SELECT id, id FROM verts)
, cc(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.v, min(c.comp)
    FROM cc c JOIN ep e ON e.u = c.id
    WHERE c.iter < {_MSF_CC_ITERS}
    GROUP BY c.iter, e.v
)
, canon AS (SELECT id, comp FROM cc WHERE iter = {_MSF_CC_ITERS})
, ep1 AS (SELECT u, v FROM sym WHERE w = 1
          UNION ALL SELECT id, id FROM verts)
, cc1(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.v, min(c.comp)
    FROM cc1 c JOIN ep1 e ON e.u = c.id
    WHERE c.iter < {_MSF_CC_ITERS}
    GROUP BY c.iter, e.v
)
, canon1 AS (SELECT id, comp AS comp1 FROM cc1 WHERE iter = {_MSF_CC_ITERS})
, per AS (
    SELECT c.comp, CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(count(DISTINCT c1.comp1) AS BIGINT) AS c1
    FROM canon c JOIN canon1 c1 ON c1.id = c.id
    GROUP BY c.comp
)
SELECT comp, n_vertices,
       n_vertices - 1 AS n_edges,
       n_vertices + c1 - 2 AS total_weight
FROM per
""",
)
