"""Fifteenth metrics ring (round-5 session 10, final batch): the
degree–coreness correlation, the C4 rejection-reason breakdown, and the
JSON-property histogram over event payloads.

Three one-glance audits: does peripheral degree predict core depth here
(hub-dominated graphs say yes; layered meshes say no), WHICH cleaning
rule is actually dropping documents (a gate that rejects 40% for length
needs different action than one rejecting for repetition), and what the
opaque JSON props column actually contains (the F7 array/map/json
family exercised at query level, engine-portably)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import G_SPARSE_SQL, docs, edges, register
from .graphq import CORENESS_ORACLE_ROUNDS, _coreness_round, _with_g

QUERIES: dict = {}

# ---- degree-coreness correlation -------------------------------------


def _q_degree_core_corr(spark, sf_dir):
    """(n_vertices, r6): Pearson correlation of degree vs coreness over
    the sparse graph — all six sums exact BIGINTs, the correlation one
    fixed IEEE chain (both engines bit-identical before round 6). High
    r = degree is a usable cheap proxy for core depth; low r = the
    k-core structure carries information degree cannot see."""
    from ..operators.kcore import coreness_hindex
    from ._common import graph_nparts

    e = edges(spark, sf_dir, G_SPARSE_SQL)
    res = coreness_hindex(
        spark, e, num_partitions=graph_nparts(spark, sf_dir)
    )
    if not (res.converged and res.rounds <= CORENESS_ORACLE_ROUNDS):
        raise RuntimeError(
            f"coreness took {res.rounds} rounds; raise "
            f"CORENESS_ORACLE_ROUNDS to keep the oracle valid"
        )
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("d")
    )
    t = deg.join(res.coreness.select("id", F.col("coreness").alias("c")), "id")
    agg = t.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("d") * F.col("c")).cast("bigint").alias("sdc"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sdc").cast("double") - F.col("sd").cast("double") * F.col("sc").cast("double")
    dend = F.sqrt(n * F.col("sdd").cast("double") - F.col("sd").cast("double") * F.col("sd").cast("double"))
    denc = F.sqrt(n * F.col("scc").cast("double") - F.col("sc").cast("double") * F.col("sc").cast("double"))
    return agg.select(
        F.col("n").alias("n_vertices"),
        F.round(
            F.when((dend > 0) & (denc > 0), num / dend / denc), 6
        ).alias("r6"),
    )


_CORE_CORR_TAIL = f"""
, deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src)
, t AS (SELECT deg.d, CAST(cx.c AS BIGINT) AS c
        FROM deg JOIN c{CORENESS_ORACLE_ROUNDS} cx ON cx.id = deg.id)
, agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sd, CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(d * c) AS BIGINT) AS sdc,
         CAST(sum(d * d) AS BIGINT) AS sdd,
         CAST(sum(c * c) AS BIGINT) AS scc
  FROM t)
SELECT n AS n_vertices,
       round(CASE WHEN sqrt(CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd) > 0
                   AND sqrt(CAST(n AS DOUBLE) * scc - CAST(sc AS DOUBLE) * sc) > 0
             THEN (CAST(n AS DOUBLE) * sdc - CAST(sd AS DOUBLE) * sc)
                  / sqrt(CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)
                  / sqrt(CAST(n AS DOUBLE) * scc - CAST(sc AS DOUBLE) * sc)
             END, 6) AS r6
FROM agg
"""

QUERIES["graph_degree_core_corr"] = (
    _q_degree_core_corr,
    _with_g(
        ", c0 AS MATERIALIZED (SELECT src AS id, count(*) AS c FROM sym GROUP BY src)"
        + "".join(
            _coreness_round(k) for k in range(1, CORENESS_ORACLE_ROUNDS + 1)
        )
        + _CORE_CORR_TAIL,
        G_SPARSE_SQL,
    ),
)


# ---- C4 rejection-reason breakdown -----------------------------------
_C4_MIN_WORDS = 30


def _q_c4_breakdown(spark, sf_dir):
    """(reason, n_docs): how many documents violate each C4 rule —
    non-exclusive counts (a doc can fail several), plus total kept.
    The action-guiding telemetry behind the doc_c4_filter gate: a
    corpus failing mostly 'too_short' needs different sourcing than one
    failing 'repetition'. All integer compares on the flags relation."""
    from ..functions.text import c4_quality_flags

    f = c4_quality_flags(docs(spark, sf_dir), min_words=_C4_MIN_WORDS)
    checks = {
        "too_short": F.col("n_words") < _C4_MIN_WORDS,
        "words_too_short": F.col("total_chars") < 3 * F.col("n_words"),
        "words_too_long": F.col("total_chars") > 8 * F.col("n_words"),
        "repetition": F.col("max_word_freq") * 5 > F.col("n_words"),
        "low_diversity": F.col("n_distinct") * 10 < 3 * F.col("n_words"),
        "kept": F.col("keep"),
    }
    agg = f.agg(
        *[
            F.sum(cond.cast("long")).cast("bigint").alias(name)
            for name, cond in checks.items()
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("reason"), F.col(name).alias("n_docs"))
            for name in checks
        ]
    )
    return agg.select(F.explode(pairs).alias("kv")).select(
        "kv.reason", "kv.n_docs"
    )


_C4_BREAKDOWN_SQL = f"""
WITH xs AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ws,
         text
  FROM documents
),
st AS (
  SELECT doc_id,
         len(ws) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, t -> length(t))), 0) AS BIGINT)
           AS total_chars,
         coalesce(list_max(list_transform(list_distinct(ws),
             d -> len(list_filter(ws, t -> t = d)))), 0) AS max_word_freq,
         len(list_distinct(ws)) AS n_distinct,
         regexp_matches(text, '[.!?]\\s*$') AS ends_terminal
  FROM xs
),
fl AS (
  SELECT *,
         (n_words >= {_C4_MIN_WORDS}
          AND total_chars >= 3 * n_words AND total_chars <= 8 * n_words
          AND max_word_freq * 5 <= n_words
          AND n_distinct * 10 >= 3 * n_words) AS keep
  FROM st)
SELECT 'too_short' AS reason,
       CAST(sum(CASE WHEN n_words < {_C4_MIN_WORDS} THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM fl
UNION ALL SELECT 'words_too_short',
       CAST(sum(CASE WHEN total_chars < 3 * n_words THEN 1 ELSE 0 END) AS BIGINT) FROM fl
UNION ALL SELECT 'words_too_long',
       CAST(sum(CASE WHEN total_chars > 8 * n_words THEN 1 ELSE 0 END) AS BIGINT) FROM fl
UNION ALL SELECT 'repetition',
       CAST(sum(CASE WHEN max_word_freq * 5 > n_words THEN 1 ELSE 0 END) AS BIGINT) FROM fl
UNION ALL SELECT 'low_diversity',
       CAST(sum(CASE WHEN n_distinct * 10 < 3 * n_words THEN 1 ELSE 0 END) AS BIGINT) FROM fl
UNION ALL SELECT 'kept', CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) FROM fl
"""

QUERIES["doc_c4_breakdown"] = (_q_c4_breakdown, _C4_BREAKDOWN_SQL)


# ---- JSON-property histogram -----------------------------------------


def _q_props_k_histogram(spark, sf_dir):
    """(k_bucket, n_events): decade histogram of the integer 'k'
    property inside the opaque JSON props payload — the F7 json family
    at query level, engine-portably: get_json_object / ->> both return
    the raw digit string, the CAST to BIGINT is exact, and the decade
    fold is integer division (floor semantics on non-negatives)."""
    register(spark, sf_dir)
    ev = spark.table("events").select(
        F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )
    return (
        ev.where(F.col("k").isNotNull())
        .groupBy((F.col("k") - F.pmod("k", F.lit(10))).alias("k_bucket"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )


_PROPS_K_SQL = """
WITH ev AS (
  SELECT CAST(props->>'$.k' AS BIGINT) AS k FROM events
)
SELECT k - (k % 10) AS k_bucket, CAST(count(*) AS BIGINT) AS n_events
FROM ev WHERE k IS NOT NULL
GROUP BY 1
"""

QUERIES["rel_props_k_histogram"] = (_q_props_k_histogram, _PROPS_K_SQL)
