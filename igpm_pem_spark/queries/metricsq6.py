"""Seventh metrics ring: spectral gap of the random-walk matrix,
asymmetric n-gram containment, and sliding 7-day distinct actives —
each oracle-paired with dtype-exact DuckDB SQL.

The spectral gap (1 - |lambda_2| of P = D^-1 A) is the mixing-rate /
expander-quality number that says whether a partitioner CAN cut the
graph cheaply — the a-priori dual of the engine's measured
edge_cut_summary (the dense co-occurrence graph measures as an
expander, which is exactly why hash partitioning cuts ~75% of its
edges). Containment is Broder's asymmetric resemblance: it catches
copy-with-boilerplate pairs whose symmetric Jaccard sits below any
dedup threshold. WAU is the classic sliding-window distinct-actives
telemetry, computed exactly by day-offset expansion (7 rows per active
(user, day) — never a distinct-over-window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import G_PARTS_SQL, edges, graph_nparts, register
from .pipeline import _TOK_CTE, _band_union, _minhash_select


# ---- spectral gap -----------------------------------------------------------
SPECTRAL_ROUNDS = 8


def _q_spectral_gap(spark, sf_dir):
    """8-round deflated power iteration on the dense co-occurrence
    graph's random-walk matrix (operators/spectral.py) — the estimate is
    the recurrence's value, replayed exactly by the oracle."""
    from ..operators.spectral import spectral_gap

    return spectral_gap(
        spark, edges(spark, sf_dir, G_PARTS_SQL),
        rounds=SPECTRAL_ROUNDS,
        num_partitions=graph_nparts(spark, sf_dir),
    )


def _spectral_sql() -> str:
    from ..operators.spectral import spectral_gap_oracle_sql

    return spectral_gap_oracle_sql(G_PARTS_SQL, rounds=SPECTRAL_ROUNDS)


# ---- n-gram containment ------------------------------------------------------
def _q_containment(spark, sf_dir):
    """Copy-with-wrapper detection: LSH candidate pairs verified by
    exact asymmetric containment, kept when either side >= 0.5
    (operators/dedup.py::containment_pairs)."""
    from ..operators.dedup import containment_pairs
    from ._common import docs

    return containment_pairs(docs(spark, sf_dir), threshold=0.5)


_CONTAINMENT_SQL = (
    f"""
{_TOK_CTE},
sig AS (SELECT doc_id, {_minhash_select()} FROM dt GROUP BY doc_id),
bands AS ({_band_union()}),
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
         CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
         CAST(sa.sz AS BIGINT) AS sz_a,
         CAST(sb.sz AS BIGINT) AS sz_b,
         round(coalesce(i.n_inter, 0) / sa.sz, 6) AS cont_a6,
         round(coalesce(i.n_inter, 0) / sb.sz, 6) AS cont_b6
  FROM prs p JOIN sizes sa ON sa.doc_id = p.doc_a
             JOIN sizes sb ON sb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
) WHERE cont_a6 >= 0.5 OR cont_b6 >= 0.5
"""
)


# ---- sliding 7-day distinct actives ------------------------------------------
def _q_wau(spark, sf_dir):
    """Exact DAU + trailing-7-day WAU per observed day. A distinct user-
    day is expanded into the <= 7 window days it contributes to (one
    small generator join — 7x a relation ALREADY collapsed to distinct
    (user, day), never the raw events), then one count-distinct per day:
    no distinct-over-sliding-window, no re-scan per offset. Day emitted
    as an ISO string for portable hashing."""
    register(spark, sf_dir)
    ud = (
        spark.table("events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .localCheckpoint(eager=False)  # dedupe the plan: ud feeds 3 branches
    )
    days = ud.select("day").distinct()
    expanded = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        F.col("day").alias("aday"),
    ).select("user_id", F.expr("date_add(aday, off)").alias("day"))
    wau = (
        expanded.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").cast("long").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(F.col("day").cast("string").alias("day"), "dau", "wau")
    )


_WAU_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
days AS (SELECT DISTINCT day FROM ud),
expanded AS (
  SELECT u.user_id, u.day + CAST(o.range AS INT) AS day
  FROM ud u CROSS JOIN range(0, 7) o
),
wau AS (
  SELECT e.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau
  FROM expanded e JOIN days d ON d.day = e.day
  GROUP BY e.day
),
dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM ud GROUP BY day)
SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau
FROM dau d JOIN wau w ON w.day = d.day
"""


QUERIES = {
    "graph_spectral_gap": (_q_spectral_gap, _spectral_sql()),
    "doc_containment": (_q_containment, _CONTAINMENT_SQL),
    "rel_wau_sliding": (_q_wau, _WAU_SQL),
}
