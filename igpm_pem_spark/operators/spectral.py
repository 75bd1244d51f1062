"""Spectral-gap estimation for the random-walk matrix P = D^-1 A of an
undirected graph: |lambda_2| by DEFLATED power iteration.

The top eigenpair of P is (1, the all-ones vector) with left eigenvector
pi = d / sum(d); the second eigenvalue controls mixing (lazy-walk mixing
time ~ 1/(1 - lambda_2)) and expander quality — the number that says
whether a partitioner can cut the graph cheaply (small gap = strong
cluster structure, big gap = expander, cuts are hopeless). The engine's
LPA/Louvain/conductance rings measure found communities; this measures
whether communities exist to be found.

Power iteration with the known top eigenpair deflated: start from a
pinned parity vector, remove the pi-component once per round
(c = sum(pi * v); v <- P v - c * 1), after k rounds report
|lambda_2| ~ ||v_k|| / ||v_{k-1}||. Every round is ONE message join +
ONE scalar aggregate — the exact PageRank superstep shape (J2), so the
cost model and partitioning are the kernel's. The recurrence is fixed-
iteration and fully deterministic, so a DuckDB oracle replays it CTE by
CTE (the pca.py power-iteration discipline applied to a graph operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import kernel_nparts, simple_edges


def spectral_gap(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row (n_vertices, lambda2_abs6, gap6) after ``rounds`` deflated
    power-iteration steps on P = D^-1 A.

    v0(u) = +1 for odd u, -1 for even u (pinned, generic); per round the
    pi-component is removed BEFORE the multiply, so the iterate stays in
    the complement of the top eigenspace up to float noise that the next
    round's deflation re-removes. Caveat of any pinned start: on a graph
    whose automorphisms make the parity vector exactly orthogonal to the
    lambda_2 eigenvector (hand-built symmetric labelings), the iteration
    reports the next eigenvalue below — real corpora are never
    label-symmetric, and determinism (engine-replayable recurrence) is
    what the oracle contract needs."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    sym = (
        simple_edges(edges, directed=False)
        .repartition(num_partitions, "src")
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    deg = deg.localCheckpoint(eager=True)
    total_d = deg.agg(F.sum("d")).first()[0]  # = 2|E|, scalar probe

    from ._superstep import loop_confs

    v = deg.select("id", (F.when(F.col("id") % 2 == 1, 1.0).otherwise(-1.0)).alias("v"))
    prev_norm2 = None
    # loop_confs: per-round fresh plans (the deflation scalar is a new
    # literal each round) — skip the repeated Janino/AQE driver-serial
    # work, as every superstep loop does (see _superstep.loop_confs)
    with loop_confs(spark):
        for r in range(rounds):
            # deflate: c = sum(pi * v) with pi = d / total_d
            c = (
                v.join(deg, "id")
                .agg(F.sum(F.col("v") * F.col("d") / F.lit(float(total_d))))
                .first()[0]
            )
            v = v.select("id", (F.col("v") - F.lit(float(c))).alias("v"))
            if r == rounds - 1:
                prev_norm2 = v.agg(F.sum(F.col("v") * F.col("v"))).first()[0]
            # multiply: (P v)(x) = sum_{u -> x} v(u) / d(u)
            vmsg = (
                sym.join(v.withColumnRenamed("id", "src"), "src")
                .join(deg.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("v") / F.col("d")).alias("v"))
            )
            # vertices with no incoming message (none on a symmetrized
            # simple graph — every vertex has degree >= 1) would drop
            # out; keep the join inner and let the algebra stand
            v = vmsg.localCheckpoint(eager=False)
    norm2 = v.agg(F.sum(F.col("v") * F.col("v"))).first()[0]
    n_v = deg.count()
    lam = (norm2 / prev_norm2) ** 0.5 if prev_norm2 and prev_norm2 > 0 else 0.0
    return spark.createDataFrame(
        [(n_v, round(lam, 6), round(1.0 - lam, 6))],
        "n_vertices BIGINT, lambda2_abs6 DOUBLE, gap6 DOUBLE",
    )


def spectral_gap_oracle_sql(g_sql: str, rounds: int = 8) -> str:
    """DuckDB oracle replaying the identical deflated recurrence as
    unrolled CTEs (one v{t} + one scalar c{t} per round)."""
    parts = [
        f"WITH g AS ({g_sql})",
        ", sym AS (SELECT src, dst FROM g UNION ALL"
        "  SELECT dst AS src, src AS dst FROM g)",
        ", deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)",
        ", td AS (SELECT CAST(sum(d) AS DOUBLE) AS t FROM deg)",
        ", v0 AS MATERIALIZED (SELECT id,"
        "   CASE WHEN id % 2 = 1 THEN 1.0 ELSE -1.0 END AS v FROM deg)",
    ]
    for r in range(rounds):
        p, n = r, r + 1
        parts.append(
            f"""
, c{p} AS (SELECT sum(v.v * deg.d / (SELECT t FROM td)) AS c
           FROM v{p} v JOIN deg ON deg.id = v.id)
, w{p} AS MATERIALIZED (
    SELECT id, v - (SELECT c FROM c{p}) AS v FROM v{p})
, v{n} AS MATERIALIZED (
    SELECT e.dst AS id, sum(w.v / deg.d) AS v
    FROM sym e JOIN w{p} w ON w.id = e.src JOIN deg ON deg.id = e.src
    GROUP BY e.dst)
"""
        )
    last, prev = rounds, rounds - 1
    parts.append(
        f"""
, n_prev AS (SELECT sum(v * v) AS s FROM w{prev})
, n_last AS (SELECT sum(v * v) AS s FROM v{last})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
       round(sqrt((SELECT s FROM n_last) / (SELECT s FROM n_prev)), 6)
         AS lambda2_abs6,
       round(1.0 - sqrt((SELECT s FROM n_last) / (SELECT s FROM n_prev)), 6)
         AS gap6
"""
    )
    return "".join(parts)
