"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()``  — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.

Graph kernels run over two edge tables derived deterministically from the
driver's parquet (FIXTURES.md §6), with the SAME derivation text in Spark
SQL and DuckDB SQL:

* ``g_parts`` — part co-occurrence graph (parts linked when they share an
  order): dense, skewed; drives degree/pagerank/LPA/triangles.
* ``g_sparse`` — co-occurrence restricted to orders with orderkey % 50 == 0:
  forest-ish, many components; drives connected-components checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# --- shared graph derivations (identical text in Spark SQL & DuckDB) ----
G_PARTS_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

G_SPARSE_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
WHERE a.l_orderkey % 50 = 0
"""

# symmetrized adjacency (both directions), used by oracle SQL
_SYM = "SELECT src, dst FROM g UNION ALL SELECT dst AS src, src AS dst FROM g"


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


def _edges(spark: SparkSession, sf_dir: str, sql: str = G_PARTS_SQL) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(sql)


# ------------------------------------------------------------------ entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: import-centrality ranking. Builds the part co-occurrence
    graph at sf0.001 and runs delta-mode PageRank to convergence."""
    from igpm_pem_spark.operators.pagerank import pagerank

    edges = _edges(spark, "/root/testdata/sf0.001")
    res = pagerank(spark, edges, tol=1e-6, max_iter=100, mode="delta", steps_per_commit=5)
    return res.ranks.orderBy(F.desc("rank"), F.asc("id")).limit(100)


# ---------------------------------------------------------------- queries
def _q_degree(spark, sf_dir):
    from igpm_pem_spark.operators.graph import degrees

    return degrees(_edges(spark, sf_dir)).select("id", "degree")


def _q_degree_distribution(spark, sf_dir):
    from igpm_pem_spark.operators.graph import degrees

    return (
        degrees(_edges(spark, sf_dir))
        .groupBy("degree")
        .agg(F.count("*").alias("n_vertices"))
    )


def _q_triangle_count(spark, sf_dir):
    from igpm_pem_spark.operators.triangles import triangle_list

    n = triangle_list(_edges(spark, sf_dir, G_SPARSE_SQL)).count()
    return spark.createDataFrame([(n,)], "n_triangles BIGINT")


def _q_star_count(spark, sf_dir):
    from igpm_pem_spark.operators.triangles import star_count

    n = star_count(_edges(spark, sf_dir, G_SPARSE_SQL), 4)
    return spark.createDataFrame([(n,)], "n_stars BIGINT")


def _q_connected_components(spark, sf_dir):
    from igpm_pem_spark.operators.components import connected_components

    res = connected_components(spark, _edges(spark, sf_dir, G_SPARSE_SQL))
    return res.components.select("id", "component")


def _q_component_sizes(spark, sf_dir):
    from igpm_pem_spark.operators.components import (
        component_sizes,
        connected_components,
    )

    res = connected_components(spark, _edges(spark, sf_dir, G_SPARSE_SQL))
    return component_sizes(res.components).select("component", "size")


def _q_pagerank_fixed8(spark, sf_dir):
    from igpm_pem_spark.operators.pagerank import pagerank

    res = pagerank(
        spark, _edges(spark, sf_dir), tol=0.0, max_iter=8, mode="exact"
    )
    return res.ranks.select("id", F.round("rank", 7).alias("rank7"))


def _q_label_propagation3(spark, sf_dir):
    from igpm_pem_spark.operators.labelprop import label_propagation

    res = label_propagation(spark, _edges(spark, sf_dir), max_iter=3)
    return res.labels.select("id", "label")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # graph kernels (SURVEY §2.4 A4/A5/A8, §2.3 J2/J5)
        "degree": _q_degree,
        "degree_distribution": _q_degree_distribution,
        "triangle_count": _q_triangle_count,
        "star_count": _q_star_count,
        "connected_components": _q_connected_components,
        "component_sizes": _q_component_sizes,
        "pagerank_fixed8": _q_pagerank_fixed8,
        "label_propagation3": _q_label_propagation3,
    }


# ----------------------------------------------------------------- oracles
def _with_g(body: str, g_sql: str = G_PARTS_SQL) -> str:
    return f"WITH g AS ({g_sql}), sym AS ({_SYM}) {body}"


def _with_g_recursive(body: str, g_sql: str) -> str:
    return f"WITH RECURSIVE g AS ({g_sql}), sym AS ({_SYM}) {body}"


_DEGREE_BODY = """
SELECT src AS id, count(*) AS degree FROM sym GROUP BY src
"""

_DEGREE_DIST_BODY = """
SELECT degree, count(*) AS n_vertices
FROM (SELECT src AS id, count(*) AS degree FROM sym GROUP BY src)
GROUP BY degree
"""

_TRIANGLE_BODY = """
SELECT count(*) AS n_triangles
FROM g e1 JOIN g e2 ON e1.dst = e2.src JOIN g e3
  ON e3.src = e1.src AND e3.dst = e2.dst
"""

_STAR_BODY = """
SELECT count(*) AS n_stars
FROM (SELECT src AS id, count(*) AS degree FROM sym GROUP BY src)
WHERE degree >= 4
"""

# hash-min CC: K synchronous rounds over sym+self-loops (min over
# neighbors-and-self); K=25 exceeds any plausible diameter here — the Spark
# side converges exactly, so equality also certifies diameter < K
_CC_BODY = """
, verts AS (SELECT DISTINCT src AS id FROM sym)
, ep AS (SELECT src, dst FROM sym UNION ALL SELECT id, id FROM verts)
, cc(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.dst, min(c.comp)
    FROM cc c JOIN ep e ON e.src = c.id
    WHERE c.iter < 25
    GROUP BY c.iter, e.dst
)
SELECT id, comp AS component FROM cc WHERE iter = 25
"""

_CC_SIZES_BODY = """
, verts AS (SELECT DISTINCT src AS id FROM sym)
, ep AS (SELECT src, dst FROM sym UNION ALL SELECT id, id FROM verts)
, cc(iter, id, comp) AS (
    SELECT 0, id, id FROM verts
    UNION ALL
    SELECT c.iter + 1, e.dst, min(c.comp)
    FROM cc c JOIN ep e ON e.src = c.id
    WHERE c.iter < 25
    GROUP BY c.iter, e.dst
)
SELECT comp AS component, count(*) AS size
FROM cc WHERE iter = 25 GROUP BY comp
"""

# 8 synchronous power-iteration rounds, alpha 0.85, uniform init; the
# co-occurrence graph is symmetric so there is no dangling mass
_PR_BODY = """
, verts AS (SELECT DISTINCT src AS id FROM sym)
, deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src)
, nn AS (SELECT count(*) AS c FROM verts)
, pr(iter, id, r) AS (
    SELECT 0, id, 1.0 / (SELECT c FROM nn) FROM verts
    UNION ALL
    SELECT p.iter + 1, e.dst,
           0.15 / (SELECT c FROM nn) + 0.85 * sum(p.r / d.d)
    FROM pr p JOIN sym e ON e.src = p.id JOIN deg d ON d.src = p.id
    WHERE p.iter < 8
    GROUP BY p.iter, e.dst
)
SELECT id, round(r, 7) AS rank7 FROM pr WHERE iter = 8
"""

# 3 unrolled synchronous LPA rounds: most-frequent neighbor label, ties to
# the smallest label (every vertex here has a neighbor)
_LPA_BODY = """
, l0 AS (SELECT DISTINCT src AS id, src AS label FROM sym)
, l1 AS (
    SELECT e.dst AS id, l.label
    FROM sym e JOIN l0 l ON l.id = e.src
    GROUP BY e.dst, l.label
    QUALIFY row_number() OVER (
        PARTITION BY e.dst ORDER BY count(*) DESC, l.label ASC) = 1
)
, l2 AS (
    SELECT e.dst AS id, l.label
    FROM sym e JOIN l1 l ON l.id = e.src
    GROUP BY e.dst, l.label
    QUALIFY row_number() OVER (
        PARTITION BY e.dst ORDER BY count(*) DESC, l.label ASC) = 1
)
, l3 AS (
    SELECT e.dst AS id, l.label
    FROM sym e JOIN l2 l ON l.id = e.src
    GROUP BY e.dst, l.label
    QUALIFY row_number() OVER (
        PARTITION BY e.dst ORDER BY count(*) DESC, l.label ASC) = 1
)
SELECT id, label FROM l3
"""


def oracle_sql() -> dict[str, str]:
    return {
        "degree": _with_g(_DEGREE_BODY),
        "degree_distribution": _with_g(_DEGREE_DIST_BODY),
        "triangle_count": _with_g(_TRIANGLE_BODY, G_SPARSE_SQL),
        "star_count": _with_g(_STAR_BODY, G_SPARSE_SQL),
        "connected_components": _with_g_recursive(_CC_BODY, G_SPARSE_SQL),
        "component_sizes": _with_g_recursive(_CC_SIZES_BODY, G_SPARSE_SQL),
        "pagerank_fixed8": _with_g_recursive(_PR_BODY, G_PARTS_SQL),
        "label_propagation3": _with_g(_LPA_BODY),
    }
