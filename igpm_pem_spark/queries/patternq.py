"""Pattern-engine queries wired into the driver correctness gate: the
match_pattern join compiler runs against graphs derived from the driver's
parquet, and the DuckDB oracle recomputes the same subgraph counts with
plain joins — an independent check that query-graph compilation,
injectivity, and canonical dedup are right."""

from __future__ import annotations

from pyspark.sql import functions as F

from ._common import G_SPARSE_SQL, SYM_SQL, edges


def _graph(spark, sf_dir):
    e = edges(spark, sf_dir, G_SPARSE_SQL)
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .select(
            "id",
            F.lit("cyan").alias("label"),
            F.create_map().cast("map<string,string>").alias("props"),
        )
    )
    return verts, e.select("src", "dst", F.lit("yes").alias("label"))


def _q_pattern_triangle(spark, sf_dir):
    from ..plans.pattern import match_pattern, parse_query_args

    verts, e = _graph(spark, sf_dir)
    q = parse_query_args(
        "--vertex a b c --edge x:a:b y:b:c z:c:a "
        "--vertexlabel a:cyan b:cyan c:cyan --edgelabel x:yes y:yes z:yes"
    )
    n = match_pattern(spark, verts, e, q).count()
    return spark.createDataFrame([(n,)], "n_matches BIGINT")


def _q_pattern_wedge(spark, sf_dir):
    from ..plans.pattern import match_pattern, parse_query_args

    verts, e = _graph(spark, sf_dir)
    q = parse_query_args("--vertex a b c --edge x:a:b y:b:c")
    n = match_pattern(spark, verts, e, q).count()
    return spark.createDataFrame([(n,)], "n_matches BIGINT")


QUERIES = {
    # distinct triangles found by the pattern engine == plain 3-join count
    "pattern_triangle_match": (
        _q_pattern_triangle,
        f"""
        WITH g AS ({G_SPARSE_SQL})
        SELECT count(*) AS n_matches
        FROM g e1 JOIN g e2 ON e1.dst = e2.src JOIN g e3
          ON e3.src = e1.src AND e3.dst = e2.dst
        """,
    ),
    # distinct 2-edge paths (wedges, unordered endpoints, injective)
    "pattern_wedge_match": (
        _q_pattern_wedge,
        f"""
        WITH g AS ({G_SPARSE_SQL}), sym AS ({SYM_SQL})
        SELECT count(*) AS n_matches
        FROM sym e1 JOIN sym e2 ON e1.dst = e2.src AND e1.src < e2.dst
        """,
    ),
}
