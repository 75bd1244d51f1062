"""Triangle counting — canonical-edge join plan (J5 in SURVEY.md §2.3).

The reference uses ``nx.triangles`` as its per-step ground-truth pattern
metric (``patternmatching/gray/incremental/gray_incremental.py:193,201``)
and a triangle query graph as its flagship pattern (``gray.ini:9``). The
distributed plan is the classic two-join wedge enumeration over canonical
``a < b`` edges:

    wedges(a, c | a<b<c) = e(a,b) ⋈ e(b,c)
    triangles = wedges ⋈ e(a,c)              (existence join)

Ordering ``a < b < c`` ensures each triangle is enumerated exactly once.
At scale the ordered edge orientation halves the join input and bounds the
wedge explosion to low-degree endpoints (orienting edges from the
lower-degree vertex is a further classic refinement; the a<b orientation
is what the SQL oracle can mirror exactly, so that's the spec'd semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import canonical_undirected


def triangle_list(edges: DataFrame) -> DataFrame:
    """All triangles as (a, b, c) with a < b < c, each exactly once."""
    e = canonical_undirected(edges)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return wedges.join(e3, ["a", "c"]).select("a", "b", "c")


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count — equals ``sum(nx.triangles(g).values()) / 3``
    (the reference's oracle expression, ``gray_incremental.py:193``)."""
    return triangle_list(edges).count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) per vertex, matching ``nx.triangles(g)`` — every
    vertex of each (a,b,c) triangle is credited once. Vertices in no
    triangle get 0 via the left join against the vertex set."""
    tris = triangle_list(edges)
    credited = (
        tris.select(F.col("a").alias("id"))
        .unionByName(tris.select(F.col("b").alias("id")))
        .unionByName(tris.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    e = canonical_undirected(edges)
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts.join(credited, "id", "left").select(
        "id", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles")
    )


def star_count(edges: DataFrame, min_degree: int = 4) -> int:
    """Vertices with degree ≥ min_degree — the reference's "5-node star"
    ground-truth count (``gray_incremental.py:194,202``: degree ≥ 4)."""
    e = canonical_undirected(edges)
    deg = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    return deg.where(F.col("degree") >= min_degree).count()
