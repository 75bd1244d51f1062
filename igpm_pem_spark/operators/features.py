"""Graph-feature preparation — neighborhood aggregation of vertex
embeddings (the message-passing/GNN feature-prop primitive: each vertex
averages its neighbors' vectors), bridging the graph ring and the
embedding ring of the engine.

Scale shape: the vector join is one shuffle keyed on the neighbor id;
the elementwise mean runs at (vertex, position) granularity — hub
vertices fan their load across `dim` keys instead of concentrating on
one, which is exactly the salting a skewed degree distribution needs,
for free. Reassembly is an array_sort over collected (pos, avg) structs
— dim-bounded per group, never data-sized. No Python anywhere.

This is a single round of the same scatter-gather the PageRank kernel
runs (operators/pagerank.py J2 message-passing join); with the mean
replaced by a learned update it is one GNN layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import symmetrize


def neighbor_mean_embedding(
    edges: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, n_neighbors, mean_emb): per vertex, the elementwise mean of
    its (undirected) neighbors' embedding vectors. Vertices whose
    neighbors have no embedding row drop out (inner semantics); the
    neighbor count reflects only embedded neighbors, matching the mean's
    denominator.

    Assumes a fixed embedding dimension across rows (the embeddings-table
    contract): with ragged vectors the per-position mean would average
    only the vectors long enough to have that position, and n_neighbors
    (the max per-position count) would overstate the shorter positions'
    denominators."""
    sym = symmetrize(edges)
    vecs = emb.select(
        F.col(id_col).alias("dst"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # gather: neighbor vectors keyed to the receiving vertex
    msgs = sym.join(vecs, "dst").select(F.col("src").alias("id"), "v")
    # elementwise mean at (id, pos) granularity — dim-way spread of hub load
    by_pos = (
        msgs.select("id", F.posexplode("v").alias("pos", "val"))
        .groupBy("id", "pos")
        .agg(F.avg("val").alias("m"), F.count("*").alias("n"))
    )
    return (
        by_pos.groupBy("id")
        .agg(
            F.max("n").alias("n_neighbors"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("mean_emb"),
        )
    )


def class_separation(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding cohesion vs separation — the class-quality
    gate a labeled training corpus runs before a probe is worth fitting:
    ``(label, n_vecs, intra_cos6, max_inter_cos6, margin6)`` where
    intra is the mean cosine of each vector to its own label centroid,
    max_inter is the largest cosine between this label's centroid and
    any OTHER label's centroid, and margin = intra - max_inter (labels
    whose members hug their centroid less tightly than the centroid hugs
    a neighboring class are candidates for relabeling or dropping).

    Scale shape: centroids are a (label, pos) mean — the same dim-way
    spread of per-label load as neighbor_mean_embedding; the resulting
    centroid table is labels x dim rows (tiny at any corpus scale), so
    it broadcasts back to the vectors and the per-vector cosine is a
    zip_with/aggregate JVM expression with ZERO additional shuffle of
    the corpus. The inter-centroid max is a self-join of the tiny
    centroid table. One corpus scan, one dim-salted aggregate — this is
    the plan you'd want at 100 TB."""
    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    by_pos = (
        vecs.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("mu"))
    )
    cent = by_pos.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mu"))), lambda s: s["mu"]
        ).alias("c")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _norm(a):
        return F.sqrt(_dot(a, a))

    intra = (
        vecs.join(F.broadcast(cent), "label")
        .select(
            "label",
            (_dot(F.col("v"), F.col("c")) / (_norm(F.col("v")) * _norm(F.col("c")))).alias(
                "cos"
            ),
        )
        .groupBy("label")
        .agg(F.count("*").alias("n_vecs"), F.avg("cos").alias("intra"))
    )
    ca, cb = cent.alias("ca"), cent.alias("cb")
    inter = (
        ca.join(cb, F.col("ca.label") != F.col("cb.label"))
        .select(
            F.col("ca.label").alias("label"),
            (
                _dot(F.col("ca.c"), F.col("cb.c"))
                / (_norm(F.col("ca.c")) * _norm(F.col("cb.c")))
            ).alias("cos"),
        )
        .groupBy("label")
        .agg(F.max("cos").alias("max_inter"))
    )
    return intra.join(inter, "label").select(
        "label",
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.round("intra", 6).alias("intra_cos6"),
        F.round("max_inter", 6).alias("max_inter_cos6"),
        F.round(F.col("intra") - F.col("max_inter"), 6).alias("margin6"),
    )
