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
