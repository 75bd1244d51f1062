"""HITS (hubs & authorities) — directed link-analysis kernel.

The reference ranks pattern matches by seeded-RWR proximity
(``patternmatching/gray/rwr.py``); HITS is the complementary directed
link-analysis primitive a link-graph engine is expected to ship alongside
PageRank (same message-passing skeleton, two mutually-recursive scores).

Semantics (the spec the SQL oracle mirrors exactly):

* simple directed graph (parallel edges collapsed, self-loops dropped)
* simultaneous (Jacobi) power iteration::

      auth_t(v) = sum over edges (u,v) of hub_{t-1}(u)
      hub_t(u)  = sum over edges (u,v) of auth_{t-1}(v)

  for a fixed number of supersteps, starting from hub_0 = auth_0 = 1,
  with final L1 normalization (hub / sum(hub), auth / sum(auth)).
  Per-step normalization is deliberately folded into the final one —
  it only rescales the vectors, and omitting it keeps the recursive-CTE
  oracle a single aggregate per round.

Distributed plan: both score families ride ONE join + ONE aggregate per
superstep by rewriting the two mutual recursions over a static *bipartite
message graph*::

    bm = {(src,'h') -> (dst,'a'), (dst,'a') -> (src,'h')}  weight 1
       ∪ {(id,s) -> (id,s)}                                weight 0

and keeping the state long-format (id, side, val). The weight-0 self
messages keep every (id, side) row alive through the aggregate (a vertex
with no in-edges holds auth 0 instead of vanishing) — the same trick the
CC oracle uses for label carry. bm is hash-partitioned once and reused
every superstep; the message aggregate is repartition-then-sum pinned to
bm's layout (see pagerank._group_sum for why map-side combine on
~V-cardinality keys is the scale trap).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._superstep import loop_confs
from .graph import kernel_nparts, simple_edges


@dataclass
class HitsResult:
    scores: DataFrame  # (id BIGINT, hub DOUBLE, auth DOUBLE) — L1-normalized
    supersteps: int


def _message_graph(e: DataFrame) -> DataFrame:
    """Static bipartite message graph (fid, fs, tid, ts, w)."""
    fwd = e.select(
        F.col("src").alias("fid"), F.lit("h").alias("fs"),
        F.col("dst").alias("tid"), F.lit("a").alias("ts"),
        F.lit(1.0).alias("w"),
    )
    bwd = e.select(
        F.col("dst").alias("fid"), F.lit("a").alias("fs"),
        F.col("src").alias("tid"), F.lit("h").alias("ts"),
        F.lit(1.0).alias("w"),
    )
    ids = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    keep = ids.crossJoin(
        F.broadcast(
            ids.sparkSession.createDataFrame([("h",), ("a",)], "side STRING")
        )
    ).select(
        F.col("id").alias("fid"), F.col("side").alias("fs"),
        F.col("id").alias("tid"), F.col("side").alias("ts"),
        F.lit(0.0).alias("w"),
    )
    return fwd.unionByName(bwd).unionByName(keep)


def hits(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_iter: int = 8,
    num_partitions: int | None = None,
) -> HitsResult:
    """Fixed-iteration HITS over the directed simple graph of ``edges``."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = simple_edges(edges, directed=True)
    bm = _message_graph(e).repartition(num_partitions, "fid").persist()
    state = (
        bm.select(F.col("fid").alias("id"), F.col("fs").alias("side"))
        .distinct()
        .withColumn("val", F.lit(1.0))
        .localCheckpoint(eager=True)
    )
    # AQE + codegen off for the loop (see pagerank's loop note)
    with loop_confs(edges.sparkSession):
        for step in range(max_iter):
            msgs = bm.join(
                state.hint("shuffle_hash"),
                (bm["fid"] == state["id"]) & (bm["fs"] == state["side"]),
            ).select("tid", "ts", (F.col("val") * F.col("w")).alias("m"))
            state = (
                msgs.repartition(num_partitions, "tid", "ts")
                .groupBy(F.col("tid").alias("id"), F.col("ts").alias("side"))
                .agg(F.sum("m").alias("val"))
            )
            # truncate the iterative lineage each superstep (tiny state)
            state = state.localCheckpoint(eager=True)
    bm.unpersist()
    totals = state.groupBy("side").agg(F.sum("val").alias("s"))
    norm = state.join(F.broadcast(totals), "side").select(
        "id", "side", (F.col("val") / F.col("s")).alias("val")
    )
    wide = norm.groupBy("id").pivot("side", ["h", "a"]).agg(F.first("val"))
    return HitsResult(
        wide.select(
            "id", F.col("h").alias("hub"), F.col("a").alias("auth")
        ),
        max_iter,
    )


def _salsa_message_graph(e: DataFrame) -> DataFrame:
    """SALSA's stochastic message graph: the HITS bipartite layout with
    degree-normalized weights (fwd w = 1/outdeg(src), bwd w = 1/indeg(dst))
    plus the same weight-0 keep-alive self messages."""
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("idg"))
    fwd = e.join(outdeg, "src").select(
        F.col("src").alias("fid"), F.lit("h").alias("fs"),
        F.col("dst").alias("tid"), F.lit("a").alias("ts"),
        (F.lit(1.0) / F.col("od")).alias("w"),
    )
    bwd = e.join(indeg, "dst").select(
        F.col("dst").alias("fid"), F.lit("a").alias("fs"),
        F.col("src").alias("tid"), F.lit("h").alias("ts"),
        (F.lit(1.0) / F.col("idg")).alias("w"),
    )
    ids = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    keep = ids.crossJoin(
        F.broadcast(
            ids.sparkSession.createDataFrame([("h",), ("a",)], "side STRING")
        )
    ).select(
        F.col("id").alias("fid"), F.col("side").alias("fs"),
        F.col("id").alias("tid"), F.col("side").alias("ts"),
        F.lit(0.0).alias("w"),
    )
    return fwd.unionByName(bwd).unionByName(keep)


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_iter: int = 8,
    num_partitions: int | None = None,
) -> HitsResult:
    """Fixed-iteration SALSA (Lempel & Moran, WWW'00) — the stochastic
    sibling of HITS: each propagation divides by the sending side's degree,
    so hubs/authorities perform coupled random walks instead of raw
    mass accumulation (TKC-effect resistant).  Spec the oracle mirrors::

        auth_t(v) = sum over (u,v) of hub_{t-1}(u)  / outdeg(u)
        hub_t(u)  = sum over (u,v) of auth_{t-1}(v) / indeg(v)

    simultaneous (Jacobi) updates from hub_0 = auth_0 = 1, final L1
    normalization only.  Same one-join + one-aggregate superstep plan as
    ``hits`` — only the static message weights differ, so the scale shape
    (bm partitioned once, repartition-then-sum aggregate) is inherited."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = simple_edges(edges, directed=True)
    bm = _salsa_message_graph(e).repartition(num_partitions, "fid").persist()
    state = (
        bm.select(F.col("fid").alias("id"), F.col("fs").alias("side"))
        .distinct()
        .withColumn("val", F.lit(1.0))
        .localCheckpoint(eager=True)
    )
    with loop_confs(edges.sparkSession):
        for _ in range(max_iter):
            msgs = bm.join(
                state.hint("shuffle_hash"),
                (bm["fid"] == state["id"]) & (bm["fs"] == state["side"]),
            ).select("tid", "ts", (F.col("val") * F.col("w")).alias("m"))
            state = (
                msgs.repartition(num_partitions, "tid", "ts")
                .groupBy(F.col("tid").alias("id"), F.col("ts").alias("side"))
                .agg(F.sum("m").alias("val"))
            )
            state = state.localCheckpoint(eager=True)
    bm.unpersist()
    totals = state.groupBy("side").agg(F.sum("val").alias("s"))
    norm = state.join(F.broadcast(totals), "side").select(
        "id", "side", (F.col("val") / F.col("s")).alias("val")
    )
    wide = norm.groupBy("id").pivot("side", ["h", "a"]).agg(F.first("val"))
    return HitsResult(
        wide.select(
            "id", F.col("h").alias("hub"), F.col("a").alias("auth")
        ),
        max_iter,
    )
