"""k-truss decomposition — edge peeling by triangle support.

The cohesion notion one level up from k-core: the k-truss is the maximal
subgraph where every EDGE participates in ≥ k−2 triangles (so every edge
sits in a dense neighborhood, not just every vertex). Standard web/social
graph primitive for community cores and spam pruning; pairs with
``kcore.k_core`` as the engine's peeling family.

Loop shape (the same shrinking partial-execution discipline as k-core):
each round computes per-edge support with ONE wedge join over the
surviving canonical edges — triangle (a<b<c) credits all three of its
edges via an explode, never a 4-way join — then drops edges below
support k−2 and re-materializes. Work is O(Σ d(v)²) of the SURVIVING
subgraph per round and shrinks monotonically; rounds ≤ peeling depth.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import canonical_undirected, kernel_nparts
from ._superstep import loop_confs


def _edge_support(e: DataFrame) -> DataFrame:
    """(src, dst, sup) per canonical edge: number of triangles through it.
    Enumerate (a<b<c) triangles once, explode each into its three edges."""
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = wedges.join(e3, ["a", "c"])
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("c").alias("dst")),
                F.struct(F.col("a").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst")
    sup = tri_edges.groupBy("src", "dst").agg(F.count("*").alias("sup"))
    return e.join(sup, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce(F.col("sup"), F.lit(0)).alias("sup")
    )


@dataclass
class KTrussResult:
    edges: DataFrame  # (src, dst) canonical surviving edges
    rounds: int
    converged: bool
    dropped_per_round: list[int] = field(default_factory=list)


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 100,
    num_partitions: int | None = None,
) -> KTrussResult:
    """Peel edges with triangle support < k−2 until stable; equals the
    edge set of ``networkx.k_truss(g, k)`` (tests pin it)."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = (
        canonical_undirected(edges)
        .repartition(num_partitions, "src")
        .localCheckpoint(eager=True)
    )
    dropped: list[int] = []
    converged, rounds = False, 0
    # AQE + codegen off for the loop (see pagerank's loop note)
    with loop_confs(spark):
        while rounds < max_rounds:
            rounds += 1
            sup = _edge_support(e).persist()
            n_drop = sup.where(F.col("sup") < k - 2).count()
            dropped.append(int(n_drop))
            if n_drop == 0:
                sup.unpersist()
                converged = True
                break
            e = (
                sup.where(F.col("sup") >= k - 2)
                .select("src", "dst")
                .repartition(num_partitions, "src")
                .localCheckpoint(eager=True)
            )
            sup.unpersist()
    return KTrussResult(e, rounds, converged, dropped)


@dataclass
class TrussnessResult:
    trussness: DataFrame  # (src BIGINT, dst BIGINT, trussness BIGINT)
    rounds: int
    converged: bool
    resumed_from: int | None = None
    stats: list = field(default_factory=list)


def trussness_hindex(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_rounds: int = 50,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> TrussnessResult:
    """Full truss decomposition — trussness(e) for every edge at once —
    by local h-index iteration (Sariyüce, Seshadhri, Pinar, WWW'18 local
    nucleus decomposition; the edge-level sibling of
    ``kcore.coreness_hindex``):

        s_0(e)     = support(e)   (triangles through e)
        s_{t+1}(e) = min(s_t(e), H-index of {min(s_t(f), s_t(g))
                                  per triangle (e, f, g)})

    The sequence is monotone non-increasing with fixpoint trussness(e)−2,
    so the loop self-terminates and every round is bulk-synchronous over
    ALL edges — no sequential min-support peeling bottleneck. The
    triangle relation is enumerated ONCE (the graph never shrinks in a
    full decomposition) and checkpointed; each round is three equi-joins
    of the static triangle list against the edge state plus the same
    windowed H-index used by coreness — shuffle at (edge, distinct-ρ)
    granularity, never proportional to a hub's triangle count.

    With ``checkpoint_dir`` each round commits the (src, dst, s, changed)
    state + per-partition lineage rows through the shared LineageLog —
    the kernels' resumability discipline (the static triangle relation is
    re-derived on resume; only the iteration state is durable).
    """
    import time

    from pyspark.sql import Window

    from ..lineage import LineageLog
    from ._superstep import commit_and_stats, edge_partition_counts

    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = (
        canonical_undirected(edges)
        .repartition(num_partitions, "src", "dst")
        .localCheckpoint(eager=True)
    )
    # triangles a<b<c, enumerated once over canonical edges
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .select("a", "b", "c")
        .repartition(num_partitions, "a", "b")
        .localCheckpoint(eager=True)
    )
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("c").alias("dst")),
                F.struct(F.col("a").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst")
    sup = tri_edges.groupBy("src", "dst").agg(F.count("*").alias("s"))
    edge_parts = edge_partition_counts(tris)

    log = LineageLog(spark, checkpoint_dir)
    start_round, resumed_from = 0, None
    state: DataFrame | None = None
    if resume and checkpoint_dir:
        last = log.last_committed()
        if last is not None:
            state = log.load_state(last)
            start_round, resumed_from = last + 1, last
    if state is None:
        state = (
            e.join(sup, ["src", "dst"], "left")
            .select("src", "dst", F.coalesce(F.col("s"), F.lit(0)).alias("s"))
            .repartition(num_partitions, "src", "dst")
            .localCheckpoint(eager=True)
        )
    w = Window.partitionBy("src", "dst").orderBy(F.col("rho").desc())
    rounds, converged = start_round, False
    # AQE + codegen off for the loop (see pagerank's loop note)
    with loop_confs(spark):
        while rounds < max_rounds:
            t0 = time.time()
            rounds += 1
            sab = state.select(
                F.col("src").alias("a"), F.col("dst").alias("b"), F.col("s").alias("s_ab")
            )
            sbc = state.select(
                F.col("src").alias("b"), F.col("dst").alias("c"), F.col("s").alias("s_bc")
            )
            sac = state.select(
                F.col("src").alias("a"), F.col("dst").alias("c"), F.col("s").alias("s_ac")
            )
            tv = tris.join(sab, ["a", "b"]).join(sbc, ["b", "c"]).join(sac, ["a", "c"])
            rho = tv.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("a").alias("src"), F.col("b").alias("dst"),
                            F.least("s_bc", "s_ac").alias("rho"),
                        ),
                        F.struct(
                            F.col("b").alias("src"), F.col("c").alias("dst"),
                            F.least("s_ab", "s_ac").alias("rho"),
                        ),
                        F.struct(
                            F.col("a").alias("src"), F.col("c").alias("dst"),
                            F.least("s_ab", "s_bc").alias("rho"),
                        ),
                    )
                ).alias("x")
            ).select("x.src", "x.dst", "x.rho")
            cum = (
                rho.groupBy("src", "dst", "rho")
                .agg(F.count("*").alias("n"))
                .select("src", "dst", "rho", F.sum("n").over(w).alias("cum"))
            )
            h = cum.groupBy("src", "dst").agg(
                F.max(F.least(F.col("rho"), F.col("cum"))).alias("h")
            )
            new_state = state.select("src", "dst", F.col("s").alias("s_old")).join(
                h, ["src", "dst"], "left"
            ).select(
                "src", "dst",
                F.least(F.col("s_old"), F.coalesce(F.col("h"), F.lit(0))).alias("s"),
                (
                    F.least(F.col("s_old"), F.coalesce(F.col("h"), F.lit(0)))
                    != F.col("s_old")
                ).alias("changed"),
            )
            state, delta, _ = commit_and_stats(
                log, rounds - 1, new_state,
                F.col("changed").cast("double"), F.col("changed"), edge_parts, t0,
                partition_key=None, num_partitions=num_partitions,
            )
            if delta == 0.0:
                converged = True
                break
    result = TrussnessResult(
        state.select(
            "src", "dst", (F.col("s") + F.lit(2)).cast("long").alias("trussness")
        ),
        rounds,
        converged,
        resumed_from,
    )
    result.stats = log.stats
    return result
