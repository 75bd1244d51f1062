"""Strongly connected components — min-label coloring (FW-BW-MIN).

WCC (``components.py``) ignores direction; directed link graphs (imports,
citations, follows) also need SCC. The classic distributed algorithm
(Orzan's coloring / FW-BW-MIN — the standard choice when you only have
message passing, e.g. Pregel-style systems) runs in phases over the
ALIVE subgraph:

1. **Color**: propagate ``color(v) = min(color(v), colors of in-neighbors)``
   along edge direction to fixpoint — each vertex ends with the smallest
   alive id that can reach it forward.
2. **Mark**: the pivot of color c is vertex c itself. Propagate a mark
   from each pivot BACKWARD, restricted to same-colored vertices, to
   fixpoint. Marked vertices of color c are mutually reachable with the
   pivot (forward via coloring, backward via marking) — exactly SCC(c).
3. Emit marked vertices (scc id = their color), remove them, repeat.

Every phase is the same frontier-restricted join+min-aggregate superstep
the WCC kernel runs (one shuffle per sweep, layout pinned to the
adjacency); phases shrink the alive set monotonically. Worst case (a long
path DAG) is O(V) phases — like every pivot-based SCC scheme — but each
phase then costs O(alive) only; cycle-rich graphs finish in a few
phases. ``max_phases`` guards the pathological case loudly.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._superstep import loop_confs
from .graph import kernel_nparts


@dataclass
class SccResult:
    components: DataFrame  # (id BIGINT, scc BIGINT) — scc = min member id
    phases: int
    supersteps: int
    converged: bool
    stats: list = field(default_factory=list)


def _min_prop_fix(
    state: DataFrame,
    adj: DataFrame,
    num_partitions: int,
    max_iter: int,
    unroll: int = 2,
) -> tuple[DataFrame, int]:
    """Run color(v) ← min(color(v), min over edges (u,v) of color(u)) to
    fixpoint, frontier-restricted. state: (id, color, changed).

    ``unroll`` sweeps share ONE job (the changed-count action is what
    materializes the lazy per-sweep checkpoints): on deep fixpoints the
    wall is dominated by per-job scheduling, not data, so cutting the
    job count nearly proportionally cuts the wall. Each sweep references
    state 3× (frontier, join left, compare), so every sweep truncates
    the logical plan with a lazy localCheckpoint — analysis stays linear
    in unroll and the checkpointed partitions are computed once inside
    the job. Measured at sf0.01: unroll 4 vs 2 is a wash (the trimmed
    phases' fixpoints are shallow, so wider blocks just add no-op
    sweeps) — 2 stays the default.
    Convergence detection is unaffected: a sweep over an unchanged state
    changes nothing, so "last sweep of the batch changed nothing" is
    still exactly the fixpoint test (at most unroll-1 no-op sweeps run)."""
    steps = 0
    while steps < max_iter:
        for _ in range(min(unroll, max_iter - steps)):
            frontier = state.where("changed").select(
                F.col("id").alias("src"), F.col("color").alias("cand")
            )
            raw = adj.join(frontier.hint("shuffle_hash"), "src").select("dst", "cand")
            msgs = (
                raw.repartition(num_partitions, "dst")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("cand").alias("cand"))
            )
            state = state.join(msgs, "id", "left").select(
                "id",
                F.least(
                    F.col("color"), F.coalesce(F.col("cand"), F.col("color"))
                ).alias("color"),
                (F.coalesce(F.col("cand"), F.col("color")) < F.col("color")).alias(
                    "changed"
                ),
            )
            steps += 1
            # per-sweep lazy checkpoint: each sweep references state 3×
            # (frontier, join left, compare), so an uncheckpointed chain
            # grows ~3^unroll in analysis — truncating per sweep keeps
            # plans linear and lets unroll rise past 2
            state = state.localCheckpoint(eager=False)
        if state.where("changed").count() == 0:
            return state, steps
    raise RuntimeError(f"min-propagation did not converge in {max_iter} sweeps")


def _trim(
    alive: DataFrame,
    fwd: DataFrame,
    max_sweeps: int,
) -> tuple[DataFrame, DataFrame | None, int]:
    """Parallel trim (the T of FW-BW-Trim, Slota/Rajamanickam/Madduri
    IPDPS'14): a vertex with zero in-degree or zero out-degree in the
    alive subgraph cannot lie on a cycle, so it is its own singleton SCC.
    Peel ALL such vertices each sweep; their removal exposes the next
    layer (chains/DAG periphery peel in depth-of-chain sweeps). Link
    graphs are mostly periphery — trimming empties the bulk of the vertex
    set for pennies before a single coloring fixpoint runs.

    Returns (alive', singletons(id, scc) or None, sweeps). Stops early at
    a fixpoint; ``max_sweeps`` only bounds the work (correctness never
    depends on trimming to completion — leftovers go through coloring)."""
    singles: DataFrame | None = None
    sweeps = 0
    # restrict the edge set to the alive subgraph ONCE, then shrink it
    # incrementally: each peel re-restricts the survivor edges, never the
    # full graph — per-sweep cost is O(remaining subgraph), not O(E)
    fa = (
        fwd.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .localCheckpoint(eager=False)
    )
    while sweeps < max_sweeps:
        # both degree flags in ONE shuffle: union the endpoint roles and
        # max-aggregate, instead of two distincts + a semi-join
        keep = (
            fa.select(F.col("src").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .unionByName(
                fa.select(F.col("dst").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i"))
            )
            .groupBy("id")
            .agg(F.max("o").alias("has_out"), F.max("i").alias("has_in"))
            .where((F.col("has_out") == 1) & (F.col("has_in") == 1))
            .select("id")
            .localCheckpoint(eager=False)
        )
        trimmed = alive.join(keep, "id", "left_anti").select(
            "id", F.col("id").alias("scc")
        )
        sweeps += 1
        # one job per peel: counting the trimmed layer materializes keep's
        # (and the shrunken edge set's) lazy checkpoints underneath it
        if trimmed.count() == 0:
            break
        # singles accumulate lazily — every input is checkpointed, so the
        # union plan stays shallow; one checkpoint after the loop
        singles = trimmed if singles is None else singles.unionByName(trimmed)
        alive = keep
        fa = (
            fa.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    if singles is not None:
        singles = singles.localCheckpoint(eager=True)
    return alive, singles, sweeps


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_phases: int = 50,
    max_iter: int = 200,
    num_partitions: int | None = None,
    trim_sweeps: int = 25,
) -> SccResult:
    """(id, scc) over the directed simple graph; scc = min member id
    (matching ``nx.strongly_connected_components`` up to labeling)."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    fwd = e.repartition(num_partitions, "src").persist()
    alive = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(num_partitions, "id")
        .localCheckpoint(eager=True)
    )

    done: DataFrame | None = None
    phases = supersteps = 0
    converged = False
    t0 = time.time()
    # AQE + codegen off for the whole FW-BW-Trim iteration (fresh
    # plans per sweep/phase — see pagerank's loop note)
    with loop_confs(spark):
        while phases < max_phases:
            # trim first, every phase: the initial periphery, then whatever
            # each extracted SCC's removal exposes
            alive, singles, s0 = _trim(alive, fwd, trim_sweeps)
            supersteps += s0
            if singles is not None:
                done = singles if done is None else done.unionByName(singles)
                done = done.localCheckpoint(eager=True)
            if alive.limit(1).count() == 0:
                converged = True
                break
            phases += 1
            # restrict both edge directions to the alive subgraph
            fa = (
                fwd.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
            ba = fa.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            # 1. forward min-coloring
            color0 = alive.select(
                "id", F.col("id").alias("color"), F.lit(True).alias("changed")
            ).localCheckpoint(eager=True)
            colored, s1 = _min_prop_fix(color0, fa, num_partitions, max_iter)
            supersteps += s1
            # 2. backward pivot marking within same color: encode "marked with
            # color c" as color value c, unmarked as null, and reuse min-prop
            # on the color-respecting backward edges
            same_color = (
                ba.join(
                    colored.select(F.col("id").alias("src"), F.col("color").alias("_cs")),
                    "src",
                )
                .join(
                    colored.select(F.col("id").alias("dst"), F.col("color").alias("_cd")),
                    "dst",
                )
                .where(F.col("_cs") == F.col("_cd"))
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            mark0 = colored.select(
                "id",
                F.when(F.col("id") == F.col("color"), F.col("color")).alias("m"),
                (F.col("id") == F.col("color")).alias("changed"),
            ).select(
                "id", F.coalesce(F.col("m"), F.lit(2**62)).alias("color"), "changed"
            ).localCheckpoint(eager=True)
            marked, s2 = _min_prop_fix(mark0, same_color, num_partitions, max_iter)
            supersteps += s2
            # marked < sentinel ⇒ pivot's color reached v backward within its
            # color class ⇒ v ∈ SCC(pivot). (min over marks is safe: within a
            # color class the only possible mark is the class's pivot color.)
            scc_now = marked.where(F.col("color") < F.lit(2**62)).select(
                "id", F.col("color").alias("scc")
            )
            done = scc_now if done is None else done.unionByName(scc_now)
            done = done.localCheckpoint(eager=True)
            alive = (
                alive.join(scc_now.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
    fwd.unpersist()
    if not converged and alive.limit(1).count() > 0:
        raise RuntimeError(
            f"SCC did not finish in {max_phases} phases — pathological "
            "pivot chain; raise max_phases"
        )
    result = SccResult(done, phases, supersteps, True)
    result.stats.append({"wall_sec": round(time.time() - t0, 3)})
    return result


def condensation_levels(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_levels: int = 200,
    num_partitions: int | None = None,
    scc_kwargs: dict | None = None,
) -> DataFrame:
    """(scc, level): longest-path layering of the SCC condensation DAG —
    the build/evaluation schedule of a directed link graph (an import
    graph's "compile level": everything at level L depends only on
    levels < L; cycles are collapsed to one schedulable unit first).

    level(c) = 0 for condensation sources, else 1 + max over predecessor
    components — computed by bulk max-propagation sweeps over the
    quotient edge set, which is ≤ the SCC count squared but in practice
    tiny next to the input graph (the expensive part, the SCC map, is
    the already-scale-shaped kernel above). Sweep count = DAG depth."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    comp = strongly_connected_components(
        spark, edges, num_partitions=num_partitions, **(scc_kwargs or {})
    ).components
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    q = (
        e.join(comp.select(F.col("id").alias("src"), F.col("scc").alias("a")), "src")
        .join(comp.select(F.col("id").alias("dst"), F.col("scc").alias("b")), "dst")
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
        .repartition(num_partitions, "a")
        .localCheckpoint(eager=True)
    )
    state = (
        comp.select(F.col("scc").alias("c"))
        .distinct()
        .select("c", F.lit(0).cast("int").alias("level"))
        .localCheckpoint(eager=True)
    )
    with loop_confs(spark):
        for _ in range(max_levels):
            msgs = (
                q.join(state.select(F.col("c").alias("a"), "level"), "a")
                .groupBy(F.col("b").alias("c"))
                .agg((F.max("level") + 1).alias("cand"))
            )
            nxt = (
                state.join(msgs, "c", "left")
                .select(
                    "c",
                    F.greatest(F.col("level"), F.coalesce(F.col("cand"), F.col("level")))
                    .cast("int")
                    .alias("level"),
                    (F.coalesce(F.col("cand"), F.lit(0)) > F.col("level")).alias("chg"),
                )
                .localCheckpoint(eager=False)
            )
            changed = nxt.where("chg").count()
            state = nxt.select("c", "level").localCheckpoint(eager=True)
            if changed == 0:
                return state.select(F.col("c").alias("scc"), "level")
    raise RuntimeError(
        f"condensation deeper than {max_levels} levels — raise max_levels"
    )
