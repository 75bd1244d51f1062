"""Deterministic maximal matching — the handshake (local-dominant) kernel.

A matching is a set of edges no two of which share a vertex; a MAXIMAL
matching admits no further edge. It is the standard coarsening primitive
of multilevel graph partitioners — the reference partitions its data
graph with METIS (``subgraph/divide.py:8-30``), whose coarsening phase
contracts a maximal matching per level — and the classic building block
for distributed independent-set/coloring pipelines.

Distributed shape (handshake): give every edge a deterministic priority
(the repo's portable md5-prefix hash, so an independent SQL engine
reproduces every value); per round, each live vertex points at its
minimum-priority incident edge, and an edge whose BOTH endpoints point at
it is matched; matched vertices leave the graph. With hash (i.e.
effectively random) priorities the expected round count is O(log n) —
adversarial chains that starve id-ordered greedy matchings cannot form,
because priority order is uncorrelated with graph structure.

Every round is two shuffles (per-vertex argmin + handshake join) over the
LIVE edge set only, which shrinks geometrically; at 100 TB the first
round dominates and is a plain groupBy + join over the edge table. The
fixed-round form (``rounds=k``) is what the driver oracle checks — the
same k rounds unrolled in SQL — and ``converged`` reports whether the
matching is already maximal (no live edge left).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ._superstep import loop_confs
from .graph import canonical_undirected, kernel_nparts


def edge_priority(src=None, dst=None, salt: str = "match"):
    """Portable deterministic edge priority in [0, 16^15): md5-prefix of
    ``salt:src_dst`` — identical arithmetic in DuckDB (see
    ``edge_priority_sql``), same family as sampling.split_bucket."""
    src = F.col("src") if src is None else src
    dst = F.col("dst") if dst is None else dst
    s = F.concat(
        F.lit(salt + ":"), src.cast("string"), F.lit("_"), dst.cast("string")
    )
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def edge_priority_sql(src: str = "src", dst: str = "dst", salt: str = "match") -> str:
    return (
        f"(('0x' || substr(md5('{salt}:' || CAST({src} AS VARCHAR) || '_' || "
        f"CAST({dst} AS VARCHAR)), 1, 15))::BIGINT)"
    )


@dataclass
class MatchingResult:
    matched: DataFrame  # (src, dst, rnd) — canonical src<dst, 1-based round
    rounds: int
    converged: bool  # True when no live edge remained after the last round


def handshake_matching(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int = 8,
    salt: str = "match",
    num_partitions: int | None = None,
) -> MatchingResult:
    """Run ``rounds`` handshake rounds over the canonical simple graph and
    return the matched edges with the round each was matched in.

    Determinism: the per-vertex argmin orders by (priority, src, dst) — a
    total order even under hash collisions — so the result is a pure
    function of the edge set, independent of partitioning."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    live = (
        canonical_undirected(edges)
        .withColumn("h", edge_priority(salt=salt))
        .repartition(num_partitions, "src")
        .localCheckpoint(eager=True)
    )
    matched: DataFrame | None = None
    converged = False
    # loop_confs: per-round fresh plans repeat driver-serial
    # Janino/AQE work every round (see _superstep.loop_confs)
    with loop_confs(spark):
        for rnd in range(1, rounds + 1):
            sym = live.select(F.col("src").alias("v"), "src", "dst", "h").unionByName(
                live.select(F.col("dst").alias("v"), "src", "dst", "h")
            )
            w = Window.partitionBy("v").orderBy("h", "src", "dst")
            best = (
                sym.withColumn("rn", F.row_number().over(w))
                .where("rn = 1")
                .select("v", "src", "dst")
            )
            m = (
                best.where(F.col("v") == F.col("src"))
                .select("src", "dst")
                .join(
                    best.where(F.col("v") == F.col("dst")).select("src", "dst"),
                    ["src", "dst"],
                    "left_semi",
                )
                .withColumn("rnd", F.lit(rnd).cast("int"))
                .localCheckpoint(eager=True)  # also truncates the round's lineage
            )
            if m.isEmpty():
                converged = True
                break
            matched = m if matched is None else matched.unionByName(m)
            mv = m.select(F.col("src").alias("v")).unionByName(
                m.select(F.col("dst").alias("v"))
            )
            live = (
                live.join(mv, live.src == mv.v, "left_anti")
                .join(mv, live.dst == mv.v, "left_anti")
                .localCheckpoint(eager=True)
            )
            if live.isEmpty():
                converged = True
                break
    if matched is None:
        matched = spark.createDataFrame([], "src BIGINT, dst BIGINT, rnd INT")
    return MatchingResult(matched=matched, rounds=rounds, converged=converged)


def _matching_rounds_cte(g_sql: str, rounds: int, salt: str) -> str:
    """The WITH chain of ``rounds`` unrolled handshake rounds; exposes
    ``mall`` = all matched (src, dst, rnd) rows for the final SELECT."""
    h = edge_priority_sql(salt=salt)
    parts = [
        f"""WITH e0 AS MATERIALIZED (
  SELECT src, dst, {h} AS h FROM (
    SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM ({g_sql}) q WHERE src <> dst
  )
)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        # every CTE is MATERIALIZED: each round references the previous
        # round's relation several times, and inlining would re-evaluate
        # the whole chain per reference (exponential in rounds)
        parts.append(
            f"""
, b{i} AS MATERIALIZED (
  SELECT v, src, dst FROM (
    SELECT v, src, dst,
           row_number() OVER (PARTITION BY v ORDER BY h, src, dst) AS rn
    FROM (SELECT src AS v, src, dst, h FROM e{p}
          UNION ALL SELECT dst AS v, src, dst, h FROM e{p})
  ) WHERE rn = 1
)
, m{i} AS MATERIALIZED (
  SELECT u.src, u.dst, CAST({i} AS INT) AS rnd
  FROM (SELECT src, dst FROM b{i} WHERE v = src) u
  JOIN (SELECT src, dst FROM b{i} WHERE v = dst) w USING (src, dst)
)
, mv{i} AS MATERIALIZED (SELECT src AS v FROM m{i} UNION SELECT dst FROM m{i})
, e{i} AS MATERIALIZED (
  SELECT e.src, e.dst, e.h FROM e{p} e
  WHERE e.src NOT IN (SELECT v FROM mv{i})
    AND e.dst NOT IN (SELECT v FROM mv{i})
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM m{i}" for i in range(1, rounds + 1))
    parts.append(f"\n, mall AS MATERIALIZED (SELECT src, dst, rnd FROM ({union}))")
    return "".join(parts)


def matching_oracle_sql(g_sql: str, rounds: int = 8, salt: str = "match") -> str:
    """DuckDB SQL computing the identical matching: the same ``rounds``
    handshake rounds unrolled as CTE chains over the canonical graph."""
    return (
        _matching_rounds_cte(g_sql, rounds, salt)
        + "\nSELECT src, dst, rnd FROM mall"
    )


def coarsen_once(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int = 8,
    salt: str = "match",
    num_partitions: int | None = None,
) -> DataFrame:
    """One multilevel-coarsening level (the METIS move the reference
    delegates to ``subgraph/divide.py``): contract the handshake matching
    — every matched pair collapses into its min-id supervertex — and
    return the coarse canonical edge list (parallel edges merged, intra-
    supervertex edges dropped). Roughly halves the vertex set per level
    on non-degenerate graphs; iterating gives the multilevel hierarchy.

    Plan shape: the matching plus two broadcast-size joins of the edge
    table against the (tiny: ≤V/2 rows) contraction map — no extra
    shuffle beyond the final dedup."""
    m = handshake_matching(
        spark, edges, rounds=rounds, salt=salt, num_partitions=num_partitions
    ).matched
    # contraction map: both endpoints of a matched edge -> min endpoint
    cmap = m.select(
        F.col("dst").alias("v"), F.col("src").alias("canon")
    )  # src<dst canonical => min is src; src maps to itself
    e = canonical_undirected(edges)
    for side in ("src", "dst"):
        e = (
            e.join(cmap.withColumnRenamed("v", side), side, "left")
            .withColumn(side, F.coalesce("canon", F.col(side)))
            .drop("canon")
        )
    return (
        e.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def coarsen_oracle_sql(g_sql: str, rounds: int = 8, salt: str = "match") -> str:
    """DuckDB SQL of ``coarsen_once``: the matching CTE chain plus the
    same contraction projection."""
    return (
        _matching_rounds_cte(g_sql, rounds, salt)
        + """
, cmap AS (SELECT dst AS v, src AS canon FROM mall)
, ge AS (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM ({g}) q WHERE src <> dst
)
, mapped AS (
  SELECT coalesce(cs.canon, ge.src) AS src, coalesce(cd.canon, ge.dst) AS dst
  FROM ge LEFT JOIN cmap cs ON cs.v = ge.src LEFT JOIN cmap cd ON cd.v = ge.dst
)
SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
FROM mapped WHERE src <> dst
""".format(g=g_sql)
    )


def vertex_priority(id_col=None, salt: str = "mis"):
    """Portable per-vertex priority (md5-prefix of ``salt:id``)."""
    c = F.col("id") if id_col is None else id_col
    s = F.concat(F.lit(salt + ":"), c.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def vertex_priority_sql(id_sql: str = "id", salt: str = "mis") -> str:
    return (
        f"(('0x' || substr(md5('{salt}:' || CAST({id_sql} AS VARCHAR)), 1, 15))"
        f"::BIGINT)"
    )


def luby_mis(
    spark: SparkSession,
    edges: DataFrame,
    *,
    rounds: int = 8,
    salt: str = "mis",
    num_partitions: int | None = None,
) -> MatchingResult:
    """Luby's maximal independent set: per round, a live vertex whose
    (priority, id) is lexicographically below every live neighbor's joins
    the MIS; MIS vertices and their neighbors leave the graph. Expected
    O(log n) rounds with hash priorities; each round is one message
    shuffle (neighbor min) over the live edge set. The dual of
    ``handshake_matching`` — together they are the standard symmetry-
    breaking pair (coloring, scheduling, coarsening seeds).

    Returns MatchingResult with ``matched`` = (id, rnd) MIS members (the
    field name is shared with the matching kernel; rnd is the round the
    vertex entered the set)."""
    if num_partitions is None:
        num_partitions = kernel_nparts(edges)
    e = canonical_undirected(edges).repartition(num_partitions, "src")
    live_v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("p", vertex_priority(salt=salt))
        .localCheckpoint(eager=True)
    )
    live_e = e.localCheckpoint(eager=True)
    mis: DataFrame | None = None
    converged = False
    # loop_confs: per-round fresh plans repeat driver-serial
    # Janino/AQE work every round (see _superstep.loop_confs)
    with loop_confs(spark):
        for rnd in range(1, rounds + 1):
            sym = live_e.select(F.col("src").alias("v"), F.col("dst").alias("nbr")).unionByName(
                live_e.select(F.col("dst").alias("v"), F.col("src").alias("nbr"))
            )
            nbrp = sym.join(
                live_v.select(F.col("id").alias("nbr"), F.col("p").alias("pn")), "nbr"
            )
            minnbr = nbrp.groupBy(F.col("v").alias("id")).agg(
                F.min(F.struct("pn", "nbr")).alias("mn")
            )
            cand = (
                live_v.join(minnbr, "id", "left")
                .where(
                    F.col("mn").isNull()
                    | (F.struct(F.col("p").alias("pn"), F.col("id").alias("nbr")) < F.col("mn"))
                )
                .select("id")
                .withColumn("rnd", F.lit(rnd).cast("int"))
                .localCheckpoint(eager=True)
            )
            if cand.isEmpty():
                converged = True
                break
            mis = cand if mis is None else mis.unionByName(cand)
            rm = cand.select("id").unionByName(
                sym.join(cand.withColumnRenamed("id", "v").select("v"), "v", "left_semi")
                .select(F.col("nbr").alias("id"))
            ).distinct()
            live_v = live_v.join(rm, "id", "left_anti").localCheckpoint(eager=True)
            lv = live_v.select("id")
            live_e = (
                live_e.join(lv.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(lv.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
            if live_v.isEmpty():
                converged = True
                break
    if mis is None:
        mis = spark.createDataFrame([], "id BIGINT, rnd INT")
    return MatchingResult(matched=mis, rounds=rounds, converged=converged)


def mis_oracle_sql(g_sql: str, rounds: int = 8, salt: str = "mis") -> str:
    """DuckDB SQL of ``luby_mis``: the same rounds unrolled (every CTE
    MATERIALIZED — see matching_oracle_sql)."""
    p = vertex_priority_sql("id", salt)
    parts = [
        f"""WITH ge AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM ({g_sql}) q WHERE src <> dst
)
, v0 AS MATERIALIZED (
  SELECT id, {p} AS p FROM (
    SELECT src AS id FROM ge UNION SELECT dst FROM ge
  )
)
, e0 AS MATERIALIZED (SELECT src, dst FROM ge)"""
    ]
    for i in range(1, rounds + 1):
        q = i - 1
        parts.append(
            f"""
, mn{i} AS MATERIALIZED (
  SELECT s.v AS id, min(ROW(x.p, s.nbr)) AS mn
  FROM (SELECT src AS v, dst AS nbr FROM e{q}
        UNION ALL SELECT dst AS v, src AS nbr FROM e{q}) s
  JOIN v{q} x ON x.id = s.nbr
  GROUP BY s.v
)
, mis{i} AS MATERIALIZED (
  SELECT v.id, CAST({i} AS INT) AS rnd
  FROM v{q} v LEFT JOIN mn{i} m ON m.id = v.id
  WHERE m.id IS NULL OR ROW(v.p, v.id) < m.mn
)
, rm{i} AS MATERIALIZED (
  SELECT id FROM mis{i}
  UNION
  SELECT s.nbr AS id
  FROM (SELECT src AS v, dst AS nbr FROM e{q}
        UNION ALL SELECT dst AS v, src AS nbr FROM e{q}) s
  JOIN mis{i} m ON m.id = s.v
)
, v{i} AS MATERIALIZED (
  SELECT v.id, v.p FROM v{q} v WHERE v.id NOT IN (SELECT id FROM rm{i})
)
, e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{q} e
  WHERE e.src IN (SELECT id FROM v{i}) AND e.dst IN (SELECT id FROM v{i})
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM mis{i}" for i in range(1, rounds + 1))
    parts.append(f"\nSELECT id, rnd FROM ({union})")
    return "".join(parts)
