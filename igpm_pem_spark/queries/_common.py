"""Shared helpers for the query registry: parquet view registration and
the co-occurrence graph derivations used by the graph-kernel queries
(identical SQL text run by Spark and DuckDB)."""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# session -> sf_dir whose tables are currently registered as temp views.
# Re-running spark.read.parquet + createOrReplaceTempView for all 10
# tables costs ~0.6 s of driver-side schema/footer work per call — ~150 s
# across a 243-query registry sweep (measured r6) — and registration is
# pure METADATA: the views still scan the parquet fresh on every query,
# so skipping the re-registration caches no data and no results.
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)

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

SYM_SQL = "SELECT src, dst FROM g UNION ALL SELECT dst AS src, src AS dst FROM g"


def register(spark: SparkSession, sf_dir: str) -> None:
    if _REGISTERED.get(spark) == sf_dir:
        return
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
    _REGISTERED[spark] = sf_dir


def edges(spark: SparkSession, sf_dir: str, sql: str = G_PARTS_SQL) -> DataFrame:
    register(spark, sf_dir)
    return spark.sql(sql)


def _path_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    return os.path.getsize(path) if os.path.exists(path) else 0


def graph_nparts(spark: SparkSession, sf_dir: str, floor: int = 4) -> int:
    """Input-proportional shuffle width for the iterative graph kernels.

    Sizing a superstep's shuffle to the input is the same rule in both
    directions: at 100 TB the source-table stats push the width into the
    thousands; at sf0.01 they pull it down to a handful, because a
    32-task shuffle over a ~100k-edge graph is pure per-task scheduling
    overhead repeated every superstep (measured: the convergence-depth
    kernels spend >2/3 of sf0.01 wall on task dispatch at the session
    default of 32). The proxy is the lineitem parquet footprint — the
    co-occurrence graphs all derive from it, it is known without running
    a job (file metadata, exactly what a catalog provides at scale), and
    ~1 MiB of source parquet ≈ 120k derived edges ≈ one healthy
    iterative-shuffle partition at this record width. Clamped to
    [floor, defaultParallelism]: never below a sane parallel floor,
    never above the core count a local session can use."""
    size = _path_bytes(os.path.join(sf_dir, "lineitem.parquet"))
    cap = max(floor, spark.sparkContext.defaultParallelism)
    return max(floor, min(cap, size >> 20))


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir)
    return spark.table("documents")


def emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir)
    return spark.table("embeddings")
