"""Shared helpers for the query registry: parquet view registration and
the co-occurrence graph derivations used by the graph-kernel queries
(identical SQL text run by Spark and DuckDB)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

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
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


def edges(spark: SparkSession, sf_dir: str, sql: str = G_PARTS_SQL) -> DataFrame:
    register(spark, sf_dir)
    return spark.sql(sql)


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir)
    return spark.table("documents")


def emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    register(spark, sf_dir)
    return spark.table("embeddings")
