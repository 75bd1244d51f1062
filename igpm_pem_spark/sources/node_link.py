"""S1 — NetworkX node-link JSON graph source.

The reference loads graphs with ``json_graph.node_link_graph``
(``patternmatching/gray/incremental/query_call.py:24-33``). Shape:

    {"directed": bool, "multigraph": bool,
     "nodes": [{"id": .., "label": .., ...props}],
     "links": [{"source": .., "target": .., "label": .., "add": ..}]}

Returns (vertices, edges, directed): vertices(id, label, props MAP),
edges(src, dst, label, ts). Parallel edges stay as duplicate rows;
missing ``add`` → ts 0 (base graph); missing labels → '' (the
reference's ``.get(key, '')`` default, ``query/Condition.py:42``).

Small graph files are parsed driver-side (the reference's graphs are
KB-scale configs); `load_node_link_distributed` does the same via
``spark.read.json(multiLine)`` + explode for files too large to parse on
the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

VERTEX_SCHEMA = "id BIGINT, label STRING, props MAP<STRING,STRING>"
EDGE_SCHEMA = "src BIGINT, dst BIGINT, label STRING, ts INT"

_RESERVED_NODE = {"id", "label"}
_RESERVED_LINK = {"source", "target", "label", "add"}


def load_node_link(
    spark: SparkSession, path_or_obj: str | dict
) -> tuple[DataFrame, DataFrame, bool]:
    if isinstance(path_or_obj, str):
        with open(path_or_obj) as f:
            obj = json.load(f)
    else:
        obj = path_or_obj
    directed = bool(obj.get("directed", False))
    vrows = [
        (
            int(nd["id"]),
            str(nd.get("label", "")),
            {k: str(v) for k, v in nd.items() if k not in _RESERVED_NODE},
        )
        for nd in obj.get("nodes", [])
    ]
    erows = [
        (
            int(lk["source"]),
            int(lk["target"]),
            str(lk.get("label", "")),
            int(lk.get("add", 0)),
        )
        for lk in obj.get("links", [])
    ]
    vertices = spark.createDataFrame(vrows, VERTEX_SCHEMA)
    edges = spark.createDataFrame(erows, EDGE_SCHEMA)
    return vertices, edges, directed


def save_node_link(
    vertices: DataFrame, edges: DataFrame, path: str, directed: bool = False
) -> None:
    """S5 — graph JSON sink (the reference's ``json_graph.node_link_data``
    + ``json.dump``, ``generator.py:144-152``). Collects to the driver —
    the reference's graphs are KB-scale; use ``save_graph_parquet`` for
    anything that shouldn't fit on the driver."""
    obj = {
        "directed": directed,
        "multigraph": True,
        "graph": {},
        "nodes": [
            {"id": r["id"], "label": r["label"], **(dict(r["props"]) if "props" in r.__fields__ and r["props"] else {})}
            for r in vertices.collect()
        ],
        "links": [
            {
                "source": r["src"],
                "target": r["dst"],
                "label": r["label"] if "label" in r.__fields__ else "",
                "add": r["ts"] if "ts" in r.__fields__ else 0,
            }
            for r in edges.collect()
        ],
    }
    with open(path, "w") as f:
        json.dump(obj, f)


def save_graph_parquet(vertices: DataFrame, edges: DataFrame, base_dir: str) -> None:
    """Distributed graph sink: two parquet tables — the engine-state sink
    shape (Iceberg-shaped on a real cluster)."""
    vertices.write.mode("overwrite").parquet(f"{base_dir}/vertices")
    edges.write.mode("overwrite").parquet(f"{base_dir}/edges")


def load_graph_parquet(spark: SparkSession, base_dir: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{base_dir}/vertices"),
        spark.read.parquet(f"{base_dir}/edges"),
    )


def load_node_link_distributed(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, bool]:
    """Distributed variant: one multiline JSON doc → exploded DataFrames."""
    raw = spark.read.option("multiLine", "true").json(path)
    directed = bool(raw.select("directed").first()[0])
    vertices = (
        raw.select(F.explode("nodes").alias("n"))
        .select(
            F.col("n.id").cast("bigint").alias("id"),
            F.coalesce(F.col("n.label"), F.lit("")).alias("label"),
        )
        .withColumn("props", F.create_map().cast("map<string,string>"))
    )
    edges = raw.select(F.explode("links").alias("e")).select(
        F.col("e.source").cast("bigint").alias("src"),
        F.col("e.target").cast("bigint").alias("dst"),
        F.coalesce(F.col("e.label"), F.lit("")).alias("label"),
        F.coalesce(F.col("e.add"), F.lit(0)).cast("int").alias("ts"),
    )
    return vertices, edges, directed
