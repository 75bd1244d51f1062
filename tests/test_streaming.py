"""Structured Streaming flavor: file-source micro-batches drive the same
incremental CC update; final state equals the batch answer."""

from __future__ import annotations

import os

from igpm_pem_spark.sources.fixtures import fixture_graph
from igpm_pem_spark.streaming.stream import components_stream

from .oracles import components_oracle


def test_components_stream_matches_batch(spark, tmp_path):
    _, edges, _ = fixture_graph(spark, "dynamic_test1")
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir, exist_ok=True)
    # one parquet file per arrival bucket
    for ts in (0, 1, 2):
        bucket = edges.where(f"ts = {ts}")
        bucket.coalesce(1).write.mode("append").parquet(src_dir)

    query, state = components_stream(
        spark,
        src_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    query.awaitTermination(120)
    query.stop()

    assert state.batches >= 1
    pairs = [(r.src, r.dst) for r in edges.collect()]
    got = {r.id: r.component for r in state.components.collect()}
    assert got == components_oracle(pairs)
