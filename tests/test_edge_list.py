"""S2/S3 edge-list loaders: file-order step stamping and epoch-day
rebasing (reference load_edgelist.py / load_edgelist_timestamp.py)."""

from __future__ import annotations

from igpm_pem_spark.sources.edge_list import (
    load_edge_list,
    load_timestamped_edge_list,
)


def test_load_edge_list_stamps_buckets(spark, tmp_path):
    p = tmp_path / "edges.txt"
    lines = [f"{i} {i + 1}" for i in range(10)]
    p.write_text("\n".join(lines) + "\n")
    verts, edges = load_edge_list(spark, str(p), tm_size=4)
    rows = sorted((r.src, r.dst, r.ts) for r in edges.collect())
    assert [r[2] for r in rows] == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    vs = verts.collect()
    assert all(v.label == "cyan" for v in vs)
    assert len(vs) == 11


def test_load_timestamped_edge_list_rebases_days(spark, tmp_path):
    p = tmp_path / "edges_ts.txt"
    day = 86400
    rows = [
        (1, 2, 100 * day + 5),
        (2, 3, 100 * day + 86399),
        (3, 4, 102 * day),
        (4, 5, 105 * day + 1),
    ]
    p.write_text("\n".join(f"{a} {b} {t}" for a, b, t in rows) + "\n")
    _, edges = load_timestamped_edge_list(spark, str(p))
    got = {(r.src, r.dst): r.ts for r in edges.collect()}
    assert got == {(1, 2): 0, (2, 3): 0, (3, 4): 2, (4, 5): 5}
