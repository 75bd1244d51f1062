"""S2/S3/S8 sources: file-order step stamping, epoch-day / datetime-string
rebasing (reference load_edgelist.py / load_edgelist_timestamp.py /
load_edgelist_dataverse.py), INI query configs, generator fixtures."""

from __future__ import annotations

from igpm_pem_spark.sources.edge_list import (
    load_datetime_edge_list,
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


def test_load_edge_list_multifile_stamping(spark, tmp_path):
    """Partition-local stamping across several input files: every row gets
    a unique rank (exact tm_size rows per bucket), in-file line order is
    preserved within each file, and the assignment is deterministic —
    with NO global sort anywhere. (Across files Spark orders splits by
    size, not name — the single-file case is the reference's semantics.)"""
    d = tmp_path / "many"
    d.mkdir()
    for fi in range(4):
        lines = [f"{fi * 100 + i} {fi * 100 + i + 1}" for i in range(25)]
        (d / f"part-{fi:03d}.txt").write_text("\n".join(lines) + "\n")
    _, edges = load_edge_list(spark, str(d), tm_size=10)
    rows = [(r.src, r.ts) for r in edges.collect()]
    assert len(rows) == 100
    from collections import Counter

    assert set(Counter(ts for _, ts in rows).values()) == {10}
    # within each file, ts must be non-decreasing in line (= src) order
    by_file: dict[int, list[tuple[int, int]]] = {}
    for src, ts in rows:
        by_file.setdefault(src // 100, []).append((src, ts))
    for group in by_file.values():
        ordered = [ts for _, ts in sorted(group)]
        assert ordered == sorted(ordered)
    # deterministic across loads
    _, again = load_edge_list(spark, str(d), tm_size=10)
    assert sorted(rows) == sorted((r.src, r.ts) for r in again.collect())


def test_load_datetime_edge_list(spark, tmp_path):
    p = tmp_path / "dataverse.csv"
    p.write_text(
        '"2015-03-01 00:00:05",1,"2"\n'
        "'2015-03-01 23:59:59',2,3\n"
        '"2015-03-03 00:00:00",3,4\n'
        '"2015-03-06 12:00:00",4,5\n'
    )
    _, edges = load_datetime_edge_list(spark, str(p))
    got = {(r.src, r.dst): r.ts for r in edges.collect()}
    assert got == {(1, 2): 0, (2, 3): 0, (3, 4): 2, (4, 5): 5}


def test_ini_config_source_runs_query(spark, tmp_path):
    """S8 end-to-end: the reference's INI format drives a pattern run
    (query_call.py:415-438)."""
    import json

    from igpm_pem_spark.sources.config_source import (
        load_query_config,
        run_query_config,
    )
    from igpm_pem_spark.sources.fixtures import GRAPHS

    g = GRAPHS["test1"]
    gfile = tmp_path / "test1.json"
    gfile.write_text(
        json.dumps(
            {"directed": False, "graph": {}, "multigraph": False,
             "nodes": g["nodes"], "links": g["links"]}
        )
    )
    ini = tmp_path / "q.ini"
    ini.write_text(
        "[Log]\nprofile = False\nlevel = info\n\n"
        "[G-Ray]\n"
        f"input_json = {gfile}\n"
        "base_steps = 1\nsteps = 1\n"
        "query = --vertex a b c --edge x:a:b y:b:c z:c:a "
        "--vertexlabel a:cyan b:cyan c:cyan\n"
        "time_limit = 0.0\n"
    )
    cfg = load_query_config(str(ini))
    assert cfg.steps == 1 and not cfg.profile
    assert set(cfg.query.vertices) == {"a", "b", "c"}
    # case 1-2: 2 triangles on test1
    assert run_query_config(spark, str(ini)).count() == 2


def test_ini_config_dynamic_steps_replay(spark, tmp_path):
    """steps > 1 drives the incremental matcher over the ts ('add')
    buckets; the final match set equals the batch run on the full graph
    (reference run_query_step, incremental/query_call.py:180-258)."""
    import json

    from igpm_pem_spark.sources.config_source import run_query_config
    from igpm_pem_spark.sources.fixtures import GRAPHS

    g = GRAPHS["dynamic_test1"]
    gfile = tmp_path / "dyn.json"
    gfile.write_text(
        json.dumps(
            {"directed": False, "graph": {}, "multigraph": False,
             "nodes": g["nodes"], "links": g["links"]}
        )
    )
    ini = tmp_path / "dyn.ini"
    ini.write_text(
        "[G-Ray]\n"
        f"input_json = {gfile}\n"
        "base_steps = 1\nsteps = 3\n"
        "query = --vertex a b c --edge x:a:b y:b:c z:c:a\n"
    )
    out = run_query_config(spark, str(ini))
    # final graph = test1 → exactly the 2 triangles, found incrementally
    assert out.count() == 2


def test_generator_fixtures(spark):
    from igpm_pem_spark.sources.fixtures import (
        powerlaw_cluster_graph,
        random_regular_graph,
    )

    _, e1, _ = powerlaw_cluster_graph(spark, 60, 3, seed=1)
    _, e1b, _ = powerlaw_cluster_graph(spark, 60, 3, seed=1)
    assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e1b.collect()))
    _, e2, _ = random_regular_graph(spark, 40, 4, seed=1)
    deg = {}
    for r in e2.collect():
        deg[r.src] = deg.get(r.src, 0) + 1
        deg[r.dst] = deg.get(r.dst, 0) + 1
    assert set(deg.values()) == {4} and len(deg) == 40
