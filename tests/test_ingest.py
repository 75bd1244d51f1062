"""North-star ingest gates (BASELINE.json input_hint): per-row content
sha256 invariance, exact import-edge derivation, determinism across
partitionings, id uniqueness."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from igpm_pem_spark.sources.code_imports import (
    file_ids,
    import_edges,
    parse_import_statements,
    sha_manifest,
)
from igpm_pem_spark.sources.repo_files import generate_repo_files

_IMPORT_RE = re.compile(
    r"(?m)^(?:import[ \t]+([\w.]+)|from[ \t]+([\w.]+)[ \t]+import[ \t]+(\w+))[ \t]*$"
)


def _expected_modules(content: str) -> list[str]:
    return [m[0] if m[0] else f"{m[1]}.{m[2]}" for m in _IMPORT_RE.findall(content)]


def test_sha256_invariant_per_row(spark):
    rf = generate_repo_files(spark, n_repos=10, files_per_repo=20).cache()
    rows = rf.collect()
    manifest = {(r.repo, r.path): r.sha for r in sha_manifest(rf).collect()}
    assert len(manifest) == len(rows) == 200
    for r in rows:
        assert manifest[(r.repo, r.path)] == hashlib.sha256(
            r.content.encode("utf-8")
        ).hexdigest()
    rf.unpersist()


def test_import_edges_match_pure_python_rederivation(spark):
    rf = generate_repo_files(spark, n_repos=10, files_per_repo=20).cache()
    rows = rf.collect()
    ids = {(r.repo, r.path): r.id for r in file_ids(rf).collect()}
    assert len(set(ids.values())) == len(ids)  # xxhash64 ids unique here

    expected = set()
    for r in rows:
        if r.lang != "python":
            continue
        for mod in _expected_modules(r.content):
            p = mod.split(".")
            tgt = (p[0], f"{p[1]}/{p[2]}.py")
            if tgt in ids:  # drop_dangling_targets semantics
                expected.add((ids[(r.repo, r.path)], ids[tgt]))
    got = {(r.src, r.dst) for r in import_edges(rf).collect()}
    assert got == expected
    assert len(got) > 100  # non-trivial graph
    rf.unpersist()


def test_jvm_and_arrow_parsers_agree(spark):
    rf = generate_repo_files(spark, n_repos=8, files_per_repo=15).cache()
    jvm = sorted(map(tuple, parse_import_statements(rf, engine="jvm").collect()))
    arrow = sorted(map(tuple, parse_import_statements(rf, engine="arrow").collect()))
    assert jvm == arrow
    assert len(jvm) > 50
    rf.unpersist()


def test_non_python_rows_not_parsed(spark):
    rf = generate_repo_files(spark, n_repos=10, files_per_repo=20).cache()
    parsed = parse_import_statements(rf)
    joined = parsed.join(
        rf.select("repo", "path", "lang"), ["repo", "path"]
    )
    assert joined.where(F.col("lang") != "python").count() == 0
    rf.unpersist()


def test_generation_deterministic_across_partitionings(spark):
    a = generate_repo_files(spark, n_repos=6, files_per_repo=15, num_partitions=2)
    b = generate_repo_files(spark, n_repos=6, files_per_repo=15, num_partitions=8)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_import_graph_is_skewed(spark):
    """Power-law target selection must produce hub files (skew is a design
    requirement: kernels are exercised against it)."""
    rf = generate_repo_files(spark, n_repos=20, files_per_repo=50)
    deg = import_edges(rf).groupBy("dst").count().collect()
    counts = sorted((r["count"] for r in deg), reverse=True)
    assert counts[0] > 10 * counts[len(counts) // 2]  # hub ≫ median
