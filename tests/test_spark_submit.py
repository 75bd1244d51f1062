"""True spark-submit --py-files launch smoke (the north rule's ship
path): zip the package, submit the pagerank subcommand to a fresh
local[2] cluster in a SEPARATE JVM, and check the output parquet against
the NetworkX oracle. Everything the driver ships to a real cluster —
the zip, the __main__ entry, getOrCreate picking up the submit-provided
session — is exercised for real, not simulated in-session."""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .oracles import pagerank_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

PAIRS = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 1), (2, 6)]


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_pagerank(tmp_path):
    # package zip exactly as the documented ship command builds it
    zpath = tmp_path / "igpm_pem_spark.zip"
    pkg = os.path.join(REPO, "igpm_pem_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    epath = tmp_path / "edges.parquet"
    pq.write_table(
        pa.table(
            {
                "src": pa.array([a for a, _ in PAIRS], pa.int64()),
                "dst": pa.array([b for _, b in PAIRS], pa.int64()),
            }
        ),
        epath,
    )
    out = tmp_path / "ranks.parquet"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.driver.memory=2g",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            os.path.join(pkg, "__main__.py"),
            "pagerank", "--edges", str(epath), "--output", str(out),
            "--tol", "1e-10",
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the driver's summary line lands on stdout under spark-submit
    assert "converged=True" in proc.stdout + proc.stderr

    got = {
        r["id"]: r["rank"]
        for r in pq.read_table(out).to_pylist()
    }
    want = pagerank_oracle(PAIRS)
    assert got.keys() == want.keys()
    for v, x in want.items():
        assert got[v] == pytest.approx(x, abs=1e-6), v
