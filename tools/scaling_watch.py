"""Quiet-window watcher for the scaling batch.

The multi-tenant host swings identical runs by ±40% (BENCH.md history
table); a batch launched into a contended window lands 0.56-0.75 and
tells us nothing.  This watcher polls the same 8-way host probe the
batch itself records, and only launches ``bench.py --scaling`` once two
consecutive probes clear the quiet threshold.  A sentinel file
(`.scaling_running` in the repo root) marks the measurement window so
interactive work can defer heavy Spark jobs instead of contaminating
the wide legs.

Writes the batch's stdout JSON to ``.scaling_result.json`` and exits.
Gives up after ``--deadline-min`` minutes without a quiet window.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SENTINEL = os.path.join(REPO, ".scaling_running")
RESULT = os.path.join(REPO, ".scaling_result.json")
LOG = os.path.join(REPO, ".scaling_watch.log")


def _probe() -> float:
    sys.path.insert(0, REPO)
    import bench

    return bench._host_probe()


def main() -> None:
    quiet = float(os.environ.get("SCALING_QUIET_PROBE", "7.0"))
    deadline_min = float(sys.argv[sys.argv.index("--deadline-min") + 1]) if "--deadline-min" in sys.argv else 210.0
    poll_s = 180.0
    t0 = time.time()
    consecutive = 0
    with open(LOG, "a") as log:
        log.write(f"watch start {time.strftime('%H:%M:%S')} quiet>={quiet}\n")
        log.flush()
        while time.time() - t0 < deadline_min * 60:
            p = _probe()
            log.write(f"{time.strftime('%H:%M:%S')} probe {p}\n")
            log.flush()
            consecutive = consecutive + 1 if p >= quiet else 0
            if consecutive >= 2:
                open(SENTINEL, "w").write(str(time.time()))
                log.write(f"{time.strftime('%H:%M:%S')} launching batch\n")
                log.flush()
                try:
                    out = subprocess.run(
                        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                        capture_output=True, text=True, timeout=5400, cwd=REPO,
                        env=dict(os.environ, SPARK_GRAFT_SCALE_REPEATS="2"),
                    )
                    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
                    with open(RESULT, "w") as f:
                        f.write(lines[-1] if lines else json.dumps({"err": out.stderr[-2000:]}))
                finally:
                    os.unlink(SENTINEL)
                log.write(f"{time.strftime('%H:%M:%S')} batch done\n")
                return
            time.sleep(poll_s)
        log.write(f"{time.strftime('%H:%M:%S')} deadline reached, no quiet window\n")


if __name__ == "__main__":
    main()
