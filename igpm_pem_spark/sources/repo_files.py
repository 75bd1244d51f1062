"""S4 — deterministic synthetic source-code repository table.

The north-star input (BASELINE.json ``input_hint``) is an Iceberg table
    repo STRING, path STRING, commit STRING, lang STRING, content STRING
of source files whose import statements induce a skewed link graph. This
generator is the Spark-era analogue of the reference's seeded synthetic
graph generators (``generator.py:10-133``: Barabási–Albert et al. with
``random.seed(0)``): fully deterministic at any scale and any partitioning,
because every field is a pure function of the global file index via
stateless 64-bit mixing (splitmix64) — no sequential RNG to replay, so the
same table materializes identically on 1 or 1000 executors.

Import targets are drawn with a power-law (u^gamma) map toward low file
indices — the preferential-attachment skew of the reference's BA graphs —
so hub files exist and downstream kernels must handle skew.

Data path: ``spark.range`` → ``mapInPandas`` (Arrow batches, vectorized
numpy/pandas inside; no per-row Python UDFs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SCHEMA = "repo STRING, path STRING, commit STRING, lang STRING, content STRING"

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized stateless hash on uint64."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(idx: np.ndarray, stream: int, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _mix64(
            idx.astype(np.uint64)
            + _mix64(np.uint64(stream) + _mix64(np.asarray([seed], np.uint64)))[0]
        )


def _u01(h: np.ndarray) -> np.ndarray:
    return h.astype(np.float64) / np.float64(2**64)


MODS_PER_PKG = 10


def module_name(repo_idx: np.ndarray, file_idx: np.ndarray) -> tuple:
    """(repo, path, dotted-module) string arrays for file positions."""
    pkg = file_idx // MODS_PER_PKG
    mod = file_idx % MODS_PER_PKG
    repo = np.char.add("repo", np.char.zfill(repo_idx.astype("U8"), 3))
    path = np.char.add(
        np.char.add(np.char.add("pkg", pkg.astype("U8")), "/mod"),
        np.char.add(mod.astype("U8"), ".py"),
    )
    dotted = np.char.add(
        np.char.add(repo, np.char.add(".pkg", pkg.astype("U8"))),
        np.char.add(".mod", mod.astype("U8")),
    )
    return repo, path, dotted


def generate_repo_files(
    spark: SparkSession,
    n_repos: int = 20,
    files_per_repo: int = 50,
    avg_imports: int = 6,
    seed: int = 42,
    skew_gamma: float = 3.0,
    other_lang_pct: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic repo_files table with ``n_repos * files_per_repo`` rows."""
    n_files = n_repos * files_per_repo
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(np.int64)
            r = (idx // files_per_repo).astype(np.int64)
            f = (idx % files_per_repo).astype(np.int64)
            repo, path, _ = module_name(r, f)
            commit = np.char.add(
                np.char.add("c", np.char.zfill(r.astype("U8"), 3)),
                np.char.zfill(idx.astype("U12"), 5),
            )
            is_other = (_h(idx.astype(np.uint64), 1, seed) % np.uint64(100)) < np.uint64(
                other_lang_pct
            )
            lang = np.where(is_other, "other", "python")

            # imports: k_i ∈ [1, 2*avg], targets power-law-skewed to low idx
            k = (
                _h(idx.astype(np.uint64), 2, seed) % np.uint64(2 * avg_imports)
            ).astype(np.int64) + 1
            kmax = 2 * avg_imports
            import_block = np.full(len(idx), "", dtype=object)
            for j in range(kmax):
                mask = k > j
                if not mask.any():
                    continue
                hj = _h(idx.astype(np.uint64), 100 + j, seed)
                t = np.minimum(
                    (np.power(_u01(hj), skew_gamma) * n_files).astype(np.int64),
                    n_files - 1,
                )
                tr, tf = t // files_per_repo, t % files_per_repo
                _, _, dotted = module_name(tr, tf)
                form = _h(idx.astype(np.uint64), 200 + j, seed) % np.uint64(2)
                base = np.where(
                    form == 0,
                    np.char.add("import ", dotted),
                    np.char.add(
                        np.char.add(
                            "from ",
                            np.char.partition(dotted, ".mod")[:, 0],
                        ),
                        np.char.add(
                            " import mod", (tf % MODS_PER_PKG).astype("U8")
                        ),
                    ),
                ).astype(object)
                add = np.where(mask, base + "\n", "")
                import_block = import_block + add

            salt = _h(idx.astype(np.uint64), 3, seed).astype("U24")
            header = (
                pd.Series(idx).map(lambda i: f"# module file {i}\n").to_numpy(object)
            )
            body = "\n\ndef main():\n    return 0\n"
            content = (
                header
                + "# sha-salt: "
                + pd.Series(salt).to_numpy(object)
                + "\n"
                + import_block
                + body
            )
            # non-python files: same shape, imports commented out so a
            # correct parser must skip them by lang, not by regex luck
            other_content = (
                header
                + "// sha-salt: "
                + pd.Series(salt).to_numpy(object)
                + "\n// no imports here\n"
            )
            content = np.where(is_other, other_content, content)
            yield pd.DataFrame(
                {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": lang,
                    "content": content,
                }
            )

    rng = spark.range(0, n_files, 1, num_partitions)
    return rng.mapInPandas(gen, SCHEMA)
