"""Dataset splitting / sampling for training-data pipelines.

Splits must be DETERMINISTIC (reproducible across runs, engines, and
partitionings), STABLE under appends (a document's split never changes
when other rows arrive), and shuffle-free — which rules out
``randomSplit`` (partition-order dependent). The assignment is a pure
function of the row key: the portable md5-prefix hash
(functions/hashing.token_id_sql family) bucketed into [0, 1e6), cut by
cumulative split weights. The same expression runs in DuckDB, so the
driver oracle checks every assignment exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SPLIT_BUCKETS = 1_000_000


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): portable md5-prefix
    hash of ``salt || ':' || key`` — identical in any engine with md5."""
    s = F.concat(F.lit(salt + ":"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(SPLIT_BUCKETS)
    )


def split_bucket_sql(key: str, salt: str = "split") -> str:
    """DuckDB SQL text of split_bucket (same value per row)."""
    return (
        f"(('0x' || substr(md5('{salt}:' || CAST({key} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {SPLIT_BUCKETS})"
    )


def split_by_hash(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given weights (normalized). Hash-based: stable under appends and
    engine-portable, unlike ``randomSplit``."""
    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    items = list(splits.items())
    for name, w in items[:-1]:
        acc += w / total
        cut = int(acc * SPLIT_BUCKETS)
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def split_case_sql(key: str, splits: dict[str, float] | None = None, salt: str = "split") -> str:
    """DuckDB CASE expression mirroring split_by_hash's assignment."""
    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    b = split_bucket_sql(key, salt)
    parts = ["CASE"]
    acc = 0.0
    items = list(splits.items())
    for name, w in items[:-1]:
        acc += w / total
        cut = int(acc * SPLIT_BUCKETS)
        parts.append(f"WHEN {b} < {cut} THEN '{name}'")
    parts.append(f"ELSE '{items[-1][0]}' END")
    return " ".join(parts)


def sample_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its hash
    bucket falls under its stratum's rate — the mixture-weighting step of
    a training-data pipeline (e.g. keep 100% of high-quality sources,
    10% of crawl). Same guarantees as split_by_hash: reproducible across
    engines and partitionings, append-stable, shuffle-free (a pure
    filter, so it composes under whatever partitioning the input has and
    pushes down to the scan). Strata not named in ``rates`` keep
    ``default_rate``."""
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"sample_stratified: rate for {name!r} not in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("sample_stratified: default_rate not in [0, 1]")
    bucket = split_bucket(F.col(key_col), salt)
    cut = None
    for name, r in rates.items():
        c = F.when(F.col(strata_col) == name, F.lit(int(r * SPLIT_BUCKETS)))
        cut = c if cut is None else cut.when(
            F.col(strata_col) == name, F.lit(int(r * SPLIT_BUCKETS))
        )
    cut = (
        F.lit(int(default_rate * SPLIT_BUCKETS))
        if cut is None
        else cut.otherwise(F.lit(int(default_rate * SPLIT_BUCKETS)))
    )
    return df.where(bucket < cut)


def sample_case_sql(
    key: str,
    strata: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> str:
    """DuckDB WHERE-clause text mirroring sample_stratified's filter."""
    b = split_bucket_sql(key, salt)
    parts = ["CASE"]
    for name, r in rates.items():
        parts.append(f"WHEN {strata} = '{name}' THEN {int(r * SPLIT_BUCKETS)}")
    parts.append(f"ELSE {int(default_rate * SPLIT_BUCKETS)} END")
    return f"{b} < ({' '.join(parts)})"


def reservoir_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    n: int = 5,
    salt: str = "resv",
) -> DataFrame:
    """Deterministic fixed-COUNT sample per group (vs sample_stratified's
    fixed-RATE): the n smallest-hash keys per group — the engine-portable
    stand-in for per-group reservoir sampling. Stable under appends in
    the weaker per-group sense (a new row evicts at most the current
    max-hash member) and reproducible across engines/partitionings.

    Scale shape: window row_number over the per-group hash order — one
    shuffle by group, per-group state is the heap of n rows."""
    from pyspark.sql import Window

    h = split_bucket(F.col(key_col), salt)  # portable hash, bucketed domain
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def reservoir_case_sql(key: str, group: str, n: int, salt: str = "resv") -> str:
    """DuckDB SQL fragment: the same per-group n-smallest-hash filter as
    a QUALIFY-style subquery predicate (callers wrap in row_number)."""
    b = split_bucket_sql(key, salt)
    return (
        f"row_number() OVER (PARTITION BY {group} ORDER BY {b}, {key}) <= {n}"
    )
