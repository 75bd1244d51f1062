"""PCA top principal component of an embedding corpus — power iteration.

The feature-prep step a training pipeline runs before whitening /
dimensionality reduction: the dominant direction of the (mean-centered)
covariance. Power iteration never materializes the d×d covariance —
each step is two corpus passes fused into ONE aggregation job:

    s_row = ⟨x_row − μ, v⟩          (row-local expression)
    w_d   = Σ_rows (x_row,d − μ_d)·s_row   (d running sums)

so the per-iteration cost is a single scan + a 64-value aggregate,
linear in corpus size and embarrassingly partition-parallel — the only
driver traffic is the d-vector itself (64 doubles per iteration). At
10^9 vectors this is exactly the shape you want: no shuffle at all
(global aggregate = partial per partition + 64-double merge).

The iteration count is FIXED (default 8) and v₀ = 1/√d·(1,…,1), so an
independent SQL engine replays the identical recurrence. Convergence
to the true top eigenvector needs a spectral gap — on a near-isotropic
corpus the fixed-step output is the exact recurrence value, not the
eigenvector (raise ``iters`` when the gap is known to be small); outputs are
rounded to 6 decimals for the cross-engine comparison (power iteration
is self-correcting, so sum-order float noise damps instead of
compounding). Sign is pinned by the positive start vector.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _centered_expr(dim: int, mu: list[float], vec_col: str):
    """Mean-centered row vector as ONE array expression (higher-order
    functions, JVM-side): keeps the logical plan O(dim) nodes instead of
    the O(dim²) tree the per-dimension unrolled form produced — at 64
    dims that unrolled tree made each iteration Catalyst-compile-bound
    (~3-5 s of pure planning per step at ANY data size)."""
    xarr = F.transform(
        F.slice(F.col(vec_col), 1, dim), lambda e: e.cast("double")
    )
    return F.zip_with(
        xarr, F.array(*[F.lit(m) for m in mu]), lambda a, b: a - b
    )


def _dot_expr(arr_col, vec: list[float]):
    """⟨arr, vec⟩ with the same left-associative 0..dim-1 accumulation
    order as the previous unrolled chain — bit-identical results."""
    return F.aggregate(
        F.zip_with(arr_col, F.array(*[F.lit(x) for x in vec]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )


def _step_w(emb: DataFrame, dim: int, mu: list[float], v: list[float], vec_col: str):
    """One power-iteration step: returns the d running sums
    w_d = Σ_rows c_d·⟨c, v⟩ via a single scan. The centered array and its
    projection s are materialized as two narrow projection columns so the
    final aggregate is 64 *small* expressions, not 64 copies of the
    64-term s tree."""
    c = _centered_expr(dim, mu, vec_col)
    staged = emb.select(c.alias("_c")).select("_c", _dot_expr(F.col("_c"), v).alias("_s"))
    # 0-based getItem, not 1-based element_at: dim ElementAt nodes in one
    # codegen'd aggregate blow the method-size limits and drop the stage
    # to interpreted eval (see similarity._pair_cos4); same NULL
    # out-of-bounds semantics under non-ANSI SQL, values identical.
    w_row = staged.agg(
        *[
            F.sum(F.col("_c").getItem(d) * F.col("_s")).alias(f"w{d}")
            for d in range(dim)
        ]
    ).collect()[0]
    return [float(w_row[f"w{d}"]) for d in range(dim)]


def _power_iterate(emb: DataFrame, dim: int, iters: int, vec_col: str):
    """Run the fixed power-iteration recurrence; returns (mu, v) as plain
    python float lists (the only driver traffic)."""
    if iters < 1 or dim < 1:
        raise ValueError("pca: iters and dim must be >= 1")
    from ._superstep import loop_confs

    xe = [F.col(vec_col).getItem(i).cast("double") for i in range(dim)]
    # loop_confs: each step embeds the fresh v as literals, so every
    # iteration is a brand-new plan whose whole-stage Janino compile is
    # driver-serial (~0.5 s × iters at any data size) — the same trade
    # every superstep loop carries (see _superstep.loop_confs)
    with loop_confs(emb.sparkSession):
        mu_row = emb.agg(
            *[F.avg(xe[d]).alias(f"m{d}") for d in range(dim)]
        ).collect()[0]
        mu = [float(mu_row[f"m{d}"]) for d in range(dim)]
        v = [1.0 / math.sqrt(dim)] * dim
        for _ in range(iters):
            w = _step_w(emb, dim, mu, v, vec_col)
            norm = math.sqrt(sum(wi * wi for wi in w))
            if norm == 0.0:
                raise ValueError("pca: zero covariance — degenerate corpus")
            v = [wi / norm for wi in w]
    return mu, v


def pca_top_component(
    emb: DataFrame,
    *,
    dim: int = 64,
    iters: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """(pos, mu6, loading6): per-dimension corpus mean and the top
    principal direction after ``iters`` power-iteration steps."""
    mu, v = _power_iterate(emb, dim, iters, vec_col)
    spark = emb.sparkSession
    rows = [(d + 1, round(mu[d], 6), round(v[d], 6)) for d in range(dim)]
    return spark.createDataFrame(rows, "pos INT, mu6 DOUBLE, loading6 DOUBLE")


def pca_project(
    emb: DataFrame,
    *,
    dim: int = 64,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, score6): each vector's coordinate on the top principal
    direction — the 1-D whitening/feature a curriculum or outlier filter
    sorts on. After the (driver-tiny) iteration, the projection itself is
    a stateless row-local expression: zero shuffle, scan-wide codegen."""
    mu, v = _power_iterate(emb, dim, iters, vec_col)
    s = _dot_expr(_centered_expr(dim, mu, vec_col), v)
    return emb.select(F.col(id_col), F.round(s, 6).alias("score6"))


def _recurrence_ctes(dim: int, iters: int, table: str) -> list[str]:
    """Shared CTE chain unrolling the power-iteration recurrence at
    (row, dim) granularity: x, mu, c (centered), v0..v{iters}."""
    parts = [
        f"""WITH x AS MATERIALIZED (
  SELECT vec_id, CAST(d.i AS INT) AS pos, CAST(embedding[CAST(d.i AS INT)] AS DOUBLE) AS val
  FROM {table} JOIN range(1, {dim + 1}) d(i) ON true
)
, mu AS MATERIALIZED (SELECT pos, avg(val) AS mu FROM x GROUP BY pos)
, c AS MATERIALIZED (
  SELECT vec_id, x.pos, x.val - mu.mu AS cv FROM x JOIN mu ON mu.pos = x.pos
)
, v0 AS MATERIALIZED (
  SELECT CAST(i AS INT) AS pos, 1.0 / sqrt({dim}) AS v FROM range(1, {dim + 1}) t(i)
)"""
    ]
    for t in range(1, iters + 1):
        q = t - 1
        parts.append(
            f"""
, s{t} AS MATERIALIZED (
  SELECT c.vec_id, sum(c.cv * v{q}.v) AS s FROM c JOIN v{q} ON v{q}.pos = c.pos
  GROUP BY c.vec_id
)
, w{t} AS MATERIALIZED (
  SELECT c.pos, sum(c.cv * s{t}.s) AS w FROM c JOIN s{t} ON s{t}.vec_id = c.vec_id
  GROUP BY c.pos
)
, v{t} AS MATERIALIZED (
  SELECT pos, w / (SELECT sqrt(sum(w * w)) FROM w{t}) AS v FROM w{t}
)"""
        )
    return parts


def pca_oracle_sql(dim: int = 64, iters: int = 8, table: str = "embeddings") -> str:
    """DuckDB SQL of ``pca_top_component``: the same fixed recurrence
    unrolled at (row, dim) granularity."""
    parts = _recurrence_ctes(dim, iters, table)
    parts.append(
        f"""
SELECT mu.pos, round(mu.mu, 6) AS mu6, round(v{iters}.v, 6) AS loading6
FROM mu JOIN v{iters} ON v{iters}.pos = mu.pos"""
    )
    return "".join(parts)


def pca_project_oracle_sql(
    dim: int = 64, iters: int = 8, table: str = "embeddings"
) -> str:
    """DuckDB SQL of ``pca_project``: the recurrence CTEs plus one more
    per-row inner product against the final direction."""
    parts = _recurrence_ctes(dim, iters, table)
    parts.append(
        f"""
SELECT c.vec_id, round(sum(c.cv * v{iters}.v), 6) AS score6
FROM c JOIN v{iters} ON v{iters}.pos = c.pos
GROUP BY c.vec_id"""
    )
    return "".join(parts)


def _deflated_iterate(emb: DataFrame, dim: int, iters: int, vec_col: str):
    """Second-component recurrence: power iteration with v₁ (the
    ``iters``-step top direction) deflated out of every step. Same
    job shape — each step ONE scan + a d-value aggregate + driver-side
    d-vector arithmetic; the deflation (w − ⟨w,v₁⟩v₁) is pure python on
    the d-vector, zero extra jobs."""
    from ._superstep import loop_confs

    mu, v1 = _power_iterate(emb, dim, iters, vec_col)
    # u0: the all-ones start orthogonalized against v1, then normalized —
    # replayed identically by the SQL oracle
    s0 = 1.0 / math.sqrt(dim)
    d0 = sum(s0 * v1[d] for d in range(dim))
    u = [s0 - d0 * v1[d] for d in range(dim)]
    n0 = math.sqrt(sum(ui * ui for ui in u))
    if n0 == 0.0:
        raise ValueError("pca: start vector is parallel to v1 — degenerate")
    u = [ui / n0 for ui in u]
    # loop_confs: same per-step fresh-plan compile trade as _power_iterate
    with loop_confs(emb.sparkSession):
        for _ in range(iters):
            w = _step_w(emb, dim, mu, u, vec_col)
            dp = sum(w[d] * v1[d] for d in range(dim))
            w = [w[d] - dp * v1[d] for d in range(dim)]
            norm = math.sqrt(sum(wi * wi for wi in w))
            if norm == 0.0:
                raise ValueError("pca: zero deflated covariance — rank-1 corpus")
            u = [wi / norm for wi in w]
    return mu, v1, u


def pca_second_component(
    emb: DataFrame,
    *,
    dim: int = 64,
    iters: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """(pos, loading1_6, loading2_6): top TWO principal directions — the
    2-D whitening basis a curriculum/visualization step wants. v₂ by
    deflated power iteration; orthogonality to v₁ is enforced every step
    so float drift can't re-admit the dominant direction."""
    _, v1, v2 = _deflated_iterate(emb, dim, iters, vec_col)
    spark = emb.sparkSession
    rows = [(d + 1, round(v1[d], 6), round(v2[d], 6)) for d in range(dim)]
    return spark.createDataFrame(rows, "pos INT, loading1_6 DOUBLE, loading2_6 DOUBLE")


def pca2_oracle_sql(dim: int = 64, iters: int = 8, table: str = "embeddings") -> str:
    """DuckDB SQL of ``pca_second_component``: the v₁ recurrence CTEs,
    then the deflated recurrence for v₂ — u0 orthogonalizes the all-ones
    start, each round deflates ⟨w,v₁⟩v₁ before normalizing."""
    I = iters
    parts = _recurrence_ctes(dim, iters, table)
    parts.append(
        f"""
, ud0a AS MATERIALIZED (
  SELECT v.pos, 1.0 / sqrt({dim}) -
         (SELECT sum(v2.v / sqrt({dim})) FROM v{I} v2) * v.v AS w
  FROM v{I} v
)
, u0 AS MATERIALIZED (
  SELECT pos, w / (SELECT sqrt(sum(w * w)) FROM ud0a) AS v FROM ud0a
)"""
    )
    for t in range(1, iters + 1):
        q = t - 1
        parts.append(
            f"""
, du{t} AS MATERIALIZED (
  SELECT c.vec_id, sum(c.cv * u{q}.v) AS s FROM c JOIN u{q} ON u{q}.pos = c.pos
  GROUP BY c.vec_id
)
, wu{t} AS MATERIALIZED (
  SELECT c.pos, sum(c.cv * du{t}.s) AS w FROM c JOIN du{t} ON du{t}.vec_id = c.vec_id
  GROUP BY c.pos
)
, wd{t} AS MATERIALIZED (
  SELECT wu.pos,
         wu.w - (SELECT sum(w2.w * v2.v) FROM wu{t} w2 JOIN v{I} v2 ON v2.pos = w2.pos)
                * v.v AS w
  FROM wu{t} wu JOIN v{I} v ON v.pos = wu.pos
)
, u{t} AS MATERIALIZED (
  SELECT pos, w / (SELECT sqrt(sum(w * w)) FROM wd{t}) AS v FROM wd{t}
)"""
        )
    parts.append(
        f"""
SELECT v{I}.pos, round(v{I}.v, 6) AS loading1_6, round(u{I}.v, 6) AS loading2_6
FROM v{I} JOIN u{I} ON u{I}.pos = v{I}.pos"""
    )
    return "".join(parts)
