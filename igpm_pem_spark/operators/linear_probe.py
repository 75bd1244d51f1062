"""Logistic-regression linear probe over an embedding corpus.

The standard intrinsic-quality gate a training pipeline runs on its
embedding column (next to kNN label accuracy): fit a linear classifier
on frozen features; if a linear probe can't separate a label, the
embedding doesn't encode it. Binary one-vs-rest probe, full-batch
gradient descent with a FIXED step count and a zero start, so an
independent SQL engine replays the identical recurrence:

    m_row = b + ⟨w, x_row⟩                 (row-local expression)
    g_row = σ(m_row) − y_row               (row-local)
    w_d  ← w_d − η/n · Σ_rows g_row·x_row,d
    b    ← b   − η/n · Σ_rows g_row

Per step: ONE corpus scan fused into a (d+1)-value global aggregate —
partial sums per partition + a 65-double merge, ZERO shuffle, the same
scale shape as ``pca.pca_top_component``. The only driver traffic is
the weight vector itself. At 10^9 vectors each step is a single
embarrassingly-parallel pass; the fixed-step output is the exact
recurrence value (not the converged optimum — raise ``iters`` for
that), which is what makes it cross-engine checkable. GD is
self-correcting, so sum-order float noise damps; outputs round to 6
decimals for the comparison (the PCA convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fit(
    emb: DataFrame,
    dim: int,
    iters: int,
    lr: float,
    target_label: int,
    vec_col: str,
    label_col: str,
    corpus_count: int | None,
):
    """Run the fixed GD recurrence; returns (margin_expr_fn, w, b) with
    w/b as plain python floats (the only driver traffic, 65 doubles per
    step). Expressions are array-native (zip_with/aggregate with the
    same left-associative order as the old per-dimension unrolled chain
    — bit-identical) and the sigmoid residual is staged as a projection
    column, so the per-iteration logical plan is O(dim) nodes instead of
    the O(dim²) tree that made each step Catalyst-compile-bound."""
    if iters < 1 or dim < 1:
        raise ValueError("linear_probe: iters and dim must be >= 1")
    xarr = F.transform(
        F.slice(F.col(vec_col), 1, dim), lambda e: e.cast("double")
    )
    y = (F.col(label_col) == F.lit(target_label)).cast("double")
    # visible one-stats-job count unless the caller already knows it
    n = emb.count() if corpus_count is None else corpus_count
    if n == 0:
        raise ValueError("linear_probe: empty corpus")

    def margin(arr, w: list[float], b: float):
        # b + Σ_d x_d·w_d, accumulated 0..dim-1 from b — the same order
        # as the previous unrolled chain
        return F.aggregate(
            F.zip_with(
                arr, F.array(*[F.lit(wd) for wd in w]), lambda a, c: a * c
            ),
            F.lit(b),
            lambda acc, t: acc + t,
        )

    from ._superstep import loop_confs

    w = [0.0] * dim
    b = 0.0
    # loop_confs: each GD step embeds the fresh weights as literals — a
    # brand-new plan whose whole-stage Janino compile repeats per step
    # (see _superstep.loop_confs; same trade as the pca loops)
    with loop_confs(emb.sparkSession):
        for _ in range(iters):
            staged = emb.select(xarr.alias("_x"), y.alias("_y")).select(
                "_x",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-margin(F.col("_x"), w, b)))
                    - F.col("_y")
                ).alias("_g"),
            )
            # getItem, not element_at — the dim-wide ElementAt aggregate
            # falls out of whole-stage codegen (see similarity._pair_cos4)
            row = staged.agg(
                *[
                    F.sum(F.col("_g") * F.col("_x").getItem(d)).alias(f"g{d}")
                    for d in range(dim)
                ],
                F.sum("_g").alias("gb"),
            ).collect()[0]
            w = [w[d] - lr / n * float(row[f"g{d}"]) for d in range(dim)]
            b = b - lr / n * float(row["gb"])
    return margin, w, b


def logreg_probe_weights(
    emb: DataFrame,
    *,
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    vec_col: str = "embedding",
    label_col: str = "label",
    corpus_count: int | None = None,
) -> DataFrame:
    """(pos, w6): trained probe weights, pos 1..dim; pos 0 is the bias."""
    _, w, b = _fit(emb, dim, iters, lr, target_label, vec_col, label_col, corpus_count)
    spark = emb.sparkSession
    rows = [(0, round(b, 6))] + [(d + 1, round(w[d], 6)) for d in range(dim)]
    return spark.createDataFrame(rows, "pos INT, w6 DOUBLE")


def logreg_probe_accuracy(
    emb: DataFrame,
    *,
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    vec_col: str = "embedding",
    label_col: str = "label",
    corpus_count: int | None = None,
) -> DataFrame:
    """One row (n_rows, n_pos, n_correct): train-set accuracy of the
    fitted probe at threshold 0.5 (margin > 0). After the driver-tiny
    fit, scoring is a stateless row-local expression — zero shuffle."""
    margin, w, b = _fit(emb, dim, iters, lr, target_label, vec_col, label_col, corpus_count)
    xarr = F.transform(
        F.slice(F.col(vec_col), 1, dim), lambda e: e.cast("double")
    )
    m = margin(xarr, w, b)
    y = (F.col(label_col) == F.lit(target_label)).cast("int")
    pred = (m > 0).cast("int")
    return emb.agg(
        F.count("*").alias("n_rows"),
        F.sum(y).cast("long").alias("n_pos"),
        F.sum((pred == y).cast("int")).cast("long").alias("n_correct"),
    )


def _recurrence_ctes(
    dim: int, iters: int, lr: float, target_label: int, table: str
) -> str:
    """CTE chain unrolling the GD recurrence at (row, dim) granularity.
    MATERIALIZED throughout — w{t}/b{t} are each referenced by two CTEs
    of round t+1 and an inlined chain explodes the planner."""
    parts = [
        f"""WITH x AS MATERIALIZED (
  SELECT vec_id, CAST(d.i AS INT) AS pos,
         CAST(embedding[CAST(d.i AS INT)] AS DOUBLE) AS val
  FROM {table} JOIN range(1, {dim + 1}) d(i) ON true
)
, y AS MATERIALIZED (
  SELECT vec_id, CAST(label = {target_label} AS DOUBLE) AS y FROM {table}
)
, nn AS MATERIALIZED (SELECT count(*) AS n FROM {table})
, w0 AS MATERIALIZED (
  SELECT CAST(i AS INT) AS pos, 0.0 AS w FROM range(1, {dim + 1}) t(i)
)
, b0 AS MATERIALIZED (SELECT 0.0 AS b)"""
    ]
    for t in range(1, iters + 1):
        q = t - 1
        parts.append(
            f"""
, m{t} AS MATERIALIZED (
  SELECT x.vec_id, (SELECT b FROM b{q}) + sum(x.val * w{q}.w) AS m
  FROM x JOIN w{q} ON w{q}.pos = x.pos GROUP BY x.vec_id
)
, g{t} AS MATERIALIZED (
  SELECT m.vec_id, 1.0 / (1.0 + exp(-m.m)) - y.y AS g
  FROM m{t} m JOIN y ON y.vec_id = m.vec_id
)
, w{t} AS MATERIALIZED (
  SELECT x.pos, any_value(w{q}.w) - {lr!r} / (SELECT n FROM nn) * sum(x.val * g.g) AS w
  FROM x JOIN g{t} g ON g.vec_id = x.vec_id JOIN w{q} ON w{q}.pos = x.pos
  GROUP BY x.pos
)
, b{t} AS MATERIALIZED (
  SELECT (SELECT b FROM b{q}) - {lr!r} / (SELECT n FROM nn) * sum(g) AS b FROM g{t}
)"""
        )
    return "".join(parts)


def logreg_oracle_sql(
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    table: str = "embeddings",
) -> str:
    """(pos, w6) oracle replaying the identical recurrence in DuckDB."""
    return (
        _recurrence_ctes(dim, iters, lr, target_label, table)
        + f"""
SELECT 0 AS pos, round(b, 6) AS w6 FROM b{iters}
UNION ALL
SELECT pos, round(w, 6) AS w6 FROM w{iters}
ORDER BY pos"""
    )


def logreg_accuracy_oracle_sql(
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    table: str = "embeddings",
) -> str:
    """(n_rows, n_pos, n_correct) oracle: score with the round-{iters}
    weights at margin > 0."""
    return (
        _recurrence_ctes(dim, iters, lr, target_label, table)
        + f"""
, margin AS MATERIALIZED (
  SELECT x.vec_id, (SELECT b FROM b{iters}) + sum(x.val * w.w) AS m
  FROM x JOIN w{iters} w ON w.pos = x.pos GROUP BY x.vec_id
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(y.y AS INT)) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN (m.m > 0) = (y.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM margin m JOIN y ON y.vec_id = m.vec_id"""
    )


def logreg_probe_auc(
    emb: DataFrame,
    *,
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    vec_col: str = "embedding",
    label_col: str = "label",
    corpus_count: int | None = None,
) -> DataFrame:
    """One row (n_pos, n_neg, auc6): exact ROC-AUC of the fitted probe by
    the tie-aware Mann-Whitney rank-sum — threshold-free separability,
    the eval a probe-based quality gate is actually judged by (accuracy
    at 0.5 hides a miscalibrated-but-well-ordered probe).

    Margins are rounded to 6 decimals BEFORE ranking so both engines
    form identical tie groups (the two sides accumulate the dot product
    in different orders; last-ulp drift must not flip a rank). The rank
    sum is computed per DISTINCT rounded margin — one groupBy + one
    ordered window whose state is the distinct-score table (bounded by
    the 1e-6 grid over the margin range, not the corpus), then
    U = Σ_s pos_s·avgrank_s − n_pos(n_pos+1)/2 and AUC = U/(n_pos·n_neg).
    """
    from pyspark.sql import Window

    margin, w, b = _fit(
        emb, dim, iters, lr, target_label, vec_col, label_col, corpus_count
    )
    xarr = F.transform(
        F.slice(F.col(vec_col), 1, dim), lambda e: e.cast("double")
    )
    y = (F.col(label_col) == F.lit(target_label)).cast("int")
    scored = emb.select(
        F.round(margin(xarr, w, b), 6).alias("s6"), y.alias("y")
    )
    g = scored.groupBy("s6").agg(
        F.count("*").alias("c"), F.sum("y").alias("cp")
    )
    ow = Window.orderBy("s6").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "s6", "c", "cp",
        (
            F.coalesce(F.sum("c").over(ow), F.lit(0))
            + (F.col("c") + 1) / F.lit(2.0)
        ).alias("avgrank"),
    )
    return ranked.agg(
        F.sum("cp").cast("long").alias("n_pos"),
        (F.sum("c") - F.sum("cp")).cast("long").alias("n_neg"),
        F.sum(F.col("cp") * F.col("avgrank")).alias("_rs"),
        F.sum("cp").alias("_np"),
        (F.sum("c") - F.sum("cp")).alias("_nn"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("_rs") - F.col("_np") * (F.col("_np") + 1) / F.lit(2.0))
            / (F.col("_np") * F.col("_nn")),
            6,
        ).alias("auc6"),
    )


def logreg_auc_oracle_sql(
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    table: str = "embeddings",
) -> str:
    """(n_pos, n_neg, auc6) oracle: identical recurrence, identical
    rounded-margin tie groups, identical rank-sum arithmetic."""
    return (
        _recurrence_ctes(dim, iters, lr, target_label, table)
        + f"""
, margin AS MATERIALIZED (
  SELECT x.vec_id, (SELECT b FROM b{iters}) + sum(x.val * w.w) AS m
  FROM x JOIN w{iters} w ON w.pos = x.pos GROUP BY x.vec_id
)
, scored AS MATERIALIZED (
  SELECT round(m.m, 6) AS s6, CAST(y.y AS INT) AS y
  FROM margin m JOIN y ON y.vec_id = m.vec_id
)
, grp AS MATERIALIZED (
  SELECT s6, count(*) AS c, sum(y) AS cp FROM scored GROUP BY s6
)
, ranked AS MATERIALIZED (
  SELECT s6, c, cp,
         coalesce(sum(c) OVER (ORDER BY s6 ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0)
           + (c + 1) / 2.0 AS avgrank
  FROM grp
)
SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
       CAST(sum(c) - sum(cp) AS BIGINT) AS n_neg,
       round((sum(cp * avgrank) - sum(cp) * (sum(cp) + 1) / 2.0)
             / (sum(cp) * (sum(c) - sum(cp))), 6) AS auc6
FROM ranked"""
    )


def logreg_lift_deciles(
    emb: DataFrame,
    *,
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    vec_col: str = "embedding",
    label_col: str = "label",
    corpus_count: int | None = None,
) -> DataFrame:
    """(decile, n, n_pos, frac_pos6, mean_margin6): the probe's lift
    chart — corpus ranked by fitted margin (highest first), cut into 10
    ntile buckets, per bucket the positive rate and mean margin. The
    monotonicity view a probe-based data-quality gate is judged by
    (AUC summarizes ranking, the lift chart shows WHERE the ranking
    pays: how concentrated the positives are in the top deciles).

    Margins are rounded to 6 decimals first and the ntile order is the
    total order (s6 DESC, vec_id ASC), so bucket assignment is
    bit-deterministic across engines — same recipe as the AUC's tie
    groups. One scan to score, one window over the scored rows. The
    global ntile sorts on a single reducer at this scale; at 100 TB the
    cut points come from approx_percentile over the margins (10 scalar
    boundaries broadcast back) — same downstream, no global sort.
    """
    from pyspark.sql import Window

    margin, w, b = _fit(
        emb, dim, iters, lr, target_label, vec_col, label_col, corpus_count
    )
    xarr = F.transform(
        F.slice(F.col(vec_col), 1, dim), lambda e: e.cast("double")
    )
    y = (F.col(label_col) == F.lit(target_label)).cast("int")
    scored = emb.select(
        F.col("vec_id"),
        F.round(margin(xarr, w, b), 6).alias("s6"),
        y.alias("y"),
    )
    ow = Window.orderBy(F.desc("s6"), F.asc("vec_id"))
    return (
        scored.withColumn("decile", F.ntile(10).over(ow))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.round(F.sum("y") / F.count("*"), 6).alias("frac_pos6"),
            F.round(F.avg("s6"), 6).alias("mean_margin6"),
        )
        .select(F.col("decile").cast("long").alias("decile"),
                "n", "n_pos", "frac_pos6", "mean_margin6")
    )


def logreg_lift_oracle_sql(
    dim: int = 64,
    iters: int = 4,
    lr: float = 1.0,
    target_label: int = 0,
    table: str = "embeddings",
) -> str:
    """(decile, n, n_pos, frac_pos6, mean_margin6) oracle: identical
    recurrence, identical rounded margins, identical ntile order."""
    return (
        _recurrence_ctes(dim, iters, lr, target_label, table)
        + f"""
, margin AS MATERIALIZED (
  SELECT x.vec_id, (SELECT b FROM b{iters}) + sum(x.val * w.w) AS m
  FROM x JOIN w{iters} w ON w.pos = x.pos GROUP BY x.vec_id
)
, scored AS MATERIALIZED (
  SELECT m.vec_id, round(m.m, 6) AS s6, CAST(y.y AS INT) AS y
  FROM margin m JOIN y ON y.vec_id = m.vec_id
)
, tiled AS (
  SELECT s6, y, ntile(10) OVER (ORDER BY s6 DESC, vec_id ASC) AS decile
  FROM scored
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       round(sum(y) * 1.0 / count(*), 6) AS frac_pos6,
       round(avg(s6), 6) AS mean_margin6
FROM tiled GROUP BY decile"""
    )
