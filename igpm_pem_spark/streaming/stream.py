"""Structured Streaming flavor of the incremental superstep loop.

The reference's "stream" is a hand-rolled micro-batch replay of a
timestamped edge log (SURVEY.md §2.8): buckets arrive in order, state
(RWR/EXTRACT/results) is carried and updated per bucket. The idiomatic
Spark form is a file-source stream of edge parquet + ``foreachBatch``
driving exactly the same per-bucket update the batch replay uses
(operators/incremental.py), with engine state carried across batches by
the driver. For the graph replay, watermarks are deliberately out of
scope — the reference's buckets are ordered (``step_list`` sorted,
``gray/query_call.py:135``).

Training-data additions (round instructions): ``dedup_stream`` (exact
content dedup over a document stream, state in the streaming engine) and
``windowed_event_counts`` (event-time windows + watermark, late rows
dropped) — the two streaming shapes a corpus pipeline actually runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class StreamState:
    """Driver-held engine state updated by each micro-batch."""

    edges: DataFrame | None = None  # cumulative edge table
    components: DataFrame | None = None
    batches: int = 0
    history: list[dict] = field(default_factory=list)


def components_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: str = "src BIGINT, dst BIGINT, label STRING, ts INT",
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
) -> tuple["object", StreamState]:
    """Start a file-source stream over ``source_dir`` (new parquet files =
    new edge buckets) that maintains connected components incrementally:
    each micro-batch seeds the hash-min frontier at the arriving edges'
    endpoints only (exact — see incremental_components).

    Returns (StreamingQuery, StreamState); caller stops the query.
    """
    from ..lineage import LineageLog
    from ..operators._superstep import commit_and_stats, edge_partition_counts
    from ..operators.components import _cc_step, connected_components
    from ..operators.graph import partitioned_adjacency, vertex_ids

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    state = StreamState()

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("src", "dst").localCheckpoint(eager=True)
        if new_edges.isEmpty():
            return
        state.batches += 1
        if state.edges is None:
            state.edges = new_edges
            res = connected_components(
                spark, state.edges, num_partitions=num_partitions, steps_per_commit=4
            )
            state.components = res.components.localCheckpoint(eager=True)
            state.history.append({"batch": batch_id, "supersteps": res.supersteps})
            return
        state.edges = state.edges.unionByName(new_edges).localCheckpoint(eager=True)
        touched = (
            new_edges.select(F.col("src").alias("id"))
            .unionByName(new_edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        adj = partitioned_adjacency(state.edges, num_partitions).persist()
        verts = vertex_ids(adj)
        st = (
            verts.join(state.components, "id", "left")
            .join(touched.withColumn("t", F.lit(True)), "id", "left")
            .select(
                "id",
                F.coalesce(F.col("component"), F.col("id")).alias("component"),
                F.coalesce(F.col("t"), F.lit(False)).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        edge_parts = edge_partition_counts(adj)
        log = LineageLog(spark, None)
        supersteps = 0
        import time as _t

        while supersteps < 100:
            t1 = _t.time()
            ns = st
            for _ in range(2):
                ns = _cc_step(ns, adj, num_partitions)
            supersteps += 2
            st, delta, _ = commit_and_stats(
                log, supersteps - 1, ns,
                F.col("changed").cast("double"), F.col("changed"), edge_parts, t1,
            )
            if delta == 0.0:
                break
        state.components = st.select("id", "component").localCheckpoint(eager=True)
        adj.unpersist()
        state.history.append({"batch": batch_id, "supersteps": supersteps})

    # one file per micro-batch: availableNow would otherwise swallow every
    # waiting bucket into a single batch and the incremental path would
    # never execute — each parquet file IS an arrival bucket here
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(on_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    return query, state


def pattern_match_stream(
    spark: SparkSession,
    vertices: DataFrame,
    source_dir: str,
    q,
    *,
    schema: str = "src BIGINT, dst BIGINT, label STRING, ts INT",
    checkpoint_dir: str | None = None,
) -> tuple["object", StreamState]:
    """Streaming IGPM: a file-source edge stream drives incremental
    pattern matching — per micro-batch, ONLY matches using ≥1 arriving
    edge are enumerated (``match_pattern(delta_edges=…)``, path edges
    included via seeded closure deltas) and unioned into the carried
    match table. The streaming face of the engine's headline operator;
    the match table after the stream drains equals a batch match over
    all edges (pinned by tests).

    Returns (StreamingQuery, StreamState) — ``state.components`` is
    unused; the match table lands in ``state.matches``."""
    from ..plans.pattern import match_pattern

    state = StreamState()
    state.matches = None  # (dynamic attr: match table)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.localCheckpoint(eager=True)
        if new_edges.isEmpty():
            return
        state.batches += 1
        if state.edges is None:
            state.edges = new_edges
            m = match_pattern(spark, vertices, state.edges, q)
            state.matches = m.localCheckpoint(eager=True)
            state.history.append(
                {"batch": batch_id, "n_matches": state.matches.count()}
            )
            return
        old = state.edges
        state.edges = old.unionByName(new_edges).localCheckpoint(eager=True)
        new_m = match_pattern(
            spark, vertices, state.edges, q,
            delta_edges=new_edges, old_edges=old,
        )
        state.matches = (
            state.matches.unionByName(new_m)
            .dropDuplicates(["sig"])
            .localCheckpoint(eager=True)
        )
        state.history.append(
            {"batch": batch_id, "n_matches": state.matches.count()}
        )

    reader = spark.readStream.schema(schema).parquet(source_dir)
    writer = reader.writeStream.foreachBatch(on_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    return query, state


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id BIGINT, text STRING",
) -> "object":
    """Streaming exact dedup: first-seen document per content hash is
    appended to the parquet sink; later duplicates (within and across
    micro-batches, across restarts via the checkpoint) are dropped by the
    engine's dropDuplicates state store. Returns the StreamingQuery
    (availableNow trigger — caller awaits termination)."""
    s = spark.readStream.schema(schema).parquet(source_dir)
    out = s.select(
        "doc_id", F.md5(F.col("text")).alias("sha"), "text"
    ).dropDuplicates(["sha"])
    return (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window_dur: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Event-time daily rollup with late-data handling: rows later than
    ``watermark`` behind the max seen event time are dropped; a window is
    emitted (append mode) once the watermark passes its end — the
    standard Structured Streaming shape for event feeds (F3/A1 on a
    stream). Returns the transformed streaming DataFrame; caller picks
    the sink."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day_start"), "n_events", "total_value"
        )
    )


def sssp_stream(
    spark: SparkSession,
    source_dir: str,
    source_vertex: int,
    *,
    schema: str = "src BIGINT, dst BIGINT, w DOUBLE, ts INT",
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
) -> tuple["object", StreamState]:
    """Streaming single-source shortest paths: a file-source stream of
    weighted edge buckets maintained exactly via the monotone min-plus
    delta — each micro-batch relaxes ONLY its arriving edges against the
    carried distance table (a batch-sized join), then runs
    frontier-restricted sweeps on the cumulative graph
    (``incremental.incremental_sssp``'s step, lifted into foreachBatch).
    ``StreamState.components`` carries the (id, dist) table after each
    batch; the final table equals batch ``sssp`` on the union of all
    buckets (pinned by tests).
    """
    from ..lineage import LineageLog
    from ..operators._superstep import commit_and_stats, edge_partition_counts
    from ..operators.sssp import _prep, _sssp_step, sssp

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    state = StreamState()

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("src", "dst", "w").localCheckpoint(eager=True)
        if new_edges.isEmpty():
            return
        state.batches += 1
        if state.edges is None:
            state.edges = new_edges
            res = sssp(
                spark, state.edges, source_vertex, weight_col="w",
                num_partitions=num_partitions, steps_per_commit=4,
            )
            state.components = res.distances.localCheckpoint(eager=True)
            state.history.append({"batch": batch_id, "supersteps": res.supersteps})
            return
        state.edges = state.edges.unionByName(new_edges).localCheckpoint(eager=True)
        dist = state.components
        adj_new = _prep(new_edges, "w", directed=False)
        cand = (
            adj_new.join(
                dist.select(F.col("id").alias("src"), F.col("dist").alias("d0")),
                "src",
            )
            .select("dst", (F.col("d0") + F.col("w")).alias("cand"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cand").alias("cand"))
        )
        st = (
            dist.join(cand, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce(F.col("dist"), F.col("cand")),
                    F.coalesce(F.col("cand"), F.col("dist")),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.coalesce(F.col("cand"), F.col("dist")) < F.col("dist"))
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        full_adj = _prep(state.edges, "w", directed=False).repartition(
            num_partitions, "src"
        ).persist()
        edge_parts = edge_partition_counts(full_adj)
        log = LineageLog(spark, None)
        supersteps = 0
        import time as _t

        while supersteps < 100:
            t1 = _t.time()
            ns = st
            for _ in range(2):
                ns = _sssp_step(ns, full_adj, num_partitions)
            supersteps += 2
            st, delta, _ = commit_and_stats(
                log, supersteps - 1, ns,
                F.col("changed").cast("double"), F.col("changed"), edge_parts, t1,
            )
            if delta == 0.0:
                break
        state.components = st.select("id", "dist").localCheckpoint(eager=True)
        full_adj.unpersist()
        state.history.append({"batch": batch_id, "supersteps": supersteps})

    # one file per micro-batch (see components_stream): each parquet file
    # is an arrival bucket, so the monotone delta path actually runs
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(on_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    return query, state


def pagerank_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: str = "src BIGINT, dst BIGINT, label STRING, ts INT",
    alpha: float = 0.85,
    tol: float = 1e-6,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
) -> tuple["object", StreamState]:
    """Streaming PageRank — the flagship kernel lifted into foreachBatch:
    the first micro-batch converges from scratch; every later batch
    warm-starts from the carried ranks via the perturbation-proportional
    seed (``incremental._pagerank_warm`` — the residual is seeded only at
    vertices incident to the arriving edges, never a whole-graph
    contribution pass), then re-converges with delta-restricted
    supersteps. ``StreamState.components`` carries the (id, rank) table
    after each batch; the final table equals batch ``pagerank`` on the
    union of all buckets within the convergence tolerance (pinned by
    tests).
    """
    from ..operators.incremental import _graph_consts, _pagerank_warm
    from ..operators.pagerank import pagerank

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    state = StreamState()
    consts = {"n": 0, "dm": 0.0}

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("src", "dst").localCheckpoint(eager=True)
        if new_edges.isEmpty():
            return
        state.batches += 1
        if state.edges is None:
            state.edges = new_edges
            res = pagerank(
                spark, state.edges, alpha=alpha, tol=tol, mode="delta",
                num_partitions=num_partitions, steps_per_commit=5,
            )
            state.components = res.ranks.localCheckpoint(eager=True)
            consts["n"], consts["dm"] = _graph_consts(
                res.ranks, state.edges, directed=False
            )
            state.history.append(
                {"batch": batch_id, "supersteps": res.supersteps}
            )
            return
        prev_edges = state.edges
        cum = prev_edges.unionByName(new_edges).localCheckpoint(eager=True)
        res, n_new, dm_new = _pagerank_warm(
            spark, cum, new_edges, prev_edges, state.components,
            consts["n"], consts["dm"], False, alpha, tol, num_partitions,
        )
        state.edges = cum
        state.components = res.ranks.localCheckpoint(eager=True)
        consts["n"], consts["dm"] = n_new, dm_new
        state.history.append(
            {
                "batch": batch_id,
                "supersteps": res.supersteps,
                "seed_active": getattr(res, "seed_active", None),
            }
        )

    # one file per micro-batch (see components_stream): each parquet file
    # IS an arrival bucket, so the warm-start path actually executes
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(on_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    return query, state


def labelprop_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: str = "src BIGINT, dst BIGINT, label STRING, ts INT",
    max_iter_per_batch: int = 30,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
) -> tuple["object", StreamState]:
    """Streaming deterministic LPA: the first micro-batch converges from
    scratch; every later batch warm-starts from the carried labels with
    the arriving edges' endpoints marked changed, then runs
    receiver-restricted sweeps (``incremental._lpa_step_frontier`` — a
    vertex whose neighborhood's labels didn't change cannot change, so
    the message shuffle is frontier-proportional, not E-proportional).

    Same semantics note as ``incremental_labelprop``: LPA is
    initialization-dependent, so the warm-started fixpoint is A stable
    labeling of the updated graph; tests pin stability (one more full
    sweep changes nothing) and batch equality on unambiguous communities.
    ``StreamState.components`` carries the (id, label) table per batch.
    """
    from ..lineage import LineageLog
    from ..operators._superstep import commit_and_stats, edge_partition_counts
    from ..operators.graph import partitioned_adjacency, vertex_ids
    from ..operators.incremental import _lpa_step_frontier
    from ..operators.labelprop import label_propagation

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    state = StreamState()

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_edges = batch_df.select("src", "dst").localCheckpoint(eager=True)
        if new_edges.isEmpty():
            return
        state.batches += 1
        if state.edges is None:
            state.edges = new_edges
            res = label_propagation(
                spark, state.edges, max_iter=max_iter_per_batch,
                num_partitions=num_partitions, steps_per_commit=2,
            )
            state.components = res.labels.localCheckpoint(eager=True)
            state.history.append({"batch": batch_id, "supersteps": res.supersteps})
            return
        state.edges = state.edges.unionByName(new_edges).localCheckpoint(eager=True)
        touched = (
            new_edges.select(F.col("src").alias("id"))
            .unionByName(new_edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        adj = partitioned_adjacency(state.edges, num_partitions).persist()
        verts = vertex_ids(adj)
        st = (
            verts.join(state.components, "id", "left")
            .join(touched.withColumn("t", F.lit(True)), "id", "left")
            .select(
                "id",
                F.coalesce(F.col("label"), F.col("id")).alias("label"),
                F.coalesce(F.col("t"), F.lit(False)).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        edge_parts = edge_partition_counts(adj)
        log = LineageLog(spark, None)
        supersteps = 0
        import time as _t

        while supersteps < max_iter_per_batch:
            t1 = _t.time()
            ns = _lpa_step_frontier(st, adj, num_partitions)
            supersteps += 1
            st, delta, _ = commit_and_stats(
                log, supersteps - 1, ns,
                F.col("changed").cast("double"), F.col("changed"), edge_parts, t1,
            )
            if delta == 0.0:
                break
        state.components = st.select("id", "label").localCheckpoint(eager=True)
        adj.unpersist()
        state.history.append({"batch": batch_id, "supersteps": supersteps})

    # one file per micro-batch (see components_stream): each parquet file
    # IS an arrival bucket, so the frontier-restricted path actually runs
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(on_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    return query, state


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    schema: str = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE"
    ),
    max_files_per_trigger: int = 1,
) -> "object":
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user sessionization with an inactivity gap, the keyed-state shape
    ``session_window`` cannot express when the per-key state must be
    inspectable/extensible (the brief's "custom stateful operator" slot).

    Per user, the state is the OPEN session ``(start_ns, last_ns,
    n_events, total_value)``. Each micro-batch's rows for a key are folded
    vectorized (numpy diff → gap flags → cumsum session ids → pandas
    groupby agg — no per-row Python); sessions closed by the gap are
    emitted append-mode, the trailing session is stored with an
    EVENT-TIME timeout at ``last_ts + gap``: when the watermark passes it,
    the engine calls back with ``hasTimedOut`` and the session is emitted
    and the state removed — so output needs no end-of-stream flush logic
    beyond the watermark advancing (tests append far-future sentinel rows
    to drive it).

    Emits exactly the batch ``rel_sessionize`` schema (user_id,
    session_start epoch-seconds floor, n_events, total_value rounded 4) —
    the session boundary rule matches ``F.session_window``: a row at
    ``ts >= last + gap`` starts a new session. Parity with the batch
    query on replayed buckets is pinned by tests/test_streaming.py.

    At-scale note: exact parity requires arrival buckets ordered by event
    time within the watermark (the reference's replay is bucket-ordered,
    SURVEY §2.8); rows later than the watermark are dropped by the engine.
    State per key is one fixed-width tuple — the state store stays
    O(active users), not O(events).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = int(gap_minutes) * 60 * 1_000_000_000

    out_schema = (
        "user_id BIGINT, session_start BIGINT, n_events BIGINT, total_value DOUBLE"
    )
    state_schema = "start_ns BIGINT, last_ns BIGINT, n_events BIGINT, total_value DOUBLE"

    def _emit(user_id, sess):
        start_ns, _last, n, tot = sess
        return pd.DataFrame(
            {
                "user_id": pd.Series([user_id], dtype="int64"),
                "session_start": pd.Series([start_ns // 1_000_000_000], dtype="int64"),
                "n_events": pd.Series([int(n)], dtype="int64"),
                "total_value": pd.Series([round(float(tot), 4)], dtype="float64"),
            }
        )

    def fold(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            sess = state.get
            state.remove()
            yield _emit(user_id, sess)
            return
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        # unit-proof ns conversion (Arrow hands pandas us- or ns-resolution
        # timestamps depending on the pandas major version)
        ts = pdf["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        vals = pdf["value"].to_numpy()
        carried = state.get if state.exists else None
        # vectorized fold: gap flags -> session ids -> per-session agg
        new_s = np.ones(len(ts), dtype=bool)
        new_s[1:] = (ts[1:] - ts[:-1]) >= gap_ns
        sid = np.cumsum(new_s)
        g = pd.DataFrame({"sid": sid, "ts": ts, "v": vals}).groupby("sid", sort=True)
        agg = g.agg(
            start=("ts", "first"), last=("ts", "last"),
            n=("ts", "size"), tot=("v", "sum"),
        )
        sessions = [
            [int(r.start), int(r.last), int(r.n), float(r.tot)]
            for r in agg.itertuples()
        ]
        if carried is not None:
            first = sessions[0]
            if first[0] - carried[1] < gap_ns:  # batch head continues the open session
                sessions[0] = [
                    carried[0], first[1], carried[2] + first[2], carried[3] + first[3]
                ]
            else:
                sessions.insert(0, list(carried))
        for sess in sessions[:-1]:  # gap-closed this batch
            yield _emit(user_id, sess)
        open_sess = sessions[-1]
        state.update(tuple(open_sess))
        state.setTimeoutTimestamp(open_sess[1] // 1_000_000 + gap_ns // 1_000_000)

    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    out = (
        s.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
    return (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    tol_seconds: int = 300,
    watermark: str = "10 minutes",
    prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval join: same-key (left, right) event pairs
    with |left_ts − right_ts| ≤ tol — the streaming twin of the batch
    ``operators/timejoin.range_join`` (identical pair semantics, proved
    equal in tests). Both sides are watermarked and the join condition
    is time-bounded, so the engine provably expires buffered rows once
    the watermark passes their reach (state ≈ watermark + tol per side
    — bounded regardless of stream length, the property that makes this
    runnable forever at event-feed scale). Inner join: matches emit as
    soon as both rows have arrived; no waiting on window finalization.

    Right columns (except the key) come back ``prefix``-renamed;
    ``delta_s`` = right − left in exact integer seconds."""
    if prefix == "" or key.startswith(prefix):
        raise ValueError("interval_join_stream: prefix must be non-empty and not a key prefix")
    l = left.withWatermark(left_ts, watermark)
    r_cols = [c for c in right.columns if c != key]
    rr = right.select(
        F.col(key), *[F.col(c).alias(f"{prefix}{c}") for c in r_cols]
    ).withWatermark(f"{prefix}{right_ts}", watermark)
    cond = (
        (l[key] == rr[key])
        & (
            rr[f"{prefix}{right_ts}"]
            >= F.col(left_ts) - F.expr(f"INTERVAL {tol_seconds} SECONDS")
        )
        & (
            rr[f"{prefix}{right_ts}"]
            <= F.col(left_ts) + F.expr(f"INTERVAL {tol_seconds} SECONDS")
        )
    )
    joined = l.join(rr, cond).drop(rr[key])
    return joined.withColumn(
        "delta_s",
        F.unix_timestamp(f"{prefix}{right_ts}") - F.unix_timestamp(left_ts),
    )


def cms_counters_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "doc_id BIGINT, text STRING",
    depth: int | None = None,
    width: int | None = None,
    queryName: str = "cms_counters",
) -> "object":
    """Streaming count-min sketch: tokens of arriving documents fold into
    the depth×width counter table, maintained in COMPLETE output mode to
    an in-memory sink (the sketch IS the bounded state — D·W rows
    regardless of stream length, which is why a sketch is the canonical
    streaming aggregate where an exact per-token count would grow
    without bound). Restart-safe via the aggregation state in the
    checkpoint. Returns the StreamingQuery; read the current counters
    from ``spark.table(queryName)``.

    Batch equality: after availableNow drains N files, the sink table
    equals ``operators.sketch``'s batch counters over the union of those
    files (pinned in tests/test_streaming.py)."""
    from ..functions.text import token_id
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_bucket_exprs

    d = depth or CMS_DEPTH
    w = width or CMS_WIDTH
    s = spark.readStream.schema(schema).parquet(source_dir)
    toks = (
        s.select(
            F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos0", "token")
        )
        .where(F.col("token") != "")
        .select(token_id("token").alias("tid"))
    )
    counters = (
        toks.select(
            F.posexplode(F.array(*cms_bucket_exprs(F.col("tid"), d, w))).alias(
                "d", "bucket"
            )
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("c"))
    )
    return (
        counters.writeStream.format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


@dataclass
class NewReturningState:
    """Driver-held state for the new-vs-returning daily split."""

    user_days: DataFrame | None = None   # distinct (user_id, day) seen
    first_seen: DataFrame | None = None  # (user_id, first_day)
    counts: DataFrame | None = None      # (day, n_new, n_returning)
    batches: int = 0
    corrections: int = 0  # late-data first-day reclassifications applied


def new_returning_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    schema: str = (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    ),
    checkpoint_dir: str | None = None,
) -> tuple["object", NewReturningState]:
    """Streaming face of ``rel_new_returning_daily``: maintain the daily
    new-vs-returning active-user split incrementally over event-file
    micro-batches, with LATE-DATA CORRECTION — if a bucket delivers a
    day EARLIER than a user's recorded first-seen day, the old first
    day's 'new' credit is reclassified to 'returning' and the earlier
    day takes it (exactly the monotone first-seen semantics the batch
    query computes over the full table, regardless of arrival order).

    Per batch the work is: one distinct over the bucket, one anti-join
    against the seen (user, day) relation, one user-keyed min + join
    against the first-seen relation, and a day-cardinality counter
    merge — work ∝ bucket, state ∝ active (user, day) pairs, the PEM
    discipline applied to engagement accounting. Everything is count
    arithmetic; the final counts equal the batch query bit-for-bit.
    """
    state = NewReturningState()

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        bd = (
            batch_df.select("user_id", F.to_date("ts").alias("day"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if bd.isEmpty():
            return
        state.batches += 1
        if state.user_days is None:
            novel = bd
        else:
            novel = bd.join(state.user_days, ["user_id", "day"], "left_anti")
        novel = novel.localCheckpoint(eager=True)
        if novel.isEmpty():
            return
        state.user_days = (
            novel if state.user_days is None
            else state.user_days.unionByName(novel)
        ).localCheckpoint(eager=True)

        nf = novel.groupBy("user_id").agg(F.min("day").alias("bmin"))
        if state.first_seen is None:
            merged = nf.select(
                "user_id", F.col("bmin").alias("first_day"),
                F.lit(None).cast("date").alias("old_first"),
            )
        else:
            merged = (
                nf.join(state.first_seen, "user_id", "full_outer")
                .select(
                    "user_id",
                    F.when(
                        F.col("bmin").isNotNull()
                        & (
                            F.col("first_day").isNull()
                            | (F.col("bmin") < F.col("first_day"))
                        ),
                        F.col("bmin"),
                    )
                    .otherwise(F.col("first_day"))
                    .alias("first_day"),
                    # a correction happened when an EXISTING first day was beaten
                    F.when(
                        F.col("bmin").isNotNull()
                        & F.col("first_day").isNotNull()
                        & (F.col("bmin") < F.col("first_day")),
                        F.col("first_day"),
                    ).alias("old_first"),
                )
            )
        merged = merged.localCheckpoint(eager=True)
        state.first_seen = merged.select("user_id", "first_day").localCheckpoint(
            eager=True
        )

        # counter deltas: novel pairs classified against the FINAL first
        # day, plus reclassification of beaten first days
        classified = (
            novel.join(state.first_seen, "user_id")
            .select(
                "day",
                (F.col("day") == F.col("first_day")).cast("long").alias("n_new"),
                (F.col("day") != F.col("first_day")).cast("long").alias(
                    "n_returning"
                ),
            )
        )
        corr = merged.where(F.col("old_first").isNotNull()).select(
            F.col("old_first").alias("day"),
            F.lit(-1).cast("long").alias("n_new"),
            F.lit(1).cast("long").alias("n_returning"),
        )
        n_corr = corr.count()
        state.corrections += int(n_corr)
        delta = classified.unionByName(corr)
        merged_counts = (
            delta if state.counts is None
            else state.counts.unionByName(delta)
        )
        state.counts = (
            merged_counts.groupBy("day")
            .agg(
                F.sum("n_new").cast("bigint").alias("n_new"),
                F.sum("n_returning").cast("bigint").alias("n_returning"),
            )
            .localCheckpoint(eager=True)
        )

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(on_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    return query, state
