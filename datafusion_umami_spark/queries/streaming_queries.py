"""Structured Streaming queries over the bounded events table.

SURVEY.md §2.11: the reference's streaming is incremental execution of
unbounded sources (StreamingTableExec, streaming.rs:63) with bounded
state; its only window-bucketing primitive is the `date_bin` scalar
(functions/src/datetime/date_bin.rs).  Spark's event-time engine is a
superset — these queries prove the superset works AND matches the batch
semantics on bounded input:

- tumbling / sliding event-time windows (F.window) with a watermark,
- stream-static broadcast join (the bounded analog of the reference's
  SymmetricHashJoinExec stream-side enrichment),
- arbitrary stateful processing via applyInPandasWithState (the Spark
  analog of a custom bounded-state streaming operator).

Each AvailableNow run is deterministic, so tumbling/sliding/join hash-
match DuckDB.  The stateful query is rows-only: its per-batch update
emission has no single-statement ANSI twin (the driver records the
weaker check, as the contract allows).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register
from datafusion_umami_spark.streaming import read_events_stream, stream_to_memory
from datafusion_umami_spark.tables import table


# --- tumbling window aggregation (streaming F.window ≈ date_bin) -----------
@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
           event_type,
           COUNT(*) AS events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    LIMIT 1000
    """,
    tags=("streaming", "window", "tumbling", "watermark", "event-time"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "events",
            "value_cents",
        )
    )
    return (
        stream_to_memory(agg, "stream_tumbling_counts", "complete")
        .orderBy("win_start", "event_type")
        .limit(1000)
    )


# --- sliding window (1h width, 30m slide) -----------------------------------
@register(
    "stream_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
               AS win_start,
             user_id
      FROM events
    )
    SELECT win_start, COUNT(*) AS events, COUNT(DISTINCT user_id) AS users
    FROM slid GROUP BY win_start
    """,
    tags=("streaming", "window", "sliding", "event-time"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: each event lands in two
    windows — the oracle reproduces that by unnesting the two window
    starts per event."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("events"),
            F.approx_count_distinct("user_id").alias("users_approx"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("win_start"),
            "events",
        )
    )
    out = stream_to_memory(agg, "stream_sliding_window", "complete")
    # exact distinct users per window is not incrementally maintainable
    # without custom state — recompute batch-side for the checked column
    ev_b = table(spark, sf_dir, "events")
    users = (
        ev_b.select(
            F.explode(
                F.array(
                    F.timestamp_seconds(
                        (F.unix_timestamp("ts") / 1800).cast("bigint") * 1800
                    ),
                    F.timestamp_seconds(
                        ((F.unix_timestamp("ts") / 1800).cast("bigint") - 1) * 1800
                    ),
                )
            ).alias("win_start"),
            "user_id",
        )
        .groupBy("win_start")
        .agg(F.count_distinct("user_id").alias("users"))
        .select(F.col("win_start").cast("timestamp_ntz").alias("win_start"), "users")
    )
    return out.join(users, "win_start").select("win_start", "events", "users")


# --- stream-static broadcast join -------------------------------------------
@register(
    "stream_static_join",
    oracle="""
    SELECT event_type,
           CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                WHEN event_type = 'error' THEN 'fault' ELSE 'engagement' END
             AS category,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "join", "stream-static", "broadcast"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich a stream with a static dimension via broadcast join — the
    bounded analog of the reference's stream-side hash-join enrichment
    (SymmetricHashJoinExec, joins/symmetric_hash_join.rs:173).  The dim
    is tiny → broadcast; no shuffle touches the stream until the agg."""
    cat = spark.createDataFrame(
        [
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("error", "fault"),
            ("click", "engagement"),
            ("view", "engagement"),
        ],
        "event_type string, category string",
    )
    ev = read_events_stream(spark, sf_dir)
    joined = ev.join(F.broadcast(cat), "event_type", "left").withColumn(
        "category", F.coalesce("category", F.lit("engagement"))
    )
    agg = joined.groupBy("event_type", "category").agg(
        F.count("*").alias("events"),
        F.approx_count_distinct("user_id").alias("users_approx"),
    )
    out = stream_to_memory(agg, "stream_static_join", "complete").drop("users_approx")
    exact = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("users"))
    )
    return out.join(exact, "event_type")


# --- arbitrary stateful processing (applyInPandasWithState) -----------------
@register(
    "stream_stateful_user_sessions",
    # The bounded source is one parquet file → one micro-batch under
    # AvailableNow, so update-mode emits exactly one row per user and the
    # final state equals the batch aggregate (would need rows-only if the
    # driver ever splits events across files per TESTDATA.md).
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_seen_us
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "applyInPandasWithState", "pandas-udf"),
)
def stream_stateful_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom bounded-state streaming operator: per-user running event
    count + latest timestamp, kept in GroupState across micro-batches —
    Spark's route to the reference's custom stateful stream operators
    (bounded-state requirement, SURVEY.md §2.11)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_sessions(key, pdfs, state: GroupState):
        count, last_us = state.get() if state.exists else (0, 0)
        for pdf in pdfs:
            count += len(pdf)
            if len(pdf):
                # as_unit("ns"): Arrow may hand pandas a datetime64[us]
                # series whose Timestamp.value is unit-relative — pin ns
                # explicitly, then truncate to µs
                last_us = max(
                    last_us,
                    int(pd.Timestamp(pdf["ts"].max()).as_unit("ns").value // 1000),
                )
        state.update((count, last_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [count], "last_seen_us": [last_us]}
        )

    ev = read_events_stream(spark, sf_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        update_sessions,
        outputStructType="user_id bigint, n_events bigint, last_seen_us bigint",
        stateStructType="n_events bigint, last_seen_us bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return stream_to_memory(out, "stream_stateful_user_sessions", "update")


# --- session windows (batch sessionization; gaps-and-islands oracle) --------
@register(
    "session_window_agg",
    # DuckDB twin: classic gaps-and-islands — a new session starts only
    # when the gap to the previous event STRICTLY exceeds 30 minutes.
    # Spark merges session windows that touch: per-event windows are
    # [ts, ts + gap), and an event landing EXACTLY on a session's end
    # boundary is merged into it (empirically pinned by
    # tests/test_fuzz.py::test_session_window_matches_gaps_and_islands_
    # reference — events at t and t+gap form ONE session of span
    # [t, t + 2*gap)).  The original oracle split on >=, which can never
    # disagree on the sf data (µs-resolution timestamps never land an
    # exact 30-minute gap) but diverges on any corpus with quantized
    # timestamps — the property test's 1-second grid hits it instantly.
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS events
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    LIMIT 1000
    """,
    tags=("streaming", "session-window", "sessionization", "event-time"),
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window over events (30-minute inactivity gap): the
    sessionization operator every behavioral/training pipeline needs.
    Runs identically over readStream (dynamic gap close via watermark);
    batch mode here so the DuckDB oracle applies row-for-row."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "events",
        )
        .orderBy("user_id", "session_start")
        .limit(1000)
    )


# --- stream-stream interval join --------------------------------------------
@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT a.user_id,
           CAST(a.ts AS TIMESTAMP) AS p_ts,
           CAST(b.ts AS TIMESTAMP) AS e_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'purchase' AND b.event_type = 'error'
    ORDER BY a.user_id, p_ts, e_ts
    LIMIT 1000
    """,
    tags=("streaming", "join", "stream-stream", "interval", "watermark"),
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition
    and watermarks on BOTH sides (errors within 30 minutes after each
    purchase, per user) — Spark's bounded-state two-stream join; the
    time bound + watermarks are what let the state store evict rows
    (the reference's SymmetricHashJoinExec plays the same range-pruning
    role, joins/symmetric_hash_join.rs:173).  AvailableNow on bounded
    input processes everything, so the batch interval-join oracle
    applies exactly."""
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    errors = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", "1 hour")
    )
    joined = purchases.join(
        errors,
        F.expr(
            "user_id = e_user AND e_ts >= p_ts "
            "AND e_ts <= p_ts + INTERVAL 30 MINUTES"
        ),
        "inner",
    ).select(
        "user_id",
        F.col("p_ts").cast("timestamp_ntz").alias("p_ts"),
        F.col("e_ts").cast("timestamp_ntz").alias("e_ts"),
    )
    return (
        stream_to_memory(joined, "stream_stream_interval_join", "append")
        .orderBy("user_id", "p_ts", "e_ts")
        .limit(1000)
    )


# --- streaming exact dedup with bounded state -------------------------------
@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS hour_ts
    FROM events
    ORDER BY user_id, event_type, hour_ts
    LIMIT 1000
    """,
    tags=("streaming", "dedup", "watermark", "bounded-state"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    dropDuplicatesWithinWatermark keeps a key's state only until the
    watermark passes it, so an unbounded run never accumulates
    unbounded dedup state — the streaming sibling of dedup_exact and a
    capability the reference has no analog for (its streaming layer has
    no event-time semantics at all, SURVEY.md §2.11; nearest scalar is
    date_bin, reference functions/src/datetime/date_bin.rs).

    The dedup key is the full projected row (user, type, hour bucket),
    so on bounded input the append-mode result is exactly the batch
    DISTINCT — hash-checked against DuckDB.  At 100 TB the state store
    holds one entry per live key within the watermark horizon; state
    expiry, not executor memory, bounds it."""
    deduped = (
        read_events_stream(spark, sf_dir)
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        )
        .withWatermark("hour_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "hour_ts"])
        .select(
            "user_id",
            "event_type",
            F.col("hour_ts").cast("timestamp_ntz").alias("hour_ts"),
        )
    )
    return (
        stream_to_memory(deduped, "stream_dedup_within_watermark", "append")
        .orderBy("user_id", "event_type", "hour_ts")
        .limit(1000)
    )


# --- chained streaming aggregations: minute → hour cascade -----------------
@register(
    "stream_multires_cascade",
    # Append mode only emits windows the final watermark (max event time
    # minus the 1-minute delay) has closed — the oracle reproduces that
    # cutoff exactly: hour windows whose end is past the watermark stay
    # unemitted (they are still open state on a live stream).
    oracle="""
    WITH cutoff AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS wm FROM events)
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events, cutoff
    WHERE time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR <= cutoff.wm
    GROUP BY 1
    ORDER BY win_start
    LIMIT 2000
    """,
    tags=("streaming", "cascade", "multi-resolution", "event-time"),
    # bench-flagged (r5 verdict item 5): the one untimed subsystem was
    # state-store cost — this entry times the full two-level stateful
    # cascade (watermark + chained window aggs) end-to-end at sf0.1.
    bench=True,
)
def stream_multires_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming sibling of ts_multires_rollup: two CHAINED stateful
    aggregations in one query — minute tumbling windows re-aggregated
    into hour windows (window-over-window, supported since Spark 3.4,
    append mode required).  At 100 TB this is the always-on ingestion
    rollup: the hour state re-aggregates 60 minute-rows, never raw
    events, so state size is bounded by live windows × grain ratio.
    The reference has no event-time engine at all (SURVEY.md §2.11) —
    its closest primitive is the date_bin scalar
    (functions/src/datetime/date_bin.rs)."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 minute")
    minute = ev.groupBy(F.window("ts", "1 minute")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    hour = (
        minute.groupBy(F.window(F.col("window"), "1 hour"))
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("win_start"),
            F.col("n"),
            F.col("cents"),
        )
    )
    return (
        stream_to_memory(hour, "stream_multires_cascade", "append")
        .orderBy("win_start")
        .limit(2000)
    )


# --- foreachBatch incremental upsert sink ----------------------------------
@register(
    "stream_foreach_batch_upsert",
    # Final upserted state == batch latest-event-per-user (ties broken by
    # event_id, the same total order the micro-batch merge uses).
    oracle="""
    SELECT user_id, event_type AS last_type,
           CAST(round(value * 100) AS BIGINT) AS last_value_c
    FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    ORDER BY user_id
    LIMIT 2000
    """,
    tags=("streaming", "foreach-batch", "upsert", "sink"),
)
def stream_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production sink pattern Structured Streaming deployments run
    against warehouses without MERGE support: foreachBatch receives each
    micro-batch as a plain DataFrame and applies an idempotent
    latest-wins upsert into a keyed state table.  The state is a keyed
    parquet table (the stand-in for a JDBC/Delta MERGE target); per
    batch the arriving rows are reduced map-side to one row per key,
    then FULL OUTER JOIN-merged into the state table executor-side —
    the same relational MERGE shape as `merge_upsert_latest_wins`
    (dataframe_ops.py).  The driver holds only the current state PATH:
    state size is bounded by |keys| on executors/storage, never driver
    memory, so the pattern survives 10^9-key ingest where a driver-side
    dict would OOM.  Cents are computed in Spark SQL (half-up round,
    matching the oracle) before the merge.  Final state hash-matches
    the batch dedup-latest oracle."""
    import os
    import shutil

    from datafusion_umami_spark.streaming.runner import scratch_dir

    ev = read_events_stream(spark, sf_dir)

    # Per-(app, sf, query) scratch root, cleared at query start (see
    # scratch_dir: session-deterministic, process/user-isolated).
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = scratch_dir(spark, "stream_upsert", sf_tag)
    state_path: list[str] = []  # driver keeps a path, never rows

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        reduced = (
            batch_df.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.desc("ts"), F.desc("event_id")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "ts",
                "event_id",
                F.col("event_type").alias("last_type"),
                F.round(F.col("value") * 100).cast("bigint").alias("last_value_c"),
            )
        )
        if state_path:
            prev = batch_df.sparkSession.read.parquet(state_path[-1])
            # Latest-wins merge: keep whichever side has the greater
            # (ts, event_id); struct comparison gives the tuple order.
            merged = (
                prev.alias("s")
                .join(reduced.alias("b"), on="user_id", how="full_outer")
                .select(
                    "user_id",
                    *(
                        F.when(
                            F.col("b.ts").isNull()
                            | (
                                F.col("s.ts").isNotNull()
                                & (
                                    F.struct("s.ts", "s.event_id")
                                    > F.struct("b.ts", "b.event_id")
                                )
                            ),
                            F.col(f"s.{c}"),
                        )
                        .otherwise(F.col(f"b.{c}"))
                        .alias(c)
                        for c in ("ts", "event_id", "last_type", "last_value_c")
                    ),
                )
            )
        else:
            merged = reduced
        out_path = os.path.join(root, f"state_v{batch_id}")
        merged.write.mode("overwrite").parquet(out_path)
        state_path.append(out_path)
        if len(state_path) > 1:
            # the new version is durably written; the superseded one is
            # unreferenced — prune so disk stays O(|keys|), not
            # O(batches × |keys|)
            shutil.rmtree(state_path.pop(0), ignore_errors=True)

    checkpoint = os.path.join(root, "checkpoint")
    q = (
        ev.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if not state_path:
        return spark.createDataFrame(
            [], "user_id long, last_type string, last_value_c long"
        )
    out = spark.read.parquet(state_path[-1]).select(
        "user_id", "last_type", "last_value_c"
    )
    return out.orderBy("user_id").limit(2000)
