"""Streaming runner: bounded parquet → readStream → memory sink.

`Trigger.AvailableNow` drains everything currently in the source and
stops — on the driver's bounded tables that makes a streaming query a
deterministic function of its input, so the SAME DuckDB oracles used for
batch queries apply.  On a real cluster the identical plan runs
unbounded (drop the trigger, point the sink at kafka/delta): the
transformations, watermarks and state logic don't change — that is the
Structured Streaming design point.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _scratch_base() -> str:
    """Base directory for streaming scratch (checkpoints, upsert state).

    r14 (guide §1/§5): the cascade's drain time was DOMINATED by
    state-store commit fsyncs against the checkpoint dir (~200 ms per
    store commit on this host's ext4 /tmp; 2 stateful ops x 32
    partitions x 2 microbatches).  These checkpoints carry NO recovery
    value across processes — scratch_dir deliberately CLEARS at start
    (see below) — so they are pure scratch and prefer tmpfs
    (/dev/shm) when present AND comfortably free (r14 ADVICE: tmpfs
    defaults to ~50% RAM, so on a small-memory host a larger state
    store must fall back to disk rather than ENOSPC).  A real
    deployment points checkpointLocation at durable storage instead;
    override with SPARK_GRAFT_STREAM_SCRATCH.  Note: scratch trees from
    pre-r14 runs may linger under /tmp (and under /dev/shm after a
    crash) until the next same-app run clears them — both live under
    dus_scratch_<uid> so a manual sweep is one rm -rf."""
    env = os.environ.get("SPARK_GRAFT_STREAM_SCRATCH")
    if env:
        return env
    floor = int(
        os.environ.get("SPARK_GRAFT_SHM_FREE_FLOOR", str(2 * 1024**3))
    )
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        try:
            if shutil.disk_usage("/dev/shm").free >= floor:
                return "/dev/shm"
        except OSError:
            pass
    return tempfile.gettempdir()


def scratch_dir(spark: SparkSession, *parts: str) -> str:
    """Deterministic WITHIN a Spark application, isolated ACROSS
    processes and users: reruns in one session overwrite (no
    per-invocation tempdir leak) while a concurrent sweep/pytest pair
    cannot rmtree each other's in-flight streaming checkpoints, and a
    shared /tmp never hits another user's 0755 parent.  Clearing (not
    reusing) at start is load-bearing — a stale checkpoint would make
    a restarted query skip already-committed source files while the
    fresh sink starts empty, silently losing rows."""
    root = os.path.join(
        _scratch_base(),
        f"dus_scratch_{os.getuid()}",
        spark.sparkContext.applicationId,
        *parts,
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    return root

_EVENTS_SCHEMA_NS = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)
_EVENTS_SCHEMA_US = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`spark.readStream` over the events parquet (StreamingTableExec
    parity).  ts encoding + normalization are shared with the batch
    loader (tables.events_ts_is_ns / normalize_events_ts): a one-file
    batch probe picks the imposed schema — imposing the bigint schema on
    µs data would silently misread values 1000× compressed.  Target type
    is TIMESTAMP (LTZ): `withWatermark` rejects NTZ event time; session
    TZ is pinned UTC so wall-clock equals the batch loader's NTZ."""
    from datafusion_umami_spark.tables import events_ts_is_ns, normalize_events_ts

    ns_encoded = events_ts_is_ns(spark, sf_dir)
    # FileStreamSource wants a directory; events.parquet is a single file,
    # so stream the directory with a glob filter (on a real deployment the
    # path would be a growing directory of files).
    sdf = (
        spark.readStream.schema(_EVENTS_SCHEMA_NS if ns_encoded else _EVENTS_SCHEMA_US)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_events_ts(sdf, "timestamp")


def stream_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into an
    in-memory sink table and return it as a batch DataFrame."""
    spark = sdf.sparkSession
    checkpoint = scratch_dir(spark, "stream", name)
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
