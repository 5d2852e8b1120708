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

# --- adaptive state-partition coalescing (r15, guide §2.2/§6) -------------
# Stateful streaming is denied AQE partition coalescing: the state
# partition count pins to spark.sql.shuffle.partitions at FIRST query
# start and every micro-batch pays one state-store open+commit PER
# PARTITION PER STATEFUL OPERATOR, so a small input on a wide session
# conf spends its drain on store commits (r14 measured the cascade at
# 2 ops x 32 partitions x 2 batches = 128 commits for 100k rows; the
# driver's own 8-core run was ~2x faster PURELY from 4x fewer stores).
# This reimplements AQE's coalesce rule for the streaming case:
#   n = min(shuffle.partitions, ceil(source_bytes / advisoryPartitionSize))
# — never ABOVE the configured parallelism (the cluster setting is
# respected exactly like AQE, which only ever coalesces DOWN), and at
# 100 TB source_bytes/advisory is astronomically larger than any
# shuffle.partitions value, so the rule is provably a no-op at scale —
# the same opt-in-shape argument as the r14 scan spread.  Results are
# partition-count-independent (the hostile-config parity gate already
# runs every streaming spec at 3 shuffle partitions).
# `read_events_stream` records its source size per session;
# `stream_to_memory` applies the override around the drain and restores
# the conf afterwards (the conf is read at query start and re-read per
# micro-batch, so the override must span awaitTermination).
# SPARK_GRAFT_STREAM_STATE_COALESCE=off disables (A/B hook).
_SOURCE_BYTES: dict[int, int] = {}  # id(SparkSession) -> bytes of last stream read


def _parse_bytes(s: str) -> int:
    """Parse a Spark byte-size conf string ('64MB', '256m', '1048576')."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([kmgt]?)b?\s*", s, re.IGNORECASE)
    if not m:
        return 64 * 1024 * 1024
    mult = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    return int(m.group(1)) * mult[m.group(2).lower()]


def _coalesced_state_partitions(spark: SparkSession) -> int | None:
    """The adaptive override for this session's next streaming drain, or
    None when it would not shrink anything (unknown source size, small
    conf, opt-out)."""
    if os.environ.get("SPARK_GRAFT_STREAM_STATE_COALESCE", "on") == "off":
        return None
    size = _SOURCE_BYTES.get(id(spark))
    if not size:
        return None
    try:
        current = int(spark.conf.get("spark.sql.shuffle.partitions"))
        advisory = _parse_bytes(
            spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        )
    except Exception:
        return None
    n = max(1, -(-size // advisory))  # ceil
    return n if n < current else None


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
    try:  # source size for the adaptive state-partition coalesce
        _SOURCE_BYTES[id(spark)] = os.stat(
            os.path.join(sf_dir, "events.parquet")
        ).st_size
    except OSError:
        _SOURCE_BYTES.pop(id(spark), None)
    return normalize_events_ts(sdf, "timestamp")


def stream_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into an
    in-memory sink table and return it as a batch DataFrame."""
    spark = sdf.sparkSession
    checkpoint = scratch_dir(spark, "stream", name)
    n = _coalesced_state_partitions(spark)
    saved: str | None = None
    if n is not None:
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        global _LAST_QUERY
        _LAST_QUERY = q  # diagnostics hook: progress log of the drain
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(name)


# Most recent drained query (stream_to_memory) — lets probes/tests read
# recentProgress (per-batch durations, state-operator commit times,
# numShufflePartitions) after the drain without changing the return
# contract.  Diagnostics only.
_LAST_QUERY = None
