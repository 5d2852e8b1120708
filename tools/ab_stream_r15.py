"""Round-15 stream_multires_cascade state-store probe (guide §1; r14
verdict item 1): the drain was bounded by state-store commit count/cost
(2 stateful ops x shuffle-partitions stores x 2 microbatches).  Arms,
interleaved in one process so host drift cancels:

  A: committed — HDFSBackedStateStoreProvider on the tmpfs scratch
  B: RocksDBStateStoreProvider
  C: RocksDBStateStoreProvider + changelog checkpointing
  D: HDFS provider + unsaferow format validation off (per-batch cost?)

Each run uses a FRESH scratch checkpoint (provider class is baked into
checkpoint metadata, so no cross-arm contamination is possible), the
provider conf is restored after every run, and the hour-level result is
asserted identical across arms every iteration.  Per-batch durationMs
and state-operator commit times printed for the best run of each arm.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_umami_spark.session import get_spark
from datafusion_umami_spark.streaming.runner import (
    read_events_stream,
    stream_to_memory,
)

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)
FMT_CHECK_KEY = "spark.sql.streaming.stateStore.formatValidation.enabled"

# each arm: (session confs, adaptive-state-coalesce on/off)
ARMS = {
    "A": ({}, "off"),  # r14 committed behavior
    "B": ({PROVIDER_KEY: ROCKSDB}, "off"),
    "C": ({PROVIDER_KEY: ROCKSDB, CHANGELOG_KEY: "true"}, "off"),
    "D": ({FMT_CHECK_KEY: "false"}, "off"),
    "E": ({}, "on"),  # r15 adaptive state-partition coalesce
    "F": ({PROVIDER_KEY: ROCKSDB, CHANGELOG_KEY: "true"}, "on"),
}


def run_once(
    spark, sf_dir: str, tag: str, confs: dict, coalesce: str = "off"
) -> tuple[float, list, int, int]:
    os.environ["SPARK_GRAFT_STREAM_STATE_COALESCE"] = coalesce
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        t0 = time.perf_counter()
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
        out = stream_to_memory(hour, f"ab_r15_{tag}", "append")
        dt = time.perf_counter() - t0
        rows = out.collect()
        sig = sorted((r.win_start, r.n, r.cents) for r in rows)
        from datafusion_umami_spark.streaming import runner as _runner

        progress = list(_runner._LAST_QUERY.recentProgress)
        return dt, progress, hash(tuple(sig)), len(sig)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "4"))
    arms = os.environ.get("AB_ARMS", "ABCD")
    spark = get_spark("ab_stream_r15")
    spark.range(10).toPandas()  # warm

    base = None
    times = {a: [] for a in arms}
    prog = {a: None for a in arms}
    for it in range(n):
        for arm in arms:
            confs, coalesce = ARMS[arm]
            dt, progress, sig, nrows = run_once(
                spark, sf_dir, arm, confs, coalesce
            )
            times[arm].append(dt)
            if base is None:
                base = (sig, nrows)
            assert (sig, nrows) == base, f"arm {arm} diverged!"
            if prog[arm] is None or dt <= min(times[arm]):
                prog[arm] = progress
            print(f"iter {it} arm {arm}: {dt:.3f}s ({nrows} rows)")
    for arm in arms:
        print(
            f"arm {arm}: best {min(times[arm]):.3f}s  "
            f"all {[round(t, 2) for t in times[arm]]}"
        )
        for p in prog[arm] or []:
            d = p.get("durationMs", {})
            ops = [
                {
                    k: so.get(k)
                    for k in (
                        "commitTimeMs",
                        "numRowsUpdated",
                        "numRowsTotal",
                        "numShufflePartitions",
                    )
                }
                for so in p.get("stateOperators", [])
            ]
            print(f"   batch {p.get('batchId')} rows {p.get('numInputRows')}: "
                  f"{d}  state: {ops}")


if __name__ == "__main__":
    main()
