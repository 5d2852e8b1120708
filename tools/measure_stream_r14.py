"""Round-14 streaming-cost probe (guide §1): where does
stream_multires_cascade's wall time go?  Prints per-microbatch
durationMs breakdowns from the StreamingQuery progress log, plus the
end-to-end time split into start/drain/collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_umami_spark.session import get_spark
from datafusion_umami_spark.streaming.runner import read_events_stream, scratch_dir


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("stream_probe")
    spark.range(10).toPandas()  # warm

    for run in range(2):
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
        t1 = time.perf_counter()
        checkpoint = scratch_dir(spark, "stream", "probe_multires")
        q = (
            hour.writeStream.format("memory")
            .queryName("probe_multires")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        t2 = time.perf_counter()
        q.awaitTermination()
        t3 = time.perf_counter()
        n = spark.table("probe_multires").count()
        t4 = time.perf_counter()
        print(
            f"run {run}: build {t1-t0:.3f}s  start {t2-t1:.3f}s  "
            f"drain {t3-t2:.3f}s  collect {t4-t3:.3f}s  rows {n}  "
            f"total {t4-t0:.3f}s"
        )
        for p in q.recentProgress:
            d = p.get("durationMs", {})
            print(
                "  batch", p.get("batchId"), "rows", p.get("numInputRows"),
                json.dumps(d),
            )
            for so in p.get("stateOperators", []):
                print(
                    "    state op:", {k: so.get(k) for k in (
                        "operatorName", "numRowsTotal", "numRowsUpdated",
                        "commitTimeMs", "numShufflePartitions")},
                )


if __name__ == "__main__":
    main()
