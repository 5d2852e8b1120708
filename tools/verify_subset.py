"""Driver-mirror verification CLI — the verify-skill recipe as a tool.

Runs queries() vs oracle_sql() through DuckDB exactly like the driver's
t2 gate, from a clean consumer import of __spark_entry__.py.

Usage:
  PYTHONPATH=/root/repo python tools/verify_subset.py [names...]
      [--sf-dir /root/testdata/sf0.01] [--hostile] [--threads 8]

  names...   query names to check (default: ALL registered queries)
  --hostile  3 shuffle partitions, broadcast disabled, AQE off — the
             out-of-core parity config (results must be identical)
  --rerun    run each query twice and compare the SECOND result (pins
             scratch/checkpoint idempotence for streaming sinks)
  --max-split BYTES
             cap spark.sql.files.maxPartitionBytes (e.g. 1048576) — the
             reference's batch-size-parameterized testing analog: scan
             chunking must never change results
  --no-codegen
             disable whole-stage codegen + codegen'd expression
             factories (interpreted-evaluation parity)
  --arrow-batch N
             cap spark.sql.execution.arrow.maxRecordsPerBatch (e.g. 7)
             — Arrow batch-shape invariance for all pandas-UDF paths

Exit code 0 iff every checked query passes (hash-match, or executes
with a stable schema for oracle-less entries).
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--hostile", action="store_true")
    ap.add_argument("--rerun", action="store_true")
    ap.add_argument("--max-split", type=int, default=None)
    ap.add_argument("--no-codegen", action="store_true")
    ap.add_argument("--arrow-batch", type=int, default=None)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{args.threads}]")
        .config("spark.sql.shuffle.partitions", str(args.threads))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Root cause of the r9/r10/r12 one-off sweep transients (found
        # r12: "Not enough memory to build and broadcast the table",
        # ~537 queries into an sf0.1 leg): PySpark's self-launched JVM
        # defaults to -Xmx1g, so the whole 541-query sweep shares 1 GiB
        # of heap with every accumulated broadcast.  Size the heap for
        # the job — this is tool configuration, not query semantics
        # (the hostile leg still proves parity under 3 partitions with
        # broadcast disabled).  Takes effect only because THIS process
        # launches the JVM (driver.memory is a pre-launch setting).
        .config("spark.driver.memory", "8g")
    )
    if args.hostile:
        b = (
            b.config("spark.sql.shuffle.partitions", "3")
            .config("spark.sql.autoBroadcastJoinThreshold", "-1")
            .config("spark.sql.adaptive.enabled", "false")
        )
    if args.max_split:
        b = (
            b.config("spark.sql.files.maxPartitionBytes", str(args.max_split))
            .config("spark.sql.files.openCostInBytes", "0")
        )
    if args.no_codegen:
        # Interpreted-evaluation parity: whole-stage codegen and the
        # codegen'd expression factories off — results must be
        # identical to the compiled path (r14 battery leg 6).
        b = (
            b.config("spark.sql.codegen.wholeStage", "false")
            .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        )
    if args.arrow_batch:
        # Arrow batch-shape invariance for every pandas-UDF /
        # mapInPandas / applyInPandas path: e.g. --arrow-batch 7
        # forces many tiny batches (r14 battery leg 7).
        b = b.config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(args.arrow_batch),
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_umami_spark.oracle import compare_frames, duckdb_connect

    con = duckdb_connect(args.sf_dir)
    qs = m.queries()
    osql = m.oracle_sql()
    names = args.names or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown)
        return 2

    bad = []
    t0 = time.time()
    for i, name in enumerate(names):
        if i and i % 50 == 0:
            # Accretion mitigation (r9/r10/r12 transients: one sf0.1 FAIL
            # ~500 queries into the shared JVM, never reproducible
            # isolated): Spark reclaims broadcast/shuffle blocks only
            # when the DRIVER GCs the py4j handles (ContextCleaner is
            # GC-driven), and a long single-process sweep may never
            # trigger a full collection — force one periodically so
            # executor memory doesn't carry ~50 queries of dead
            # broadcast state into the next heavy join.
            import gc

            gc.collect()
            spark._jvm.System.gc()
        try:
            spdf = qs[name](spark, args.sf_dir).toPandas()
            if args.rerun:
                spdf = qs[name](spark, args.sf_dir).toPandas()
            if name in osql:
                r = compare_frames(name, spdf, con.execute(osql[name]).df())
                status = "OK" if r.ok else f"FAIL {r.detail}"
                if not r.ok:
                    bad.append(name)
            else:
                assert len(spdf.columns) > 0
                status = f"rows-only {len(spdf)}"
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            status = f"ERR {type(e).__name__}: {e}"
            bad.append(name)
        print(f"{name}: {status}"[:200], flush=True)
    print(
        f"{len(names)} queries in {time.time() - t0:.0f}s — "
        + ("FAILED: " + ", ".join(bad) if bad else "ALL OK")
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
