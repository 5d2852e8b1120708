"""Round-15 bench-context inflation probe (r14 verdict item 6): the JOB
cliques measured 0.8-0.9 s isolated but 1.1-1.5 s inside the shared
bench session.  Hypotheses: (a) driver/executor GC pressure accumulating
over the 42-query session (48 GiB heap, full GC rarely fires, broadcast
and shuffle state only freed by the weak-ref ContextCleaner ON GC);
(b) block-manager/shuffle-file accumulation.

Method: run the full bench order once (warmup + 1 timed iter per query,
the cheap variant), sampling driver GC time, heap, and the RDD/broadcast
counts before each query.  Then re-time the three inflation witnesses
in-context, force a full GC, and re-time them again — if the GC restores
the isolated floor, (a) is proven and the fix is a periodic/untimed GC
(ContextCleaner drain), not a per-query cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_umami_spark.operators.materialize import release_all
from datafusion_umami_spark.registry import bench_queries
from datafusion_umami_spark.session import get_spark

WITNESSES = [
    "job_five_alias_fact_clique",
    "job_t6_four_bridge_clique",
    "tpcds_twice_joined_wide_star",
]


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    beans = mf.getGarbageCollectorMXBeans()
    gc_ms = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    sc = spark.sparkContext._jsc.sc()
    n_rdds = sc.getRDDStorageInfo().__len__()
    return gc_ms, heap.getUsed() // (1024**2), n_rdds


def time_query(spark, spec, sf_dir, iters=2):
    release_all()
    spec.fn(spark, sf_dir).toPandas()  # warmup
    runs = []
    for _ in range(iters):
        release_all(blocking=True)
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).toPandas()
        runs.append(round(time.perf_counter() - t0, 3))
    return min(runs), runs


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_ctx_probe")
    spark.range(10).toPandas()

    specs = bench_queries()
    print("== fresh-session witness floors ==")
    fresh = {}
    for name in WITNESSES:
        fresh[name], runs = time_query(spark, specs[name], sf_dir)
        g, h, r = jvm_stats(spark)
        print(f"  {name}: {fresh[name]:.3f}s {runs} (gc {g}ms heap {h}MB rdds {r})")

    print("== full bench order (1 timed iter each) ==")
    for name in sorted(specs):
        g0, h0, r0 = jvm_stats(spark)
        t, _ = time_query(spark, specs[name], sf_dir, iters=1)
        g1, h1, r1 = jvm_stats(spark)
        print(
            f"  {name}: {t:.3f}s  gc+{g1 - g0}ms heap {h0}->{h1}MB "
            f"rdds {r0}->{r1}"
        )

    print("== witnesses in-context ==")
    ctx = {}
    for name in WITNESSES:
        ctx[name], runs = time_query(spark, specs[name], sf_dir)
        print(f"  {name}: {ctx[name]:.3f}s {runs} (fresh {fresh[name]:.3f}s)")

    print("== after forced full GC ==")
    jvm = spark.sparkContext._jvm
    t0 = time.perf_counter()
    jvm.System.gc()
    time.sleep(2)  # let ContextCleaner drain
    print(f"  gc+drain took {time.perf_counter() - t0:.2f}s")
    g, h, r = jvm_stats(spark)
    print(f"  post-gc: gc {g}ms heap {h}MB rdds {r}")
    for name in WITNESSES:
        t, runs = time_query(spark, specs[name], sf_dir)
        print(f"  {name}: {t:.3f}s {runs} (in-ctx {ctx[name]:.3f}s fresh {fresh[name]:.3f}s)")


if __name__ == "__main__":
    main()
