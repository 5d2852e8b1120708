"""Round-14 per-query spread A/B (guide §1: measure, then decide).

For each bench-flagged query, times best-of-N with the scan spread OFF
vs FORCED (all fact views spread), interleaved per query so host drift
hits both arms equally.  The winners become the per-spec
`spread_tables` opt-ins.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_umami_spark.operators.materialize import release_all
from datafusion_umami_spark.registry import bench_queries
from datafusion_umami_spark.session import get_spark

N = int(os.environ.get("AB_ITERS", "4"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_spread")
    spark.range(10).toPandas()
    specs = bench_queries()
    names = sys.argv[1:] or sorted(specs)
    rows = []
    for name in names:
        best = {}
        for mode, env in (("off", "0"), ("on", "force")):
            os.environ["SPARK_GRAFT_SCAN_SPREAD"] = env
            release_all()
            specs[name].fn(spark, sf_dir).toPandas()  # warm this mode
            ts = []
            for _ in range(N):
                release_all(blocking=True)
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).toPandas()
                ts.append(time.perf_counter() - t0)
            best[mode] = min(ts)
        d = best["on"] - best["off"]
        rows.append((name, best["off"], best["on"], d))
        print(
            f"{name:35s} off {best['off']:.3f}  on {best['on']:.3f}  "
            f"delta {d:+.3f}  {'SPREAD' if d < -0.05 else ''}",
            flush=True,
        )
    print("\n# suggested opt-ins:")
    for name, off, on, d in sorted(rows, key=lambda r: r[3]):
        if d < -0.05:
            print(f"#   {name}  ({d:+.3f}s)")


if __name__ == "__main__":
    main()
