"""Fact-scan auditor — the CTE-inlining detector (SCALE.md round 5).

For every registered query (or the names given), builds the DataFrame
and counts parquet scans of the big fact tables in the FINAL stage's
executed plan (shared helper: operators/materialize.py
`fact_scan_counts` — the same detector the pinning gate in
tests/test_plans.py uses).  A count exceeding the SQL's textual
references means a shared subtree is being re-executed per reference
(Spark inlines deterministic CTEs); fix with operators/materialize.py.

Usage:
  python tools/audit_scans.py [names...] [--min 3]
      [--sf-dir /root/testdata/sf0.001] [--exec]

Prints one line per query at or above the threshold.  Exit 2 on
unknown query names; otherwise 0 (an audit, not a gate).

`--exec` EXECUTES each flagged query and appends the runtime reuse
counters (ReusedSubquery / ReusedExchange from the post-execution
adaptive plan): a flagged query whose references collapse at runtime
(merged scalar subqueries, reused aggregate exchanges — the round-6
SCALE.md finding) is a false positive of the pre-execution count, not
a multiplicative re-execution.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--min", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--exec", dest="execute", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from datafusion_umami_spark.operators.materialize import fact_scan_counts
    from datafusion_umami_spark.registry import REGISTRY, _load_all
    from datafusion_umami_spark.session import get_spark

    _load_all()
    unknown = [n for n in args.names if n not in REGISTRY]
    if unknown:
        print("unknown queries:", unknown)
        return 2
    spark = get_spark("audit-scans")
    names = args.names or list(REGISTRY)
    flagged = 0
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, args.sf_dir)
            scans = fact_scan_counts(df)
            if scans and max(scans.values()) >= args.min:
                flagged += 1
                extra = ""
                if args.execute:
                    df.collect()
                    post = df._jdf.queryExecution().executedPlan().toString()
                    extra = (
                        f"  [runtime: ReusedSubquery={post.count('ReusedSubquery')}"
                        f" ReusedExchange={post.count('ReusedExchange')}]"
                    )
                print(f"{name}: {scans}{extra}", flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            print(f"{name}: ERR {type(e).__name__}: {e}"[:200], flush=True)
    print(f"# {flagged} of {len(names)} at >= {args.min} scans of one fact table")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
