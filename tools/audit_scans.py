"""Fact-scan auditor — the CTE-inlining detector (SCALE.md round 5).

For every registered query (or the names given), builds the DataFrame
and counts parquet scans of the big fact tables in the FINAL stage's
executed plan.  A count exceeding the SQL's textual references means a
shared subtree is being re-executed per reference (Spark inlines
deterministic CTEs); fix with operators/materialize.py.

Usage:
  PYTHONPATH=. python tools/audit_scans.py [names...] [--min 3]
      [--sf-dir /root/testdata/sf0.001]

Prints one line per query at or above the threshold.  Exit 0 always —
an audit, not a gate (the gate for fixed queries is
tests/test_plans.py::test_materialized_queries_do_not_rescan_facts).
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter

BIG = {"lineitem", "orders", "events", "documents", "embeddings"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--min", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from datafusion_umami_spark.registry import REGISTRY, _load_all
    from datafusion_umami_spark.session import get_spark

    _load_all()
    spark = get_spark("audit-scans")
    names = args.names or list(REGISTRY)
    flagged = 0
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            c = Counter(
                t
                for t in re.findall(r"file:\S*?/(\w+)\.parquet", plan)
                if t in BIG
            )
            if c and max(c.values()) >= args.min:
                flagged += 1
                print(f"{name}: {dict(c)}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}", flush=True)
    print(f"# {flagged} of {len(names)} at >= {args.min} scans of one fact table")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
