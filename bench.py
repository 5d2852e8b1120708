"""Benchmark runner — the driver's perf feedback loop.

Runs the registry's bench-flagged headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ...}

Per-query time is the best of N_ITERS MEASURED runs after one untimed
warmup (the warmup pays scan-cache/code-gen costs that would otherwise
make per-query numbers noisy; mirrors the reference's `compare.py`
multi-iteration protocol, reference benchmarks/bench.sh).
Execution is a full materialization of the result via `toPandas()`
(Arrow-batched transfer) — the same "collect everything" semantics as
the reference's `collect()`, without py4j per-row deserialization
overhead polluting the engine measurement on wide results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_umami_spark.operators.materialize import release_all
from datafusion_umami_spark.registry import bench_queries
from datafusion_umami_spark.session import get_spark

# Best-of-3 by default: per-query wall times on this host are
# heavy-tailed (up to 2.5x iteration spread on identical plans — see
# SCALE.md "bench regression root cause"); best-of-N with N=3 converges
# to the true plan cost where N=2 still carries ~10% aggregate noise.
N_ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))


def _steal_jiffies() -> int | None:
    """Cumulative hypervisor CPU-steal (jiffies) from /proc/stat — the
    delta across the run attributes slow totals to host contention
    (SCALE.md: bench regression root cause).  None off-Linux."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return None


# Timed-window steal above this ⇒ the run is contaminated by host
# contention and affected queries get ONE clean-retry pass (the r6
# official artifact carried steal 1093 while two independent quiet runs
# were clean — the driver artifact should not depend on luck).
STEAL_THRESHOLD = int(os.environ.get("SPARK_GRAFT_STEAL_THRESHOLD", "200"))


def _timed_iters(spark, spec, sf_dir: str) -> tuple[list[float], int]:
    """N_ITERS timed runs of one query; returns (times, steal-in-window)."""
    runs: list[float] = []
    steal = 0
    for _ in range(N_ITERS):
        # each timed iteration pays the FULL cost: a shared/once
        # materialization left live by the previous iteration would
        # otherwise let later runs skip the build stage entirely.
        # Blocking release: eviction completes BEFORE the timer starts,
        # so it can neither overlap the measured window nor leave the
        # previous iteration's blocks silently serving this one.
        release_all(blocking=True)
        s0 = _steal_jiffies()
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).toPandas()
        runs.append(round(time.perf_counter() - t0, 4))
        s1 = _steal_jiffies()
        if s0 is not None and s1 is not None:
            steal += s1 - s0
    return runs, steal


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    specs = bench_queries()
    times: dict[str, float] = {}
    iters: dict[str, list[float]] = {}
    steal_by_query: dict[str, int] = {}
    steal_timed = 0  # steal during TIMED iterations only — contention
    # during startup/warmup cannot affect the reported best-of-N minima
    # and must not flag a clean comparison as contaminated
    for name, spec in sorted(specs.items()):
        release_all()  # free prior query's pinned checkpoints (hook per
        # operators/materialize.py: sequential runner = O(one query) held
        # storage, not O(all keys ever materialized))
        spec.fn(spark, sf_dir).toPandas()  # warmup, untimed
        runs, steal = _timed_iters(spark, spec, sf_dir)
        times[name] = min(runs)
        iters[name] = runs
        steal_by_query[name] = steal
        steal_timed += steal
        spread = max(runs) - min(runs)
        print(f"# {name}: {times[name]:.3f}s (spread {spread:.3f}s)", file=sys.stderr)

    # Self-defense (r6 verdict item 3): when the pass as a whole was
    # contaminated, every query whose own timed windows saw steal gets
    # one retry pass, and its reported time is the best-of-N of
    # whichever pass saw LESS steal for that query (ties keep the
    # first).  One pass's minima only — folding min over both passes
    # would make affected queries best-of-2N, which deflates minima
    # under the documented heavy-tailed iteration spread and breaks
    # round-over-round comparability; unconditional replacement would
    # let a retry window that is itself more contaminated overwrite a
    # cleaner first-pass value.  Both passes' iterations land in the
    # JSON for attribution.
    retry_iters: dict[str, list[float]] = {}
    retry_replaced: list[str] = []
    steal_retry = 0
    # steal attributable to the passes that actually supplied the
    # reported minima (first-pass steal minus the contaminated windows a
    # clean retry replaced) — the number a consumer should judge the
    # artifact by once a retry ran
    steal_effective = steal_timed
    if steal_timed > STEAL_THRESHOLD:
        affected = [n for n, s in steal_by_query.items() if s > 0]
        print(
            f"# steal {steal_timed} > {STEAL_THRESHOLD}: retrying "
            f"{len(affected)} affected queries once",
            file=sys.stderr,
        )
        for name in affected:
            spec = specs[name]
            # warmup: pass 1's minima came right after a dedicated warm
            # run, but this query last executed ~len(specs) queries ago —
            # an unwarmed retry would overwrite a warm best-of-N with a
            # measurement carrying recompile/cold-cache cost
            release_all()
            spec.fn(spark, sf_dir).toPandas()
            runs, steal = _timed_iters(spark, spec, sf_dir)
            retry_iters[name] = runs
            steal_retry += steal
            if steal < steal_by_query[name]:
                times[name] = min(runs)
                retry_replaced.append(name)
                steal_effective += steal - steal_by_query[name]

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        # every measured iteration per query (best-of is `queries`) so a
        # round-over-round delta can be attributed to noise vs plan change
        "query_iters": iters,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if _steal_jiffies() is not None:
        # steal accumulated across the timed windows only; a
        # non-trivial value ⇒ treat the totals as contaminated when
        # comparing round over round (unless a clean retry is recorded)
        out["steal_jiffies"] = steal_timed
    if retry_iters:
        out["query_iters_retry"] = retry_iters
        out["steal_retry_jiffies"] = steal_retry
        # which queries' reported times came from the retry pass, and
        # the steal of the passes that supplied the reported minima —
        # so a clean-after-retry artifact is legible as clean without
        # diffing query_iters against query_iters_retry (steal_jiffies
        # above stays the FIRST pass's value for protocol continuity)
        out["retry_replaced"] = sorted(retry_replaced)
        out["steal_effective_jiffies"] = steal_effective
    print(json.dumps(out))


if __name__ == "__main__":
    main()
