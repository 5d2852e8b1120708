"""Round-15 pagerank A/B probe (guide §1 measure-first, §2.4 remove
shuffles/joins outright).  Interleaved arms in ONE process/window so
host drift cancels:

  A: pagerank as committed after r14 (dedup_edges=False caller path)
  B: restructured iteration —
       * outdeg attached to the edge list ONCE via a count window in the
         same pass that materializes it (e_deg checkpoint replaces the
         plain-e checkpoint; no extra job),
       * round 1 folded: state0 is the CONSTANT pr=MICRO, so the first
         e⋈state join is a no-op — contribs1 = MICRO DIV outdeg directly
         off e_deg,
       * the per-round deg⋈contribs LEFT join dropped entirely: on a
         bidirectional edge list every node has in-degree >= 1, so every
         node receives mass and the left join is the identity (the
         caller-guaranteed property, like dedup_edges) — each round is
         ONE broadcast join (state onto e_deg) + ONE keyed aggregate.
     Per round that removes a |V|-row join + broadcast build; the deg
     checkpoint job disappears.

  C: B plus the edge build pre-distincting lineitem to
     (l_orderkey, l_suppkey) before the orders join (verdict item 2
     candidate) — measures whether shrinking the join input below the
     distinct pays at sf0.1.

Per-phase timings (edge build / per-round) printed per arm; results
asserted bit-identical to arm A every iteration (integer-exact
contract).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_umami_spark.operators.connected_components import _free_checkpoint
from datafusion_umami_spark.operators.pagerank import (
    DAMP_NUM,
    MICRO,
    TELEPORT,
    pagerank,
)
from datafusion_umami_spark.session import get_spark
from datafusion_umami_spark.tables import table

ITERS = 4


def _damped(mass_col: str) -> F.Column:
    return (
        F.lit(TELEPORT)
        + F.expr(
            f"CAST(FLOOR((CAST({DAMP_NUM} AS DECIMAL(38,0))"
            f" * coalesce({mass_col}, 0L)) / {MICRO}) AS BIGINT)"
        )
    ).cast("long").alias("pr")


def pagerank_b(edges: DataFrame, iterations: int = ITERS, phases=None) -> DataFrame:
    t0 = time.perf_counter()
    e = edges.select(
        F.col(edges.columns[0]).cast("long").alias("src"),
        F.col(edges.columns[1]).cast("long").alias("dst"),
    )
    e_deg = e.withColumn("outdeg", F.count("*").over(Window.partitionBy("src")))
    e_deg = e_deg.localCheckpoint(eager=True)
    if phases is not None:
        phases.append(("edge+deg ck", time.perf_counter() - t0))

    st_ck = None
    state = None
    for i in range(iterations):
        t0 = time.perf_counter()
        if state is None:
            contribs = e_deg.select(
                "dst", F.expr(f"{MICRO} DIV outdeg").alias("c")
            )
        else:
            contribs = e_deg.join(
                F.broadcast(state), e_deg.src == state.node
            ).select("dst", F.expr("pr DIV outdeg").alias("c"))
        nxt = (
            contribs.groupBy("dst")
            .agg(F.sum("c").alias("mass"))
            .select(F.col("dst").alias("node"), _damped("mass"))
        )
        nxt_ck = nxt.localCheckpoint(eager=True)
        if st_ck is not None:
            _free_checkpoint(st_ck)
        st_ck = nxt_ck
        state = st_ck.toDF(*st_ck.columns)
        if phases is not None:
            phases.append((f"round {i}", time.perf_counter() - t0))

    _free_checkpoint(e_deg)
    return state.select("node", "pr")


def edges_df(spark, sf_dir, pre_distinct=False):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    li = lineitem.select("l_orderkey", "l_suppkey")
    if pre_distinct:
        li = li.distinct()
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "5"))
    spark = get_spark("ab_pagerank_r15")
    spark.range(10).toPandas()  # warm

    base = None
    times = {"A": [], "B": [], "C": []}
    phase_log = {"A": [], "B": [], "C": []}
    for it in range(n):
        for arm in ("A", "B", "C"):
            phases = []
            t0 = time.perf_counter()
            if arm == "A":
                t1 = time.perf_counter()
                out = pagerank(
                    edges_df(spark, sf_dir), iterations=ITERS, dedup_edges=False
                )
            elif arm == "B":
                out = pagerank_b(edges_df(spark, sf_dir), ITERS, phases)
            else:
                out = pagerank_b(
                    edges_df(spark, sf_dir, pre_distinct=True), ITERS, phases
                )
            rows = {(r.node, r.pr) for r in out.collect()}
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            phase_log[arm].append(phases)
            if base is None:
                base = rows
            assert rows == base, f"arm {arm} diverged!"
            print(f"iter {it} arm {arm}: {dt:.3f}s  ({len(rows)} nodes)")
    for arm in ("A", "B", "C"):
        print(
            f"arm {arm}: best {min(times[arm]):.3f}s  "
            f"all {[round(t, 2) for t in times[arm]]}"
        )
        if phase_log[arm][-1]:
            best_i = times[arm].index(min(times[arm]))
            print("   phases(best):", [
                (p, round(s, 3)) for p, s in phase_log[arm][best_i]
            ])


if __name__ == "__main__":
    main()
