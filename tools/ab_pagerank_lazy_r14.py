"""Round-14 pagerank A/B probe #2 (guide §1 measure-first, §2.4 job
overhead).  Arms interleaved in ONE process/window so host drift
cancels:

  A: pagerank as committed (per-round eager localCheckpoint; the
     connected-components-style hygiene, needed there because CC's
     lineage DOUBLES per round).
  B: lazy variant — NO intermediate checkpoints.  PageRank's lineage
     grows LINEARLY with the fixed iteration count (each round
     references e/deg once), every round already contains a shuffle
     (groupBy dst) whose map output bounds fault-recovery replay, and
     nothing needs unpersisting because nothing is persisted.  The
     4-round DAG then runs as ONE job instead of 4 eager checkpoint
     jobs + a final job.

Results asserted bit-identical every iteration (integer-exact
contract).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
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


def pagerank_lazy(
    edges: DataFrame, iterations: int = ITERS
) -> tuple[DataFrame, DataFrame, DataFrame]:
    e = edges.select(
        F.col(edges.columns[0]).cast("long").alias("src"),
        F.col(edges.columns[1]).cast("long").alias("dst"),
    )
    e = e.localCheckpoint(eager=True)

    deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("outdeg"))
        .withColumnRenamed("src", "node")
    )
    deg_ck = deg.localCheckpoint(eager=True)
    deg = deg_ck.toDF(*deg_ck.columns)

    state = deg.withColumn("pr", F.lit(MICRO).cast("long"))

    for i in range(iterations):
        contribs = (
            e.join(state, e.src == state.node)
            .select("dst", F.expr("pr DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        state = (
            deg.join(contribs, deg.node == contribs.dst, "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(TELEPORT)
                    + F.expr(
                        f"CAST(FLOOR((CAST({DAMP_NUM} AS DECIMAL(38,0))"
                        f" * coalesce(mass, 0L)) / {MICRO}) AS BIGINT)"
                    )
                ).cast("long").alias("pr"),
            )
        )

    out = state.select("node", "pr")
    return out, e, deg_ck


def edges_df(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
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
    n = int(os.environ.get("AB_N", "4"))
    spark = get_spark("ab_pagerank_lazy")
    spark.range(10).toPandas()  # warm

    base = None
    times = {"A": [], "B": []}
    for it in range(n):
        for arm in ("A", "B"):
            t0 = time.perf_counter()
            if arm == "A":
                out = pagerank(edges_df(spark, sf_dir), iterations=ITERS,
                               dedup_edges=False)
                rows = {(r.node, r.pr) for r in out.collect()}
            else:
                out, e_ck, deg_ck = pagerank_lazy(edges_df(spark, sf_dir))
                rows = {(r.node, r.pr) for r in out.collect()}
                _free_checkpoint(e_ck)
                _free_checkpoint(deg_ck)
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            if base is None:
                base = rows
            assert rows == base, f"arm {arm} diverged!"
            print(f"iter {it} arm {arm}: {dt:.3f}s  ({len(rows)} nodes)", flush=True)
    for arm in ("A", "B"):
        print(f"arm {arm}: best {min(times[arm]):.3f}s  all {[round(t,2) for t in times[arm]]}")


if __name__ == "__main__":
    main()
