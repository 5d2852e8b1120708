"""Round-14 pagerank A/B probe (guide §1 measure-first, §2 shuffle
removal).  Interleaved arms in ONE process/window so host drift cancels:

  A: pagerank as committed (dedup_edges=False caller path)
  B: variant — edge list hash-partitioned by src ONCE before the
     checkpoint (the per-round e⋈state join probes a pre-partitioned
     build), and the redundant initial-state checkpoint dropped (state0
     is a free projection of the already-checkpointed deg).

Prints per-arm best-of-N and the Exchange count of one round's plan for
each arm.  Equality of results is asserted every iteration (integer-
exact contract: must be bit-identical).
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


def pagerank_variant(edges: DataFrame, iterations: int = ITERS) -> DataFrame:
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(
        F.col(edges.columns[0]).cast("long").alias("src"),
        F.col(edges.columns[1]).cast("long").alias("dst"),
    ).repartition(n_part, "src")
    e = e.localCheckpoint(eager=True)

    deg = (
        e.groupBy("src")
        .agg(F.count("*").alias("outdeg"))
        .withColumnRenamed("src", "node")
    )
    deg_ck = deg.localCheckpoint(eager=True)
    deg = deg_ck.toDF(*deg_ck.columns)

    # state0: free projection of checkpointed deg (no third checkpoint)
    state = deg.withColumn("pr", F.lit(MICRO).cast("long"))
    st_ck = None

    for i in range(iterations):
        contribs = (
            e.join(state, e.src == state.node)
            .select("dst", F.expr("pr DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        nxt = (
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
        nxt_ck = nxt.localCheckpoint(eager=True)
        if st_ck is not None:
            _free_checkpoint(st_ck)
        st_ck = nxt_ck
        state = st_ck.toDF(*st_ck.columns)

    _free_checkpoint(e)
    _free_checkpoint(deg_ck)
    return state.select("node", "pr")


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
    spark = get_spark("ab_pagerank")
    spark.range(10).toPandas()  # warm

    # NOTE: edges_df here REPLICATES graph_pagerank_purchases' edge
    # build only for isolated timing; results are asserted equal.
    base = None
    times = {"A": [], "B": []}
    for it in range(n):
        for arm, fn in (("A", pagerank), ("B", pagerank_variant)):
            t0 = time.perf_counter()
            if arm == "A":
                out = fn(edges_df(spark, sf_dir), iterations=ITERS, dedup_edges=False)
            else:
                out = fn(edges_df(spark, sf_dir), iterations=ITERS)
            rows = {(r.node, r.pr) for r in out.collect()}
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            if base is None:
                base = rows
            assert rows == base, f"arm {arm} diverged!"
            print(f"iter {it} arm {arm}: {dt:.3f}s  ({len(rows)} nodes)")
    for arm in ("A", "B"):
        print(f"arm {arm}: best {min(times[arm]):.3f}s  all {[round(t,2) for t in times[arm]]}")


if __name__ == "__main__":
    main()
