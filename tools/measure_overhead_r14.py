"""Round-14 fixed-overhead probe (guide §1: measure first).

Quantifies the driver-side per-iteration costs the bench pays inside its
timed window: spark.read.parquet construction (file listing + footer
schema inference), register_views (10 reads + view registration),
spark.sql analysis, and a trivial end-to-end job — so per-query bench
numbers can be decomposed into fixed overhead vs real execution.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_umami_spark.session import get_spark
from datafusion_umami_spark.tables import register_views, table


def t(label, fn, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label}: min {min(times)*1e3:.1f}ms  med {sorted(times)[len(times)//2]*1e3:.1f}ms  max {max(times)*1e3:.1f}ms")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("overhead_probe")
    # warm the JVM
    spark.range(10).toPandas()

    t("read.parquet(lineitem) [construct only]",
      lambda: spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    t("table(events) [construct only]",
      lambda: table(spark, sf_dir, "events"))
    t("register_views (10 tables)",
      lambda: register_views(spark, sf_dir))

    sql = "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
    register_views(spark, sf_dir)
    t("spark.sql(analysis only)", lambda: spark.sql(sql))
    t("trivial job: spark.range(1).toPandas()",
      lambda: spark.range(1).toPandas())
    t("1-col count over lineitem view", lambda: spark.sql(
        "SELECT count(*) AS n FROM lineitem").toPandas())
    t("full q-shape: groupBy count over lineitem",
      lambda: spark.sql(sql).toPandas())

    # schema-imposed read: skips footer inference
    sch = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    t("read.parquet with imposed schema",
      lambda: spark.read.schema(sch).parquet(f"{sf_dir}/lineitem.parquet"))


if __name__ == "__main__":
    main()
