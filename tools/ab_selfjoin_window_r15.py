"""Round-15 self-join → window restructure A/B (guide §2.4 remove
shuffles outright; r14 verdict item 5).

tpcds_twice_joined_wide_star and tpcds_yearly_decline_union both
self-join a per-(entity, year) aggregate on consecutive years
(b2.yr = b1.yr + 1).  Because (group keys) are unique, the join partner
is exactly LEAD/LAG over (entity) ORDER BY yr — ONE pass over the
aggregate instead of two scans + a sort-merge self-join, and a
REPARTITION(entity) hint under the aggregate makes the aggregate AND
the window share a single exchange (HashPartitioning on a SUBSET of the
group keys satisfies the aggregate's ClusteredDistribution).  Plan
shape: 3 shuffle exchanges + checkpoint job → 1 exchange, no
materialization job.

Equivalence: proven byte-identical in DuckDB at sf0.001/0.01/0.1
(join form vs window form), asserted again per iteration here on the
Spark side; both engine texts will share the window form, so no
reformulation class opens.

Arms interleaved in one process; per-arm best-of-N printed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_umami_spark.operators.materialize import release_all
from datafusion_umami_spark.registry import bench_queries
from datafusion_umami_spark.session import get_spark
from datafusion_umami_spark.tables import register_views

WIDE_STAR_WIN = """
WITH buyraw AS (
  SELECT /*+ REPARTITION(cust, part) */
         o.o_custkey AS cust, l.l_partkey AS part,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
         l.l_extendedprice AS price
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate < DATE '2002-01-01'
),
buy AS (
  SELECT cust, part, yr, MIN(price) AS best_price
  FROM buyraw GROUP BY cust, part, yr
)
SELECT c.c_name AS cust_name, w.part AS part_key,
       p.p_name AS part_name, w.yr AS first_year,
       w.best_price AS price_y1, w.next_price AS price_y2
FROM (
  SELECT cust, part, yr, best_price,
         LEAD(yr) OVER (PARTITION BY cust, part ORDER BY yr) AS next_yr,
         LEAD(best_price) OVER (PARTITION BY cust, part ORDER BY yr)
             AS next_price
  FROM buy) w
JOIN customer c ON w.cust = c.c_custkey
JOIN part p ON w.part = p.p_partkey
WHERE w.next_yr = w.yr + 1
  AND w.next_price < w.best_price
  AND w.yr BETWEEN 1996 AND 2000
ORDER BY cust_name, part_key, first_year
LIMIT 1000
"""

DECLINE_WIN = """
WITH salesraw AS (
  SELECT /*+ REPARTITION(ch, part) */
         l_linenumber % 3 AS ch,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         l_partkey AS part,
         CAST(l_quantity AS BIGINT) AS qty1,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents1
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey
    AND l_returnflag <> 'R'
),
channel_sales AS (
  SELECT ch, yr, part,
         CAST(SUM(qty1) AS BIGINT) AS qty,
         CAST(SUM(cents1) AS BIGINT) AS cents
  FROM salesraw GROUP BY 1, 2, 3
)
SELECT ch, part, prev_yr AS prev_year, yr AS sales_year,
       prev_qty - qty AS qty_decline,
       prev_cents - cents AS cents_decline
FROM (
  SELECT ch, part, yr, qty, cents,
         LAG(yr) OVER w AS prev_yr,
         LAG(qty) OVER w AS prev_qty,
         LAG(cents) OVER w AS prev_cents
  FROM channel_sales
  WINDOW w AS (PARTITION BY ch, part ORDER BY yr)) t
WHERE prev_yr = yr - 1 AND 10 * qty < 9 * prev_qty
ORDER BY qty_decline DESC, ch, part, sales_year
LIMIT 500
"""

CASES = {
    "tpcds_twice_joined_wide_star": WIDE_STAR_WIN,
    "tpcds_yearly_decline_union": DECLINE_WIN,
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "5"))
    spark = get_spark("ab_selfjoin_window_r15")
    spark.range(10).toPandas()  # warm
    specs = bench_queries()

    for qname, win_sql in CASES.items():
        spec = specs[qname]
        base = None
        times = {"join": [], "win": []}
        for it in range(n):
            for arm in ("join", "win"):
                release_all(blocking=True)
                t0 = time.perf_counter()
                if arm == "join":
                    pdf = spec.fn(spark, sf_dir).toPandas()
                else:
                    register_views(spark, sf_dir)
                    pdf = spark.sql(win_sql).toPandas()
                dt = time.perf_counter() - t0
                times[arm].append(dt)
                if base is None:
                    base = pdf
                else:
                    assert base.equals(pdf), f"{qname} arm {arm} diverged!"
                print(f"{qname} iter {it} arm {arm}: {dt:.3f}s")
        for arm in ("join", "win"):
            print(
                f"{qname} arm {arm}: best {min(times[arm]):.3f}s  "
                f"all {[round(t, 2) for t in times[arm]]}"
            )


if __name__ == "__main__":
    main()
