"""TPC-H-shaped flagship queries over the driver star schema.

Shapes mirror the reference's primary correctness + bench corpus
(reference `benchmarks/queries/q1.sql`-`q22.sql` and
`datafusion/sqllogictest/test_files/tpch/`), adapted to the driver's
reduced columns (FIXTURES.md: no partsupp table, no comment/phone/
shipmode/commitdate/receiptdate columns).  Each query keeps the
*operator shape* of its TPC-H counterpart — the join graph, agg pattern,
and subquery structure — which is what exercises the engine.

Scale notes: nation/region are broadcast explicitly; other dim joins are
left to Catalyst/AQE which broadcasts anything under the 64 MiB threshold
and falls back to shuffled joins (spillable) beyond it — the umami parity
path (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import davg, dec, dsum, money, register
from datafusion_umami_spark.tables import table

def one() -> F.Column:
    """Literal 1 as DECIMAL(3,2) (lazy: needs an active session)."""
    return F.lit(1).cast("decimal(3,2)")

# SQL fragment twins of registry.dec/money — keep in sync with registry.py.
DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
DEC_DISC = "CAST(l_discount AS DECIMAL(4,2))"
DEC_TAX = "CAST(l_tax AS DECIMAL(4,2))"
SQL_MONEY = f"{DEC_PRICE} * (CAST(1 AS DECIMAL(3,2)) - {DEC_DISC})"


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM({DEC_PRICE}) AS DOUBLE) AS sum_base_price,
           CAST(SUM({SQL_MONEY}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({SQL_MONEY} * (CAST(1 AS DECIMAL(3,2)) + {DEC_TAX})) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM({DEC_PRICE}) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM({DEC_DISC}) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "sort", "filter", "flagship"),
    bench=True,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→project→grouped agg→sort (reference q1.sql shape).

    The partial/final agg split + spillable hash agg Catalyst plans here
    is the Spark counterpart of the reference's umami-wrapped
    AggregateExec (reference physical-plan/src/aggregates/mod.rs:652).
    """
    # r14: opt into the scale-adaptive scan spread — the decimal
    # aggregation chain above the single-task scan dominates (A/B:
    # 1.21 s -> 0.74 s at sf0.1; no-op once the scan splits naturally)
    li = table(spark, sf_dir, "lineitem", spread=True)
    disc_price = money()
    charge = (disc_price * (one() + dec("l_tax", 2, 4))).alias("charge")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_MONEY}) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "flagship"),
    bench=True,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join → agg → top-k (TakeOrderedAndProject; reference q3.sql)."""
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(money()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"))
        .orderBy(F.col("revenue").desc(), "o_orderdate")
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, CAST(SUM({SQL_MONEY}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    tags=("join", "agg", "flagship"),
    bench=True,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join (reference q5.sql). nation/region broadcast."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(money()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@register(
    "tpch_q6",
    oracle=f"""
    SELECT CAST(SUM({DEC_PRICE} * {DEC_DISC}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "flagship"),
    bench=True,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective scan + ungrouped agg (reference q6.sql); predicate fully
    pushed to the parquet reader (verified via .explain PushedFilters)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(dec("l_extendedprice") * dec("l_discount", 2, 4)).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H-shaped suite (q2..q22), adapted to the driver star schema
# (no partsupp table; no phone/comment/shipmode/commitdate/receiptdate
# columns — see FIXTURES.md). Registered as shared Spark-SQL/DuckDB text:
# both engines run the SAME ANSI SQL, which keeps the oracle twin in sync
# by construction. Shapes mirror reference benchmarks/queries/q2.sql-q22.sql.
# ---------------------------------------------------------------------------

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import probe, register_sql

DEC_QTY = "CAST(l_quantity AS DECIMAL(12,2))"

register_sql(
    "tpch_q2",
    f"""
    SELECT DISTINCT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE'
      AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                       FROM supplier s2
                         JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                         JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                         JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                       WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "correlated-scalar"),
)

register_sql(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("subquery", "exists", "semi-join"),
    discrimination=probe(
        semi_kept="""SELECT COUNT(*) FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)""",
        semi_rejected="""SELECT COUNT(*) FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
              AND NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_orderkey = o_orderkey
                                AND l_shipdate > o_orderdate)""",
    ),
)

register_sql(
    "tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                 {SQL_MONEY} AS volume
          FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
    bench=True,
)

register_sql(
    "tpch_q8",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 {SQL_MONEY} AS volume, n2.n_name AS nation
          FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1997-12-31 00:00:00') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "case"),
    discrimination=probe(
        case_nation3_rows="""SELECT COUNT(*) FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
              AND n2.n_name = 'NATION_3'""",
        case_else_rows="""SELECT COUNT(*) FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
              AND n2.n_name <> 'NATION_3'""",
    ),
)

register_sql(
    "tpch_q9",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 {SQL_MONEY} AS amount
          FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%bolt%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "like"),
    bench=True,
    discrimination=probe(
        like_matches="SELECT COUNT(*) FROM part WHERE p_name LIKE '%bolt%'",
        like_excludes="SELECT COUNT(*) FROM part "
        "WHERE p_name NOT LIKE '%bolt%'",
    ),
)

register_sql(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name, CAST(SUM({SQL_MONEY}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)

# q11 r14 discrimination rewrite (probe-found): the old text filtered
# n_name = 'NATION_1' — EMPTY at sf0.001 (10 suppliers spread one per
# nation leave most nations supplier-less), so the spec proved nothing
# locally; and its HAVING threshold was a FRACTION of the corpus total
# (SUM*0.001), which rejects every group once the part count outgrows
# 1000 (all 2000 groups rejected at sf0.01).  Now: a key-range nation
# fence (n_nationkey <= 12, SF-invariant half of the dim) and a
# mean-multiple threshold (v > 1.5×AVG of the per-part values), which
# is scale-free — survivors and rejected both populate at every SF
# (18/182, 94/1906, 1057/18943 probed at sf0.001/0.01/0.1).  The
# comparison is exact integers end-to-end: per-part cents are bounded
# BIGINTs, the corpus-growing total and the products accumulate in
# DECIMAL(38,0), and 2·N·v > 3·S avoids any division.  The per-part
# rollup feeds the threshold aggregate AND the filter — materialized
# once on the Spark side (the inlined WITH would re-run the join per
# reference).
_Q11_G = """
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS v_c
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_nationkey <= 12
      GROUP BY l_partkey"""
_Q11_FINAL = """
    SELECT l_partkey AS ps_partkey,
           CAST(v_c AS DOUBLE) / 100.0 AS value
    FROM {g}
    WHERE CAST(v_c AS DECIMAL(38,0)) * (SELECT 2 * COUNT(*) FROM {g})
          > (SELECT CAST(SUM(CAST(v_c AS DECIMAL(38,0))) AS DECIMAL(38,0))
             FROM {g}) * 3
    ORDER BY value DESC, ps_partkey
    """

register_split_sql(
    "tpch_q11",
    stages=[(_Q11_G, "q11_g_m")],
    final_sql=_Q11_FINAL.format(g="q11_g_m"),
    oracle=f"WITH g AS ({_Q11_G})" + _Q11_FINAL.format(g="g"),
    tags=("agg", "having", "subquery"),
    discrimination=probe(
        survivors=f"""WITH g AS ({_Q11_G})
            SELECT COUNT(*) FROM g
            WHERE CAST(v_c AS DECIMAL(38,0)) * (SELECT 2*COUNT(*) FROM g)
                  > (SELECT CAST(SUM(CAST(v_c AS DECIMAL(38,0)))
                             AS DECIMAL(38,0)) FROM g) * 3""",
        rejected=f"""WITH g AS ({_Q11_G})
            SELECT COUNT(*) FROM g
            WHERE CAST(v_c AS DECIMAL(38,0)) * (SELECT 2*COUNT(*) FROM g)
                  <= (SELECT CAST(SUM(CAST(v_c AS DECIMAL(38,0)))
                              AS DECIMAL(38,0)) FROM g) * 3""",
    ),
)

register_sql(
    "tpch_q12",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("join", "agg", "case"),
    discrimination=probe(
        high_priority_rows="""SELECT COUNT(*) FROM orders
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate
              AND o_orderpriority IN ('1-URGENT', '2-HIGH')""",
        low_priority_rows="""SELECT COUNT(*) FROM orders
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate
              AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')""",
    ),
)

register_sql(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("outer-join", "agg"),
    bench=True,
)

register_sql(
    "tpch_q14",
    f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_MONEY}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
           / CAST(SUM({SQL_MONEY}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("join", "agg", "case"),
    discrimination=probe(
        promo_rows="""SELECT COUNT(*) FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate < TIMESTAMP '1997-10-01'
              AND p_type = 'PROMO'""",
        non_promo_rows="""SELECT COUNT(*) FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate < TIMESTAMP '1997-10-01'
              AND p_type <> 'PROMO'""",
    ),
)

# q15's revenue view is referenced twice (join + MAX subquery); inlined
# that re-runs the lineitem aggregation shuffle, so the Spark side
# materializes the |suppliers|-row aggregate once (oracle unchanged).
_Q15_REVENUE = f"""
      SELECT l_suppkey AS supplier_no, SUM({SQL_MONEY}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey"""
_Q15_FINAL = """
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN {rev} ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM {rev})
    ORDER BY s_suppkey
    """

register_split_sql(
    "tpch_q15",
    stages=[(_Q15_REVENUE, "q15_revenue_m")],
    final_sql=_Q15_FINAL.format(rev="q15_revenue_m"),
    oracle=f"WITH revenue AS ({_Q15_REVENUE})"
    + _Q15_FINAL.format(rev="revenue"),
    tags=("cte", "subquery", "agg"),
)

register_sql(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'ECO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("agg", "distinct-agg", "not-in", "anti-join"),
    discrimination=probe(
        notin_excluded_suppliers="SELECT COUNT(*) FROM supplier "
        "WHERE s_acctbal < 1000",
        notin_kept_suppliers="SELECT COUNT(*) FROM supplier "
        "WHERE s_acctbal >= 1000",
        brand_fence_excludes="SELECT COUNT(*) FROM part "
        "WHERE p_brand = 'Brand#13'",
        notlike_fence_excludes="SELECT COUNT(*) FROM part "
        "WHERE p_type LIKE 'ECO%'",
        size_inlist_matches="SELECT COUNT(*) FROM part "
        "WHERE p_size IN (1, 5, 10, 15, 20, 25, 30, 35)",
        size_inlist_excludes="SELECT COUNT(*) FROM part "
        "WHERE p_size NOT IN (1, 5, 10, 15, 20, 25, 30, 35)",
    ),
)

register_sql(
    "tpch_q17",
    f"""
    SELECT CAST(SUM({DEC_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    tags=("subquery", "correlated-scalar", "agg"),
    discrimination=probe(
        below_avg_kept="""SELECT COUNT(*) FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#13'
              AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = p_partkey)""",
        above_avg_rejected="""SELECT COUNT(*) FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#13'
              AND l_quantity >= (SELECT 0.2 * AVG(l_quantity)
                                 FROM lineitem l2
                                 WHERE l2.l_partkey = p_partkey)""",
    ),
)

register_sql(
    "tpch_q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           o_totalprice, CAST(SUM({DEC_QTY}) AS DOUBLE) AS sum_qty
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM({DEC_QTY}) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate
    LIMIT 100
    """,
    tags=("join", "in-subquery", "having", "topk"),
    bench=True,
    spread_tables=("lineitem",),
    discrimination=probe(
        having_survivors="""SELECT COUNT(*) FROM (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)""",
        having_rejected="""SELECT COUNT(*) FROM (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) <= 300)""",
    ),
)

register_sql(
    "tpch_q19",
    f"""
    SELECT CAST(SUM({SQL_MONEY}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("join", "or-predicate", "agg"),
)

# q20 r14 discrimination rewrite (probe-found): n_name = 'NATION_1'
# emptied the query at sf0.001 (see q11), and the HAVING > 50 kept
# EVERY supplier that shipped any blue part (per-supplier yearly blue
# qty bottoms out near 50-90), so the IN-semi never rejected a row at
# any proof SF.  Key-range nation fence + threshold 200, sitting inside
# the per-supplier distribution at every SF (kept/rejected probed
# 2/1, 48/7, 389/121 at sf0.001/0.01/0.1 — the per-supplier stat is
# roughly SF-invariant because lines-per-supplier is).
_Q20_SEMI = f"""SELECT l_suppkey
                        FROM lineitem JOIN part ON l_partkey = p_partkey
                        WHERE p_name LIKE 'blue%'
                          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                        GROUP BY l_suppkey
                        HAVING SUM({DEC_QTY}) > 200"""
register_sql(
    "tpch_q20",
    f"""
    SELECT s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_nationkey <= 12
      AND s_suppkey IN ({_Q20_SEMI})
    ORDER BY s_name
    """,
    tags=("in-subquery", "semi-join", "having"),
    discrimination=probe(
        semi_kept=f"""SELECT COUNT(*) FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_nationkey <= 12 AND s_suppkey IN ({_Q20_SEMI})""",
        semi_rejected=f"""SELECT COUNT(*) FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_nationkey <= 12 AND s_suppkey NOT IN ({_Q20_SEMI})""",
        nation_fence_excludes="""SELECT COUNT(*) FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_nationkey > 12""",
    ),
)

# q21 r14 discrimination rewrite (probe-found): n_name = 'NATION_1'
# emptied the whole query at sf0.001 (see q11) — the EXISTS/NOT-EXISTS
# pair was proven on zero rows locally.  Key-range nation fence only;
# the sole-late-supplier logic is untouched and all three branches
# populate at every proof SF (kept/rej-by-exists/rej-by-anti probed
# 37/12/271 at sf0.001, 537/104/4689 at sf0.01).
_Q21_BASE = """FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_nationkey <= 12
      AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY"""
_Q21_EXISTS = """EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)"""
_Q21_OTHER_LATE = """EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY)"""
_Q21_ANTI = f"NOT {_Q21_OTHER_LATE}"
register_sql(
    "tpch_q21",
    f"""
    SELECT s_name, COUNT(*) AS numwait
    {_Q21_BASE}
      AND {_Q21_EXISTS}
      AND {_Q21_ANTI}
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("exists", "not-exists", "semi-join", "anti-join"),
    bench=True,
    discrimination=probe(
        kept=f"SELECT COUNT(*) {_Q21_BASE} AND {_Q21_EXISTS} AND {_Q21_ANTI}",
        rejected_by_exists=f"SELECT COUNT(*) {_Q21_BASE} AND NOT {_Q21_EXISTS}",
        rejected_by_anti=f"SELECT COUNT(*) {_Q21_BASE} AND {_Q21_EXISTS} "
        f"AND {_Q21_OTHER_LATE}",
    ),
)

# q22 r14 discrimination rewrite (probe-found): the fixture generator
# gives EVERY customer at least one order at every SF, so the original
# "customers with no orders" anti-join produced an EMPTY result at all
# proof scales — the spec was hash-green on two engines agreeing about
# nothing.  The anti condition is now "no URGENT-priority order"
# (P(no urgent among a customer's ~10 orders) ≈ 0.8^10, so the kept
# set populates at every SF: 3/18/228 probed at sf0.001/0.01/0.1)
# while the q22 shape — scalar AVG subquery fence + NOT EXISTS anti +
# rollup — is untouched.
_Q22_HAS_URGENT = """EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')"""
_Q22_ANTI = f"NOT {_Q22_HAS_URGENT}"
_Q22_BAL = """c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0
                               AND c_nationkey IN (1, 3, 5, 7, 9, 11))"""
register_sql(
    "tpch_q22",
    f"""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM (SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
            AND {_Q22_BAL}
            AND {_Q22_ANTI}) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("subquery", "not-exists", "anti-join", "agg"),
    discrimination=probe(
        anti_survivors=f"""SELECT COUNT(*) FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
              AND {_Q22_BAL} AND {_Q22_ANTI}""",
        rejected_by_anti=f"""SELECT COUNT(*) FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
              AND {_Q22_BAL} AND {_Q22_HAS_URGENT}""",
        rejected_by_balance=f"""SELECT COUNT(*) FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11) AND NOT ({_Q22_BAL})""",
    ),
)
