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
    li = table(spark, sf_dir, "lineitem")
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
