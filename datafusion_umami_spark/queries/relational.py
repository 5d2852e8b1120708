"""Core relational operators: projection, filter/predicates, sort, limit/
offset, distinct / DISTINCT ON, set operations, VALUES, range series.

Covers SURVEY.md §2.2 (ProjectionExec/FilterExec + predicate expressions,
reference physical-plan/src/projection.rs:58, filter.rs:73,
physical-expr/src/expressions/), §2.6 (SortExec/TopK/limits,
sorts/sort.rs:839, topk/mod.rs:102, limit.rs:43), §2.7 (UnionExec +
intersect/except, union.rs:92, sql/src/set_expr.rs) and §2.1's
ValuesExec / generate_series (values.rs:41,
functions-table/src/generate_series.rs:685).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

# --- projection: arithmetic, aliases, conditional scalar exprs -------------
register_sql(
    "proj_expressions",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS gross,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           GREATEST(l_quantity, 25.0) AS qty_floor25,
           LEAST(l_quantity, 25.0) AS qty_cap25,
           CASE WHEN l_discount >= 0.05 THEN 'high' WHEN l_discount > 0.0 THEN 'low'
                ELSE 'zero' END AS disc_bucket,
           - l_tax AS neg_tax,
           NOT (l_quantity > 10) AS small_qty
    FROM lineitem
    WHERE l_orderkey < 200
    """,
    tags=("projection", "case", "coalesce", "nullif"),
)

# --- filter predicates: IN, LIKE, BETWEEN, boolean algebra -----------------
register_sql(
    "filter_predicates",
    """
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      AND o_orderstatus NOT IN ('P')
      AND o_totalprice BETWEEN 1000.0 AND 200000.0
      AND (o_orderkey % 2 = 0 OR o_orderkey < 100)
    """,
    tags=("filter", "in-list", "between"),
)

register_sql(
    "filter_like_ilike",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%wid%' AND p_name NOT LIKE 'blue%'
      AND lower(p_brand) LIKE 'brand#1%'
    """,
    tags=("filter", "like"),
)

# --- sort + top-k + offset -------------------------------------------------
register_sql(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "topk"),
)

register_sql(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 100
    """,
    tags=("limit", "offset"),
)

register_sql(
    "sort_nulls_ordering",
    """
    SELECT c_custkey, NULLIF(c_acctbal, 0.0) AS bal,
           CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
    FROM customer
    ORDER BY seg ASC NULLS FIRST, bal DESC NULLS LAST, c_custkey
    LIMIT 40
    """,
    tags=("sort", "nulls-ordering"),
)


# --- distinct / DISTINCT ON ------------------------------------------------
register_sql(
    "distinct_pairs",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("distinct",),
)


@register(
    "distinct_on_first_line",
    oracle="""
    SELECT DISTINCT ON (l_orderkey) l_orderkey, l_linenumber, l_partkey
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("distinct-on", "window"),
)
def distinct_on_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON rewrite (reference replace_distinct_aggregate.rs /
    logical Distinct::On, expr/src/logical_plan/plan.rs:3315): Spark has
    no DISTINCT ON — the idiomatic rewrite is row_number over the ON keys.
    The windowGroupLimit optimization turns the rn=1 filter into a
    per-partition limit, so no full-partition materialization at scale."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


# --- set operations --------------------------------------------------------
register_sql(
    "union_all",
    """
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000
    """,
    tags=("union",),
)

register_sql(
    "union_distinct",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
    tags=("union", "distinct"),
)

register_sql(
    "intersect_distinct",
    """
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 8000
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
    tags=("intersect",),
)

register_sql(
    "intersect_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL
    SELECT s_suppkey AS k FROM supplier
    """,
    tags=("intersect", "multiset"),
)

register_sql(
    "except_distinct",
    """
    SELECT s_nationkey AS nk FROM supplier
    EXCEPT
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
    """,
    tags=("except",),
)

register_sql(
    "except_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 300
    EXCEPT ALL
    SELECT s_suppkey AS k FROM supplier WHERE s_acctbal < 2000
    """,
    tags=("except", "multiset"),
)


@register(
    "union_by_name",
    oracle="""
    SELECT c_custkey AS key, c_acctbal AS bal FROM customer WHERE c_custkey < 50
    UNION ALL
    SELECT s_suppkey AS key, s_acctbal AS bal FROM supplier WHERE s_suppkey < 50
    """,
    tags=("union", "by-name"),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (reference union_by_name, logical_plan/plan.rs:204-229):
    columns matched by name, not position."""
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") < 50)
        .select(F.col("s_acctbal").alias("bal"), F.col("s_suppkey").alias("key"))  # swapped order
    )
    return c.unionByName(s)


# --- VALUES / literal relations / empty & one-row relations ----------------
register_sql(
    "values_literal",
    """
    SELECT id, color, CAST(score AS DOUBLE) AS score
    FROM VALUES (1, 'red', 1.5), (2, 'green', 2.5), (3, NULL, 3.5) AS t(id, color, score)
    """,
    oracle="""
    SELECT id, color, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'red', 1.5), (2, 'green', 2.5), (3, NULL, 3.5)) t(id, color, score)
    """,
    tags=("values",),
)

register_sql(
    "placeholder_one_row",
    "SELECT 1 AS one, 'x' AS tag",
    tags=("placeholder",),
)

register_sql(
    "empty_relation",
    "SELECT l_orderkey FROM lineitem WHERE 1 = 0",
    tags=("empty",),
)


# --- range / generate_series table functions -------------------------------
@register(
    "range_series",
    oracle="SELECT CAST(range AS BIGINT) AS id FROM range(0, 10000, 7)",
    tags=("range", "table-function"),
)
def range_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.range = reference generate_series/range table function
    (functions-table/src/generate_series.rs:685). Distributed generation:
    numPartitions splits the range, no driver materialization."""
    return spark.range(0, 10000, 7, numPartitions=8).select(F.col("id"))


@register(
    "date_series",
    oracle="""
    SELECT CAST(d AS DATE) AS d
    FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-03-01', INTERVAL 1 DAY)) AS d)
    """,
    tags=("range", "sequence", "explode"),
)
def date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date series via sequence() + explode (SURVEY §2.1 generate_series
    row): stays JVM-side, no Python loop."""
    return spark.sql(
        """
        SELECT explode(sequence(DATE '2024-01-01', DATE '2024-03-01', INTERVAL 1 DAY)) AS d
        """
    )


# --- large top-k sort (reference benchmarks/src/sort_tpch.rs shape) ---------
register_sql(
    "sort_multicol_large",
    """
    SELECT l_shipdate, l_orderkey, l_linenumber, l_returnflag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    LIMIT 2000
    """,
    tags=("sort", "multi-column", "topk-large"),
    bench=True,
)


# --- lateral column alias: later select-items reference earlier aliases ----
register_sql(
    "proj_lateral_column_alias",
    """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           cents * 2 AS cents_x2,
           cents_x2 + o_orderkey AS keyed
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("projection", "lateral-alias"),
)
