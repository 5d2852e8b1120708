"""Catalog / DDL / introspection surface: SHOW TABLES, DESCRIBE,
EXPLAIN, SET, information-schema views.

Covers SURVEY.md §2.10's DML/DDL row (reference
datafusion/sql/src/statement.rs Statement::* arms) and the catalog +
information_schema hierarchy (catalog/src/lib.rs,
catalog/src/information_schema.rs), plus EXPLAIN
(physical-plan/src/explain.rs:40).

These return engine-specific metadata shapes, so they are rows-only
checks (no DuckDB oracle) — except `catalog_information_schema`, whose
column inventory is engine-independent and hash-checked against
DuckDB's information_schema over the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register
from datafusion_umami_spark.tables import TABLE_NAMES, register_views


@register("ddl_show_tables", oracle=None, tags=("ddl", "catalog", "show"))
def ddl_show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TABLES over the registered star schema (catalog listing,
    reference catalog/src/lib.rs)."""
    register_views(spark, sf_dir)
    return spark.sql("SHOW TABLES").filter(F.col("tableName").isin(*TABLE_NAMES))


@register("ddl_describe_table", oracle=None, tags=("ddl", "catalog", "describe"))
def ddl_describe_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE TABLE — schema introspection."""
    register_views(spark, sf_dir)
    return spark.sql("DESCRIBE TABLE lineitem")


@register("ddl_explain_query", oracle=None, tags=("ddl", "explain"))
def ddl_explain_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN of a join-agg query (reference ExplainExec, explain.rs:40;
    Spark's formatted mode is the analog of the reference's tree
    format)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        EXPLAIN FORMATTED
        SELECT n_name, count(*) AS cnt
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@register("ddl_set_show_conf", oracle=None, tags=("ddl", "set"))
def ddl_set_show_conf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET / SHOW of a session config knob (reference `SET x.*` config
    extension, common/src/config.rs:897-927)."""
    spark.sql("SET spark.sql.adaptive.enabled=true")
    return spark.sql("SET spark.sql.adaptive.enabled")


@register(
    "catalog_information_schema",
    oracle="""
    SELECT column_name, data_type
    FROM information_schema.columns
    WHERE table_name = 'nation'
    """,
    tags=("catalog", "information-schema"),
)
def catalog_information_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """information_schema.columns parity for one table: Spark's catalog
    listing mapped onto DuckDB's type names (both read the same parquet,
    so the logical column/type inventory must agree)."""
    register_views(spark, sf_dir)
    spark_to_ansi = {
        "bigint": "BIGINT",
        "int": "INTEGER",
        "double": "DOUBLE",
        "string": "VARCHAR",
        "date": "DATE",
        "binary": "BLOB",
        "boolean": "BOOLEAN",
    }
    cols = [
        (f.name, spark_to_ansi.get(f.dataType.simpleString(), f.dataType.simpleString()))
        for f in spark.table("nation").schema.fields
    ]
    return spark.createDataFrame(cols, "column_name string, data_type string")


@register("ddl_explain_cost", oracle=None, tags=("ddl", "explain", "statistics"))
def ddl_explain_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN COST — optimized plan with CBO statistics (the analog of
    the reference's EXPLAIN with statistics display, explain.rs +
    AnalyzeExec's stats output)."""
    register_views(spark, sf_dir)
    return spark.sql(
        "EXPLAIN COST SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus"
    )


@register(
    "repartition_coalesce_roundtrip",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
           MIN(l_shipdate) AS first_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("repartition", "coalesce", "partial-sort"),
)
def repartition_coalesce_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-visible RepartitionExec(Hash) + PartialSort + CoalescePartitions
    (reference repartition/mod.rs:471, sorts/partial_sort.rs:80,
    coalesce_partitions.rs:40): hash-repartition on the group key, sort
    within partitions, aggregate (shuffle-free — data already co-located),
    then coalesce to one partition.  Results must be identical to the
    direct plan; the oracle checks exactly that."""
    from datafusion_umami_spark.tables import table
    from pyspark.sql import functions as F

    li = table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_returnflag")
        .sortWithinPartitions("l_returnflag", "l_shipdate")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cents"),
            F.min("l_shipdate").alias("first_ship"),
        )
        .coalesce(1)
    )
