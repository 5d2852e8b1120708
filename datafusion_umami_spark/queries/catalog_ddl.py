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
