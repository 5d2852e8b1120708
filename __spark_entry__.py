"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `datafusion_umami_spark.registry`: every operator from
SURVEY.md §2 registers a QuerySpec (Spark callable + DuckDB oracle SQL)
there; this module just exposes the registry in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datafusion_umami_spark.registry import all_oracle_sql, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return all_queries()["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (None-oracle specs
    are omitted → driver records a rows-only check)."""
    return all_oracle_sql()
