"""datafusion_umami_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference engine (ctsk/datafusion-umami, an Apache
DataFusion fork with an adaptive spill subsystem), expressed idiomatically
with the Spark DataFrame / SQL APIs so that Catalyst + Tungsten (and AQE at
runtime) choose the physical strategy.

Layout:
- ``session``   — tuned SparkSession factory (AQE, shuffle partitions, UTC).
- ``tables``    — the test star schema loader / temp-view registration.
- ``registry``  — QuerySpec registry: one entry per operator capability,
  each with a Spark callable and a DuckDB oracle-SQL twin.
- ``queries/``  — operator coverage, one module per SURVEY.md §2 family.
- ``operators/``— helpers for capabilities Spark lacks natively
  (date_bin, distinct-on, recursive CTE loop, as-of join, minhash LSH...).
- ``functions/``— scalar/array helper functions missing from pyspark.sql.functions.
"""

from datafusion_umami_spark.session import get_spark
from datafusion_umami_spark.registry import REGISTRY, all_queries, all_oracle_sql

__all__ = ["get_spark", "REGISTRY", "all_queries", "all_oracle_sql"]
__version__ = "0.1.0"
