"""AS-OF join queries: enrich events with the most recent prior order
state per user.

The reference lacks an as-of join (SURVEY.md §2.3); DuckDB has a native
ASOF JOIN, making it a fully independent oracle for our
union-and-carry-forward implementation (operators/asof_join.py).
The right side is pre-aggregated to one row per (key, time) so the
as-of match is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.operators.asof_join import asof_join
from datafusion_umami_spark.registry import register
from datafusion_umami_spark.tables import table


@register(
    "asof_join_events_orders",
    oracle="""
    WITH r AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS last_order_ts,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents,
             MAX(o_orderkey) AS day_max_key
      FROM orders GROUP BY 1, 2)
    SELECT e.event_id, e.user_id, e.event_type,
           r.last_order_ts, r.day_cents, r.day_max_key
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.last_order_ts
    WHERE e.event_id < 2000
    """,
    tags=("asof-join", "join", "llm-pipeline", "event-enrichment"),
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )
    )
    orders_daily = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp_ntz").alias("last_order_ts"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("day_cents"),
            F.max("o_orderkey").alias("day_max_key"),
        )
    )
    joined = asof_join(
        ev,
        orders_daily,
        on="user_id",
        left_time="ts",
        right_time="last_order_ts",
        right_payload=["last_order_ts", "day_cents", "day_max_key"],
    )
    return joined.select(
        "event_id", "user_id", "event_type", "last_order_ts", "day_cents", "day_max_key"
    )
