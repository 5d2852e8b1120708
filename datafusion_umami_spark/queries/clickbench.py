"""ClickBench-shaped queries over events — the reference's third
benchmark suite (reference benchmarks/src/clickbench.rs:36-76,
benchmarks/queries/clickbench/): web-analytics scan-heavy aggregations.

Three canonical shapes: top-K entities by distinct users (CB q13-ish),
quantile-grade numeric scan (q26-ish, exact here for the oracle), and
substring search + grouped count (q20-ish).  All scan→agg→topk: zero
joins, map-side partial aggs, TakeOrderedAndProject — the plans that
must stay scan-bound at 100 TB.
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

register_sql(
    "cb_topk_by_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS users,
           COUNT(*) AS hits
    FROM events
    GROUP BY event_type
    ORDER BY users DESC, event_type
    LIMIT 10
    """,
    tags=("clickbench", "topk", "distinct-agg"),
    bench=True,
)

register_sql(
    "cb_value_scan_stats",
    """
    SELECT event_type,
           CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           COUNT(*) AS n
    FROM events
    WHERE value > 10.0
    GROUP BY event_type
    """,
    tags=("clickbench", "scan", "agg"),
)

register_sql(
    "cb_substring_search",
    """
    SELECT user_id % 50 AS user_bucket, COUNT(*) AS hits
    FROM events
    WHERE event_type LIKE '%c%' AND props LIKE '%"k"%'
    GROUP BY user_id % 50
    ORDER BY hits DESC, user_bucket
    LIMIT 20
    """,
    tags=("clickbench", "like", "substring"),
)
