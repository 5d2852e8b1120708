"""Time-series rollup patterns (the "hypertable rollup" class).

The reference's only time-bucketing primitive is the `date_bin` scalar
(reference datafusion/functions/src/datetime/date_bin.rs); production
time-series stores layer two patterns on top of it that a 100 TB events
pipeline needs:

- multi-resolution rollup: aggregate ONCE at the finest grain, then
  derive every coarser resolution from the already-aggregated frame —
  the cascade touches minute-rows (≪ raw rows), never rescans the fact
  table for hour/day.  Integer-cents sums re-aggregate exactly.
- gap filling: a generated calendar spine LEFT JOINed to the aggregate
  with COALESCE(0) — empty buckets appear as zeros, which window/lag
  consumers downstream require.

Both are pure DataFrame/SQL (no UDFs); the spine generator is
`sequence()`/`range()` — constant-size output, never a fact-table scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

# Cascade: minute → hour → day, each level re-aggregating the previous.
# Expressed as DataFrame code (not SQL text) because Spark INLINES
# deterministic CTEs: the SQL formulation physically scanned the fact
# table twice (once per UNION branch) — exactly the rescans the cascade
# exists to avoid.  materialize_once pins the hour grain so both the
# hour output and the day re-aggregation read the materialized
# ≪raw-rows frame: ONE fact scan regardless of how many resolutions the
# cascade emits (see operators/materialize.py for the general rule).

_TS_MULTIRES_ORACLE = """
    WITH minute AS (
        SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY 1
    ),
    hour AS (
        SELECT CAST(date_trunc('hour', bucket) AS TIMESTAMP) AS bucket,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM minute
        GROUP BY 1
    ),
    day AS (
        SELECT CAST(date_trunc('day', bucket) AS TIMESTAMP) AS bucket,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM hour
        GROUP BY 1
    )
    SELECT 'hour' AS resolution, bucket, n, cents FROM hour
    UNION ALL
    SELECT 'day' AS resolution, bucket, n, cents FROM day
    ORDER BY resolution, bucket
    LIMIT 2000
    """


@register(
    "ts_multires_rollup",
    oracle=_TS_MULTIRES_ORACLE,
    tags=("timeseries", "rollup", "multi-resolution"),
    bench=True,
)
def ts_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup, one fact scan: minute grain aggregated
    from events, hour re-aggregated from minute, the hour frame eagerly
    checkpointed so the day level and the hour output share ONE
    materialization (see module docstring; the SQL-text version was
    double-scanned by CTE inlining)."""
    from datafusion_umami_spark.operators.materialize import materialize_once

    ev = table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    hour_df = materialize_once("ts_multires_hour", hour)
    day = (
        hour_df.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )

    def lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("resolution"),
            F.col("bucket").cast("timestamp_ntz").alias("bucket"),
            "n",
            "cents",
        )

    return (
        lvl(hour_df, "hour")
        .unionAll(lvl(day, "day"))
        .orderBy("resolution", "bucket")
        .limit(2000)
    )


# Calendar spine LEFT JOIN + COALESCE(0): empty days become zero rows.
register_sql(
    "ts_gap_fill_daily",
    """
    WITH spine AS (
        SELECT explode(sequence(DATE '2024-01-01', DATE '2024-03-31',
                                INTERVAL 1 DAY)) AS d
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY date_trunc('day', ts)
    )
    SELECT CAST(s.d AS DATE) AS d,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(daily.cents, 0) AS BIGINT) AS cents
    FROM spine s LEFT JOIN daily ON CAST(s.d AS DATE) = daily.d
    ORDER BY d
    """,
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-03-31',
                                      INTERVAL 1 DAY)) AS d
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT CAST(s.d AS DATE) AS d,
           CAST(COALESCE(daily.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(daily.cents, 0) AS BIGINT) AS cents
    FROM spine s LEFT JOIN daily ON CAST(s.d AS DATE) = daily.d
    ORDER BY d
    """,
    tags=("timeseries", "gap-fill", "calendar-spine"),
)


# --- incremental rollup maintenance ---------------------------------------
# The materialized-view maintenance pattern: a standing daily summary
# merged with a delta by UNION ALL + re-aggregation, ORACLE = the full
# recompute (merge == recompute because the integer-cents aggregates
# are associative).  r13 review rewrote the split on THREE counts:
# (a) the old date cutoff was DISJOINT at the group level (o_orderdate
#     values are midnight timestamps, so the boundary day lived only
#     in the delta) — the merge never actually combined two partials
#     for one day, i.e. the associativity the spec exists to prove was
#     never exercised.  The split key is now orderkey parity, FINER
#     than the group key, so EVERY day group must merge two partials;
# (b) a NULL o_orderdate satisfied neither cutoff predicate and
#     silently vanished from the merge while the recompute oracle kept
#     its group — both texts now filter IS NOT NULL (TPC-H dates are
#     non-null; the fence keeps the reformulation total);
# (c) the cutoff CTE was cross-joined into both branches and Spark
#     inlines CTEs, so the plan scanned orders FOUR times — the
#     per-(day, parity) rollup is now split-materialized (one scan),
#     matching the zscore spec's pattern below.
# Pinned against a pure-Python recompute on adversarial micro-data
# (NULL dates, single-parity days) in tests/test_fuzz.py.
register_split_sql(
    "inc_rollup_merge",
    stages=[
        (
            """
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             o_orderkey % 2 AS part,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY CAST(date_trunc('day', o_orderdate) AS DATE),
               o_orderkey % 2""",
            "inc_daily_parts_m",
        )
    ],
    final_sql="""
    WITH summary AS (
      SELECT day, n, cents FROM inc_daily_parts_m WHERE part = 0),
    delta AS (
      SELECT day, n, cents FROM inc_daily_parts_m WHERE part = 1),
    merged AS (
      SELECT day, CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM (SELECT * FROM summary UNION ALL SELECT * FROM delta) u
      GROUP BY day)
    SELECT day, n, cents FROM merged
    ORDER BY day
    LIMIT 3000
    """,
    oracle="""
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderdate IS NOT NULL
    GROUP BY CAST(date_trunc('day', o_orderdate) AS DATE)
    ORDER BY day
    LIMIT 3000
    """,
    tags=("timeseries", "incremental", "materialized-view"),
)


# --- anomaly detection: exact integer z-score flags ------------------------
# Flag minutes whose event count deviates > 3 sigma from their day's
# mean.  The whole test is done in INTEGER arithmetic by squaring the
# z-score inequality:  |x - mu| > 3*sigma  <=>  (n*x - s1)^2 > 9*(n*s2 - s1^2)
# with s1 = sum(x), s2 = sum(x^2) over the day's n minutes — no float,
# no sqrt, so the flag is bit-identical on every engine and partitioning.
# At 100 TB: minute counts are a rollup (tiny), day stats re-aggregate
# the rollup, the flag join is day-keyed broadcast.
# The minute rollup is referenced by day_stats AND the flag join;
# inlined that re-runs the events aggregation shuffle, so the Spark
# side materializes the rollup once (split-SQL; oracle unchanged).
# The squared terms are agg x agg products whose factors grow with
# data volume, so they are computed in width-bounded DECIMAL (shared
# Spark/DuckDB text).  CRITICAL DuckDB width rule (probed, v1.0.0): a
# product of two decimals BOTH <= 18 wide stays DECIMAL(18,0) (int64
# storage) and throws OutOfRangeException past 1e18; real widening to
# min(a+b, 38) only happens when at least ONE operand is >= 19 wide.
# So every product below casts exactly one factor to DECIMAL(19,0).
# Bounds: n <= 1440 minutes/day -> D(4).  s2 = SUM(x^2) is accumulated
# in DECIMAL (one factor cast to D(19) per the width rule, sum output
# D(38,0); DuckDB SUM(DECIMAL) is exact the same way) — a plain BIGINT
# accumulator sat only ~0.08% under 2^63 at the old 8e7/minute bound
# and ANSI-crashed past it (r9 ADVICE item 4).  The remaining bound is
# the LHS D(17) fence: |n*x - s1| < 1e17, i.e. per-minute counts up to
# ~7e13 (s1 <= 1440*7e13 ~ 1e17; s2 <= 1440*(7e13)^2 ~ 7e30 << 1e38).
# DuckDB node widths: LHS D(17)xD(19) -> D(36); RHS 9 x (D(4)xD(38) ->
# D(38) minus D(17)xD(19) -> D(36), diff D(38)) -> D(38); runtime
# values <= ~7e33.  Plain BIGINT (n*x - s1)^2 overflows 2^63 around
# 3e9 events/day — ~100 TB territory.
_ZSCORE_MINUTES = """
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(date_trunc('minute', ts) AS TIMESTAMP_NTZ) AS minute,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events
      GROUP BY date_trunc('day', ts), date_trunc('minute', ts)"""
_ZSCORE_FINAL = """
    WITH day_stats AS (
      SELECT day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
               AS s2
      FROM {m} GROUP BY day)
    -- is_anomaly is constant 1 by construction (every row already
    -- passed the identical WHERE below) — the old CASE re-evaluated
    -- the 8-line fence a third time and was a drift hazard across the
    -- three copies (r13 review); the oracle always had CAST(1)
    SELECT m.minute, m.x, d.n AS day_minutes,
           CAST(1 AS BIGINT) AS is_anomaly
    FROM {m} m JOIN day_stats d ON m.day = d.day
    WHERE CAST(d.n * m.x - d.s1 AS DECIMAL(17,0))
          * CAST(d.n * m.x - d.s1 AS DECIMAL(19,0))
          > CAST(9 AS DECIMAL(1,0))
            * (CAST(d.n AS DECIMAL(4,0)) * CAST(d.s2 AS DECIMAL(38,0))
               - CAST(d.s1 AS DECIMAL(17,0)) * CAST(d.s1 AS DECIMAL(19,0)))
    ORDER BY m.minute
    LIMIT 2000
    """

register_split_sql(
    "ts_anomaly_zscore_minutes",
    stages=[(_ZSCORE_MINUTES, "zscore_minutes_m")],
    final_sql=_ZSCORE_FINAL.format(m="zscore_minutes_m"),
    oracle="""
    WITH minutes AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events
      GROUP BY 1, 2),
    day_stats AS (
      SELECT day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
               AS s2
      FROM minutes GROUP BY day)
    SELECT m.minute, m.x, d.n AS day_minutes,
           CAST(1 AS BIGINT) AS is_anomaly
    FROM minutes m JOIN day_stats d ON m.day = d.day
    WHERE CAST(d.n * m.x - d.s1 AS DECIMAL(17,0))
          * CAST(d.n * m.x - d.s1 AS DECIMAL(19,0))
          > CAST(9 AS DECIMAL(1,0))
            * (CAST(d.n AS DECIMAL(4,0)) * CAST(d.s2 AS DECIMAL(38,0))
               - CAST(d.s1 AS DECIMAL(17,0)) * CAST(d.s1 AS DECIMAL(19,0)))
    ORDER BY m.minute
    LIMIT 2000
    """,
    tags=("timeseries", "anomaly", "exact-zscore"),
)

# --- daily latency-style percentile bands ----------------------------------
# p50/p95/p99 of event value per day.  Both engines linearly interpolate
# ((1-g)*lo + g*hi over integer cents); results round to 4 decimals to
# absorb the last-ulp difference interpolation can produce.
register_sql(
    "ts_percentile_bands_daily",
    """
    WITH vals AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events)
    SELECT day,
           ROUND(percentile(v_c, 0.5) / 100.0, 4) AS p50,
           ROUND(percentile(v_c, 0.95) / 100.0, 4) AS p95,
           ROUND(percentile(v_c, 0.99) / 100.0, 4) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM vals
    GROUP BY day
    ORDER BY day
    LIMIT 200
    """,
    oracle="""
    WITH vals AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events)
    SELECT day,
           ROUND(quantile_cont(v_c, 0.5) / 100.0, 4) AS p50,
           ROUND(quantile_cont(v_c, 0.95) / 100.0, 4) AS p95,
           ROUND(quantile_cont(v_c, 0.99) / 100.0, 4) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM vals
    GROUP BY day
    ORDER BY day
    LIMIT 200
    """,
    tags=("timeseries", "percentile-bands", "observability"),
)


# --- rolling weekly median (percentile over a moving frame) ----------------
# Exact-interpolation percentile as a WINDOW aggregate over a 7-row
# trailing frame of daily revenue — the robust-trend line dashboards
# draw.  r13 review (the CLAUDE.md magnitude-ROUND rule): the old
# ROUND(med/100.0, 4) rounded a float whose magnitude GROWS with the
# corpus at a FIXED absolute boundary — a countdown that hits zero
# once ulp(med) > 5e-5 (daily revenue ~ 4.5e13 cents, far below the
# 100 TB design point).  The median is now emitted as EXACT cents: the
# 7-row frames select an exact element and the partial even-sized
# frames interpolate at g=0.5 between two integers (a half-integer,
# exact in double below 2^52 ~ $45T/day) — both engines' interpolation
# formulas are exact on these inputs, so no rounding is needed at all.
# The unpartitioned window's input is the |days| rollup — calendar-
# bounded (~2400 rows at any corpus size), not corpus-cardinality.
register_sql(
    "ts_rolling_median_weekly",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY date_trunc('day', o_orderdate))
    SELECT d, rev_c,
           CAST(percentile(rev_c, 0.5) OVER (ORDER BY d
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS med7_c
    FROM daily
    ORDER BY d
    LIMIT 2000
    """,
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY date_trunc('day', o_orderdate))
    SELECT d, rev_c,
           CAST(quantile_cont(rev_c, 0.5) OVER (ORDER BY d
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS med7_c
    FROM daily
    ORDER BY d
    LIMIT 2000
    """,
    tags=("timeseries", "rolling-median", "window-percentile"),
)
