"""Type-system edge semantics: decimals, intervals, try_cast, temporal
precision, and the SURVEY §1.2 shims for types Spark lacks.

Covers the ScalarValue type matrix (reference
datafusion/common/src/scalar/mod.rs:222-328) where the mapping is not
1:1: Decimal precision/rounding, IntervalYearMonth/DayTime arithmetic,
Time64 (no Spark TimeType → µs-since-midnight shim), UInt64 (→
DECIMAL(20,0) widening), TryCast (expressions/cast.rs try variants).
Each query pins the RESULT type explicitly on both sides so the oracle
hash compares values, not engine-default scales (Spark and DuckDB have
different implicit decimal-division scale rules — the explicit final
CAST is the documented convention from registry.py).
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

# --- decimal arithmetic at high precision -----------------------------------
# unit_price (r13 review): the old DECIMAL/DECIMAL quotient was a SILENT
# REFORMULATION — DuckDB 1.x evaluates decimal division in DOUBLE
# (probed: typeof = DOUBLE), so Spark rounded an exact decimal quotient
# to 10 places while DuckDB rounded a double approximation; they agreed
# only because TPC-H extended prices are exact multiples of the
# (integral) quantity, with ~2x of double headroom.  True decimal-
# quotient parity is NOT expressible against DuckDB 1.x (documented
# gap); the quotient is now IEEE-shared: exact integer cents over
# qty*100, the identical double operands on both engines.
register_sql(
    "types_decimal_arith",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))
                AS DECIMAL(38,8)) AS DOUBLE) AS gross_d38,
           CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE)
             / NULLIF(CAST(l_quantity AS BIGINT) * 100, 0) AS unit_price,
           CAST(ROUND(CAST(l_discount AS DECIMAL(10,6)), 1) AS DOUBLE) AS disc_r1
    FROM lineitem
    WHERE l_orderkey < 300
    """,
    tags=("types", "decimal"),
)

# --- interval arithmetic: year-month + day-time ------------------------------
# plus_36h (r13 review): the Spark side now routes through
# TIMESTAMP_NTZ per the registry output convention — the old shared
# CAST(.. AS TIMESTAMP) produced LTZ, green only under the UTC session
# pin; the oracle keeps DuckDB's naive TIMESTAMP (it has no NTZ
# keyword, its TIMESTAMP already IS naive).
register_sql(
    "types_interval_arith",
    """
    SELECT o_orderkey,
           o_orderdate,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(o_orderdate - INTERVAL 90 DAY AS DATE) AS minus_90d,
           CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus_1y,
           CAST(CAST(o_orderdate AS TIMESTAMP_NTZ) + INTERVAL 36 HOUR
                AS TIMESTAMP_NTZ) AS plus_36h
    FROM orders
    WHERE o_orderkey < 200
    """,
    oracle="""
    SELECT o_orderkey,
           o_orderdate,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(o_orderdate - INTERVAL 90 DAY AS DATE) AS minus_90d,
           CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus_1y,
           CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 36 HOUR AS TIMESTAMP) AS plus_36h
    FROM orders
    WHERE o_orderkey < 200
    """,
    tags=("types", "interval", "datetime"),
)

# --- try_cast: malformed / overflowing input → NULL, not error ---------------
# DOCUMENTED ENGINE DIVERGENCE (r13 review, pinned by tests/test_fuzz.py
# ::test_try_cast_agreement_class_and_documented_divergence): on
# decimal/exponent-formatted strings ('2.5', '12.0', '1e2') DuckDB's
# TRY_CAST(.. AS INT) rounds/accepts where Spark ANSI try_cast yields
# NULL.  The spec's inputs (color words, integral key strings) sit in
# the probed agreement class — integral strings, garbage words, and
# out-of-range values behave identically on both engines.
register_sql(
    "types_try_cast",
    """
    SELECT p_partkey,
           TRY_CAST(p_name AS INT) AS name_as_int,
           TRY_CAST(substr(p_type, 1, 3) AS DATE) AS type_as_date,
           CAST(TRY_CAST(p_retailprice AS DECIMAL(5,2)) AS DOUBLE) AS price_narrow,
           TRY_CAST(CAST(p_partkey AS STRING) AS TINYINT) AS key_as_tiny
    FROM part
    WHERE p_partkey < 400
    """,
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_name AS INT) AS name_as_int,
           TRY_CAST(substr(p_type, 1, 3) AS DATE) AS type_as_date,
           CAST(TRY_CAST(p_retailprice AS DECIMAL(5,2)) AS DOUBLE) AS price_narrow,
           TRY_CAST(CAST(p_partkey AS VARCHAR) AS TINYINT) AS key_as_tiny
    FROM part
    WHERE p_partkey < 400
    """,
    tags=("types", "try-cast", "null-semantics"),
)

# --- Time64 shim: µs-since-midnight (Spark has no TIME type) -----------------
register_sql(
    "types_time_of_day_shim",
    """
    SELECT event_id,
           unix_micros(CAST(ts AS TIMESTAMP))
             - unix_micros(CAST(date_trunc('DAY', ts) AS TIMESTAMP)) AS time_of_day_us,
           hour(ts) AS h, minute(ts) AS m, second(ts) AS s
    FROM events
    WHERE event_id < 500
    """,
    oracle="""
    SELECT event_id,
           epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS time_of_day_us,
           CAST(hour(ts) AS INT) AS h, CAST(minute(ts) AS INT) AS m,
           CAST(second(ts) AS INT) AS s
    FROM events
    WHERE event_id < 500
    """,
    tags=("types", "time", "shim"),
)

# --- unsigned widening shims (UInt8→SMALLINT … UInt64→DECIMAL(20,0)) ---------
register_sql(
    "types_unsigned_widening",
    """
    SELECT CAST(255 AS SMALLINT) AS u8_max,
           CAST(65535 AS INT) AS u16_max,
           CAST(4294967295 AS BIGINT) AS u32_max,
           CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) AS STRING) AS u64_max,
           CAST(CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) + 1 AS DECIMAL(21,0))
                AS STRING) AS u64_plus1
    """,
    oracle="""
    SELECT CAST(255 AS SMALLINT) AS u8_max,
           CAST(65535 AS INT) AS u16_max,
           CAST(4294967295 AS BIGINT) AS u32_max,
           CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) AS VARCHAR) AS u64_max,
           CAST(CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) + 1 AS DECIMAL(21,0))
                AS VARCHAR) AS u64_plus1
    """,
    tags=("types", "unsigned", "shim"),
)

# --- timestamp precision: µs round-trip + ns truncation ----------------------
# r13 review notes: (a) ts_ms/ts_s now stay TIMESTAMP_NTZ (the old CAST
# .. AS TIMESTAMP laundered the normalized NTZ column back to LTZ —
# green only under the UTC pin); (b) unix_micros(CAST(ts AS TIMESTAMP))
# and the shim's time-of-day arithmetic depend on the session UTC pin
# for epoch equality with DuckDB's epoch_us over naive values — the pin
# is a repo-wide invariant (session.py + the driver), documented here;
# (c) this spec and types_time_of_day_shim share the tables.py KNOWN
# ASYMMETRY exposure: under the historical ns-as-long generator with
# true sub-µs ticks, Spark's µs normalization vs DuckDB's raw ns read
# would diverge (fixtures are native-µs; probed r12).
register_sql(
    "types_timestamp_precision",
    """
    SELECT event_id, ts,
           unix_micros(CAST(ts AS TIMESTAMP)) AS us,
           CAST(date_trunc('MILLISECOND', ts) AS TIMESTAMP_NTZ) AS ts_ms,
           CAST(date_trunc('SECOND', ts) AS TIMESTAMP_NTZ) AS ts_s
    FROM events
    WHERE event_id < 300
    """,
    oracle="""
    SELECT event_id, ts,
           epoch_us(ts) AS us,
           date_trunc('millisecond', ts) AS ts_ms,
           date_trunc('second', ts) AS ts_s
    FROM events
    WHERE event_id < 300
    """,
    tags=("types", "timestamp", "precision"),
)


# --- try_* overflow-safe arithmetic (reference arrow kernels error on
# int64 overflow; ANSI try-variants return NULL instead). DuckDB has no
# TRY() in this build, so the oracle range-checks through HUGEINT. ------
register_sql(
    "types_try_arithmetic",
    """
    SELECT a, b,
           try_add(a, b) AS t_add,
           try_subtract(a, b) AS t_sub,
           try_multiply(a, b) AS t_mul,
           try_divide(a, b) AS t_div
    FROM VALUES
      (CAST(9223372036854775807 AS BIGINT), CAST(1 AS BIGINT)),
      (CAST(-9223372036854775808 AS BIGINT), CAST(1 AS BIGINT)),
      (CAST(9223372036854775807 AS BIGINT), CAST(-1 AS BIGINT)),
      (CAST(4611686018427387904 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(10 AS BIGINT), CAST(20 AS BIGINT)),
      (CAST(7 AS BIGINT), CAST(0 AS BIGINT)) AS t(a, b)
    """,
    oracle="""
    WITH t(a, b) AS (VALUES
      (CAST(9223372036854775807 AS BIGINT), CAST(1 AS BIGINT)),
      (CAST(-9223372036854775808 AS BIGINT), CAST(1 AS BIGINT)),
      (CAST(9223372036854775807 AS BIGINT), CAST(-1 AS BIGINT)),
      (CAST(4611686018427387904 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(10 AS BIGINT), CAST(20 AS BIGINT)),
      (CAST(7 AS BIGINT), CAST(0 AS BIGINT)))
    SELECT a, b,
           CASE WHEN CAST(a AS HUGEINT) + b
                     BETWEEN -9223372036854775808 AND 9223372036854775807
                THEN CAST(CAST(a AS HUGEINT) + b AS BIGINT) END AS t_add,
           CASE WHEN CAST(a AS HUGEINT) - b
                     BETWEEN -9223372036854775808 AND 9223372036854775807
                THEN CAST(CAST(a AS HUGEINT) - b AS BIGINT) END AS t_sub,
           CASE WHEN CAST(a AS HUGEINT) * b
                     BETWEEN -9223372036854775808 AND 9223372036854775807
                THEN CAST(CAST(a AS HUGEINT) * b AS BIGINT) END AS t_mul,
           CASE WHEN b = 0 THEN NULL
                ELSE CAST(a AS DOUBLE) / CAST(b AS DOUBLE) END AS t_div
    FROM t
    """,
    tags=("types", "try-arithmetic", "overflow"),
)
