"""Aggregation operators: the full aggregate-function surface, distinct
aggregates, HAVING, GROUPING SETS / ROLLUP / CUBE + grouping().

Covers SURVEY.md §2.4 — reference AggregateExec
(physical-plan/src/aggregates/mod.rs:384, umami-wrapped spillable final
agg at mod.rs:652) and the functions-aggregate crate list
(functions-aggregate/src/lib.rs:142-182): sum, min, max, count, avg,
median, array_agg, first/last_value, covar/corr, regr_*, var/stddev,
approx_* (HLL / t-digest), string_agg, bit_*, bool_*, grouping,
nth_value.

Determinism: order-sensitive float stats are rounded on both sides;
approx sketches (HLL/t-digest) differ by algorithm across engines, so
their specs hash-check EXACT counts plus a tolerance-band flag (the
oracle pins the flag to 1) — upgraded from the original rows-only
check in round 7; see the comment at agg_approx_distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

# --- basic + distinct aggregates ------------------------------------------
register_sql(
    "agg_basic_stats",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_shipdate) AS DATE) AS first_ship,
           CAST(MAX(l_shipdate) AS DATE) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "distinct-agg"),
)

register_sql(
    "agg_sum_distinct",
    """
    SELECT o_orderstatus,
           CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_distinct_price,
           COUNT(DISTINCT o_orderpriority) AS n_prio
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "distinct-agg"),
)

register_sql(
    "agg_no_grouping",
    """
    SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_p,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_p
    FROM lineitem
    """,
    tags=("agg", "no-grouping"),
)

# --- median / percentiles (exact) ------------------------------------------
register_sql(
    "agg_median",
    """
    SELECT l_linestatus, CAST(MEDIAN(l_quantity) AS DOUBLE) AS med_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg", "median"),
)

register_sql(
    "agg_percentile_exact",
    """
    SELECT event_type,
           CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value) AS DOUBLE) AS p50,
           CAST(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY value) AS DOUBLE) AS p90
    FROM events GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)

# --- variance family (order-sensitive floats → rounded both sides) --------
register_sql(
    "agg_variance_family",
    """
    SELECT l_returnflag,
           ROUND(CAST(VAR_SAMP(l_quantity) AS DOUBLE), 6) AS var_s,
           ROUND(CAST(VAR_POP(l_quantity) AS DOUBLE), 6) AS var_p,
           ROUND(CAST(STDDEV_SAMP(l_quantity) AS DOUBLE), 6) AS std_s,
           ROUND(CAST(STDDEV_POP(l_quantity) AS DOUBLE), 6) AS std_p
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)

register_sql(
    "agg_covar_corr",
    """
    SELECT l_linestatus,
           ROUND(CAST(COVAR_SAMP(l_quantity, l_extendedprice) AS DOUBLE), 4) AS cov_s,
           ROUND(CAST(COVAR_POP(l_quantity, l_extendedprice) AS DOUBLE), 4) AS cov_p,
           ROUND(CAST(CORR(l_quantity, l_extendedprice) AS DOUBLE), 6) AS r
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)

# REGR_SXX/SYY/SXY are raw sums of squared deviations — they GROW with
# SF, so rounding them at a fixed decimal place leaves shrinking ulp
# headroom (r12 aggregates review: Spark and DuckDB already differ by
# 1 ulp on SYY ~ 1.8e13 at sf0.01, and past ulp(SYY) > 0.5 any
# disagreement flips the rounded value).  Output the per-row-scale
# quotients S**/n instead: same information, SF-INVARIANT magnitude,
# so the 1e-16 relative cross-engine slack stays ~9 orders below the
# rounding boundary at every scale.
register_sql(
    "agg_regression",
    """
    SELECT l_returnflag,
           CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(CAST(REGR_SLOPE(l_extendedprice, l_quantity) AS DOUBLE), 4) AS slope,
           ROUND(CAST(REGR_INTERCEPT(l_extendedprice, l_quantity) AS DOUBLE), 4) AS intercept,
           ROUND(CAST(REGR_R2(l_extendedprice, l_quantity) AS DOUBLE), 6) AS r2,
           ROUND(CAST(REGR_AVGX(l_extendedprice, l_quantity) AS DOUBLE), 6) AS avgx,
           ROUND(CAST(REGR_AVGY(l_extendedprice, l_quantity) AS DOUBLE), 4) AS avgy,
           ROUND(CAST(REGR_SXX(l_extendedprice, l_quantity)
                      / NULLIF(REGR_COUNT(l_extendedprice, l_quantity), 0)
                      AS DOUBLE), 4) AS sxx_n,
           ROUND(CAST(REGR_SYY(l_extendedprice, l_quantity)
                      / NULLIF(REGR_COUNT(l_extendedprice, l_quantity), 0)
                      AS DOUBLE), 2) AS syy_n,
           ROUND(CAST(REGR_SXY(l_extendedprice, l_quantity)
                      / NULLIF(REGR_COUNT(l_extendedprice, l_quantity), 0)
                      AS DOUBLE), 3) AS sxy_n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "regression"),
)

# --- boolean / bitwise -----------------------------------------------------
register_sql(
    "agg_bool_bit",
    """
    SELECT c_mktsegment,
           BOOL_AND(c_acctbal > -900.0) AS all_above,
           BOOL_OR(c_acctbal > 9000.0) AS any_rich,
           CAST(BIT_AND(c_nationkey) AS BIGINT) AS band,
           CAST(BIT_OR(c_nationkey) AS BIGINT) AS bor,
           CAST(BIT_XOR(c_nationkey) AS BIGINT) AS bxor
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg", "bool", "bitwise"),
)

# --- positional: first/last/nth via min_by/max_by & sorted arrays ---------
register_sql(
    "agg_min_by_max_by",
    """
    SELECT o_orderstatus,
           MIN_BY(o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
                    + o_orderkey) AS cheapest_order,
           MAX_BY(o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
                    + o_orderkey) AS priciest_order,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "first-last"),
)


@register(
    "agg_array_agg_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(ARRAY_AGG(n_name)), ',') AS names
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "array-agg"),
)
def agg_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg (reference functions-aggregate/src/array_agg.rs):
    Spark collect_list is unordered by contract → sort for determinism.
    Output projected to a joined string: ARRAY columns are not portable
    through the driver's pandas canonicalizer (sqllogictest prints arrays
    as text for the same reason)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names")
    )


@register(
    "agg_nth_value",
    oracle="""
    SELECT l_returnflag, ARRAY_AGG(DISTINCT l_suppkey ORDER BY l_suppkey)[3] AS third_supp
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "nth-value"),
)
def agg_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value aggregate (reference functions-aggregate nth_value.rs)
    → sorted distinct array element (1-indexed on both engines)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        # try_element_at, not element_at: under the session's pinned
        # ANSI mode element_at THROWS on out-of-bounds while the DuckDB
        # oracle's list[3] yields NULL — a group with <3 distinct
        # suppliers would crash the whole query instead of matching the
        # oracle's NULL row (r12 aggregates review; invisible on the
        # generated fixtures where every group is wide)
        F.try_element_at(F.array_sort(F.collect_set("l_suppkey")), F.lit(3)).alias(
            "third_supp"
        )
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT r_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS members
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey
    """,
    tags=("agg", "string-agg"),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg (reference functions-aggregate string_agg.rs) →
    ordered array join (listagg exists in Spark 4 but array path keeps
    deterministic order explicit)."""
    n = table(spark, sf_dir, "nation")
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("members"))
    )


# --- approx aggregates: TOLERANCE-BANDED oracles ---------------------------
# Sketch values differ by implementation, so a raw hash can't match —
# but the ACCURACY CONTRACT can be hash-checked: output the exact value
# plus an in-band flag computed Spark-side, with the oracle asserting
# the flag.  A Spark sketch drifting out of its published error bound
# now FAILS the driver hash instead of sliding through a rows-only
# check.  Mirrors the reference's own accuracy tests (hyperloglog.rs
# error tests; approx_percentile_cont.rs): HLL with rsd=0.02 has
# standard error 2% → 3σ band 6%; percentile_approx at accuracy=10000
# has rank error ≤ 1e-4 → a 2% value band is generous at every SF.
register_sql(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(CASE WHEN abs(CAST(approx_count_distinct(l_partkey, 0.02) AS DOUBLE)
                              - COUNT(DISTINCT l_partkey))
                          <= 0.06 * COUNT(DISTINCT l_partkey)
                THEN 1 ELSE 0 END AS BIGINT) AS hll_in_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(1 AS BIGINT) AS hll_in_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "hll"),
)

register_sql(
    "agg_approx_percentile",
    # integer-cents domain for the EXACT side (order-independent,
    # CLAUDE.md float determinism rule); the approx estimate is compared
    # against the same exact interpolated percentile, per quantile.
    """
    WITH c AS (SELECT l_linestatus,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem)
    SELECT l_linestatus,
           ROUND(percentile(cents, 0.25) / 100.0, 4) AS p25_exact,
           ROUND(percentile(cents, 0.50) / 100.0, 4) AS p50_exact,
           ROUND(percentile(cents, 0.75) / 100.0, 4) AS p75_exact,
           CAST(CASE WHEN abs(percentile_approx(cents, 0.25, 10000)
                              - percentile(cents, 0.25))
                          <= 0.02 * percentile(cents, 0.25)
                THEN 1 ELSE 0 END AS BIGINT) AS p25_in_band,
           CAST(CASE WHEN abs(percentile_approx(cents, 0.50, 10000)
                              - percentile(cents, 0.50))
                          <= 0.02 * percentile(cents, 0.50)
                THEN 1 ELSE 0 END AS BIGINT) AS p50_in_band,
           CAST(CASE WHEN abs(percentile_approx(cents, 0.75, 10000)
                              - percentile(cents, 0.75))
                          <= 0.02 * percentile(cents, 0.75)
                THEN 1 ELSE 0 END AS BIGINT) AS p75_in_band
    FROM c
    GROUP BY l_linestatus
    """,
    oracle="""
    WITH c AS (SELECT l_linestatus,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem)
    SELECT l_linestatus,
           ROUND(quantile_cont(cents, 0.25) / 100.0, 4) AS p25_exact,
           ROUND(quantile_cont(cents, 0.50) / 100.0, 4) AS p50_exact,
           ROUND(quantile_cont(cents, 0.75) / 100.0, 4) AS p75_exact,
           CAST(1 AS BIGINT) AS p25_in_band,
           CAST(1 AS BIGINT) AS p50_in_band,
           CAST(1 AS BIGINT) AS p75_in_band
    FROM c
    GROUP BY l_linestatus
    """,
    tags=("agg", "approx", "tdigest"),
)


# --- weighted percentile (reference approx_percentile_cont_with_weight.rs:
# the t-digest weighted variant; here EXACT weighted interpolation so the
# DuckDB twin hash-matches — Spark's percentile(col, p, frequency) over
# integer cents equals quantile_cont over the weight-expanded multiset) ----
register_sql(
    "agg_weighted_percentile",
    """
    SELECT l_returnflag,
           ROUND(percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25,
                            CAST(l_quantity AS INT)) / 100.0, 4) AS wp25,
           ROUND(percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.50,
                            CAST(l_quantity AS INT)) / 100.0, 4) AS wp50,
           ROUND(percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75,
                            CAST(l_quantity AS INT)) / 100.0, 4) AS wp75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    oracle="""
    WITH expanded AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
      CROSS JOIN LATERAL (SELECT unnest(range(CAST(l_quantity AS INT))) AS rep) t)
    SELECT l_returnflag,
           ROUND(quantile_cont(cents, 0.25) / 100.0, 4) AS wp25,
           ROUND(quantile_cont(cents, 0.50) / 100.0, 4) AS wp50,
           ROUND(quantile_cont(cents, 0.75) / 100.0, 4) AS wp75
    FROM expanded
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "weighted"),
)


# --- HAVING ----------------------------------------------------------------
register_sql(
    "agg_having",
    """
    SELECT l_partkey, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) > 30 AND SUM(CAST(l_quantity AS DECIMAL(12,2))) > 500
    ORDER BY l_partkey
    LIMIT 1000
    """,
    tags=("agg", "having"),
)

# --- grouping sets / rollup / cube + grouping() ---------------------------
register_sql(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg", "grouping-sets"),
)

register_sql(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)

register_sql(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)

# --- high-cardinality group-by (the umami/spill-relevant shape) -----------
register_sql(
    "agg_high_cardinality",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS order_total,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY order_total DESC, l_orderkey
    LIMIT 100
    """,
    tags=("agg", "high-cardinality", "spill"),
    bench=True,
    spread_tables=("lineitem",),
)

# --- count(*) vs count(col) null semantics --------------------------------
register_sql(
    "agg_count_nulls",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_all,
           COUNT(o.o_orderkey) AS n_orders,
           COUNT(DISTINCT o.o_orderstatus) AS n_status
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("agg", "null-semantics", "outer-join"),
)


# --- NULL group keys: NULLs form one group (reference group-by null
# handling, aggregates/group_values) ------------------------------------------
register_sql(
    "agg_null_group_keys",
    """
    SELECT CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_mktsegment END AS seg,
           CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_nationkey END AS nk,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM customer
    GROUP BY 1, 2
    """,
    tags=("agg", "null-semantics", "null-group-keys"),
)


# --- FILTER clause on aggregates (reference sql FILTER (WHERE ...) support,
# sqllogictest test_files/aggregate.slt) — same text both engines ----------
register_sql(
    "agg_filter_clause",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_discount > 0.05) AS BIGINT) AS discounted_cents,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F') AS f_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "filter-clause"),
)

# --- GROUP BY ALL / ORDER BY ALL (reference supports both; Spark 4 too) ----
register_sql(
    "agg_group_by_all",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("agg", "group-by-all"),
)
