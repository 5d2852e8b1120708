"""Window functions: ranking, analytic, aggregates-over-frames with
ROWS / RANGE frame specs.

Covers SURVEY.md §2.5 — reference WindowAggExec
(windows/window_agg_exec.rs:55), BoundedWindowAggExec
(bounded_window_agg_exec.rs:77), frame spec (expr/src/window_frame.rs:40),
ranking + analytic functions (functions-window/src/lib.rs:68-78).
GROUPS frames have no Spark equivalent — documented gap (README).

Determinism, two distinct invariants (don't conflate them):
- ranking/analytic windows (rank/lead/lag/row_number): the ORDER BY
  includes a unique tiebreaker so the picked row is well-defined on
  both engines;
- value-offset RANGE frames (window_time_range_frame, the GROUPS
  emulation's RANGE-over-dense_rank): Spark REJECTS multi-column ORDER
  BY there, so no tiebreaker is possible — these are deterministic for
  a different reason: frame AGGREGATES are peer-uniform (every row
  sharing the ORDER BY value sees the same frame), so no per-row
  choice exists to break.
Sums over frames use the decimal convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import dec, probe, register, register_sql
from datafusion_umami_spark.tables import table

register_sql(
    "window_ranking",
    """
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           CAST(NTILE(4)  OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS prank,
           ROUND(CUME_DIST()    OVER w, 9) AS cdist
    FROM orders
    WHERE o_custkey < 40
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window", "ranking"),
)

register_sql(
    "window_lead_lag",
    """
    SELECT event_id, user_id,
           LAG(value, 1)        OVER w AS prev_v,
           LAG(value, 2, -1.0)  OVER w AS prev2_v,
           LEAD(value)          OVER w AS next_v,
           LEAD(event_type, 1, 'none') OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    LIMIT 1000
    """,
    tags=("window", "analytic"),
)

# r14: (l_orderkey, l_linenumber) is NOT unique in the generated
# fixtures, so the window sort needs the l_partkey tiebreak to be a
# TOTAL order — without it first/last/nth picks were partition-layout
# luck (latent for 13 rounds because every fixture scan was a single
# task; surfaced the moment the r14 scan spread changed row order, and
# would equally surface on any real multi-task layout).
register_sql(
    "window_first_last_nth",
    """
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_partkey) OVER w AS first_part,
           LAST_VALUE(l_partkey)  OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_part,
           NTH_VALUE(l_partkey, 2) OVER w AS second_part
    FROM lineitem
    WHERE l_orderkey < 400
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
    """,
    tags=("window", "analytic"),
)


@register(
    "window_running_sum_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS window3_qty
    FROM lineitem
    WHERE l_orderkey < 300
    """,
    tags=("window", "frame", "rows"),
)
def window_running_sum_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames (reference window_frame.rs WindowFrameUnits::Rows):
    running total + sliding 3-row sum via the DataFrame Window API.

    r14: the window sort carries the l_quantity tiebreak — (l_orderkey,
    l_linenumber) is NOT unique in the fixtures, and ROWS-frame sums
    over an ambiguous order are partition-layout luck (rows tying on
    BOTH linenumber and quantity are interchangeable in every output
    the frame can produce, so this order is total FOR THE SUMS)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 300)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = w.rowsBetween(-1, 1)
    q = dec("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(q).over(running).cast("double").alias("running_qty"),
        F.sum(q).over(sliding).cast("double").alias("window3_qty"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(12,2))
                               RANGE BETWEEN CAST(10000 AS DECIMAL(12,2)) PRECEDING
                                         AND CAST(10000 AS DECIMAL(12,2)) FOLLOWING) AS BIGINT) AS n_similar
    FROM orders
    WHERE o_custkey < 30
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with value offsets (reference WindowFrameUnits::Range):
    count of same-customer orders within ±10000 of this order's price.
    Decimal order key so the range arithmetic is exact on both engines."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 30)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            """
            CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(12,2))
                                RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS BIGINT)
            """
        ).alias("n_similar"),
    )


register_sql(
    "window_agg_functions",
    """
    SELECT s_suppkey, s_nationkey,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) OVER wn AS DOUBLE) AS nation_total,
           CAST(MAX(s_acctbal) OVER wn AS DOUBLE) AS nation_max,
           CAST(MIN(s_acctbal) OVER wn AS DOUBLE) AS nation_min,
           COUNT(*) OVER wn AS nation_n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) OVER wn AS DOUBLE)
             / (COUNT(*) OVER wn) AS nation_avg
    FROM supplier
    WINDOW wn AS (PARTITION BY s_nationkey)
    """,
    tags=("window", "agg-over-window"),
)

register_sql(
    "window_topk_per_group",
    """
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
    tags=("window", "topk-per-group"),
    bench=True,
)

register_sql(
    "window_dedup_latest",
    """
    SELECT user_id, event_id, event_type
    FROM (SELECT user_id, event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
    WHERE rn = 1
    """,
    tags=("window", "dedup", "latest-per-key"),
)


# --- GROUPS frame emulation --------------------------------------------------
# The reference supports GROUPS window frames (expr/src/window_frame.rs:40);
# Spark has only ROWS/RANGE.  Exact emulation: GROUPS distance over the
# ORDER BY key == RANGE distance over dense_rank(key), so a first window
# pass computes dense_rank and a second applies a RANGE frame on it.
# DuckDB v1.0.0 ALSO lacks GROUPS frames ("GROUPS mode ... not
# implemented yet"), so there is NO native cross-check available: the
# oracle below is a structurally independent reformulation (per-peer-
# group aggregation + self-join on dense-rank distance), and the shared
# SQL-standard definition both sides reformulate is pinned engine-
# independently by the hypothesis evaluator in tests/test_fuzz.py::
# test_groups_frame_emulation_matches_definition.
register_sql(
    "window_groups_frame_emulated",
    """
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             CAST(l_quantity AS BIGINT) AS qty_key,
             DENSE_RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY CAST(l_quantity AS BIGINT)) AS dr,
             l_returnflag
      FROM lineitem WHERE l_orderkey < 400)
    SELECT l_orderkey, l_linenumber, qty_key,
           CAST(SUM(qty_key) OVER (PARTITION BY l_returnflag ORDER BY dr
                                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                AS BIGINT) AS qty_groups_sum,
           CAST(COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY dr
                               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                AS BIGINT) AS peers_in_frame
    FROM ranked
    """,
    # DuckDB also lacks GROUPS frames — the oracle recomputes the same
    # semantics with a structurally INDEPENDENT formulation (per-peer-group
    # aggregation + self-join on dense-rank distance ≤ 1), so the check
    # does not share the emulation's code path.
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty_key,
             l_returnflag,
             DENSE_RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY CAST(l_quantity AS BIGINT)) AS dr
      FROM lineitem WHERE l_orderkey < 400),
    g AS (
      SELECT l_returnflag, dr, SUM(qty_key) AS s, COUNT(*) AS c
      FROM ranked GROUP BY l_returnflag, dr),
    gwin AS (
      SELECT a.l_returnflag, a.dr, SUM(b.s) AS ws, SUM(b.c) AS wc
      FROM g a
      JOIN g b ON b.l_returnflag = a.l_returnflag AND b.dr BETWEEN a.dr - 1 AND a.dr + 1
      GROUP BY a.l_returnflag, a.dr)
    SELECT r.l_orderkey, r.l_linenumber, r.qty_key,
           CAST(gwin.ws AS BIGINT) AS qty_groups_sum,
           CAST(gwin.wc AS BIGINT) AS peers_in_frame
    FROM ranked r
    JOIN gwin ON gwin.l_returnflag = r.l_returnflag AND gwin.dr = r.dr
    """,
    tags=("window", "groups-frame", "emulation"),
)

# --- IGNORE NULLS analytic functions -----------------------------------------
register_sql(
    "window_ignore_nulls",
    """
    WITH holey AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS px
      FROM orders WHERE o_custkey < 120)
    SELECT o_orderkey, o_custkey, px,
           lag(px) IGNORE NULLS OVER w AS prev_px,
           lead(px) IGNORE NULLS OVER w AS next_px,
           first_value(px) IGNORE NULLS OVER w AS first_px,
           last_value(px) IGNORE NULLS OVER w AS running_last_px
    FROM holey
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    # DuckDB spells IGNORE NULLS inside the call parentheses
    oracle="""
    WITH holey AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS px
      FROM orders WHERE o_custkey < 120)
    SELECT o_orderkey, o_custkey, px,
           lag(px IGNORE NULLS) OVER w AS prev_px,
           lead(px IGNORE NULLS) OVER w AS next_px,
           first_value(px IGNORE NULLS) OVER w AS first_px,
           last_value(px IGNORE NULLS) OVER w AS running_last_px
    FROM holey
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    tags=("window", "analytic", "ignore-nulls"),
    discrimination=probe(
        null_px_rows="""SELECT COUNT(*) FROM orders
            WHERE o_custkey < 120 AND o_orderkey % 3 = 0""",
        non_null_px_rows="""SELECT COUNT(*) FROM orders
            WHERE o_custkey < 120 AND o_orderkey % 3 <> 0""",
        # IGNORE NULLS only differs from the default when a partition
        # holds a NULL with a non-NULL BEFORE it (lag must skip)
        partitions_with_null_after_value="""SELECT COUNT(*) FROM (
            SELECT o_custkey FROM orders o1
            WHERE o_custkey < 120 AND o_orderkey % 3 = 0
              AND EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = o1.o_custkey
                            AND o2.o_orderkey < o1.o_orderkey
                            AND o2.o_orderkey % 3 <> 0)
            GROUP BY o_custkey)""",
    ),
)


# --- event-time RANGE frame (interval bounds over a timestamp order key) ----
register_sql(
    "window_time_range_frame",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS events_last_hour,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS cents_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    LIMIT 1000
    """,
    tags=("window", "range-frame", "event-time", "interval"),
)


# --- COUNT(DISTINCT) OVER workaround ---------------------------------------
# Spark (like most engines) rejects COUNT(DISTINCT) as a window
# function; the standard workaround is MAX(DENSE_RANK) within the
# partition: rank the distinct-key space, then the running/total
# distinct count is a plain MAX over the rank.  NOTE what this spec
# verifies: the final SELECT collapses to one row per custkey, so the
# driver row checks the per-partition distinct count, not the windowed
# value on every order row — the PER-ROW emulation semantics are pinned
# separately against DuckDB's native windowed COUNT(DISTINCT) by
# tests/test_fuzz.py::
# test_count_distinct_over_emulation_matches_duckdb_native.
register_sql(
    "window_count_distinct_emulated",
    """
    WITH base AS (
      SELECT o_custkey AS ck, o_orderkey, l_partkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    ranked AS (
      SELECT ck, o_orderkey, l_partkey,
             DENSE_RANK() OVER (PARTITION BY ck ORDER BY l_partkey) AS dr
      FROM base),
    counted AS (
      SELECT ck, o_orderkey,
             MAX(dr) OVER (PARTITION BY ck) AS n_distinct_parts
      FROM ranked)
    SELECT ck AS custkey,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           CAST(MAX(n_distinct_parts) AS BIGINT) AS n_distinct_parts
    FROM counted
    GROUP BY ck
    ORDER BY ck
    LIMIT 2000
    """,
    tags=("window", "count-distinct-over", "workaround"),
)


# --- EXCLUDE CURRENT ROW frame (emulated; native on the oracle side) -------
# Spark has no frame-exclusion clause (SQL:2011 EXCLUDE CURRENT ROW);
# the exact emulation is frame-aggregate minus the current row's
# contribution: avg_others = (SUM(frame) - x) / (COUNT(frame) - 1).
# DuckDB runs the REAL `EXCLUDE CURRENT ROW` clause, so this is an
# emulation checked against a native implementation, not against
# itself.  Integer-cents input keeps both sides exact; single-row
# frames yield NULL on both (0/0 guarded vs native empty frame).
register_sql(
    "window_exclude_current_emulated",
    """
    WITH o AS (
      SELECT o_custkey AS ck, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS rev_c
      FROM orders)
    SELECT ck, o_orderkey,
           ROUND(CAST((SUM(rev_c) OVER w) - rev_c AS DOUBLE)
                 / nullif((COUNT(*) OVER w) - 1, 0) / 100.0, 4)
             AS avg_other_orders
    FROM o
    WINDOW w AS (PARTITION BY ck ORDER BY o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ORDER BY ck, o_orderkey
    LIMIT 2000
    """,
    oracle="""
    WITH o AS (
      SELECT o_custkey AS ck, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS rev_c
      FROM orders)
    SELECT ck, o_orderkey,
           ROUND(AVG(rev_c) OVER (PARTITION BY ck ORDER BY o_orderkey
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   EXCLUDE CURRENT ROW) / 100.0, 4)
             AS avg_other_orders
    FROM o
    ORDER BY ck, o_orderkey
    LIMIT 2000
    """,
    tags=("window", "frame-exclusion", "emulation"),
)


# --- QUALIFY clause (emulated; native on the oracle side) ------------------
# Spark has no QUALIFY; the emulation is the textbook subquery-then-
# filter on the window column.  DuckDB runs a REAL QUALIFY clause.
register_sql(
    "window_qualify_emulated",
    """
    SELECT ck, o_orderkey, revenue
    FROM (
      SELECT o_custkey AS ck, o_orderkey,
             ROUND(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                   / 100.0, 2)
               AS revenue,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2
    ORDER BY ck, o_orderkey
    LIMIT 2000
    """,
    oracle="""
    SELECT o_custkey AS ck, o_orderkey,
           ROUND(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)
                   / 100.0, 2)
             AS revenue
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 2
    ORDER BY ck, o_orderkey
    LIMIT 2000
    """,
    tags=("window", "qualify", "emulation"),
)


# --- FILTER clause on a window aggregate (emulated vs native) --------------
# Spark rejects `agg(x) FILTER (WHERE ...) OVER w`; the exact emulation
# pushes the predicate into a CASE inside the aggregate.  DuckDB runs
# the native windowed FILTER.
register_sql(
    "window_filter_clause_emulated",
    """
    WITH o AS (
      SELECT o_custkey AS ck, o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS rev_c
      FROM orders)
    SELECT ck, o_orderkey,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN rev_c ELSE 0 END)
                  OVER (PARTITION BY ck ORDER BY o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS urgent_running_c
    FROM o
    ORDER BY ck, o_orderkey
    LIMIT 2000
    """,
    oracle="""
    WITH o AS (
      SELECT o_custkey AS ck, o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS rev_c
      FROM orders)
    SELECT ck, o_orderkey,
           CAST(COALESCE(SUM(rev_c) FILTER (WHERE o_orderpriority = '1-URGENT')
                  OVER (PARTITION BY ck ORDER BY o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                AS BIGINT) AS urgent_running_c
    FROM o
    ORDER BY ck, o_orderkey
    LIMIT 2000
    """,
    tags=("window", "filter-clause", "emulation"),
    discrimination=probe(
        filter_matched_rows="""SELECT COUNT(*) FROM orders
            WHERE o_orderpriority = '1-URGENT'""",
        filter_excluded_rows="""SELECT COUNT(*) FROM orders
            WHERE o_orderpriority <> '1-URGENT'""",
    ),
)
