"""PostgreSQL-compat edge semantics: DISTINCT ON + derived-NULL corners.

Covers the reference's `sqllogictest/test_files/distinct_on.slt` and
`pg_compat/pg_compat_null.slt` surfaces (r9 verdict item 7) — the edge
families not yet oracle-proven at driver scale.  The BASIC DISTINCT ON
case is `relational.distinct_on_first_line` (driver-green since r3);
this tranche closes the slt's remaining shapes — full-table scale with
a non-key choice column, reverse-direction tail, expression keys, and
the ON column omitted from the selection — plus the pg-compat
derived-NULL corners:

- ``SELECT DISTINCT ON (keys) ... ORDER BY keys, tiebreak`` — pick ONE
  row per key group, chosen by the ORDER BY tail.  Spark has no
  DISTINCT ON; the Spark-first re-expression is a rank-1 window
  (``row_number() OVER (PARTITION BY keys ORDER BY tail) = 1``), which
  Catalyst plans as WindowGroupLimit — a partial per-partition top-1
  BEFORE the shuffle, so at 100 TB each executor forwards one candidate
  row per key instead of the full group (plan-gated in
  tests/test_plans.py).  DuckDB implements DISTINCT ON natively, so the
  oracles state the semantics verbatim — the emulation is checked
  against the real operator, not against itself.
- pg-style derived nullable columns (CASE ... THEN NULL) driving
  COUNT(*) vs COUNT(col) vs COUNT(DISTINCT col) asymmetry and
  mixed-direction NULLS FIRST/LAST ordering.

Reference parity: distinct_on.slt:40 (basic), :50/:60 (reverse order),
:76 (ON column omitted from selection), :131 (expression keys);
pg_compat_null.slt:73-95 (CASE-derived nullable columns + count
asymmetry).  Determinism: every ORDER BY tail ends in a unique key so
the picked row is total-ordered; money goes through integer cents;
doubles are cast explicitly (registry.py conventions).

Round-11 stretch (r10 verdict item 7) closes the remaining pg_compat
files: pg_compat_type_coercion.slt (three-valued AND/OR over the full
TRUE/FALSE/NULL grid), pg_compat_union.slt (EXCEPT ALL / INTERSECT ALL
multiplicity preservation), pg_compat_window.slt (the analytic-function
matrix :53-63, the empty-OVER() aggregate block :287-296 incl. bit_and/
bit_or/bit_xor, and the asymmetric GROUPS-frame block :402-414 — Spark
emulates GROUPS via dense_rank + RANGE; DuckDB 1.0.0 also lacks GROUPS,
so the oracle recomputes the semantics with a structurally independent
per-peer-group aggregation + FILTERed self-join, same cross-check
design as windows.window_groups_frame_emulated).
"""

from __future__ import annotations

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import probe, register_sql

# --- DISTINCT ON, basic: earliest order per customer ------------------------
# distinct_on.slt:40-46.  Spark: rank-1 window; oracle: native DISTINCT ON.
register_sql(
    "distinct_on_first_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS first_day
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    LIMIT 2000
    """,
    oracle="""
    SELECT * FROM (
      SELECT DISTINCT ON (o_custkey)
             o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS first_day
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey
    ) ORDER BY o_custkey
    LIMIT 2000
    """,
    tags=("pg-compat", "distinct-on", "window-group-limit"),
)

# --- DISTINCT ON, reverse tail: max-quantity line per supplier --------------
# distinct_on.slt:50-57 (DESC tail picks the opposite row).
register_sql(
    "distinct_on_max_qty_line_per_supplier",
    """
    SELECT l_suppkey, CAST(l_quantity AS DOUBLE) AS qty,
           l_orderkey, l_linenumber
    FROM (
      SELECT l_suppkey, l_quantity, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY l_quantity DESC, l_orderkey,
                                         l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    ORDER BY l_suppkey
    LIMIT 2000
    """,
    oracle="""
    SELECT * FROM (
      SELECT DISTINCT ON (l_suppkey)
             l_suppkey, CAST(l_quantity AS DOUBLE) AS qty,
             l_orderkey, l_linenumber
      FROM lineitem
      ORDER BY l_suppkey, l_quantity DESC, l_orderkey, l_linenumber
    ) ORDER BY l_suppkey
    LIMIT 2000
    """,
    tags=("pg-compat", "distinct-on"),
)

# --- DISTINCT ON over EXPRESSION keys ---------------------------------------
# distinct_on.slt:131-141: ON and ORDER BY are expressions, not columns.
# Key = (custkey mod 7, order year); pick the priciest order in each cell.
register_sql(
    "distinct_on_expression_keys",
    """
    SELECT k7, yr, cents, o_orderkey
    FROM (
      SELECT o_custkey % 7 AS k7, year(o_orderdate) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey % 7, year(o_orderdate)
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                        o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY k7, yr
    """,
    oracle="""
    SELECT * FROM (
      SELECT DISTINCT ON (o_custkey % 7, year(o_orderdate))
             o_custkey % 7 AS k7, year(o_orderdate) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
      ORDER BY o_custkey % 7, year(o_orderdate),
               CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
    ) ORDER BY k7, yr
    """,
    tags=("pg-compat", "distinct-on", "expression-keys"),
)

# --- DISTINCT ON with the key column OMITTED from the selection -------------
# distinct_on.slt:76-80: the ON column need not be projected.  Output is
# just the top-balance customer NAME per nation (names are unique).
register_sql(
    "distinct_on_omit_key_top_balance",
    """
    SELECT c_name
    FROM (
      SELECT c_name,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    ORDER BY c_name
    """,
    oracle="""
    SELECT * FROM (
      SELECT DISTINCT ON (c_nationkey) c_name
      FROM customer
      ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    ) ORDER BY c_name
    """,
    tags=("pg-compat", "distinct-on"),
)

# --- derived nullable columns: COUNT asymmetry ------------------------------
# pg_compat_null.slt:73-95: CASE-derived NULL columns make COUNT(*),
# COUNT(col), COUNT(DISTINCT col) and SUM diverge.  Shared text (both
# engines run it verbatim); SUM(BIGINT) wrapped per the DuckDB-floats
# convention.
_NULL_COUNTS = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(n5) AS BIGINT) AS n_n5,
           CAST(COUNT(n9) AS BIGINT) AS n_n9,
           CAST(COUNT(DISTINCT n9) AS BIGINT) AS n9_distinct,
           CAST(SUM(n5) AS BIGINT) AS n5_cents
    FROM (
      SELECT CASE WHEN o_custkey % 3 = 0 THEN NULL
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS n5,
             CASE WHEN o_orderkey % 5 <> 0 THEN o_custkey
                  ELSE NULL END AS n9
      FROM orders
    )
    """
register_sql(
    "pg_null_derived_count_asymmetry",
    _NULL_COUNTS,
    oracle=_NULL_COUNTS,
    tags=("pg-compat", "null-semantics"),
)

# --- mixed-direction NULLS FIRST/LAST over derived nullable keys ------------
# pg_compat ordering corner: opposing null placements in one sort
# (DESC NULLS FIRST then ASC NULLS LAST), unique final tiebreak.
_NULL_ORDERING = """
    SELECT n5, n9, o_orderkey
    FROM (
      SELECT CASE WHEN o_custkey % 3 = 0 THEN NULL
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS n5,
             CASE WHEN o_orderkey % 5 <> 0 THEN o_custkey
                  ELSE NULL END AS n9,
             o_orderkey
      FROM orders
    )
    ORDER BY n5 DESC NULLS FIRST, n9 ASC NULLS LAST, o_orderkey
    LIMIT 2000
    """
register_sql(
    "pg_null_ordering_matrix",
    _NULL_ORDERING,
    oracle=_NULL_ORDERING,
    tags=("pg-compat", "null-semantics", "sort"),
)

# ============================ round-11 stretch ===============================

# --- three-valued AND/OR over the full TRUE/FALSE/NULL grid ------------------
# pg_compat_type_coercion.slt:18-55: every AND/OR combination of
# (true, false, null).  One query materializes the whole 3x3 truth table;
# booleans go out as strings so NULL vs false is hash-visible.  Shared
# text; (a, b) is a unique key and NULLS LAST is pinned on both engines.
_THREE_VALUED = """
    SELECT CAST(a AS STRING) AS a_str, CAST(b AS STRING) AS b_str,
           CAST(a AND b AS STRING) AS a_and_b,
           CAST(a OR b AS STRING)  AS a_or_b
    FROM (VALUES (TRUE), (FALSE), (CAST(NULL AS BOOLEAN))) ta(a),
         (VALUES (TRUE), (FALSE), (CAST(NULL AS BOOLEAN))) tb(b)
    ORDER BY a_str NULLS LAST, b_str NULLS LAST
    """
register_sql(
    "pg_three_valued_logic_matrix",
    _THREE_VALUED,
    oracle=_THREE_VALUED.replace("AS STRING", "AS VARCHAR"),
    tags=("pg-compat", "type-coercion", "three-valued-logic"),
)

# --- EXCEPT ALL / INTERSECT ALL multiplicity preservation --------------------
# pg_compat_union.slt:71-118 (EXCEPT/EXCEPT ALL) and :154-200
# (INTERSECT/INTERSECT ALL): ALL variants keep per-value multiplicities
# (left minus right / min(left, right)), which plain EXCEPT/INTERSECT
# collapse.  The slt enumerates duplicate rows; at table scale the
# equivalent check is the per-value multiset cardinality.  The pruned
# base feeds FOUR set-op inputs — inlined it would scan lineitem 4×
# (the CTE-inlining trap, SCALE.md), so the Spark side materializes it
# once; the DuckDB oracle keeps the single WITH statement (DuckDB
# materializes shared CTEs natively).
_SETOP_FINAL = """
    SELECT op, v, n FROM (
      SELECT 'except' AS op, v, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT v FROM pg_setop_base
        EXCEPT ALL
        SELECT v FROM pg_setop_base WHERE v IN (3, 4)
      ) GROUP BY v
      UNION ALL
      SELECT 'intersect' AS op, v, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT v FROM pg_setop_base
        INTERSECT ALL
        SELECT v FROM pg_setop_base WHERE v IN (3, 4)
      ) GROUP BY v
    )
    ORDER BY op, v
    """
register_split_sql(
    "pg_setop_all_multiplicity",
    stages=[(
        "SELECT l_linenumber AS v FROM lineitem WHERE l_orderkey < 4000",
        "pg_setop_base",
    )],
    final_sql=_SETOP_FINAL,
    oracle=(
        "WITH pg_setop_base AS "
        "(SELECT l_linenumber AS v FROM lineitem WHERE l_orderkey < 4000)\n"
        + _SETOP_FINAL
    ),
    tags=("pg-compat", "set-ops", "except-all", "intersect-all"),
    discrimination=probe(
        # ALL semantics only differ from DISTINCT when a value carries
        # multiplicity > 1 through the operator
        inlist_values_multiplicity_gt1="""SELECT COUNT(*) FROM (
            SELECT l_linenumber AS v, COUNT(*) AS n FROM lineitem
            WHERE l_orderkey < 4000 AND l_linenumber IN (3, 4)
            GROUP BY l_linenumber HAVING COUNT(*) > 1)""",
        values_outside_inlist="""SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey < 4000 AND l_linenumber NOT IN (3, 4)""",
    ),
)

# --- analytic-function matrix: asc + desc variants in one pass ---------------
# pg_compat_window.slt:53-63: row_number / lead / lag / first_value /
# last_value / nth_value(2), with first/last/nth repeated over the
# REVERSED ordering.  ORDER BY key (o_orderkey) is unique within the
# partition so default frames are deterministic on both engines
# (last_value under RANGE ... CURRENT ROW == current row only when no
# peers exist).  Shared text via the WINDOW clause, supported by both.
_ANALYTIC_MATRIX = """
    SELECT o_orderpriority, o_orderkey,
           row_number()          OVER wa AS row_num,
           lead(o_orderkey)      OVER wa AS lead_key,
           lag(o_orderkey)       OVER wa AS lag_key,
           first_value(o_orderkey) OVER wa AS first_asc,
           first_value(o_orderkey) OVER wd AS first_desc,
           last_value(o_orderkey)  OVER wa AS last_asc,
           last_value(o_orderkey)  OVER wd AS last_desc,
           nth_value(o_orderkey, 2) OVER wa AS second_asc,
           nth_value(o_orderkey, 2) OVER wd AS second_desc
    FROM orders
    WHERE o_orderkey < 12000
    WINDOW wa AS (PARTITION BY o_orderpriority ORDER BY o_orderkey),
           wd AS (PARTITION BY o_orderpriority ORDER BY o_orderkey DESC)
    ORDER BY o_orderpriority, o_orderkey
    LIMIT 2000
    """
register_sql(
    "pg_window_analytic_matrix",
    _ANALYTIC_MATRIX,
    oracle=_ANALYTIC_MATRIX,
    tags=("pg-compat", "window", "analytic"),
)

# --- empty-OVER() aggregates incl. the bitwise trio --------------------------
# pg_compat_window.slt:287-296: count/sum/max/min + bit_and/bit_or/
# bit_xor computed OVER () — every row sees the table-wide aggregate.
# A literal OVER () window in Spark moves ALL rows to one partition
# (WindowExec warns; a 100 TB scale-killer), so the Spark-first
# re-expression is a one-row global aggregate broadcast-cross-joined
# back onto the distributed rows — same semantics, no single-partition
# stage.  The DuckDB oracle runs the LITERAL empty-OVER window, so the
# re-expression is cross-checked against the real operator (the
# DISTINCT ON design).  Money through integer cents; every aggregate
# cast to BIGINT so DuckDB's HUGEINT SUM and pandas floating never
# leak in.
register_split_sql(
    "pg_window_empty_over_aggregates",
    stages=[(
        """
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey < 8000
        """,
        "pg_over_base",
    )],
    final_sql="""
    SELECT b.o_orderkey, a.n_all, a.cents_all, a.cents_max, a.cents_min,
           a.cust_band, a.cust_bor, a.cust_bxor
    FROM pg_over_base b
    CROSS JOIN (
      SELECT CAST(count(*) AS BIGINT)         AS n_all,
             CAST(sum(cents) AS BIGINT)       AS cents_all,
             CAST(max(cents) AS BIGINT)       AS cents_max,
             CAST(min(cents) AS BIGINT)       AS cents_min,
             CAST(bit_and(o_custkey) AS BIGINT) AS cust_band,
             CAST(bit_or(o_custkey)  AS BIGINT) AS cust_bor,
             CAST(bit_xor(o_custkey) AS BIGINT) AS cust_bxor
      FROM pg_over_base
    ) a
    ORDER BY b.o_orderkey
    LIMIT 2000
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(count(*) OVER ()  AS BIGINT) AS n_all,
           CAST(sum(cents) OVER () AS BIGINT) AS cents_all,
           CAST(max(cents) OVER () AS BIGINT) AS cents_max,
           CAST(min(cents) OVER () AS BIGINT) AS cents_min,
           CAST(bit_and(o_custkey) OVER () AS BIGINT) AS cust_band,
           CAST(bit_or(o_custkey)  OVER () AS BIGINT) AS cust_bor,
           CAST(bit_xor(o_custkey) OVER () AS BIGINT) AS cust_bxor
    FROM (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey < 8000
    )
    ORDER BY o_orderkey
    LIMIT 2000
    """,
    tags=("pg-compat", "window", "bitwise"),
)

# --- asymmetric GROUPS frames: the four shapes the slt stresses --------------
# pg_compat_window.slt:402-414 (summation1/2/4/11): GROUPS BETWEEN
# 3 PRECEDING AND 1 FOLLOWING / 3 PRECEDING AND 2 PRECEDING (frame fully
# behind) / 1 FOLLOWING AND 3 FOLLOWING (fully ahead, empty at the tail
# -> NULL) / CURRENT ROW AND UNBOUNDED FOLLOWING (current PEER GROUP
# through the end).  Spark lacks GROUPS: distance in peer groups over
# the ORDER BY key == RANGE distance over dense_rank(key), so the
# emulation is a dense_rank pass + RANGE frames on it.  DuckDB 1.0.0
# also lacks GROUPS ("not implemented yet"), so the oracle derives the
# same semantics INDEPENDENTLY: per-peer-group partial sums, a
# partition-local self-join, and one FILTER per frame shape — the
# emulation is checked against a different algorithm, not itself.
# LIMIT 2000 on both sides (r11 ADVICE item 5): the ORDER BY tail is a
# total order, so the cap enforces the driver-sweep row budget by TEXT
# instead of leaning on TPC-H keygen density under l_orderkey < 700.
register_sql(
    "pg_window_groups_asymmetric_frames",
    """
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty_key,
             l_returnflag,
             DENSE_RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY CAST(l_quantity AS BIGINT)) AS dr
      FROM lineitem WHERE l_orderkey < 700)
    SELECT l_orderkey, l_linenumber, qty_key,
           CAST(SUM(qty_key) OVER (PARTITION BY l_returnflag ORDER BY dr
                 RANGE BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS BIGINT)
             AS sum_back3_fwd1,
           CAST(SUM(qty_key) OVER (PARTITION BY l_returnflag ORDER BY dr
                 RANGE BETWEEN 3 PRECEDING AND 2 PRECEDING) AS BIGINT)
             AS sum_back3_back2,
           CAST(SUM(qty_key) OVER (PARTITION BY l_returnflag ORDER BY dr
                 RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS BIGINT)
             AS sum_fwd1_fwd3,
           CAST(SUM(qty_key) OVER (PARTITION BY l_returnflag ORDER BY dr
                 RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS sum_cur_unbounded
    FROM ranked
    ORDER BY l_orderkey, l_linenumber
    LIMIT 2000
    """,
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty_key,
             l_returnflag,
             DENSE_RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY CAST(l_quantity AS BIGINT)) AS dr
      FROM lineitem WHERE l_orderkey < 700),
    g AS (
      SELECT l_returnflag, dr, SUM(qty_key) AS s
      FROM ranked GROUP BY l_returnflag, dr),
    gwin AS (
      SELECT a.l_returnflag, a.dr,
             SUM(b.s) FILTER (WHERE b.dr BETWEEN a.dr - 3 AND a.dr + 1)
               AS w_back3_fwd1,
             SUM(b.s) FILTER (WHERE b.dr BETWEEN a.dr - 3 AND a.dr - 2)
               AS w_back3_back2,
             SUM(b.s) FILTER (WHERE b.dr BETWEEN a.dr + 1 AND a.dr + 3)
               AS w_fwd1_fwd3,
             SUM(b.s) FILTER (WHERE b.dr >= a.dr) AS w_cur_unbounded
      FROM g a
      JOIN g b ON b.l_returnflag = a.l_returnflag
      GROUP BY a.l_returnflag, a.dr)
    SELECT r.l_orderkey, r.l_linenumber, r.qty_key,
           CAST(w.w_back3_fwd1 AS BIGINT)    AS sum_back3_fwd1,
           CAST(w.w_back3_back2 AS BIGINT)   AS sum_back3_back2,
           CAST(w.w_fwd1_fwd3 AS BIGINT)     AS sum_fwd1_fwd3,
           CAST(w.w_cur_unbounded AS BIGINT) AS sum_cur_unbounded
    FROM ranked r
    JOIN gwin w ON w.l_returnflag = r.l_returnflag AND w.dr = r.dr
    ORDER BY r.l_orderkey, r.l_linenumber
    LIMIT 2000
    """,
    tags=("pg-compat", "window", "groups-frame", "emulation"),
)
