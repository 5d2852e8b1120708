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
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

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
