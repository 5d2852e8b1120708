"""Subquery forms: scalar (correlated + uncorrelated), IN / NOT IN,
EXISTS / NOT EXISTS, lateral.

Covers SURVEY.md §2.10 — reference subquery decorrelation
(sql/src/expr/subquery.rs, optimizer/src/decorrelate*.rs,
scalar_subquery_to_join.rs). Spark SQL supports all of these natively
via Catalyst's RewriteCorrelatedScalarSubquery / RewritePredicateSubquery
— these queries prove the decorrelation parity. Additional EXISTS/IN
shapes live in joins.py and tpch.py (q2/q4/q17/q18/q20/q21/q22).
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

register_sql(
    "subq_scalar_uncorrelated",
    # NULLIF(COUNT(*), 0) per the CLAUDE.md ANSI-asymmetry rule (r13
    # review): Spark `/` throws on a zero denominator where DuckDB
    # yields NULL.  Unreachable with a non-empty orders table (and the
    # NULL dividend short-circuits first), but the bare COUNT(*) was a
    # refactor hazard — copying the pattern onto a filtered subquery
    # where COUNT can hit 0 with a non-null dividend would crash
    # Spark-only.
    """
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                  / NULLIF(COUNT(*), 0) FROM orders) AS delta_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                 / NULLIF(COUNT(*), 0) * 1.5 FROM orders)
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("subquery", "scalar"),
)

register_sql(
    "subq_scalar_correlated_projection",
    # The o_totalprice > 450000 filter makes the correlated group EMPTY
    # for a third of customers at every SF (probed: 57/150 at sf0.001,
    # 538/1500 at sf0.01, 5518/15000 at sf0.1) — the canonical "count
    # bug" path of scalar-subquery decorrelation (COUNT over an empty
    # group must be 0, MAX must be NULL; a naive rewrite to a join
    # returns NULL for both).  The unfiltered original never took this
    # branch: every fixture customer has orders, so the exact
    # divergence the spec exists to prove sat in a measure-zero set
    # (r13 review, same class as the r12 masked-boundary lessons).
    """
    SELECT c_custkey, c_name,
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 450000)
             AS n_big_orders,
           (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 450000)
             AS max_big_order
    FROM customer
    WHERE c_custkey < 100
    """,
    tags=("subquery", "scalar", "correlated"),
)

register_sql(
    "subq_in_correlated_filter",
    # The IN subquery is now genuinely CORRELATED (r13 review: both
    # subqueries were uncorrelated, so the name overstated coverage —
    # correlated-IN is a distinct RewritePredicateSubquery path): the
    # machinery customer must also have an account balance above 1% of
    # the OUTER order's total price (o_totalprice is DOUBLE, so the
    # /100.0 literal stays in IEEE double on both engines).
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY'
                          AND c_acctbal > o_totalprice / 100.0)
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("subquery", "in", "not-in", "correlated"),
)

register_sql(
    "subq_lateral_topn",
    # The o_totalprice > 450000 filter empties the lateral subquery for
    # ~a third of customers at every SF (probed — same distribution as
    # the scalar spec above), so INNER-lateral row elimination (a
    # customer whose subquery returns zero rows disappears) is actually
    # exercised; unfiltered, every customer had orders and an
    # accidental outer-lateral rewrite emitting NULL rows would have
    # stayed gate-green (r13 review).
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey AND o_totalprice > 450000
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey < 60
    """,
    tags=("subquery", "lateral"),
)

register_sql(
    "subq_exists_correlated_agg",
    """
    SELECT n_name, COUNT(*) AS n_supp
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    -- threshold 15000 ~ the per-supplier qty-sum MEDIAN (probed:
    -- min/med/max = 13928/15221/16446 at sf0.001, 12815/15288/18218 at
    -- sf0.1), so the EXISTS genuinely splits suppliers at every SF.
    -- The old > 1000 passed 100% of suppliers (per-supplier sums are
    -- scale-invariant ~15k) — the spec proved nothing about
    -- EXISTS/HAVING filtering (r13 review).
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey
                  GROUP BY l_suppkey
                  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 15000)
    GROUP BY n_name
    """,
    tags=("subquery", "exists", "having"),
)
