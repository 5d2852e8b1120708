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
    """
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                  / COUNT(*) FROM orders) AS delta_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                 / COUNT(*) * 1.5 FROM orders)
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("subquery", "scalar"),
)

register_sql(
    "subq_scalar_correlated_projection",
    """
    SELECT c_custkey, c_name,
           (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
           (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
            WHERE o_custkey = c_custkey) AS max_order
    FROM customer
    WHERE c_custkey < 100
    """,
    tags=("subquery", "scalar", "correlated"),
)

register_sql(
    "subq_in_correlated_filter",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("subquery", "in", "not-in"),
)

register_sql(
    "subq_lateral_topn",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
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
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey
                  GROUP BY l_suppkey
                  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 1000)
    GROUP BY n_name
    """,
    tags=("subquery", "exists", "having"),
)
