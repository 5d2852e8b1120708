"""JOB / IMDB-shaped queries on the TPC-H star schema.

The reference's third big benchmark corpus is the Join Order Benchmark
(reference benchmarks/queries/imdb/1a..33c.sql, runner
benchmarks/src/imdb/run.rs): many-way comma-joins whose WHERE clause
mixes join predicates with highly selective dimension filters
(equality + LIKE / NOT LIKE / IN), aggregated to MIN() columns with no
GROUP BY.  The *operator* content is covered elsewhere; these three
queries reproduce the characteristic optimizer stress — join-order
choice driven by selective filters — on the driver's schema, where
Catalyst must (and does: tests assert broadcasts) reorder and broadcast
the filtered dimensions instead of joining in textual order.

MIN() over every output column makes results order-independent, exactly
like the JOB originals.
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

# 1a-ish: 5-way comma join, two selective dim filters + a LIKE fence
register_sql(
    "job_selective_5way",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(s_name) AS first_supplier,
           MIN(n_name) AS first_nation,
           COUNT(*) AS matches
    FROM customer, orders, lineitem, supplier, nation
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND c_mktsegment = 'BUILDING'
      AND n_name LIKE 'A%'
      AND o_orderpriority NOT LIKE '%LOW%'
      AND l_quantity < 10
    """,
    tags=("job", "join-order", "selective"),
)

# 8a-ish: 6-way with string fences on both ends of the join chain
register_sql(
    "job_string_fences_6way",
    """
    SELECT MIN(o_orderdate) AS first_order,
           MIN(r_name) AS first_region,
           MIN(l_shipdate) AS first_ship,
           COUNT(*) AS matches
    FROM region, nation, customer, orders, lineitem, supplier
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND r_name LIKE '%E%'
      AND c_name LIKE '%0001%'
      AND s_name NOT LIKE '%9%'
      AND o_orderstatus IN ('F', 'O')
      AND l_returnflag <> 'R'
    """,
    tags=("job", "join-order", "like"),
)

# 10c-ish: mid-selectivity chain where the optimizer should start from
# the small filtered side (single-digit nations), not the fact table
register_sql(
    "job_dim_first_chain",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(o_orderdate) AS first_order,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS matches
    FROM nation, customer, orders, lineitem
    WHERE n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND n_name IN ('FRANCE', 'GERMANY', 'ROMANIA')
      AND c_acctbal > 0
      AND o_totalprice > 100000
      AND l_discount BETWEEN 0.02 AND 0.08
    """,
    tags=("job", "join-order", "in-list"),
)

# OR-heavy predicate fences (JOB's disjunctive note-filters): the
# optimizer must keep the equi-join keys clean while the ORs stay as
# post-scan filters
register_sql(
    "job_or_fences",
    """
    SELECT MIN(o_orderdate) AS first_order,
           MIN(c_name) AS first_customer,
           COUNT(*) AS matches
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND (c_mktsegment = 'AUTOMOBILE' OR c_mktsegment = 'HOUSEHOLD')
      AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
      AND (l_returnflag = 'A' OR l_linestatus = 'O')
      AND (l_quantity < 5 OR l_quantity > 45)
    """,
    tags=("job", "or-predicates", "join-order"),
)

# anti-join fence: NOT EXISTS against a filtered dimension
register_sql(
    "job_antijoin_fence",
    """
    SELECT MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM supplier s, lineitem l
    WHERE s.s_suppkey = l.l_suppkey
      AND l.l_discount > 0.09
      AND NOT EXISTS (
        SELECT 1 FROM nation n
        WHERE n.n_nationkey = s.s_nationkey AND n.n_name LIKE '%UNITED%')
    """,
    tags=("job", "anti-join", "not-exists"),
)

# star with two filtered dimension arms on one fact table
register_sql(
    "job_star_two_arms",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(s_name) AS first_supplier,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, supplier, nation cn, nation sn
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = cn.n_nationkey
      AND s_nationkey = sn.n_nationkey
      AND cn.n_name = 'CHINA'
      AND sn.n_name IN ('JAPAN', 'INDIA')
      AND l_shipdate >= DATE '1995-06-01'
    """,
    tags=("job", "star", "two-arms"),
)
