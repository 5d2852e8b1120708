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

from datafusion_umami_spark.registry import probe, register_sql

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
      AND n_name LIKE 'NATION_1%'
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
      AND n_name IN ('NATION_3', 'NATION_7', 'NATION_12')
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
        WHERE n.n_nationkey = s.s_nationkey
          AND n.n_name LIKE 'NATION!_1%' ESCAPE '!')
    """,
    tags=("job", "anti-join", "not-exists"),
    discrimination=probe(
        anti_kept_suppliers="""SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                WHERE n.n_nationkey = s.s_nationkey
                  AND n.n_name LIKE 'NATION!_1%' ESCAPE '!')""",
        anti_rejected_suppliers="""SELECT COUNT(*) FROM supplier s
            WHERE EXISTS (SELECT 1 FROM nation n
                WHERE n.n_nationkey = s.s_nationkey
                  AND n.n_name LIKE 'NATION!_1%' ESCAPE '!')""",
        discount_fence_rows="""SELECT COUNT(*) FROM lineitem
            WHERE l_discount > 0.09""",
        discount_fence_excludes="""SELECT COUNT(*) FROM lineitem
            WHERE l_discount <= 0.09""",
    ),
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
      AND cn.n_name = 'NATION_5'
      AND sn.n_name IN ('NATION_8', 'NATION_14')
      AND l_shipdate >= DATE '1995-06-01'
    """,
    tags=("job", "star", "two-arms"),
)

# ---------------------------------------------------------------------------
# Round-3 breadth: six more characteristic JOB optimizer stresses
# (reference benchmarks/queries/imdb/ 2a/6f/13d/16b/22c/33c families).
# ---------------------------------------------------------------------------

# 2a-ish: single ultra-selective equality on a mid dim drives the order
register_sql(
    "job_point_dim_probe",
    """
    SELECT MIN(o_orderdate) AS first_order,
           MIN(l_shipdate) AS first_ship,
           COUNT(*) AS matches
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND c_name = 'Customer#000000042'
    """,
    tags=("job", "point-probe", "join-order"),
)

# 6f-ish: no selective filter at all — pure join-order on sizes
register_sql(
    "job_unselective_4way",
    """
    SELECT MIN(n_name) AS first_nation,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM nation, supplier, lineitem, part
    WHERE n_nationkey = s_nationkey
      AND s_suppkey = l_suppkey
      AND l_partkey = p_partkey
      AND p_size > 1
    """,
    tags=("job", "unselective", "join-order"),
)

# 13d-ish: range fences on BOTH fact arms + a BETWEEN on the bridge
register_sql(
    "job_double_range_fence",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM part, lineitem, supplier, orders
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND p_retailprice BETWEEN 920 AND 950
      AND o_totalprice BETWEEN 100000 AND 250000
      AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
    """,
    tags=("job", "range-fences", "join-order"),
)

# 16b-ish: IN-list on two dims + LIKE on the bridge string
register_sql(
    "job_two_inlists_like",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM customer, orders, lineitem, part
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND c_mktsegment IN ('MACHINERY', 'FURNITURE')
      AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_type LIKE '%O%'
    """,
    tags=("job", "in-list", "like", "join-order"),
)

# 22c-ish: the same dimension joined twice under DIFFERENT filters
# (alias disambiguation + per-arm selectivity estimation)
register_sql(
    "job_self_dim_two_filters",
    """
    SELECT MIN(cn.n_name) AS cust_nation,
           MIN(sn.n_name) AS supp_nation,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, supplier, nation cn, nation sn
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = cn.n_nationkey
      AND s_nationkey = sn.n_nationkey
      AND cn.n_name LIKE 'NATION_1%'
      AND sn.n_name LIKE '%2'
      AND l_quantity < 15
    """,
    tags=("job", "self-dim", "join-order"),
)

# 33c-ish: deep 7-way chain region→nation→customer→orders→lineitem→
# part+supplier with mixed fences — the longest chain in the corpus
register_sql(
    "job_deep_7way_chain",
    """
    SELECT MIN(r_name) AS first_region,
           MIN(p_name) AS first_part,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS matches
    FROM region, nation, customer, orders, lineitem, part, supplier
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND r_name IN ('ASIA', 'EUROPE')
      AND p_size BETWEEN 10 AND 30
      AND s_acctbal > 0
      AND o_orderstatus = 'F'
    """,
    tags=("job", "deep-chain", "join-order"),
)

# ---------------------------------------------------------------------------
# Round-4 breadth: JOB's widest star fan-outs and its remaining filter
# idioms (reference benchmarks/queries/imdb/6a,16a,22a-c,33c.sql):
# role-playing dimension arms, redundant transitive join predicates,
# negated dim equality, string-inequality fences, LIKE + NOT LIKE on
# the same column, bridge self-joins, and 4-dim IN-list stacks.
# ---------------------------------------------------------------------------

# 22a-ish widest star: 9 relations, both nation/region arms role-played,
# selective fences on three different arms
register_sql(
    "job_widest_9way_star",
    """
    SELECT MIN(cr.r_name) AS cust_region,
           MIN(sr.r_name) AS supp_region,
           MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM region cr, region sr, nation cn, nation sn,
         customer, supplier, orders, lineitem, part
    WHERE cr.r_regionkey = cn.n_regionkey
      AND sr.r_regionkey = sn.n_regionkey
      AND cn.n_nationkey = c_nationkey
      AND sn.n_nationkey = s_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND cr.r_name IN ('ASIA', 'AMERICA')
      AND sr.r_name <> 'AFRICA'
      AND p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
      AND o_orderpriority LIKE '1%'
    """,
    tags=("job", "widest-star", "role-playing-dims"),
)

# JOB's hallmark redundant transitive equalities (t.id = mk.movie_id AND
# t.id = mc.movie_id AND mk.movie_id = mc.movie_id): two lineitem
# aliases + orders, every pairwise orderkey equality stated
register_sql(
    "job_redundant_join_preds",
    """
    SELECT MIN(l1.l_shipdate) AS first_ship,
           MIN(l2.l_shipdate) AS second_ship,
           COUNT(*) AS matches
    FROM orders, lineitem l1, lineitem l2
    WHERE l1.l_orderkey = o_orderkey
      AND l2.l_orderkey = o_orderkey
      AND l1.l_orderkey = l2.l_orderkey
      AND l1.l_linenumber < l2.l_linenumber
      AND l1.l_returnflag = 'R'
      AND l2.l_returnflag = 'A'
      AND o_orderstatus = 'F'
    """,
    tags=("job", "redundant-preds", "self-join"),
)

# 22a-ish negated dimension equality (cn.country_code != '[us]') plus a
# NOT LIKE fence on a second dim
register_sql(
    "job_negated_dim_eq",
    """
    SELECT MIN(n_name) AS first_nation,
           MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM nation, supplier, lineitem, part
    WHERE n_nationkey = s_nationkey
      AND s_suppkey = l_suppkey
      AND l_partkey = p_partkey
      AND n_name <> 'NATION_0'
      AND n_name NOT LIKE '%1%'
      AND p_name NOT LIKE '%bolt%'
      AND p_size < 8
    """,
    tags=("job", "negated-eq", "not-like"),
)

# mi_idx.info < '7.0'-ish: STRING inequality fences driving selectivity
register_sql(
    "job_string_range_dim",
    """
    SELECT MIN(o_orderpriority) AS first_prio,
           MIN(p_brand) AS first_brand,
           COUNT(*) AS matches
    FROM orders, lineitem, part
    WHERE o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND o_orderpriority < '3'
      AND p_brand >= 'Brand#40'
      AND l_discount > 0.05
    """,
    tags=("job", "string-range"),
)

# 16a-ish: integer range fence (t.episode_nr >= 50 AND < 100) inside an
# 8-way join with a role-played supplier-nation arm
register_sql(
    "job_episode_range_8way",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(sn.n_name) AS supp_nation,
           COUNT(*) AS matches
    FROM region, nation cn, nation sn, customer, supplier, orders, lineitem, part
    WHERE r_regionkey = cn.n_regionkey
      AND cn.n_nationkey = c_nationkey
      AND sn.n_nationkey = s_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND p_size >= 25 AND p_size < 35
      AND r_name = 'EUROPE'
      AND o_orderstatus IN ('F', 'O')
    """,
    tags=("job", "int-range", "role-playing-dims"),
)

# IN-list stacks on four dimensions simultaneously (join-order stress:
# which arm is most selective?)
register_sql(
    "job_four_inlist_dims",
    """
    SELECT MIN(r_name) AS first_region,
           MIN(c_mktsegment) AS first_segment,
           COUNT(*) AS matches
    FROM region, nation, customer, orders, lineitem, part, supplier
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND r_name IN ('ASIA', 'EUROPE', 'AMERICA')
      AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND p_brand IN ('Brand#11', 'Brand#21', 'Brand#31')
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("job", "in-list", "join-order"),
)

# movie_link-ish bridge self-join: two lineitem arms crossed on
# (partkey, suppkey) — same part+supplier appearing in two orders
register_sql(
    "job_crossed_bridges",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(l1.l_shipdate) AS earlier_ship,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, part
    WHERE l1.l_partkey = l2.l_partkey
      AND l1.l_suppkey = l2.l_suppkey
      AND l1.l_orderkey < l2.l_orderkey
      AND l1.l_partkey = p_partkey
      AND p_brand = 'Brand#13'
      AND l1.l_quantity > 40
      AND l2.l_quantity > 40
    """,
    tags=("job", "bridge-self-join"),
)

# 6a-ish: point equality on one dim (k.keyword = '...') + year trend
# fence (t.production_year > 2010) on the fact's date
register_sql(
    "job_year_trend_fence",
    """
    SELECT MIN(o_orderdate) AS first_order,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM part, lineitem, orders, supplier, nation, region
    WHERE p_partkey = l_partkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND p_name = 'blue anvil'
      AND o_orderdate > DATE '2000-01-01'
    """,
    tags=("job", "point-dim", "date-trend"),
)

# 22a-ish LIKE + NOT LIKE on the SAME column (mc.note not like '%(USA)%'
# and mc.note like '%(200%)%')
register_sql(
    "job_like_notlike_same_col",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM part, lineitem, orders
    WHERE p_partkey = l_partkey
      AND l_orderkey = o_orderkey
      AND p_name LIKE '%blue%'
      AND p_name NOT LIKE '%bolt%'
      AND o_orderpriority IN ('1-URGENT', '5-LOW')
      AND l_tax < 0.05
    """,
    tags=("job", "like-notlike"),
)

# three independent chains hanging off one fact, each chain fenced at
# its far end — the optimizer must pick which arm to build first
register_sql(
    "job_three_chains_one_fact",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(s_name) AS first_supplier,
           MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, supplier, part
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND c_acctbal > 8000
      AND s_acctbal > 8000
      AND p_retailprice > 980
    """,
    tags=("job", "three-arms", "join-order"),
)

# ---------------------------------------------------------------------------
# Round-4 second tranche: twelve more JOB idioms (reference
# benchmarks/queries/imdb/ shapes not yet represented above).  Same
# conventions: MIN()/COUNT() outputs for order-independence, selective
# dimension fences driving join-order choice, identical SQL on both
# engines.  100 TB shape for all of these: every filtered dimension arm
# collapses to KBs and broadcasts; only lineitem/orders shuffle.
# ---------------------------------------------------------------------------

# 7a-ish: nation joined TWICE (customer arm vs supplier arm) with a
# cross-arm inequality — the classic JOB aliased-dimension shape
# (imdb/7a.sql joins name/aka_name the same way)
register_sql(
    "job_two_nation_arms_crossed",
    """
    SELECT MIN(n1.n_name) AS first_cust_nation,
           MIN(n2.n_name) AS first_supp_nation,
           COUNT(*) AS matches
    FROM nation n1, customer, orders, lineitem, supplier, nation n2
    WHERE n1.n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n2.n_nationkey
      AND n1.n_name <> n2.n_name
      AND n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND n2.n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
      AND l_quantity > 10
    """,
    tags=("job", "aliased-dims", "join-order"),
)

# anti-join via LEFT JOIN ... IS NULL (imdb queries express "no such
# link exists" this way before optimizers normalize it to anti-join)
register_sql(
    "job_leftjoin_null_reject",
    """
    SELECT MIN(p.p_name) AS first_unordered_part,
           COUNT(*) AS n_unordered
    FROM part p LEFT JOIN lineitem l
      ON p.p_partkey = l.l_partkey AND l.l_quantity > 45
    WHERE l.l_orderkey IS NULL
      AND p.p_retailprice > 500
    """,
    tags=("job", "left-null-anti"),
    # NOTE (r15 queue): the p_retailprice > 500 arm excludes nothing
    # (every generated part prices above 500) — the load-bearing anti
    # branch below is healthy; tighten the price fence under sanction.
    discrimination=probe(
        anti_kept_parts="""SELECT COUNT(*) FROM part p
            WHERE p_retailprice > 500
              AND NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE p.p_partkey = l.l_partkey
                                AND l.l_quantity > 45)""",
        anti_rejected_parts="""SELECT COUNT(*) FROM part p
            WHERE p_retailprice > 500
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE p.p_partkey = l.l_partkey
                            AND l.l_quantity > 45)""",
    ),
)

# numeric BETWEEN fences on two different dimension arms at once
register_sql(
    "job_between_numeric_dims",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM part, lineitem, supplier
    WHERE p_partkey = l_partkey
      AND l_suppkey = s_suppkey
      AND p_size BETWEEN 10 AND 25
      AND s_acctbal BETWEEN 2000.0 AND 6000.0
      AND p_retailprice BETWEEN 900.0 AND 910.0
    """,
    tags=("job", "between", "numeric-fence"),
)

# COUNT(DISTINCT) over the fenced star — JOB's dedup-the-fanout idiom
register_sql(
    "job_distinct_over_star",
    """
    SELECT COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(DISTINCT p_brand) AS n_brands,
           COUNT(*) AS matches
    FROM customer, orders, lineitem, part
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND p_type = 'PROMO'
      AND c_mktsegment = 'MACHINERY'
      AND o_orderstatus = 'F'
    """,
    tags=("job", "count-distinct"),
)

# substring-equality probe (imdb's char_name prefix tests): substr on
# the dim column must stay a post-scan filter, not break the equi-join
register_sql(
    "job_substring_prefix_probe",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(o_totalprice) AS min_price,
           COUNT(*) AS matches
    FROM customer, orders
    WHERE c_custkey = o_custkey
      AND SUBSTRING(c_name, 16, 1) = '0'
      AND o_totalprice > 50000
    """,
    tags=("job", "substring-probe"),
)

# disjunction SPANNING two dimension arms (imdb/11-ish): the OR
# references columns of different relations, so neither arm's filter
# can be pushed below the join — both joins execute, filter on top
register_sql(
    "job_or_across_two_dims",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM part, lineitem, supplier
    WHERE p_partkey = l_partkey
      AND l_suppkey = s_suppkey
      AND (p_brand = 'Brand#11' OR s_acctbal > 9000)
      AND l_discount > 0.05
    """,
    tags=("job", "cross-arm-or"),
)

# IN + NOT IN on sibling dims (imdb/14-ish keyword include/exclude)
register_sql(
    "job_inlist_notin_mix",
    """
    SELECT MIN(n_name) AS first_nation,
           MIN(c_name) AS first_customer,
           COUNT(*) AS matches
    FROM nation, customer, orders
    WHERE n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND n_name IN ('NATION_2', 'NATION_4', 'NATION_6', 'NATION_8')
      AND c_mktsegment NOT IN ('BUILDING', 'FURNITURE')
      AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
    """,
    tags=("job", "in-notin"),
)

# MIN over computed expressions (imdb keeps MIN(col); computing inside
# the aggregate exercises expression-then-aggregate over the join)
register_sql(
    "job_min_over_expression",
    """
    SELECT CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS min_net_price,
           MIN(UPPER(p_name)) AS first_part_upper,
           COUNT(*) AS matches
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_brand = 'Brand#22'
      AND l_shipdate > DATE '2000-06-01'
    """,
    tags=("job", "expression-agg"),
)

# prefix LIKE on one dim + suffix LIKE on another
register_sql(
    "job_like_prefix_suffix",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(n_name) AS first_nation,
           COUNT(*) AS matches
    FROM part, lineitem, supplier, nation
    WHERE p_partkey = l_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE 'blue%'
      AND n_name LIKE '%4'
      AND l_returnflag = 'N'
    """,
    tags=("job", "like-prefix-suffix"),
)

# all three star arms fenced at once (imdb/19-ish: person + company +
# keyword all filtered) — maximum broadcast pressure
register_sql(
    "job_three_fenced_arms",
    """
    SELECT MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM customer, orders, lineitem, part, supplier
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND c_mktsegment = 'AUTOMOBILE'
      AND p_type IN ('SMALL', 'MEDIUM')
      AND s_acctbal > 5000
    """,
    tags=("job", "three-fences", "broadcast"),
)

# date-windowed star with a redundant transitive fence (imdb carries
# both t.production_year and mi.info year fences; here the o_orderdate
# window plus l_shipdate window overlap transitively)
register_sql(
    "job_double_date_window",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(l_shipdate) AS first_ship,
           COUNT(*) AS matches
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND o_orderdate BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
      AND l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1999-06-30'
      AND c_acctbal < 0
    """,
    tags=("job", "date-window"),
)

# widest inner shape with BOTH aliased nations AND both regions:
# 8 relations, two of them aliased twice — deepest broadcast tree
register_sql(
    "job_double_aliased_arms_8way",
    """
    SELECT MIN(r1.r_name) AS first_cust_region,
           MIN(r2.r_name) AS first_supp_region,
           COUNT(*) AS matches
    FROM region r1, nation n1, customer, orders, lineitem,
         supplier, nation n2, region r2
    WHERE r1.r_regionkey = n1.n_regionkey
      AND n1.n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r1.r_name = 'ASIA'
      AND r2.r_name IN ('EUROPE', 'AFRICA')
      AND o_totalprice > 150000
    """,
    tags=("job", "aliased-dims", "widest"),
)

# ---------------------------------------------------------------------------
# Round-4 third mini-tranche: four idioms still unrepresented.
# ---------------------------------------------------------------------------

# synthesized-NULL fence: NULLIF turns a sentinel into NULL and the
# predicate keeps only the nulled rows (imdb's "note IS NULL" shape on
# a schema without natural NULLs)
register_sql(
    "job_nullif_is_null_fence",
    """
    SELECT MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND NULLIF(o_orderpriority, '5-LOW') IS NULL
      AND l_returnflag = 'A'
    """,
    tags=("job", "nullif-fence"),
    discrimination=probe(
        nullif_matched_rows="""SELECT COUNT(*) FROM orders
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderpriority = '5-LOW' AND l_returnflag = 'A'""",
        nullif_passed_rows="""SELECT COUNT(*) FROM orders
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderpriority <> '5-LOW' AND l_returnflag = 'A'""",
    ),
)

# three-way LIKE disjunction on one dim column (imdb keyword triples)
register_sql(
    "job_triple_like_or",
    """
    SELECT MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND (p_name LIKE 'blue%' OR p_name LIKE 'cold%'
           OR p_name LIKE '%bolt')
      AND l_quantity BETWEEN 20 AND 30
    """,
    tags=("job", "like-disjunction"),
)

# COUNT(*)-only output over the full unfiltered 8-relation join — pure
# join-order/broadcast stress with no selective fence anywhere
register_sql(
    "job_count_only_widest",
    """
    SELECT COUNT(*) AS matches
    FROM region r1, nation n1, customer, orders, lineitem,
         supplier, nation n2, region r2
    WHERE r1.r_regionkey = n1.n_regionkey
      AND n1.n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
    """,
    tags=("job", "count-only", "unfiltered"),
)

# LIKE ... ESCAPE on a dimension attribute (imdb escapes literal
# underscores in company codes; NATION_ names need the same)
register_sql(
    "job_escape_like_dim",
    """
    SELECT MIN(n_name) AS first_nation,
           MIN(c_name) AS first_customer,
           COUNT(*) AS matches
    FROM nation, customer, orders
    WHERE n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND n_name LIKE 'NATION!_2%' ESCAPE '!'
      AND o_orderstatus <> 'P'
    """,
    tags=("job", "like-escape"),
)

# ---------------------------------------------------------------------------
# Full mapping of the 113 JOB files (reference benchmarks/queries/imdb/) to
# the registry entry that re-expresses each file's combination idiom on the
# driver star schema.  Unlike the ClickBench closure (dedicated 1:1), JOB
# letters within a family mostly differ by constants/fence tightness, so the
# mapping is honestly MANY-TO-ONE: a letter maps to the entry whose predicate
# combination matches its own (operator-mix-verified against each file).
# tests/test_registry_inventory.py parses this block and enforces: every
# file 1a..33c appears exactly once, and every mapped name is a registered
# "job"-tagged query.
#
# 1a→job_selective_5way 1b→job_selective_5way 1c→job_selective_5way
# 1d→job_selective_5way
# 2a→job_point_dim_probe 2b→job_point_dim_probe 2c→job_point_dim_probe
# 2d→job_point_dim_probe
# 3a→job_t7_dim_like_bridge_in8 3b→job_t7_dim_like_bridge_in8
# 3c→job_t7_dim_like_bridge_in8
# 4a→job_t7_lexic_second_stack 4b→job_t7_lexic_second_stack
# 4c→job_t7_lexic_second_stack
# 5a→job_t7_conj_same_column_likes 5b→job_t7_conj_same_column_likes
# 5c→job_t7_notlike_like_same_column
# 6a→job_year_trend_fence 6b→job_two_inlists_like 6c→job_year_trend_fence
# 6d→job_two_inlists_like 6e→job_year_trend_fence 6f→job_unselective_4way
# 7a→job_two_nation_arms_crossed 7b→job_two_nation_arms_crossed
# 7c→job_string_range_dim
# 8a→job_string_fences_6way 8b→job_multiwildcard_notlike_or
# 8c→job_t7_dim_key_triangle 8d→job_t7_dim_key_triangle
# 9a→job_t7_dim_key_triangle 9b→job_t7_dim_key_triangle
# 9c→job_t7_dim_key_triangle 9d→job_t7_dim_key_triangle
# 10a→job_dim_first_chain 10b→job_dim_first_chain 10c→job_dim_first_chain
# 11a→job_t7_null_fence_point_year 11b→job_t7_null_fence_point_year
# 11c→job_negation_heavy_three_arms 11d→job_negation_heavy_three_arms
# 12a→job_t6_genre_rating_year_band 12b→job_notnull_or_like_fence
# 12c→job_t6_genre_rating_year_band
# 13a→job_t7_all_point_star 13b→job_notnull_or_like_fence
# 13c→job_notnull_or_like_fence 13d→job_double_range_fence
# 14a→job_t7_three_stack_two_roles 14b→job_t7_or3_likes_center_dim
# 14c→job_t7_three_stack_two_roles
# 15a→job_date_string_prefix_fence 15b→job_t7_double_conj_like_pairs
# 15c→job_notnull_or_like_fence 15d→job_date_string_prefix_fence
# 16a→job_episode_range_8way 16b→job_two_inlists_like
# 16c→job_t6_episode_capped_chain 16d→job_episode_range_8way
# 17a→job_t6_duplicate_min_aliases 17b→job_t6_duplicate_min_aliases
# 17c→job_t6_duplicate_min_aliases 17d→job_t6_duplicate_min_aliases
# 17e→job_t6_duplicate_min_aliases 17f→job_t6_duplicate_min_aliases
# 18a→job_t6_unfenced_fact_two_infos 18b→job_nullif_is_null_fence
# 18c→job_t6_unfenced_fact_two_infos
# 19a→job_three_fenced_arms 19b→job_three_fenced_arms
# 19c→job_three_fenced_arms 19d→job_triple_bridge_three_chains
# 20a→job_multiwildcard_notlike_or 20b→job_t6_double_negation_fences
# 20c→job_t7_case_variant_or_likes
# 21a→job_t6_negated_dim_mixed_in8 21b→job_t7_four_bridge_fence_kit
# 21c→job_t6_negated_dim_mixed_in8
# 22a→job_widest_9way_star 22b→job_t7_notlike_like_same_column
# 22c→job_self_dim_two_filters 22d→job_negated_dim_eq
# 23a→job_notnull_or_like_fence 23b→job_t6_status_role_date_prefix
# 23c→job_t6_status_role_date_prefix
# 24a→job_t6_point_company_like_prefix 24b→job_t6_point_company_like_prefix
# 25a→job_keyword_in8_triple_clique 25b→job_keyword_in8_triple_clique
# 25c→job_t6_four_bridge_clique
# 26a→job_t6_notnull_orlikes_lexgt 26b→job_t7_case_variant_or_likes
# 26c→job_t6_notnull_orlikes_lexgt
# 27a→job_company_negation_or_like 27b→job_linktype_like_chain
# 27c→job_company_negation_or_like
# 28a→job_full_clique_preds_10way 28b→job_triple_roleplay_same_dim
# 28c→job_full_clique_preds_10way
# 29a→job_point_anchor_wide_star 29b→job_t7_point_center_mega_star
# 29c→job_double_bridge_clique
# 30a→job_t6_role_in_role_point 30b→job_t7_or3_likes_center_dim
# 30c→job_five_alias_fact_clique
# 31a→job_t6_prefix_company_wide_star 31b→job_inlist_role_prefix_probe
# 31c→job_t6_prefix_company_wide_star
# 32a→job_link_bridge_same_entity 32b→job_link_bridge_same_entity
# 33a→job_t6_linked_pair_point_year 33b→job_t6_linked_pair_point_year
# 33c→job_deep_7way_chain
# ---------------------------------------------------------------------------
