"""JOB tranche 5: complete-cast roles, derived-table aggregations, and
multi-link chains (the 20a/27a/29a flavor).

Mirrors the Join Order Benchmark patterns (reference
benchmarks/queries/imdb/20a.sql, 27a.sql, 29a.sql and kin) still
unrepresented after tranches 1-4, re-expressed on the driver's star
schema:

- the complete_cast TWO-TYPE-ROLE shape: one bridge row joined to the
  SAME small type dimension through TWO DIFFERENT FK columns
  (cct1.id = cc.subject_id AND cct2.id = cc.status_id), each role
  fenced differently (point vs IN-list);
- 20a's char_name arm: OR of two multi-wildcard LIKEs plus a NOT LIKE
  on the SAME column in one conjunct;
- 20a's keyword IN-8 fence driving a THREE-bridge movie_id clique
  (t = mk = ci = cc, all pairwise equalities written out);
- 29a's point-anchored wide star (t.title = 'Shrek 2': an
  ultra-selective anchor at the center of a many-arm star);
- 29a's voice-note IN-3 bridge fence + a TWO-COLUMN conjunction on one
  person arm (n.gender = 'f' AND n.name LIKE '%An%');
- 27a's company arm: negation + OR-of-LIKEs on the dim, an IS NULL
  fence on the bridge (mc.note IS NULL), and the link_type LIKE chain
  (lt.link LIKE '%follow%') with a year band;
- 29a's mixed-semantics IN list (mi.info IN ('Sweden','German',...)
  mixes countries and languages in one list over a value column);
- TWO-HOP link chains: entity A linked to B via a shared dimension,
  B linked to C via a second bridge (movie_link composed twice);
- subquery-in-FROM aliased aggregations (the derived-table flavor the
  round-6 verdict called out): a FROM-clause aggregate joined to dims;
  the SAME derived aggregate aliased TWICE and self-joined on an equi
  key (materialized once Spark-side via register_split_sql); a derived
  aggregate re-joined to its own base fact; TWO different derived
  aggregates equi-joined with an integer cross-multiplied ratio fence;
  and a derived aggregate over a UNION ALL of channel scans.

Like the originals, queries aggregate to MIN() columns + COUNT(*) with
no GROUP BY — single-row, order-independent output — and the SQL text
is ANSI-shared with the DuckDB oracle.  Money compares through integer
cents; ratio fences cross-multiply in integers (no FP at a comparison
boundary).  Registered in a module imported LAST so these never-swept
additions queue BEHIND the legacy backlog (sweep-rotation contract,
queries/__init__.py).
"""

from __future__ import annotations

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import register_sql

# complete_cast two-type-role shape: orders is the bridge; nation plays
# the type dimension through TWO different FK columns (subject_id /
# status_id analogs derived from orderkey/custkey), one role
# point-fenced, the other IN-fenced; a real dim chain rides along.
register_sql(
    "job_bridge_two_type_roles",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM orders, nation n1, nation n2, customer
    WHERE o_custkey % 25 = n1.n_nationkey
      AND o_orderkey % 25 = n2.n_nationkey
      AND n1.n_name = 'NATION_3'
      AND n2.n_name IN ('NATION_1', 'NATION_7', 'NATION_19')
      AND o_custkey = c_custkey
      AND c_mktsegment <> 'BUILDING'
      AND o_orderstatus = 'F'
    """,
    tags=("job", "two-type-roles", "bridge"),
)

# 20a char_name arm: OR of two multi-wildcard LIKEs + NOT LIKE on the
# SAME column, inside a fact chain with a year fence up the order arm.
register_sql(
    "job_or_likes_notlike_char_arm",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(l_shipdate) AS first_ship,
           COUNT(*) AS matches
    FROM lineitem, part, orders
    WHERE l_partkey = p_partkey
      AND l_orderkey = o_orderkey
      AND (p_name LIKE '%large%widget%' OR p_name LIKE '%cold%widget%')
      AND p_name NOT LIKE '%bolt%'
      AND o_orderdate > DATE '1998-01-01'
    """,
    tags=("job", "or-likes", "notlike-same-col"),
)

# 20a keyword IN-8 fence + the THREE-bridge movie_id clique: three fact
# aliases with all pairwise orderkey equalities written out, ordered
# line numbers bounding the fan-out, an 8-item IN on the first arm's
# dim and point fences on the other two arms.
register_sql(
    "job_keyword_in8_triple_clique",
    """
    SELECT MIN(p_name) AS first_keyword,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, lineitem l3, part, orders
    WHERE l1.l_orderkey = l2.l_orderkey
      AND l1.l_orderkey = l3.l_orderkey
      AND l2.l_orderkey = l3.l_orderkey
      AND l1.l_orderkey = o_orderkey
      AND l1.l_partkey = p_partkey
      AND p_brand IN ('Brand#1', 'Brand#4', 'Brand#9', 'Brand#12',
                      'Brand#15', 'Brand#18', 'Brand#21', 'Brand#24')
      AND l2.l_returnflag = 'A'
      AND l3.l_linestatus = 'F'
      AND l1.l_linenumber < l2.l_linenumber
      AND l2.l_linenumber < l3.l_linenumber
      AND o_orderdate > DATE '1996-01-01'
    """,
    tags=("job", "in8", "triple-clique"),
    bench=True,
    spread_tables=("lineitem",),
)

# 29a point anchor: an ultra-selective center (one order week + one
# priority) with five arms around it — part, supplier→nation→region,
# and customer.
register_sql(
    "job_point_anchor_wide_star",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           MIN(c_name) AS first_customer,
           COUNT(*) AS matches
    FROM orders, lineitem, part, supplier, nation, region, customer
    WHERE o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND o_custkey = c_custkey
      AND o_orderdate BETWEEN DATE '1997-03-01' AND DATE '1997-03-31'
      AND o_orderpriority = '2-HIGH'
      AND r_name <> 'AFRICA'
    """,
    tags=("job", "point-anchor", "wide-star"),
)

# 29a voice-note arm: IN-3 on a bridge column + a TWO-COLUMN
# conjunction fence on one dim arm (gender + name LIKE analog) + a
# point role fence on a second dim.
register_sql(
    "job_bridge_in3_dim_conj",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM lineitem, part, supplier
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND l_quantity IN (1, 2, 3)
      AND p_type = 'SMALL' AND p_name LIKE '%rod%'
      AND s_nationkey < 5
    """,
    tags=("job", "in3-bridge", "two-col-conj"),
)

# 27a company arm: dim negation + OR-of-LIKEs, an IS NULL fence on the
# bridge (mc.note IS NULL via NULLIF), and a point kind fence.
register_sql(
    "job_company_negation_or_like",
    """
    SELECT MIN(c_name) AS first_company,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND c_mktsegment <> 'BUILDING'
      AND (c_name LIKE '%00001%' OR c_name LIKE '%00002%')
      AND NULLIF(o_orderpriority, '5-LOW') IS NULL
      AND n_name NOT LIKE '%_24'
    """,
    tags=("job", "negation", "or-like", "isnull-bridge"),
)

# 27a link chain: two order roles of one customer (movie_link analog),
# the link-type dim LIKE-fenced, a production-year band on the first
# role and a point status on the second.
register_sql(
    "job_linktype_like_chain",
    """
    SELECT MIN(o1.o_orderdate) AS first_linked,
           MIN(n_name) AS link_kind,
           COUNT(*) AS matches
    FROM orders o1, customer, orders o2, nation
    WHERE o1.o_custkey = c_custkey
      AND o2.o_custkey = c_custkey
      AND o1.o_orderkey < o2.o_orderkey
      AND c_nationkey = n_nationkey
      AND n_name LIKE '%_1%'
      AND o1.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1999-12-31'
      AND o2.o_orderstatus = 'F'
    """,
    tags=("job", "link-chain", "liketype"),
)

# 29a mixed-semantics IN: one list mixing adjective-led and noun-led
# part names (countries + languages analog) over a value-ish column,
# mid-chain, with a date fence.
register_sql(
    "job_mixed_inlist_dim_value",
    """
    SELECT MIN(p_name) AS first_info,
           MIN(l_shipdate) AS first_ship,
           COUNT(*) AS matches
    FROM lineitem, part, orders
    WHERE l_partkey = p_partkey
      AND l_orderkey = o_orderkey
      AND p_name IN ('large bolt', 'blue rod', 'cold widget', 'small widget')
      AND o_orderdate < DATE '1998-01-01'
    """,
    tags=("job", "mixed-inlist"),
)

# cct1.kind IN ('cast','crew') AND cct2.kind = 'complete': the SAME
# top dimension (region) in two roles — one IN-fenced, one
# point-fenced — reached through two independent 2-hop arms.
register_sql(
    "job_inlist_role1_point_role2",
    """
    SELECT MIN(s_name) AS first_supplier,
           MIN(c_name) AS first_customer,
           COUNT(*) AS matches
    FROM lineitem, supplier, nation n1, region r1,
         orders, customer, nation n2, region r2
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r1.r_name IN ('ASIA', 'EUROPE')
      AND r2.r_name = 'AMERICA'
      AND l_returnflag = 'R'
    """,
    tags=("job", "role-in-vs-point", "double-arm"),
)

# TWO-HOP link chain (movie_link composed twice): l1 linked to l2 via a
# shared part, l2 linked to l3 within one order; both ends fenced so
# the fan-out stays bounded at any SF.
register_sql(
    "job_double_link_two_hops",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, lineitem l3, part, supplier
    WHERE l1.l_partkey = p_partkey
      AND l2.l_partkey = p_partkey
      AND l1.l_orderkey <> l2.l_orderkey
      AND l2.l_orderkey = l3.l_orderkey
      AND l2.l_linenumber < l3.l_linenumber
      AND l3.l_suppkey = s_suppkey
      AND l1.l_returnflag = 'R'
      AND l1.l_shipdate >= DATE '2000-01-01'
      AND l2.l_shipdate < DATE '1996-01-01'
    """,
    tags=("job", "two-hop-link"),
    bench=True,
    spread_tables=("lineitem",),
)

# Subquery-in-FROM aliased aggregation: a derived per-customer order
# profile joined onward to dims, fenced on the AGGREGATE output.
register_sql(
    "job_from_subquery_agg_join",
    """
    SELECT MIN(c_name) AS top_customer,
           MIN(t.order_cnt) AS min_cnt,
           COUNT(*) AS matches
    FROM (SELECT o_custkey AS cust, COUNT(*) AS order_cnt,
                 CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS spend_cents
          FROM orders
          WHERE o_orderstatus = 'F'
          GROUP BY o_custkey) t,
         customer, nation
    WHERE t.cust = c_custkey
      AND c_nationkey = n_nationkey
      AND n_name LIKE 'NATION_1%'
      AND t.order_cnt >= 2
    """,
    tags=("job", "from-subquery", "derived-agg"),
)

# The SAME derived aggregate aliased TWICE and self-joined on an equi
# key: per-nation spend, paired within a region, the lower-spend side
# strictly below the higher.  Spark materializes the aggregate ONCE
# (register_split_sql); DuckDB keeps the single statement.
register_split_sql(
    "job_from_subquery_twice_aliased",
    stages=[(
        """
        SELECT n_nationkey AS nat, n_name AS nname, n_regionkey AS reg,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS bal_cents,
               COUNT(*) AS members
        FROM customer, nation
        WHERE c_nationkey = n_nationkey
        GROUP BY n_nationkey, n_name, n_regionkey
        """,
        "nation_balance",
    )],
    final_sql="""
    SELECT MIN(a1.nname) AS first_high,
           MIN(a2.nname) AS first_low,
           COUNT(*) AS pairs
    FROM nation_balance a1, nation_balance a2
    WHERE a1.reg = a2.reg
      AND a1.nat < a2.nat
      AND a1.bal_cents > a2.bal_cents
    """,
    oracle="""
    WITH nation_balance AS (
        SELECT n_nationkey AS nat, n_name AS nname, n_regionkey AS reg,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS bal_cents,
               COUNT(*) AS members
        FROM customer, nation
        WHERE c_nationkey = n_nationkey
        GROUP BY n_nationkey, n_name, n_regionkey
    )
    SELECT MIN(a1.nname) AS first_high,
           MIN(a2.nname) AS first_low,
           COUNT(*) AS pairs
    FROM nation_balance a1, nation_balance a2
    WHERE a1.reg = a2.reg
      AND a1.nat < a2.nat
      AND a1.bal_cents > a2.bal_cents
    """,
    tags=("job", "from-subquery", "twice-aliased", "split"),
)

# Year band + complete_cast clique + two type roles in ONE query (the
# 27a tail combination): three fact aliases pairwise equal, two
# synthetic type roles fenced IN-vs-point, and a date band.
register_sql(
    "job_year_band_two_roles_clique",
    """
    SELECT MIN(o_orderdate) AS first_order,
           MIN(n1.n_name) AS subject_role,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, orders, nation n1, nation n2
    WHERE l1.l_orderkey = l2.l_orderkey
      AND l1.l_orderkey = o_orderkey
      AND l2.l_orderkey = o_orderkey
      AND l1.l_linenumber < l2.l_linenumber
      AND o_orderkey % 25 = n1.n_nationkey
      AND o_custkey % 25 = n2.n_nationkey
      AND n1.n_name IN ('NATION_2', 'NATION_8')
      AND n2.n_name = 'NATION_5'
      AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '2000-12-31'
    """,
    tags=("job", "clique", "two-type-roles", "year-band"),
)

# Derived aggregate re-joined to its OWN base fact: per-order line
# counts from lineitem, rejoined to lineitem rows of the same orders
# with a fence on both the aggregate and the row.
register_sql(
    "job_from_subquery_filtered_rejoin",
    """
    SELECT MIN(t.line_cnt) AS min_lines,
           MIN(l_shipdate) AS first_ship,
           COUNT(*) AS matches
    FROM (SELECT l_orderkey AS okey, COUNT(*) AS line_cnt
          FROM lineitem
          GROUP BY l_orderkey) t,
         lineitem
    WHERE t.okey = l_orderkey
      AND t.line_cnt >= 4
      AND l_returnflag = 'A'
      AND l_shipdate >= DATE '1999-01-01'
    """,
    tags=("job", "from-subquery", "rejoin-base"),
)

# TWO different derived aggregates equi-joined on the part key with an
# integer cross-multiplied ratio fence: returned revenue > 30% of
# total revenue for the part.
register_sql(
    "job_two_from_subqueries_join",
    """
    SELECT MIN(rev.part) AS first_part,
           MIN(ret.ret_cents) AS min_ret_cents,
           COUNT(*) AS matches
    FROM (SELECT l_partkey AS part,
                 CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS rev_cents
          FROM lineitem
          GROUP BY l_partkey) rev,
         (SELECT l_partkey AS part,
                 CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS ret_cents
          FROM lineitem
          WHERE l_returnflag = 'R'
          GROUP BY l_partkey) ret
    WHERE rev.part = ret.part
      AND 10 * ret.ret_cents > 3 * rev.rev_cents
    """,
    tags=("job", "two-derived-aggs", "ratio-fence"),
)

# Derived aggregate over a UNION ALL of two channel scans, joined to
# the part dim with a LIKE fence.
register_sql(
    "job_from_subquery_over_union",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(u.n) AS min_channel_rows,
           COUNT(*) AS matches
    FROM (SELECT part, COUNT(*) AS n,
                 CAST(SUM(cents) AS BIGINT) AS cents
          FROM (SELECT l_partkey AS part,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                FROM lineitem WHERE l_returnflag = 'R'
                UNION ALL
                SELECT l_partkey AS part,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                FROM lineitem WHERE l_linestatus = 'O') ch
          GROUP BY part) u,
         part
    WHERE u.part = p_partkey
      AND p_name LIKE '%widget%'
      AND u.n >= 3
    """,
    tags=("job", "from-subquery", "union-channels"),
)
