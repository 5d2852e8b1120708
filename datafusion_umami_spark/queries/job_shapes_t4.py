"""JOB tranche 4: bridge-fanout, clique, and empty-arm shapes.

Mirrors the Join Order Benchmark patterns (reference
benchmarks/queries/imdb/1a..33c.sql, 113 files) still unrepresented
after tranches 1-3, re-expressed on the driver's star schema:

- the TRIPLE-BRIDGE fanout of 19d: one bridge relation (cast_info)
  simultaneously joined into three independent entity chains
  (name/aka_name, role_type, char_name) plus the movie chain, with an
  IN-list fence on the bridge's own low-cardinality column;
- 19d's doubled person arm: the same entity aliased twice on ONE key
  with the redundant pairwise equality spelled out
  (n.id = an.person_id AND ci.person_id = an.person_id);
- 30c's full movie_id clique: FIVE fact-side aliases with all C(5,2)
  pairwise equalities written out — the optimizer must collapse the
  transitive closure, never join a pair twice;
- zero-row arms: a dimension arm whose filter matches nothing must
  propagate emptiness through an INNER chain (PropagateEmptyRelation —
  reference optimizer/src/propagate_empty_relation.rs), and must NOT
  through a LEFT-outer chain (the 0-row-arm outer-join chain: left
  rows survive with NULLs and per-depth COUNTs tier off);
- OR predicates spanning TWO relations (non-pushable above the join);
- the movie_link self-bridge of 32a/33a: two fact roles linked through
  one shared entity with an inequality between the roles;
- lexicographic date-prefix string fences (15a's 'USA:% 199%');
- negation-heavy multi-arm fences and all-arms-LIKE-fenced stars.

Like the originals, queries aggregate to MIN() columns + COUNT(*) with
no GROUP BY — single-row, order-independent output — and the SQL text
is ANSI-shared verbatim with the DuckDB oracle.  Registered in a module
imported LAST so these never-swept additions queue BEHIND the round-6
front-50 (sweep-rotation contract, queries/__init__.py).
"""

from __future__ import annotations

from datafusion_umami_spark.registry import probe, register_sql

# 19d: one bridge (lineitem) fanning into THREE chains at once —
# part (role_type analog), supplier→nation (char_name), and
# orders→customer→nation (title→name) — with the bridge's own IN-list
# fence (ci.note IN (...) → l_returnflag) and a year fence up the
# movie chain (t.production_year > 2000).
register_sql(
    "job_triple_bridge_three_chains",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM lineitem, part, supplier, nation n1, orders, customer, nation n2
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n1.n_nationkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n2.n_nationkey
      AND l_returnflag IN ('A', 'R')
      AND p_type = 'PROMO'
      AND c_mktsegment = 'FURNITURE'
      AND n1.n_name LIKE 'NATION_1%'
      AND o_orderdate >= DATE '2000-01-01'
    """,
    tags=("job", "triple-bridge", "fanout"),
    bench=True,
)

# 19d's doubled person arm: customer aliased twice on the SAME key,
# with the redundant closure equality spelled out exactly as JOB writes
# n.id = an.person_id AND ci.person_id = an.person_id.
register_sql(
    "job_double_alias_person_clique",
    """
    SELECT MIN(c1.c_name) AS first_name,
           MIN(c2.c_acctbal) AS min_alias_bal,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM orders, customer c1, customer c2, nation
    WHERE o_custkey = c1.c_custkey
      AND o_custkey = c2.c_custkey
      AND c1.c_custkey = c2.c_custkey
      AND c1.c_nationkey = n_nationkey
      AND c1.c_mktsegment = 'BUILDING'
      AND c2.c_acctbal > 0
      AND n_name NOT LIKE '%_2'
      AND o_orderstatus = 'F'
    """,
    tags=("job", "double-alias", "clique-preds"),
)

# 30c's movie_id clique: FIVE fact-side aliases (l1..l4 + orders) with
# all C(5,2)=10 pairwise orderkey equalities written out, ordered line
# numbers bounding the fan-out, one dimension probe on the first arm.
register_sql(
    "job_five_alias_fact_clique",
    """
    SELECT MIN(l1.l_shipdate) AS first_ship,
           MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, lineitem l3, lineitem l4, orders, part
    WHERE l1.l_orderkey = l2.l_orderkey
      AND l1.l_orderkey = l3.l_orderkey
      AND l1.l_orderkey = l4.l_orderkey
      AND l2.l_orderkey = l3.l_orderkey
      AND l2.l_orderkey = l4.l_orderkey
      AND l3.l_orderkey = l4.l_orderkey
      AND l1.l_orderkey = o_orderkey
      AND l2.l_orderkey = o_orderkey
      AND l3.l_orderkey = o_orderkey
      AND l4.l_orderkey = o_orderkey
      AND l1.l_linenumber < l2.l_linenumber
      AND l2.l_linenumber < l3.l_linenumber
      AND l3.l_linenumber < l4.l_linenumber
      AND l1.l_partkey = p_partkey
      AND p_size > 40
      AND o_orderstatus = 'F'
    """,
    tags=("job", "clique-preds", "five-alias"),
    bench=True,
    spread_tables=("lineitem",),
)

# 29a it/it3 flavor, tightened: the same dimension aliased twice via
# ONE fact FK (plus the redundant alias-alias equality), with crossed
# filters — a LIKE fence on one role, a numeric band on the other.
register_sql(
    "job_same_dim_twice_one_fk",
    """
    SELECT MIN(p1.p_name) AS first_part,
           MIN(p2.p_retailprice) AS min_price,
           COUNT(*) AS matches
    FROM lineitem, part p1, part p2
    WHERE l_partkey = p1.p_partkey
      AND l_partkey = p2.p_partkey
      AND p1.p_partkey = p2.p_partkey
      AND p1.p_name LIKE 'red%'
      AND p2.p_size BETWEEN 10 AND 30
    """,
    tags=("job", "roleplay-dim", "redundant-probe"),
)

# Zero-row dimension arm through an INNER chain: the filter matches no
# nation, so the whole join tree is empty — COUNT 0, NULL MINs
# (PropagateEmptyRelation; reference propagate_empty_relation.rs).
register_sql(
    "job_zero_row_dim_arm_inner",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND n_name = 'ATLANTIS'
      AND o_orderstatus = 'O'
    """,
    tags=("job", "empty-arm", "propagate-empty"),
)

# The 0-row-arm OUTER-join chain: the emptied customer arm must NOT
# empty the result — every order survives with NULLs, the chained
# second LEFT join stays all-NULL, and the per-depth COUNTs tier off
# (COUNT(*) > 0, COUNT(c) = 0, COUNT(n) = 0).
register_sql(
    "job_left_outer_zero_arm_chain",
    """
    SELECT COUNT(*) AS all_orders,
           COUNT(c.c_custkey) AS matched_customers,
           COUNT(n.n_name) AS matched_nations,
           MIN(o_orderdate) AS first_order
    FROM orders
    LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'NO_SUCH_SEGMENT') c
      ON o_custkey = c.c_custkey
    LEFT JOIN nation n
      ON c.c_nationkey = n.n_nationkey
    WHERE o_orderdate >= DATE '2001-01-01'
    """,
    tags=("job", "empty-arm", "outer-chain"),
)

# LEFT-outer CHAIN with partially-empty arms: part arm thinned by a
# selective filter, supplier arm conditioned on the thinned part arm —
# COUNTs must tier monotonically down the chain.
register_sql(
    "job_outer_chain_tiered_counts",
    """
    SELECT COUNT(*) AS all_lines,
           COUNT(o.o_orderkey) AS with_order,
           COUNT(p.p_partkey) AS with_big_part,
           COUNT(s.s_suppkey) AS with_supplier_via_part,
           MIN(l_shipdate) AS first_ship
    FROM lineitem
    LEFT JOIN orders o ON l_orderkey = o.o_orderkey
    LEFT JOIN (SELECT * FROM part WHERE p_size > 45) p
      ON l_partkey = p.p_partkey
    LEFT JOIN supplier s
      ON l_suppkey = s.s_suppkey AND p.p_partkey IS NOT NULL
    WHERE l_shipdate >= DATE '2001-06-01'
    """,
    tags=("job", "outer-chain", "tiered-counts"),
    discrimination=probe(
        # the tier counts only discriminate when each LEFT JOIN leaves
        # some rows NULL and keeps others
        window_rows="""SELECT COUNT(*) FROM lineitem
            WHERE l_shipdate >= DATE '2001-06-01'""",
        with_big_part="""SELECT COUNT(*) FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= DATE '2001-06-01' AND p_size > 45""",
        without_big_part="""SELECT COUNT(*) FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= DATE '2001-06-01' AND p_size <= 45""",
    ),
)

# OR spanning predicates of TWO different relations — not pushable
# below the join into either side (JOB's cross-relation OR fences).
register_sql(
    "job_or_across_two_relations",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(n_name) AS first_nation,
           MIN(r_name) AS first_region,
           COUNT(*) AS matches
    FROM customer, nation, region
    WHERE c_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND (n_name = 'NATION_3' OR r_name = 'AFRICA')
      AND c_acctbal > 1000
    """,
    tags=("job", "or-across-relations"),
)

# 32a/33a movie_link self-bridge: two order roles linked through one
# shared customer with an inequality between the roles (sequel-link
# shape: linked titles, production_year ordering).
register_sql(
    "job_link_bridge_same_entity",
    """
    SELECT MIN(o1.o_orderdate) AS first_early,
           MIN(o2.o_orderdate) AS first_late,
           MIN(c_name) AS link_customer,
           COUNT(*) AS matches
    FROM orders o1, orders o2, customer
    WHERE o1.o_custkey = c_custkey
      AND o2.o_custkey = c_custkey
      AND o1.o_custkey = o2.o_custkey
      AND o1.o_orderdate < o2.o_orderdate
      AND o1.o_orderstatus = 'F'
      AND o2.o_orderpriority = '1-URGENT'
      AND c_mktsegment = 'MACHINERY'
    """,
    tags=("job", "link-bridge", "self-join"),
)

# 15a's release-date string prefix ('USA:% 199%'): a lexicographic
# LIKE fence over the STRING rendering of a date column.
register_sql(
    "job_date_string_prefix_fence",
    """
    SELECT MIN(o_orderdate) AS first_order,
           MIN(o_totalprice) AS min_price,
           COUNT(*) AS matches
    FROM orders, customer
    WHERE o_custkey = c_custkey
      AND CAST(o_orderdate AS STRING) LIKE '1996-0%'
      AND c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
    """,
    oracle="""
    SELECT MIN(o_orderdate) AS first_order,
           MIN(o_totalprice) AS min_price,
           COUNT(*) AS matches
    FROM orders, customer
    WHERE o_custkey = c_custkey
      AND CAST(o_orderdate AS VARCHAR) LIKE '1996-0%'
      AND c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
    """,
    tags=("job", "date-string-fence"),
)

# Negation-heavy: NOT LIKE / NOT IN / != fences on three different
# arms at once (20c's negation stacking).
register_sql(
    "job_negation_heavy_three_arms",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           MIN(n_name) AS first_nation,
           COUNT(*) AS matches
    FROM lineitem, part, supplier, nation
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND p_name NOT LIKE '%ring%'
      AND p_type NOT IN ('ECONOMY', 'PROMO')
      AND n_name != 'NATION_0'
      AND n_name NOT LIKE 'NATION_2%'
      AND s_acctbal > 4000
    """,
    tags=("job", "negation-heavy"),
)

# Every arm LIKE-fenced at once: the all-selective fan-out star.
register_sql(
    "job_five_selective_like_arms",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, part, supplier, nation
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n_nationkey
      AND c_name LIKE 'Customer#0000001%'
      AND p_name LIKE '%bolt'
      AND s_name LIKE 'Supplier#000000%'
      AND n_name LIKE 'NATION_%'
      AND o_orderpriority LIKE '%URGENT'
    """,
    tags=("job", "like-fences", "fanout"),
)

# Bridge's own IN-list fence (19d ci.note IN (...)) combined with an
# IN-list up the movie chain — fences on fact AND dim simultaneously.
register_sql(
    "job_inlist_on_bridge_and_dim",
    """
    SELECT MIN(l_shipdate) AS first_ship,
           MIN(o_orderdate) AS first_order,
           MIN(c_name) AS first_customer,
           COUNT(*) AS matches
    FROM lineitem, orders, customer
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_returnflag IN ('R')
      AND l_linestatus IN ('F')
      AND o_orderpriority IN ('2-HIGH', '3-MEDIUM')
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    tags=("job", "inlist-bridge"),
)

# Point filter at the BOTTOM of the deepest chain (region), everything
# above unfenced except a closing band — join ordering must start from
# the 1-row seed, not the fact.
register_sql(
    "job_point_bottom_deep_chain",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM region, nation, customer, orders, lineitem, part
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND r_name = 'MIDDLE EAST'
      AND p_size BETWEEN 20 AND 40
    """,
    tags=("job", "point-bottom", "deep-chain"),
)

# Two dimension cliques (customer-side and supplier-side geography)
# bridged ONLY by the fact, with a crossed inequality between the two
# region roles (11a's cross-country fence).
register_sql(
    "job_two_cliques_bridged",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(s_name) AS first_supplier,
           MIN(r1.r_name) AS cust_region,
           MIN(r2.r_name) AS supp_region,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, supplier,
         nation n1, nation n2, region r1, region r2
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey
      AND s_nationkey = n2.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r1.r_name != r2.r_name
      AND r1.r_name = 'ASIA'
      AND o_orderdate >= DATE '2001-01-01'
    """,
    tags=("job", "two-cliques", "cross-region"),
)

# TPC-H Q5's local-supplier flavor written as a JOB clique: region
# reached through BOTH geography arms with the equality spelled out
# redundantly at the nation AND region levels.
register_sql(
    "job_clique_redundant_region",
    """
    SELECT MIN(n1.n_name) AS shared_nation,
           MIN(r1.r_name) AS shared_region,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, supplier,
         nation n1, nation n2, region r1, region r2
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey
      AND s_nationkey = n2.n_nationkey
      AND n1.n_nationkey = n2.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r1.r_regionkey = r2.r_regionkey
      AND r1.r_name = 'EUROPE'
      AND o_orderdate < DATE '1996-01-01'
    """,
    tags=("job", "clique-preds", "redundant-region"),
)
