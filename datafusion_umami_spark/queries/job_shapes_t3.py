"""JOB tranche 3: the reference corpus's widest / most redundant shapes.

Mirrors the remaining distinctive patterns of the Join Order Benchmark
(reference benchmarks/queries/imdb/1a..33c.sql) that tranches 1-2 left
unrepresented, re-expressed on the driver's star schema:

- the FULL CLIQUE of pairwise join predicates the widest JOB queries
  spell out (28a/29a equate movie_id across every bridge pair — the
  optimizer must dedup the transitive closure, not multiply join);
- the same dimension aliased three times with =, != and LIKE arms
  (28a's cct1/cct2, 29a's it/it3 role-play);
- `IS NOT NULL AND (LIKE OR LIKE)` same-column fences (23a);
- multi-wildcard NOT LIKE + OR-of-LIKE ('%Tony%Stark%', 20a);
- lexicographic inequality on a numeric-looking string column
  (28a's mi_idx.info < '8.5');
- point dimension equality + year band (29a's t.title = 'Shrek 2');
- double-bridge cliques sharing two join keys (29a's an/pi person
  bridges);
- the widest relation count our schema supports (11, the 17-relation
  29a spirit).

Like the originals, every query aggregates to MIN() columns + COUNT(*)
with no GROUP BY — single-row, order-independent output — and the SQL
text is ANSI-shared verbatim with the DuckDB oracle.  Registered in a
module imported LAST so the never-swept additions queue BEHIND the
round-5 front-50 (sweep-rotation contract, queries/__init__.py).
"""

from __future__ import annotations

from datafusion_umami_spark.registry import probe, register_sql

# 28a/29a-ish: 10 relations, and the join on the shared nation key is
# written as the FULL pairwise clique (all C(5,2) equalities among the
# two FK columns and three nation aliases) exactly as JOB spells out
# every movie_id pair — Catalyst must collapse the redundant closure
# into one equi-join tree, never plan a pair twice.
register_sql(
    "job_full_clique_preds_10way",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(s_name) AS first_supplier,
           MIN(p_name) AS first_part,
           MIN(n1.n_name) AS shared_nation,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, supplier, part,
         nation n1, nation n2, nation n3, region r1, region r2
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND c_nationkey = s_nationkey
      AND c_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND c_nationkey = n3.n_nationkey
      AND s_nationkey = n1.n_nationkey
      AND s_nationkey = n2.n_nationkey
      AND s_nationkey = n3.n_nationkey
      AND n1.n_nationkey = n2.n_nationkey
      AND n1.n_nationkey = n3.n_nationkey
      AND n2.n_nationkey = n3.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey
      AND n2.n_regionkey = r2.r_regionkey
      AND c_mktsegment = 'AUTOMOBILE'
      AND p_size BETWEEN 5 AND 25
      AND n2.n_name LIKE 'NATION_1%'
      AND n3.n_name NOT LIKE '%_13'
      AND r1.r_name IN ('ASIA', 'EUROPE', 'AMERICA')
      AND r2.r_name NOT IN ('AFRICA')
      AND o_orderdate >= DATE '1996-01-01'
    """,
    tags=("job", "clique-preds", "widest-star"),
    bench=True,
)

# 23a-ish: `IS NOT NULL AND (LIKE OR LIKE)` fence on ONE column, plus a
# point dim filter and a year fence lower in the chain.
register_sql(
    "job_notnull_or_like_fence",
    # r14 discrimination fix (probe-found): n_name = 'NATION_7' emptied
    # the whole query at sf0.001 (10 suppliers spread one per nation —
    # the same class as the tpch q11/q20/q21 fences) and the spec was
    # hash-green on an EMPTY result locally.  SF-invariant key-range
    # nation fence; kept/rej-by-OR/rej-by-nation 130/354/291, 2204/
    # 6744/1688, 20400/62253/19588 probed at sf0.001/0.01/0.1.
    """
    SELECT MIN(p_name) AS first_part,
           MIN(s_name) AS first_supplier,
           MIN(l_shipdate) AS first_ship,
           COUNT(*) AS matches
    FROM lineitem, part, supplier, nation
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND p_name IS NOT NULL AND (p_name LIKE 'blue%' OR p_name LIKE 'cold%')
      AND n_nationkey <= 12
      AND l_shipdate > DATE '1999-12-31'
    """,
    tags=("job", "notnull-or-like"),
    discrimination=probe(
        kept="""SELECT COUNT(*) FROM lineitem, part, supplier, nation
            WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
              AND s_nationkey = n_nationkey
              AND (p_name LIKE 'blue%' OR p_name LIKE 'cold%')
              AND n_nationkey <= 12
              AND l_shipdate > DATE '1999-12-31'""",
        rejected_by_or_fence="""SELECT COUNT(*)
            FROM lineitem, part, supplier, nation
            WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
              AND s_nationkey = n_nationkey
              AND NOT (p_name LIKE 'blue%' OR p_name LIKE 'cold%')
              AND n_nationkey <= 12
              AND l_shipdate > DATE '1999-12-31'""",
        rejected_by_nation="""SELECT COUNT(*)
            FROM lineitem, part, supplier, nation
            WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
              AND s_nationkey = n_nationkey
              AND (p_name LIKE 'blue%' OR p_name LIKE 'cold%')
              AND n_nationkey > 12
              AND l_shipdate > DATE '1999-12-31'""",
        rejected_by_date="""SELECT COUNT(*) FROM lineitem
            WHERE l_shipdate <= DATE '1999-12-31'""",
    ),
)

# 28a/20a-ish: the SAME dimension role-played three times — an equality
# arm, a negated arm, and a LIKE arm — joined through two different FK
# columns plus one redundant re-probe of the supplier FK.
register_sql(
    "job_triple_roleplay_same_dim",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(s_name) AS first_supplier,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM orders, customer, lineitem, supplier,
         nation n1, nation n2, nation n3
    WHERE o_custkey = c_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = n1.n_nationkey
      AND s_nationkey = n2.n_nationkey
      AND s_nationkey = n3.n_nationkey
      AND n1.n_name = 'NATION_3'
      AND n2.n_name != 'NATION_3'
      AND n3.n_name LIKE 'NATION_1%'
      AND o_orderstatus = 'F'
    """,
    tags=("job", "roleplay-dim", "negated-arm"),
)

# 28a-ish: lexicographic inequality on a numeric-looking STRING column
# (mi_idx.info < '8.5') — 'Brand#2' > 'Brand#10' lexicographically, the
# exact class of fence JOB uses to stress selectivity estimation.
register_sql(
    "job_string_numeric_inequality",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(p_brand) AS first_brand,
           COUNT(*) AS matches
    FROM lineitem, part, orders
    WHERE l_partkey = p_partkey
      AND l_orderkey = o_orderkey
      AND p_brand < 'Brand#2'
      AND p_type IN ('ECONOMY', 'PROMO')
      AND o_orderdate > DATE '2000-01-01'
    """,
    tags=("job", "string-inequality"),
)

# 31a-ish: IN-list over a role column + LIKE prefix probe on an entity
# name + a genre-ish IN on a second dimension.
register_sql(
    "job_inlist_role_prefix_probe",
    """
    SELECT MIN(o_totalprice) AS min_price,
           MIN(s_name) AS first_supplier,
           MIN(p_type) AS first_type,
           COUNT(*) AS matches
    FROM orders, lineitem, supplier, part, customer
    WHERE o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey
      AND o_custkey = c_custkey
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                              '4-NOT SPECIFIED', '5-LOW')
      AND s_name LIKE 'Supplier#0000000%'
      AND p_type IN ('PROMO', 'STANDARD')
      AND c_mktsegment = 'MACHINERY'
    """,
    tags=("job", "inlist-role", "prefix-probe"),
)

# 20a-ish: NOT LIKE plus an OR of multi-wildcard LIKEs on the SAME
# column ('%Tony%Stark%' / '%Iron%Man%' shape).
register_sql(
    "job_multiwildcard_notlike_or",
    """
    SELECT MIN(p_name) AS first_part,
           MIN(l_quantity) AS min_qty,
           COUNT(*) AS matches
    FROM lineitem, part, supplier
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND p_name NOT LIKE '%ring%'
      AND (p_name LIKE '%o%d%' OR p_name LIKE '%l%te%')
      AND s_acctbal > 0
    """,
    tags=("job", "multi-wildcard"),
)

# Deep chain with LIKE fences at four different depths (the tranche-3
# target shape: 3+ LIKE fences spread over a long join chain).
register_sql(
    "job_three_like_fences_chain",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(p_name) AS first_part,
           MIN(n_name) AS first_nation,
           MIN(r_name) AS first_region,
           COUNT(*) AS matches
    FROM region, nation, customer, orders, lineitem, part, supplier
    WHERE r_regionkey = n_regionkey
      AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND c_name LIKE 'Customer#00000%'
      AND p_name LIKE '%widget'
      AND n_name LIKE 'NATION_%3'
      AND o_orderpriority LIKE '%HIGH'
      AND r_name LIKE '%E%'
    """,
    tags=("job", "like-fences", "deep-chain"),
    bench=True,
)

# 29a-ish: point equality on a dimension natural key + a year band on
# the fact + an IN-list on a flag column.
register_sql(
    "job_point_dim_plus_year_band",
    """
    SELECT MIN(o_orderdate) AS first_order,
           MIN(c_name) AS first_customer,
           COUNT(*) AS matches
    FROM lineitem, part, orders, customer
    WHERE l_partkey = p_partkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND p_name = 'hot rod'
      AND o_orderdate BETWEEN DATE '2000-01-01' AND DATE '2001-12-31'
      AND l_returnflag IN ('A', 'R')
    """,
    tags=("job", "point-dim", "year-band"),
)

# 29a-ish person clique: two bridge arms (lineitem self-join) that share
# TWO join keys, with the redundant cross-equalities written out.
register_sql(
    "job_double_bridge_clique",
    """
    SELECT MIN(l1.l_shipdate) AS first_ship,
           MIN(l2.l_shipdate) AS second_ship,
           MIN(p_name) AS first_part,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, orders, part
    WHERE l1.l_orderkey = o_orderkey
      AND l2.l_orderkey = o_orderkey
      AND l1.l_orderkey = l2.l_orderkey
      AND l1.l_partkey = p_partkey
      AND l2.l_partkey = p_partkey
      AND l1.l_partkey = l2.l_partkey
      AND l1.l_linenumber < l2.l_linenumber
      AND p_size > 40
      AND o_orderstatus = 'O'
    """,
    tags=("job", "double-bridge", "clique-preds"),
)

# The widest relation count this schema supports: 11 (fact + self-join
# arm + 4 dims + 3 nation roles + 2 region roles) — the 17-relation 29a
# spirit, COUNT + MINs only.
register_sql(
    "job_eleven_rel_roleplay_star",
    """
    SELECT MIN(c_name) AS first_customer,
           MIN(s_name) AS first_supplier,
           MIN(l2.l_shipdate) AS second_ship,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, orders, customer, supplier, part,
         nation n1, nation n2, nation n3, region r1, region r2
    WHERE l1.l_orderkey = o_orderkey
      AND l2.l_orderkey = o_orderkey
      AND l1.l_linenumber < l2.l_linenumber
      AND o_custkey = c_custkey
      AND l1.l_suppkey = s_suppkey
      AND l1.l_partkey = p_partkey
      AND c_nationkey = n1.n_nationkey
      AND s_nationkey = n2.n_nationkey
      AND s_nationkey = n3.n_nationkey
      AND n1.n_regionkey = r1.r_regionkey
      AND n2.n_regionkey = r2.r_regionkey
      AND n1.n_name IN ('NATION_1', 'NATION_5', 'NATION_9')
      AND n2.n_name NOT LIKE '%_7'
      AND n3.n_name LIKE 'NATION_%'
      AND r1.r_name != 'AFRICA'
      AND p_size < 15
      AND o_orderdate >= DATE '2001-01-01'
    """,
    tags=("job", "widest-star", "roleplay-dim"),
)
