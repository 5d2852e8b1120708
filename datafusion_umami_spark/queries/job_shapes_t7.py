"""JOB tranche 7: the last unrepresented combination flavors — the
all-point star, conjunctive same-column LIKE pairs, NULL-producing
fences, dim-key triangles, and the point-center mega star (r8 verdict
item 6).

Mirrors the Join Order Benchmark patterns (reference
benchmarks/queries/imdb/, 113 files) still unrepresented after tranches
1-6, re-expressed on the driver's star schema:

- 3a: dim LIKE + bridge IN-8 + year floor over a two-bridge pairwise
  closure (the minimal keyword/info double-membership shape);
- 4a: 3a plus a SECOND bridge stack carrying a lexicographic '>' on a
  numeric-looking string and a point on its role dim;
- 5a: CONJUNCTIVE same-column LIKE pair (note LIKE '%x%' AND LIKE
  '%y%') — both patterns must hit the same value;
- 9a: the person-side TRIANGLE — two bridges closed on the DIM key
  (an.person_id = n.id AND an.person_id = ci.person_id), not the fact
  key, plus voice IN-4 / gender point / name-contains LIKE;
- 11b: a NULL-test fence (mc.note IS NULL — emulated with NULLIF since
  the driver columns are non-null), a POINT year, a LIKE on the fact's
  descriptor, a dim inequality != and an OR-LIKE pair;
- 13a: the all-point nine-relation star: every fence an equality, three
  fact bridges with the full pairwise closure written out — join-order
  stress with zero range selectivity to lean on;
- 15b: TWO conjunctive LIKE pairs on TWO different columns plus a point
  company name and a year BETWEEN;
- 21b: the four-bridge full closure of 25c but with the 11b fence kit
  (NULL-test + != + IN-2 + BETWEEN) and the region link chain;
- 22b: NOT LIKE and LIKE conjoined on the SAME column + kind IN-2 +
  lexicographic '<' + year floor + country !=;
- 26b: IS NOT NULL + case-variant OR-LIKE pair on a role dim + keyword
  IN-4 + lexicographic '>' over a second part role;
- 30b: OR-of-THREE LIKEs (two infix + one prefix) on the center dim +
  writer-note IN-5 + keyword IN-7 + genre IN-2 + gender point;
- 29b: the mega star with a POINT on the center dim's name (t.title =
  'Shrek 2') collapsing the whole clique to near-point selectivity;
- 14a: the three-bridge stack with two role-played info dims (closes
  the last zero-mention JOB family — all 33 families represented).

Like the originals, queries aggregate to MIN() columns + COUNT(*) with
no GROUP BY — single-row, order-independent output — and the SQL text
is ANSI-shared with the DuckDB oracle.  Registered in a module imported
LAST so these never-swept additions queue BEHIND the legacy backlog
(sweep-rotation contract, queries/__init__.py).

At 100 TB: every join is an equi-join on a key column (the spelled-out
pairwise closures are redundant equalities Catalyst collapses); dims
broadcast; the only fact-fact joins are self-joins on the fact key.
"""

from __future__ import annotations

from datafusion_umami_spark.registry import probe, register_sql

# 3a: two bridges on the order key (pairwise closure spelled out), a
# LIKE on the part dim reached through bridge 1, an IN-8 on bridge 2's
# own column, and a year floor on the fact.
register_sql(
    "job_t7_dim_like_bridge_in8",
    """
    SELECT MIN(p_name) AS movie_title,
           COUNT(*) AS matches
    FROM part, lineitem b1, lineitem b2, orders
    WHERE p_name LIKE '%widget%'
      AND b2.l_quantity IN (1, 2, 3, 4, 5, 6, 7, 8)
      AND o_orderdate > DATE '1998-01-01'
      AND o_orderkey = b1.l_orderkey
      AND o_orderkey = b2.l_orderkey
      AND b2.l_orderkey = b1.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND p_partkey = b1.l_partkey
    """,
    tags=("job", "bridge-closure", "in-list", "like"),
)

# 4a: 3a plus a second dim stack — lexicographic '>' on the
# numeric-looking supplier name (mi_idx.info > '5.0') and a point on
# its role dim (it.info = 'rating').
register_sql(
    "job_t7_lexic_second_stack",
    """
    SELECT MIN(s_name) AS rating,
           MIN(p_name) AS movie_title,
           COUNT(*) AS matches
    FROM part, lineitem b1, lineitem b2, supplier, nation, orders
    WHERE p_name LIKE '%rod%'
      AND s_name > 'Supplier#000000005'
      AND n_name = 'NATION_12'
      AND o_orderdate > DATE '1997-06-01'
      AND o_orderkey = b1.l_orderkey
      AND o_orderkey = b2.l_orderkey
      AND b2.l_orderkey = b1.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND p_partkey = b1.l_partkey
      AND b2.l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
    """,
    tags=("job", "lexicographic", "point-dim", "bridge-closure"),
)

# 5a: conjunctive SAME-COLUMN LIKE pair (mc.note LIKE '%(theatrical)%'
# AND LIKE '%(France)%') + IN-list country fence + point company type +
# year floor.
register_sql(
    "job_t7_conj_same_column_likes",
    """
    SELECT MIN(c_name) AS typical_european_movie,
           COUNT(*) AS matches
    FROM customer, orders, lineitem, part
    WHERE c_name LIKE '%Customer%' AND c_name LIKE '%00001%'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                              '4-NOT SPECIFIED', '5-LOW')
      AND p_type = 'PROMO'
      AND o_orderdate > DATE '1996-01-01'
      AND o_custkey = c_custkey
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
    """,
    tags=("job", "conjunctive-likes", "point-dim"),
)

# 9a: the triangle closed on the DIM key — two order "bridges" both
# anchored on the customer (an.person_id = n.id AND an.person_id =
# ci.person_id), with the voice-note IN-4, the gender point, and the
# name-contains LIKE.
register_sql(
    "job_t7_dim_key_triangle",
    """
    SELECT MIN(c_name) AS alternative_name,
           MIN(o2.o_orderdate) AS first_aka_order,
           MIN(s_name) AS movie,
           COUNT(*) AS matches
    FROM customer, orders o1, orders o2, lineitem, supplier
    WHERE o1.o_orderpriority IN ('1-URGENT', '2-HIGH',
                                 '3-MEDIUM', '5-LOW')
      AND c_mktsegment = 'FURNITURE'
      AND c_name LIKE '%0001%'
      AND o2.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1999-12-31'
      AND o1.o_custkey = c_custkey
      AND o2.o_custkey = c_custkey
      AND o2.o_custkey = o1.o_custkey
      AND o1.o_orderkey < o2.o_orderkey
      AND l_orderkey = o1.o_orderkey
      AND l_suppkey = s_suppkey
    """,
    tags=("job", "dim-key-triangle", "in-list"),
)

# 11b: NULL-test bridge fence (mc.note IS NULL — NULLIF emulation
# keeps the IS NULL predicate shape over non-null driver columns),
# POINT production year, LIKE on the fact descriptor, dim != and an
# OR-LIKE company pair.
register_sql(
    "job_t7_null_fence_point_year",
    """
    SELECT MIN(c_name) AS from_company,
           MIN(r_name) AS movie_link_type,
           MIN(p_name) AS sequel_movie,
           COUNT(*) AS matches
    FROM customer, orders, lineitem, part, supplier, nation, region
    WHERE NULLIF(l_tax, 0.0) IS NULL
      AND EXTRACT(YEAR FROM o_orderdate) = 1998
      AND c_name LIKE '%001%'
      AND n_name <> 'NATION_3'
      AND (p_name LIKE '%widget%' OR p_name LIKE '%bolt%')
      AND r_name LIKE '%A%'
      AND o_custkey = c_custkey
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    """,
    tags=("job", "null-fence", "point-year", "or-likes"),
    discrimination=probe(
        tax_zero_rows="SELECT COUNT(*) FROM lineitem WHERE l_tax = 0.0",
        tax_positive_rows="SELECT COUNT(*) FROM lineitem "
        "WHERE l_tax <> 0.0",
        kept="""SELECT COUNT(*)
            FROM customer, orders, lineitem, part, supplier, nation,
                 region
            WHERE l_tax = 0.0
              AND EXTRACT(YEAR FROM o_orderdate) = 1998
              AND c_name LIKE '%001%'
              AND n_name <> 'NATION_3'
              AND (p_name LIKE '%widget%' OR p_name LIKE '%bolt%')
              AND r_name LIKE '%A%'
              AND o_custkey = c_custkey AND l_orderkey = o_orderkey
              AND l_partkey = p_partkey AND l_suppkey = s_suppkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey""",
    ),
)

# 13a: the ALL-POINT nine-relation star — every fence an equality,
# three fact bridges fully pairwise-closed, zero range predicates for
# the optimizer to lean on (pure join-order stress).
register_sql(
    "job_t7_all_point_star",
    """
    SELECT MIN(b1.l_shipdate) AS release_date,
           MIN(b2.l_extendedprice) AS rating,
           MIN(c_name) AS german_movie,
           COUNT(*) AS matches
    FROM customer, orders, lineitem b1, lineitem b2, lineitem b3,
         part, supplier, nation, region
    WHERE n_name = 'NATION_12'
      AND r_name = 'ASIA'
      AND p_type = 'STANDARD'
      AND c_mktsegment = 'MACHINERY'
      AND o_orderstatus = 'F'
      AND o_custkey = c_custkey
      AND b1.l_orderkey = o_orderkey
      AND b2.l_orderkey = o_orderkey
      AND b3.l_orderkey = o_orderkey
      AND b1.l_orderkey = b2.l_orderkey
      AND b1.l_orderkey = b3.l_orderkey
      AND b2.l_orderkey = b3.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND b2.l_linenumber < b3.l_linenumber
      AND b1.l_partkey = p_partkey
      AND b2.l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    """,
    tags=("job", "all-point", "three-bridge-closure"),
    bench=True,
)

# 15b: TWO conjunctive LIKE pairs on TWO different columns (mc.note
# '%(200%)%' AND '%(worldwide)%'; mi.info 'USA:% 200%' with mi.note
# '%internet%') + point company name + year BETWEEN.
register_sql(
    "job_t7_double_conj_like_pairs",
    """
    SELECT MIN(o_orderdate) AS release_date,
           MIN(p_name) AS youtube_movie,
           COUNT(*) AS matches
    FROM part, customer, orders, lineitem, supplier
    WHERE p_name LIKE '%cold%' AND p_name LIKE '%wid%'
      AND c_name LIKE '%Customer%' AND c_name LIKE '%002%'
      AND s_name = 'Supplier#000000003'
      AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '2000-12-31'
      AND o_custkey = c_custkey
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
    """,
    tags=("job", "double-conj-likes", "point-dim"),
)

# 21b: the four-bridge full closure of 25c carrying 11b's fence kit —
# NULL-test + dim != + IN-2 + year BETWEEN — and the region link chain
# with its LIKE.
register_sql(
    "job_t7_four_bridge_fence_kit",
    """
    SELECT MIN(c_name) AS company_name,
           MIN(r_name) AS link_type,
           MIN(b1.l_shipdate) AS german_follow_up,
           COUNT(*) AS matches
    FROM customer, orders, lineitem b1, lineitem b2, lineitem b3,
         supplier, nation, region
    WHERE NULLIF(b2.l_discount, 0.0) IS NULL
      AND n_name <> 'NATION_4'
      AND b3.l_returnflag IN ('A', 'N')
      AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1999-12-31'
      AND r_name LIKE '%A%'
      AND o_custkey = c_custkey
      AND b1.l_orderkey = o_orderkey
      AND b2.l_orderkey = o_orderkey
      AND b3.l_orderkey = o_orderkey
      AND b1.l_orderkey = b2.l_orderkey
      AND b1.l_orderkey = b3.l_orderkey
      AND b2.l_orderkey = b3.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND b2.l_linenumber < b3.l_linenumber
      AND b1.l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    """,
    tags=("job", "four-bridge", "null-fence", "between"),
)

# 22b: NOT LIKE conjoined with LIKE on the SAME column + kind IN-2 +
# lexicographic '<' on the numeric-looking supplier name + year floor
# + country !=.
register_sql(
    "job_t7_notlike_like_same_column",
    """
    SELECT MIN(s_name) AS movie_company,
           MIN(l_extendedprice) AS rating,
           MIN(p_name) AS western_violent_movie,
           COUNT(*) AS matches
    FROM part, lineitem, orders, supplier, nation
    WHERE p_name NOT LIKE '%blue%' AND p_name LIKE '%rod%'
      AND l_linestatus IN ('F', 'O')
      AND s_name < 'Supplier#000000015'
      AND o_orderdate > DATE '1998-06-01'
      AND n_name <> 'NATION_0'
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
    """,
    tags=("job", "notlike-like", "lexicographic", "in-list"),
)

# 26b: IS NOT NULL + case-variant OR-LIKE pair on a role dim
# (chn.name '%man%' OR '%Man%') + keyword IN-4 through a second
# bridge + lexicographic '>' rating.
register_sql(
    "job_t7_case_variant_or_likes",
    """
    SELECT MIN(p1.p_name) AS character_name,
           MIN(b2.l_extendedprice) AS rating,
           MIN(c_name) AS complete_hero_movie,
           COUNT(*) AS matches
    FROM customer, orders, lineitem b1, lineitem b2, part p1, part p2
    WHERE p1.p_name IS NOT NULL
      AND (p1.p_name LIKE '%widget%' OR p1.p_name LIKE '%Widget%')
      AND p2.p_brand IN ('Brand#1', 'Brand#4', 'Brand#9', 'Brand#12')
      AND b2.l_extendedprice > 2000.0
      AND o_orderdate > DATE '1997-01-01'
      AND o_custkey = c_custkey
      AND b1.l_orderkey = o_orderkey
      AND b2.l_orderkey = o_orderkey
      AND b1.l_orderkey = b2.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND b1.l_partkey = p1.p_partkey
      AND b2.l_partkey = p2.p_partkey
    """,
    tags=("job", "case-variant-likes", "two-part-roles"),
)

# 30b: OR-of-THREE LIKEs on the center dim (two infix, one prefix —
# '%Freddy%' OR '%Jason%' OR 'Saw%') + writer-note IN-5 + keyword IN-7
# + genre IN-2 + gender point.
register_sql(
    "job_t7_or3_likes_center_dim",
    """
    SELECT MIN(b1.l_extendedprice) AS movie_budget,
           MIN(b2.l_quantity) AS movie_votes,
           MIN(s_name) AS writer,
           MIN(c_name) AS complete_gore_movie,
           COUNT(*) AS matches
    FROM customer, orders, lineitem b1, lineitem b2, part, supplier
    WHERE (c_name LIKE '%0001%' OR c_name LIKE '%0002%'
             OR c_name LIKE 'Customer#0000001%')
      AND b1.l_quantity IN (5, 10, 15, 20, 25)
      AND p_name IN ('cold widget', 'large bolt', 'blue rod',
                     'small widget', 'hot rod', 'new anvil',
                     'blue ring')
      AND b2.l_returnflag IN ('A', 'R')
      AND c_mktsegment = 'MACHINERY'
      AND o_custkey = c_custkey
      AND b1.l_orderkey = o_orderkey
      AND b2.l_orderkey = o_orderkey
      AND b1.l_orderkey = b2.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND b2.l_partkey = p_partkey
      AND b1.l_suppkey = s_suppkey
    """,
    tags=("job", "or3-likes", "in-lists"),
)

# 29b: the mega star collapsed by a POINT on the center dim's name
# (t.title = 'Shrek 2'): full bridge closure + many point fences, the
# whole clique near-point selective.
register_sql(
    "job_t7_point_center_mega_star",
    """
    SELECT MIN(p_name) AS voiced_char,
           MIN(s_name) AS voicing_actress,
           MIN(c_name) AS voiced_animation,
           COUNT(*) AS matches
    FROM customer, orders, lineitem b1, lineitem b2, part, supplier,
         nation, region
    WHERE c_name = 'Customer#000000042'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '2001-08-01'
      AND r_name LIKE '%A%'
      AND o_custkey = c_custkey
      AND b1.l_orderkey = o_orderkey
      AND b2.l_orderkey = o_orderkey
      AND b1.l_orderkey = b2.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND b1.l_partkey = p_partkey
      AND b2.l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    """,
    tags=("job", "point-center", "mega-star"),
)

# 14a: the three-bridge stack with TWO role-played info dims — three
# fact bridges fully pairwise-closed, the keyword IN-4 through one,
# the lexicographic '<' on the numeric-looking rating through another,
# a kind point and a year floor (closes the last zero-mention JOB
# family: every family 1..33 is now represented).
register_sql(
    "job_t7_three_stack_two_roles",
    """
    SELECT MIN(b2.l_extendedprice) AS rating,
           MIN(c_name) AS northern_dark_movie,
           COUNT(*) AS matches
    FROM customer, orders, lineitem b1, lineitem b2, lineitem b3,
         part, supplier
    WHERE p_brand IN ('Brand#1', 'Brand#4', 'Brand#9', 'Brand#12')
      AND s_name < 'Supplier#000000008'
      AND c_mktsegment = 'FURNITURE'
      AND o_orderdate > DATE '1997-01-01'
      AND o_custkey = c_custkey
      AND b1.l_orderkey = o_orderkey
      AND b2.l_orderkey = o_orderkey
      AND b3.l_orderkey = o_orderkey
      AND b1.l_orderkey = b2.l_orderkey
      AND b1.l_orderkey = b3.l_orderkey
      AND b2.l_orderkey = b3.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND b2.l_linenumber < b3.l_linenumber
      AND b1.l_partkey = p_partkey
      AND b2.l_suppkey = s_suppkey
    """,
    tags=("job", "three-stack", "two-roles", "lexicographic"),
)
