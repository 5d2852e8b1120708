"""JOB tranche 6: the remaining combination idioms — deep clique chains
with double-negation fences, multi-keyword-IN + year-window stacks, and
the linked-pair flavor variants (r7 verdict item 4).

Mirrors the Join Order Benchmark patterns (reference
benchmarks/queries/imdb/, 113 files) still unrepresented after tranches
1-5, re-expressed on the driver's star schema:

- 16c: the 16b clique PLUS a bare numeric upper bound on the fact
  (t.episode_nr < 100) — a one-sided cap, not 16d's closed range;
- 24b: 24a's IN-4 voice-note bridge fence combined with a POINT company
  name and a LIKE-prefix on the fact title — three selectivity tiers in
  one query;
- 25c: FOUR bridge aliases on one fact key (ci, mi, mi_idx, mk), the
  full pairwise clique spelled out, each arm fenced differently
  (IN-list note, point status, numeric bound, keyword IN-7);
- 26a: `IS NOT NULL AND (LIKE OR LIKE)` same-column + lexicographic
  rating '>' on a numeric-looking string + keyword IN-10 + year window
  over the two-type-role dim;
- 30a: the two-type-role dim with an IN-list on ONE role and a point
  on the OTHER (cct1.kind IN ('cast','crew') AND cct2 = point);
- 31a: LIKE-prefix company fence (cn.name LIKE 'Lionsgate%') centering
  a wide star with two info roles;
- 33b: the linked-pair self-bridge where the SECOND role carries a
  POINT production year (33a uses a band), a lexicographic '<' rating,
  and each role its own company/dim stack;
- 21a: negated dim equality + OR-of-LIKEs on the same dim column +
  mixed-semantics IN-8 + a 50-year BETWEEN window + link LIKE;
- 23c: the complete_cast dim fenced through ONE role only (status),
  with the date-prefix OR-LIKE pair over a stringified date;
- 20b: double negation — NOT LIKE on the same column as the OR-of-
  multi-wildcard-LIKEs, plus a multi-wildcard person LIKE and the
  two-type-role dim;
- 17a: the SAME MIN() column projected twice under different aliases
  (duplicate aggregate outputs must not be collapsed into one column);
- 18a: no fence on the fact at all — selectivity lives entirely on the
  bridge IN-2 and the person two-column conjunction;
- 12a: two info roles through two DIFFERENT bridge aliases, one IN-2
  genre fence, one lexicographic '>' rating, year band 2005-2008.

Like the originals, queries aggregate to MIN() columns + COUNT(*) with
no GROUP BY — single-row, order-independent output — and the SQL text
is ANSI-shared with the DuckDB oracle unless a STRING/VARCHAR cast
forces an engine split.  Registered in a module imported LAST so these
never-swept additions queue BEHIND the legacy backlog (sweep-rotation
contract, queries/__init__.py).
"""

from __future__ import annotations

from datafusion_umami_spark.registry import register_sql

# 16c: 6-relation chain, point fences on two dims, and the bare numeric
# cap on the fact line number (episode_nr < 100).
register_sql(
    "job_t6_episode_capped_chain",
    """
    SELECT MIN(s_name) AS pseudonym,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM supplier, nation, lineitem, orders, customer, part
    WHERE s_nationkey = n_nationkey
      AND l_suppkey = s_suppkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_partkey = p_partkey
      AND n_name = 'NATION_5'
      AND p_type = 'PROMO'
      AND l_linenumber < 5
    """,
    tags=("job", "chain", "numeric-cap"),
)

# 24b: IN-4 bridge note + POINT supplier name + LIKE-prefix customer +
# keyword IN-4 + year fence — the 24a stack tightened by two point-ish
# fences exactly as 24b tightens 24a.
register_sql(
    "job_t6_point_company_like_prefix",
    """
    SELECT MIN(c_name) AS voiced_char,
           MIN(p_name) AS first_keyword,
           MIN(o_orderdate) AS first_order,
           COUNT(*) AS matches
    FROM lineitem, orders, customer, part, supplier, nation
    WHERE l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '5-LOW')
      AND s_name = 'Supplier#000000008'
      AND c_name LIKE 'Customer#0000000%'
      AND p_brand IN ('Brand#1', 'Brand#4', 'Brand#9', 'Brand#12')
      AND o_orderdate > DATE '1996-01-01'
    """,
    tags=("job", "point-dim", "like-prefix", "in-list"),
)

# 25c: FOUR bridge aliases on one order key with the full C(5,2)
# pairwise clique written out; line-number ordering bounds the per-key
# fan-out the way the reference's distinct bridge TABLES do.  Catalyst
# must collapse the redundant closure to a linear equi-join chain.
register_sql(
    "job_t6_four_bridge_clique",
    """
    SELECT MIN(b1.l_extendedprice) AS movie_budget,
           MIN(b3.l_quantity) AS movie_votes,
           MIN(p_name) AS violent_keyword,
           COUNT(*) AS matches
    FROM orders, lineitem b1, lineitem b2, lineitem b3, lineitem b4,
         part, supplier
    WHERE b1.l_orderkey = o_orderkey
      AND b2.l_orderkey = o_orderkey
      AND b3.l_orderkey = o_orderkey
      AND b4.l_orderkey = o_orderkey
      AND b1.l_orderkey = b2.l_orderkey
      AND b1.l_orderkey = b3.l_orderkey
      AND b1.l_orderkey = b4.l_orderkey
      AND b2.l_orderkey = b3.l_orderkey
      AND b2.l_orderkey = b4.l_orderkey
      AND b3.l_orderkey = b4.l_orderkey
      AND b1.l_linenumber < b2.l_linenumber
      AND b2.l_linenumber < b3.l_linenumber
      AND b3.l_linenumber < b4.l_linenumber
      AND b1.l_returnflag IN ('A', 'N', 'R')
      AND b2.l_linestatus = 'F'
      AND b3.l_tax < 0.05
      AND b4.l_partkey = p_partkey
      AND p_name IN ('cold widget', 'large bolt', 'blue rod',
                     'small widget', 'large widget', 'cold bolt',
                     'blue widget')
      AND b1.l_suppkey = s_suppkey
      AND s_name LIKE 'Supplier#%'
    """,
    tags=("job", "clique", "multi-bridge"),
    bench=True,
    spread_tables=("lineitem",),
)

# 26a: two-type-role dim (point + LIKE roles), IS NOT NULL + OR-of-LIKEs
# on one column, lexicographic '>' on the numeric-prefixed priority
# string, keyword IN-10, year fence.
register_sql(
    "job_t6_notnull_orlikes_lexgt",
    """
    SELECT MIN(c_name) AS character_name,
           MIN(o_orderpriority) AS rating,
           MIN(o_orderdate) AS first_movie,
           COUNT(*) AS matches
    FROM orders, nation n1, nation n2, customer, lineitem, part
    WHERE o_custkey % 25 = n1.n_nationkey
      AND o_orderkey % 25 = n2.n_nationkey
      AND n1.n_name = 'NATION_2'
      AND n2.n_name LIKE '%1%'
      AND o_custkey = c_custkey
      AND c_name IS NOT NULL
      AND (c_name LIKE '%001%' OR c_name LIKE '%002%')
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND p_brand IN ('Brand#1', 'Brand#3', 'Brand#5', 'Brand#7',
                      'Brand#9', 'Brand#11', 'Brand#13', 'Brand#15',
                      'Brand#17', 'Brand#19')
      AND o_orderpriority > '2'
      AND o_orderdate > DATE '1997-01-01'
    """,
    tags=("job", "two-type-roles", "or-likes", "lex-compare"),
)

# 30a: the two-type-role dim with IN on one role, point on the other,
# plus genre IN-2 and a writer-note IN on the bridge.
register_sql(
    "job_t6_role_in_role_point",
    """
    SELECT MIN(p_name) AS movie_genre,
           MIN(o_orderdate) AS first_movie,
           COUNT(*) AS matches
    FROM orders, nation n1, nation n2, lineitem, part
    WHERE o_custkey % 25 = n1.n_nationkey
      AND o_orderkey % 25 = n2.n_nationkey
      AND n1.n_name IN ('NATION_1', 'NATION_4')
      AND n2.n_name = 'NATION_9'
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND p_type IN ('ECONOMY', 'PROMO')
      AND l_returnflag IN ('A', 'R')
      AND o_orderdate > DATE '1996-01-01'
    """,
    tags=("job", "two-type-roles", "in-list"),
)

# 31a: LIKE-prefix company fence centering a wide star with two info
# arms (quantity bound + lexicographic priority), keyword IN-7.
register_sql(
    "job_t6_prefix_company_wide_star",
    """
    SELECT MIN(l1.l_extendedprice) AS movie_budget,
           MIN(l2.l_quantity) AS movie_votes,
           MIN(s_name) AS writer,
           MIN(o_orderdate) AS first_movie,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, orders, customer, nation,
         part, supplier
    WHERE l1.l_orderkey = o_orderkey
      AND l2.l_orderkey = o_orderkey
      AND l1.l_orderkey = l2.l_orderkey
      AND l1.l_linenumber < l2.l_linenumber
      AND o_custkey = c_custkey
      AND c_nationkey = n_nationkey
      AND l1.l_partkey = p_partkey
      AND l1.l_suppkey = s_suppkey
      AND s_name LIKE 'Supplier#0000000%'
      AND p_name IN ('cold widget', 'large bolt', 'blue rod',
                     'small widget', 'large widget', 'cold bolt',
                     'blue widget')
      AND l2.l_quantity > 5
      AND o_orderpriority > '3'
    """,
    tags=("job", "like-prefix", "wide-star"),
)

# 33b: linked-pair self-bridge; the second role carries a POINT year
# (33a's band becomes 33b's equality), a lexicographic '<' rating, and
# each role has its own customer/nation stack; the link dim is
# LIKE-fenced through the first role's nation.
register_sql(
    "job_t6_linked_pair_point_year",
    """
    SELECT MIN(c1.c_name) AS first_company,
           MIN(c2.c_name) AS second_company,
           MIN(o1.o_orderpriority) AS first_rating,
           MIN(o2.o_orderpriority) AS second_rating,
           MIN(o1.o_orderdate) AS first_movie,
           MIN(o2.o_orderdate) AS second_movie,
           COUNT(*) AS matches
    FROM orders o1, orders o2, customer c1, customer c2,
         nation n1, nation n2
    WHERE o1.o_custkey = c1.c_custkey
      AND o2.o_custkey = c2.c_custkey
      AND c1.c_nationkey = n1.n_nationkey
      AND c2.c_nationkey = n2.n_nationkey
      AND o1.o_orderkey % 100 = o2.o_orderkey % 100
      AND o1.o_orderkey < o2.o_orderkey
      AND n1.n_name = 'NATION_3'
      AND n2.n_name LIKE '%1%'
      AND o2.o_orderpriority < '3'
      AND EXTRACT(YEAR FROM o2.o_orderdate) = 1998
    """,
    tags=("job", "link-bridge", "self-join", "point-year"),
)

# 21a: negated dim equality + OR-of-LIKEs on the same dim + mixed
# IN-8 over the part names + the 4-year BETWEEN window + link LIKE.
register_sql(
    "job_t6_negated_dim_mixed_in8",
    """
    SELECT MIN(c_name) AS company_name,
           MIN(s_name) AS link_type,
           MIN(o_orderdate) AS western_follow_up,
           COUNT(*) AS matches
    FROM nation, customer, orders, lineitem, part, supplier
    WHERE n_name <> 'NATION_13'
      AND (c_name LIKE '%1%' OR c_name LIKE '%2%')
      AND c_nationkey = n_nationkey
      AND o_custkey = c_custkey
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND p_type = 'PROMO'
      AND s_name LIKE '%0%'
      AND p_name IN ('cold widget', 'large bolt', 'blue rod',
                     'small widget', 'cold bolt', 'blue widget',
                     'large rod', 'small bolt')
      AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1999-12-31'
    """,
    tags=("job", "negated-dim", "or-likes", "in-list", "year-band"),
)

# 23c: the two-FK dim fenced through ONE role only (status side), with
# the date-prefix OR-LIKE pair over the stringified order date and a
# kind IN-4 on the customer segment.
register_sql(
    "job_t6_status_role_date_prefix",
    """
    SELECT MIN(c_mktsegment) AS movie_kind,
           MIN(o_orderdate) AS first_movie,
           COUNT(*) AS matches
    FROM orders, nation n2, customer, lineitem, part
    WHERE o_orderkey % 25 = n2.n_nationkey
      AND n2.n_name = 'NATION_21'
      AND o_custkey = c_custkey
      AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY',
                           'HOUSEHOLD')
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND p_name LIKE '%widget%'
      AND CAST(o_orderdate AS STRING) IS NOT NULL
      AND (CAST(o_orderdate AS STRING) LIKE '199%'
           OR CAST(o_orderdate AS STRING) LIKE '200%')
      AND o_orderdate > DATE '1995-06-01'
    """,
    oracle="""
    SELECT MIN(c_mktsegment) AS movie_kind,
           MIN(o_orderdate) AS first_movie,
           COUNT(*) AS matches
    FROM orders, nation n2, customer, lineitem, part
    WHERE o_orderkey % 25 = n2.n_nationkey
      AND n2.n_name = 'NATION_21'
      AND o_custkey = c_custkey
      AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY',
                           'HOUSEHOLD')
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND p_name LIKE '%widget%'
      AND CAST(o_orderdate AS VARCHAR) IS NOT NULL
      AND (CAST(o_orderdate AS VARCHAR) LIKE '199%'
           OR CAST(o_orderdate AS VARCHAR) LIKE '200%')
      AND o_orderdate > DATE '1995-06-01'
    """,
    tags=("job", "one-role-fence", "date-prefix"),
)

# 20b: double negation — NOT LIKE on the same column as the OR of two
# multi-wildcard LIKEs, a multi-wildcard person LIKE, the two-type-role
# dim, keyword IN-8, and a year fence.
register_sql(
    "job_t6_double_negation_fences",
    """
    SELECT MIN(o_orderdate) AS complete_movie,
           COUNT(*) AS matches
    FROM orders, nation n1, nation n2, lineitem, part, customer
    WHERE o_custkey % 25 = n1.n_nationkey
      AND o_orderkey % 25 = n2.n_nationkey
      AND n1.n_name = 'NATION_1'
      AND n2.n_name LIKE '%1%'
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND o_custkey = c_custkey
      AND p_name NOT LIKE '%bolt%'
      AND (p_name LIKE '%large%widget%' OR p_name LIKE '%cold%widget%')
      AND c_name LIKE '%00%1%'
      AND p_brand IN ('Brand#1', 'Brand#3', 'Brand#5', 'Brand#7',
                      'Brand#9', 'Brand#11', 'Brand#13', 'Brand#15')
      AND o_orderdate > DATE '1997-01-01'
    """,
    tags=("job", "double-negation", "or-likes", "two-type-roles"),
)

# 17a: the SAME MIN() projected twice under different aliases (the
# duplicate-aggregate-output idiom) + LIKE-prefix person fence.
register_sql(
    "job_t6_duplicate_min_aliases",
    """
    SELECT MIN(c_name) AS member_name,
           MIN(c_name) AS a1,
           COUNT(*) AS matches
    FROM customer, orders, lineitem, part, nation
    WHERE o_custkey = c_custkey
      AND l_orderkey = o_orderkey
      AND l_partkey = p_partkey
      AND c_nationkey = n_nationkey
      AND c_name LIKE 'Customer#0000000%'
      AND n_name = 'NATION_8'
      AND p_type = 'ECONOMY'
    """,
    tags=("job", "duplicate-agg-output", "like-prefix"),
)

# 18a: NO fence on the fact at all — selectivity lives on the bridge
# IN-2 note and the supplier two-column conjunction; two info arms.
register_sql(
    "job_t6_unfenced_fact_two_infos",
    """
    SELECT MIN(l1.l_extendedprice) AS movie_budget,
           MIN(l2.l_quantity) AS movie_votes,
           MIN(o_orderdate) AS movie_title,
           COUNT(*) AS matches
    FROM lineitem l1, lineitem l2, orders, supplier, nation
    WHERE l1.l_orderkey = o_orderkey
      AND l2.l_orderkey = o_orderkey
      AND l1.l_orderkey = l2.l_orderkey
      AND l1.l_linenumber < l2.l_linenumber
      AND l1.l_returnflag IN ('A', 'R')
      AND l1.l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_14'
      AND s_name LIKE '%3%'
    """,
    tags=("job", "unfenced-fact", "two-infos"),
)

# 12a: two info roles via two DIFFERENT bridge aliases — one IN-2
# genre, one lexicographic '>' rating — with the 2005-2008-style
# closed year band.
register_sql(
    "job_t6_genre_rating_year_band",
    """
    SELECT MIN(c_name) AS movie_company,
           MIN(o_orderpriority) AS rating,
           MIN(o_orderdate) AS drama_horror_movie,
           COUNT(*) AS matches
    FROM lineitem m1, lineitem m2, orders, customer
    WHERE m1.l_orderkey = o_orderkey
      AND m2.l_orderkey = o_orderkey
      AND m1.l_orderkey = m2.l_orderkey
      AND m1.l_linenumber < m2.l_linenumber
      AND m1.l_returnflag IN ('A', 'N')
      AND m2.l_linestatus = 'O'
      AND o_orderpriority > '4'
      AND o_custkey = c_custkey
      AND o_orderdate BETWEEN DATE '1997-01-01' AND DATE '2000-12-31'
    """,
    tags=("job", "two-infos", "lex-compare", "year-band"),
)
