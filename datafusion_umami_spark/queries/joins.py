"""Join operators: every join type + theta, cross, range, null-safe,
existence (mark-join analog), broadcast variant.

Covers SURVEY.md §2.3 — reference HashJoinExec (joins/hash_join.rs:328,
Partitioned/CollectLeft modes), SortMergeJoinExec (sort_merge_join.rs:129),
NestedLoopJoinExec (nested_loop_join.rs:156), CrossJoinExec
(cross_join.rs:78), SymmetricHashJoinExec range semantics
(symmetric_hash_join.rs:173), join types (common/src/join_type.rs:30-75).

Spark-first notes: Catalyst/AQE picks BHJ vs SMJ vs SHJ per side sizes;
the Partitioned+umami spill path maps to Spark's shuffled joins whose
build/sort sides spill via TaskMemoryManager. Broadcast is pinned
explicitly only where a dim side is known-small at any SF (nation/region).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 300000.0
    WHERE c_custkey < 200
    """,
    tags=("join", "left-outer"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with a join-side residual filter (filter must not fall
    to WHERE — semantics differ; reference hash_join.rs residual filter)."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    o = table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000.0)
    return c.join(o, cond, "left").select("c_custkey", "o_orderkey")


@register(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey BETWEEN 50 AND 100
    """,
    tags=("join", "right-outer"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey").between(50, 100))
    return o.join(c, o.o_custkey == c.c_custkey, "right").select("o_orderkey", "c_name")


@register(
    "join_full_outer",
    oracle="""
    SELECT ck, ok FROM
      (SELECT c_custkey AS ck, c_nationkey FROM customer WHERE c_custkey % 3 = 0) c
      FULL JOIN
      (SELECT o_custkey AS oc, MIN(o_orderkey) AS ok FROM orders GROUP BY o_custkey
       HAVING o_custkey % 2 = 0) o
      ON c.ck = o.oc
    """,
    tags=("join", "full-outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("ck"), "c_nationkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("oc"))
        .agg(F.min("o_orderkey").alias("ok"))
        .where(F.col("oc") % 2 == 0)
    )
    return c.join(o, c.ck == o.oc, "full").select("ck", "ok")


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    tags=("join", "semi"),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftSemi (reference join_type.rs LeftSemi; planned from EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 450000.0)
    """,
    tags=("join", "anti"),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join against BIG orders (r13 review: the unfiltered original
    returned ZERO rows at sf0.001/0.01 — every fixture customer has an
    order — so a never-match anti join hashed green against the equally
    empty oracle; the 450000 filter leaves ~1/3 of customers orderless
    at every SF, populating both kept and dropped branches)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_right_semi",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity = 50
                    AND l_discount >= 0.08 AND l_returnflag = 'R')
    """,
    tags=("join", "semi"),
)
def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RightSemi = LeftSemi with sides swapped (reference join_type.rs:
    RightSemi) — Spark only exposes left_semi, so swap explicitly.
    r13 review: the old `l_quantity >= 49` probe retained every
    supplier at every SF (each supplier has ~600 lineitems, so
    P(no qty>=49 item) ~ 1e-11) — the semi join structurally could not
    discriminate; the three-conjunct probe passes 9/10 suppliers at
    sf0.001, 59/100 at sf0.01, 653/1000 at sf0.1 (probed), so both
    branches are populated at every proof scale."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") == 50)
        & (F.col("l_discount") >= 0.08)
        & (F.col("l_returnflag") == "R")
    )
    s = table(spark, sf_dir, "supplier")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@register(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS a, r2.r_name AS b FROM region r1 CROSS JOIN region r2
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = table(spark, sf_dir, "region").select(F.col("r_name").alias("a"))
    r2 = table(spark, sf_dir, "region").select(F.col("r_name").alias("b"))
    return r1.crossJoin(r2)


@register(
    "join_theta_inequality",
    oracle="""
    SELECT n1.n_name AS lo, n2.n_name AS hi
    FROM nation n1 JOIN nation n2
      ON n1.n_nationkey < n2.n_nationkey AND n1.n_regionkey = n2.n_regionkey
    """,
    tags=("join", "theta", "nested-loop"),
)
def join_theta_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (reference NestedLoopJoinExec). The equi conjunct keeps
    Catalyst on a hash join with residual `<` filter instead of BNLJ."""
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("lo"), F.col("n_nationkey").alias("k1"), F.col("n_regionkey").alias("r1")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("hi"), F.col("n_nationkey").alias("k2"), F.col("n_regionkey").alias("r2")
    )
    return n1.join(n2, (n1.k1 < n2.k2) & (n1.r1 == n2.r2)).select("lo", "hi")


@register(
    "join_null_safe_eq",
    oracle="""
    SELECT a.c_custkey AS ck1, b.c_custkey AS ck2
    FROM (SELECT c_custkey, NULLIF(c_nationkey % 7, 3) AS g FROM customer WHERE c_custkey < 60) a
    JOIN (SELECT c_custkey, NULLIF(c_nationkey % 7, 3) AS g FROM customer WHERE c_custkey < 60) b
      ON a.g IS NOT DISTINCT FROM b.g AND a.c_custkey < b.c_custkey
    """,
    tags=("join", "null-safe"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-equals-null equi join (reference HashJoinExec
    null_equals_null flag): Spark's <=> operator, still hash-joinable."""
    base = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 60)
        .select("c_custkey", F.nullif(F.col("c_nationkey") % 7, F.lit(3)).alias("g"))
    )
    a = base.alias("a")
    b = base.alias("b")
    return a.join(
        b, (F.col("a.g").eqNullSafe(F.col("b.g"))) & (F.col("a.c_custkey") < F.col("b.c_custkey"))
    ).select(F.col("a.c_custkey").alias("ck1"), F.col("b.c_custkey").alias("ck2"))


@register(
    "join_range_events",
    oracle="""
    SELECT e1.event_id AS base_id, COUNT(e2.event_id) AS n_follow
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
    WHERE e1.event_type = 'signup'
    GROUP BY e1.event_id
    """,
    tags=("join", "range", "symmetric-hash"),
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (reference SymmetricHashJoinExec semantics on bounded
    data, joins/symmetric_hash_join.rs:87-104): equi key + time interval.
    At scale the equi conjunct drives the shuffle; the range is a residual
    predicate — no cartesian blowup."""
    e = table(spark, sf_dir, "events")
    e1 = e.where(F.col("event_type") == "signup").alias("e1")
    e2 = e.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 10 MINUTE"))
    )
    return (
        e1.join(e2, cond)
        .groupBy(F.col("e1.event_id").alias("base_id"))
        .agg(F.count(F.col("e2.event_id")).alias("n_follow"))
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n_name, COUNT(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of constant-size dims (reference CollectLeft
    mode, joins/mod.rs:50-58): no shuffle of the fact side for the dim
    join even at 100 TB."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE")))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


# Existence/mark-join analog: EXISTS inside OR cannot be planned as a plain
# semi join — the reference decorrelates it to a Mark join
# (common/src/join_type.rs LeftMark); Catalyst's ExistenceJoin does the same.
register_sql(
    "join_exists_in_or",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > 9500.0
       OR EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    """,
    tags=("join", "mark", "exists", "subquery"),
)

# r13 review: the old IN branch (l_quantity = 50 alone) matched every
# supplier at every SF, so the OR excluded zero rows and the mark-join
# shape never discriminated.  The three-conjunct probe splits the
# branch matrix (bal&in / bal-only / in-only / neither) to
# (1,0,8,1) at sf0.001, (9,6,50,35) at sf0.01, (114,55,539,292) at
# sf0.1 — probed; the exclusion branch is populated everywhere.
register_sql(
    "join_in_or_subquery",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_acctbal < 1000.0
       OR s_suppkey IN (SELECT l_suppkey FROM lineitem
                        WHERE l_quantity = 50 AND l_discount >= 0.08
                          AND l_returnflag = 'R')
    """,
    tags=("join", "mark", "in-subquery"),
)


# --- salted skew join (manual hot-key mitigation) ---------------------------
register_sql(
    "join_salted_skew",
    """
    WITH dim AS (
      SELECT * FROM VALUES ('click', 'engagement'), ('view', 'engagement'),
                           ('purchase', 'conversion'), ('signup', 'conversion'),
                           ('error', 'fault') AS t(event_type, category)),
    salted_dim AS (
      SELECT event_type, category, s
      FROM dim LATERAL VIEW explode(sequence(0, 7)) st AS s),
    f AS (
      -- coalesce BEFORE the salt (r13 review + micro pin): a NULL
      -- event_id salted to pmod(NULL,8)=NULL and the salted equi-join
      -- silently DROPPED the row while the unsalted oracle kept it —
      -- the salt value is arbitrary, so any non-null constant is a
      -- correct bucket for the NULL ids
      SELECT event_type, value, pmod(coalesce(event_id, 0), 8) AS s
      FROM events)
    SELECT sd.category,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(f.value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM f JOIN salted_dim sd
      ON f.event_type = sd.event_type AND f.s = sd.s
    GROUP BY sd.category
    """,
    oracle="""
    WITH dim(event_type, category) AS (
      VALUES ('click', 'engagement'), ('view', 'engagement'),
             ('purchase', 'conversion'), ('signup', 'conversion'),
             ('error', 'fault'))
    SELECT dim.category,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events e JOIN dim ON e.event_type = dim.event_type
    GROUP BY dim.category
    """,
    tags=("join", "skew", "salting"),
)
# Salting pattern: a hot join key (every fact row shares 5 event_types)
# is split into 8 sub-keys by salting the fact side with pmod(id, 8) and
# replicating the dim side 8x — the join's shuffle then spreads each hot
# key over 8 reducers instead of 1. The oracle is the UNSALTED join:
# identical results prove the rewrite is semantics-preserving. (AQE's
# skewedJoin does this automatically for shuffle joins; the manual form
# is the one that works for any join type and pre-AQE engines.)


# --- SQL hint surface: /*+ BROADCAST(dim) */ --------------------------------
register_sql(
    "join_hint_broadcast_sql",
    """
    SELECT /*+ BROADCAST(n) */
           n.n_name,
           COUNT(*) AS suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "hint", "broadcast"),
)
