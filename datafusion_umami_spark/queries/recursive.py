"""Recursive CTE queries (WITH RECURSIVE parity).

The reference executes recursive CTEs natively (RecursiveQueryExec +
WorkTableExec, reference datafusion/physical-plan/src/recursive_query.rs:58,
work_table.rs:99); Spark SQL has no WITH RECURSIVE, so these run through
`operators.recursive.recursive_cte` — a driver-side fixpoint loop whose
per-iteration step is a plain Catalyst-optimized DataFrame.  DuckDB's
native WITH RECURSIVE is the oracle, making this the strongest possible
check that loop semantics (work-table delta, UNION vs UNION ALL
termination) match a real SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.operators.recursive import recursive_cte
from datafusion_umami_spark.registry import register
from datafusion_umami_spark.tables import table


# --- UNION ALL recursion: computed sequence (bounded by predicate) ---------
@register(
    "recursive_fibonacci",
    oracle="""
    WITH RECURSIVE fib(i, a, b) AS (
      SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT i + 1, b, a + b FROM fib WHERE i < 24
    )
    SELECT i, a AS fib FROM fib
    """,
    tags=("recursive-cte", "union-all"),
)
def recursive_fibonacci(spark: SparkSession, sf_dir: str) -> DataFrame:
    seed = spark.createDataFrame([(1, 0, 1)], "i int, a bigint, b bigint")

    def step(d: DataFrame) -> DataFrame:
        return d.filter(F.col("i") < 24).select(
            (F.col("i") + 1).alias("i"),
            F.col("b").alias("a"),
            (F.col("a") + F.col("b")).alias("b"),
        )

    return recursive_cte(seed, step, distinct=False).select("i", F.col("a").alias("fib"))


# --- UNION ALL recursion over real tables: hierarchy depth -----------------
@register(
    "recursive_hierarchy_depth",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT 'N' || CAST(n_nationkey AS VARCHAR) AS node,
             'R' || CAST(n_regionkey AS VARCHAR) AS parent
      FROM nation
      UNION ALL
      SELECT 'S' || CAST(s_suppkey AS VARCHAR),
             'N' || CAST(s_nationkey AS VARCHAR)
      FROM supplier
    ),
    tree(node, depth) AS (
      SELECT 'R' || CAST(r_regionkey AS VARCHAR) AS node, 0 AS depth FROM region
      UNION ALL
      SELECT e.node, t.depth + 1 FROM tree t JOIN edges e ON e.parent = t.node
    )
    SELECT depth, COUNT(*) AS nodes, MIN(node) AS first_node
    FROM tree GROUP BY depth
    """,
    tags=("recursive-cte", "hierarchy", "graph"),
)
def recursive_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region ← nation ← supplier forest; recursion computes each node's
    depth.  The per-iteration join broadcasts the (small) delta against
    the edge list — at scale the edge list is the big side and stays
    shuffle-partitioned while the frontier broadcasts."""
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    region = table(spark, sf_dir, "region")

    edges = nation.select(
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("node"),
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("parent"),
    ).unionAll(
        supplier.select(
            F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("node"),
            F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("parent"),
        )
    )
    seed = region.select(
        F.concat(F.lit("R"), F.col("r_regionkey").cast("string")).alias("node"),
        F.lit(0).alias("depth"),
    )

    def step(d: DataFrame) -> DataFrame:
        frontier = F.broadcast(d.select(F.col("node").alias("parent_node"), "depth"))
        return edges.join(frontier, edges.parent == F.col("parent_node")).select(
            edges.node, (F.col("depth") + 1).alias("depth")
        )

    tree = recursive_cte(seed, step, distinct=False)
    return tree.groupBy("depth").agg(
        F.count("*").alias("nodes"), F.min("node").alias("first_node")
    )


# --- UNION (distinct) recursion: reachability in a CYCLIC graph ------------
@register(
    "recursive_cyclic_reachability",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT n_nationkey AS src, (n_nationkey * 2 + 1) % 25 AS dst FROM nation
      UNION ALL
      SELECT n_nationkey, (n_nationkey + 7) % 25 FROM nation
    ),
    reach(node) AS (
      SELECT CAST(0 AS BIGINT) AS node
      UNION
      SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT COUNT(*) AS reachable, CAST(SUM(node) AS BIGINT) AS node_sum
    FROM reach
    """,
    tags=("recursive-cte", "union-distinct", "cycle", "graph"),
)
def recursive_cyclic_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over a graph WITH CYCLES: UNION-distinct
    semantics (dedup against all seen rows) is what guarantees
    termination — the direct analog of the reference's recursive CTE
    distinct mode."""
    nation = table(spark, sf_dir, "nation")
    edges = nation.select(
        F.col("n_nationkey").alias("src"),
        ((F.col("n_nationkey") * 2 + 1) % 25).alias("dst"),
    ).unionAll(
        nation.select(
            F.col("n_nationkey").alias("src"),
            ((F.col("n_nationkey") + 7) % 25).alias("dst"),
        )
    )
    seed = nation.sparkSession.createDataFrame([(0,)], "node bigint")

    def step(d: DataFrame) -> DataFrame:
        return edges.join(
            F.broadcast(d.withColumnRenamed("node", "cur")), edges.src == F.col("cur")
        ).select(F.col("dst").alias("node"))

    reach = recursive_cte(seed, step, distinct=True)
    return reach.agg(
        F.count("*").alias("reachable"),
        F.sum("node").cast("bigint").alias("node_sum"),
    )
