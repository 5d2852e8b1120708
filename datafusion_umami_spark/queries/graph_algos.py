"""Graph-algorithm queries: PageRank over the customer-supplier
purchase graph.

Companion to the connected-components clustering in queries/dedup.py —
together they cover the two iterative-graph shapes a training-data
pipeline actually runs (dedup clustering, importance/centrality
weighting for source selection).  The DuckDB oracle unrolls the fixed
iteration count as chained CTEs (no WITH RECURSIVE aggregation, which
ANSI forbids), exercising exactly the same integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register
from datafusion_umami_spark.tables import table

_ITER = 4


def _oracle_pagerank() -> str:
    parts = [
        """
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst
          FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY src),
    p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)"""
    ]
    for k in range(1, _ITER + 1):
        parts.append(f""",
    c{k} AS (
      SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS mass
      FROM e JOIN p{k - 1} p ON e.src = p.node
             JOIN deg d ON e.src = d.node
      GROUP BY e.dst),
    p{k} AS (
      SELECT n.node,
             CAST(150000 + (850000 * COALESCE(c.mass, 0)) // 1000000
                  AS BIGINT) AS pr
      FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
    parts.append(f"""
    SELECT node, pr FROM p{_ITER} ORDER BY pr DESC, node LIMIT 50""")
    return "".join(parts)


@register(
    "graph_pagerank_purchases",
    oracle=_oracle_pagerank(),
    tags=("graph", "pagerank", "iterative", "llm-pipeline"),
)
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the bipartite customer↔supplier purchase graph
    (customers and suppliers mapped to disjoint even/odd node ids,
    edges made bidirectional so no node dangles), 4 fixed iterations
    of exact micro-unit integer arithmetic — see operators/pagerank.py.
    Top-50 nodes by rank; ties break on node id."""
    from datafusion_umami_spark.operators.pagerank import pagerank

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    bidir = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(bidir, iterations=_ITER)
    return (
        pr.select(F.col("node").cast("long"), F.col("pr").cast("long"))
        .orderBy(F.desc("pr"), "node")
        .limit(50)
    )
