"""PageRank over a DataFrame edge list with EXACT integer arithmetic.

The reference engine's only iterative surface is WITH RECURSIVE
(reference datafusion/physical-plan/src/recursive_query.rs:58); it has
no fixed-point graph operator.  This implements the standard public
PageRank iteration (Page/Brin/Motwani/Winograd, Stanford tech report
1999) as a driver-side loop of two DataFrame passes per iteration —
the same loop architecture as operators/connected_components.py, with
the same checkpoint hygiene.

Determinism contract: ranks are micro-units (node mass starts at
1_000_000) and every update is integer arithmetic only —
`pr DIV outdeg` contributions and `(850_000 * mass) DIV 1_000_000`
damping (the product accumulated in DECIMAL(38,0) so hub mass on
billion-node graphs cannot overflow BIGINT under ANSI mode) — so the
result is bit-identical regardless of partitioning,
merge order, or engine (integer truncating division is associative-
safe here because each quotient is computed from fully-aggregated
BIGINT sums; no float ever appears).  Truncation loses a few micro-
units of total mass per round, identically on every engine.

100 TB notes: per iteration one shuffle keyed (dst) for the
contribution aggregate and one broadcast-or-shuffle join back to the
node list — work is O(|E|) per round with a FIXED round count (no
convergence test ⇒ no driver-side collect at all).  Superseded
checkpoints are unpersisted each round (block-manager usage stays
O(|V|), not O(iterations × |V|)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_umami_spark.operators.connected_components import _free_checkpoint

MICRO = 1_000_000
DAMP_NUM = 850_000  # 0.85 in micro-units
TELEPORT = 150_000  # (1 - 0.85) in micro-units


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    stats: dict | None = None,
) -> DataFrame:
    """Integer-exact PageRank.  `edges`: columns (src, dst), directed —
    pass both directions for an undirected graph.  Every node must
    appear as a src (no dangling mass handling; feed bidirectional
    edges to guarantee it).  Returns (node, pr) with pr in micro-units.
    """
    e = edges.select(
        F.col(edges.columns[0]).cast("long").alias("src"),
        F.col(edges.columns[1]).cast("long").alias("dst"),
    ).distinct()
    e = e.localCheckpoint(eager=True)

    nodes = e.select(F.col("src").alias("node")).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    pr = nodes.withColumn("pr", F.lit(MICRO).cast("long"))
    pr_ck = pr.localCheckpoint(eager=True)
    pr = pr_ck.toDF(*pr_ck.columns)

    for i in range(iterations):
        contribs = (
            e.join(pr, e.src == pr.node)
            .join(deg, "src")
            .select("dst", F.expr("pr DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        nxt = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(TELEPORT)
                    # Damping product in DECIMAL(38,0): mass at a hub is
                    # bounded by total graph mass (|V| * 1e6), so the
                    # BIGINT product 850_000 * mass would overflow past
                    # ~1e7 nodes under ANSI.  DECIMAL keeps exactness to
                    # ~1e31; FLOOR == DIV for the nonnegative operands.
                    # (DuckDB side is already safe: SUM(BIGINT) yields
                    # HUGEINT there, so its product never overflows.)
                    + F.expr(
                        f"CAST(FLOOR((CAST({DAMP_NUM} AS DECIMAL(38,0))"
                        f" * coalesce(mass, 0L)) / {MICRO}) AS BIGINT)"
                    )
                ).cast("long").alias("pr"),
            )
        )
        nxt_ck = nxt.localCheckpoint(eager=True)
        _free_checkpoint(pr_ck)
        pr_ck = nxt_ck
        pr = pr_ck.toDF(*pr_ck.columns)

    if stats is not None:
        stats["iterations"] = iterations
    _free_checkpoint(e)
    return pr
