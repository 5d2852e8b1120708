"""AS-OF join: for each left row, the latest right row with the same key
and right.time <= left.time.

The reference has NO dedicated as-of join (SURVEY.md §2.3 — its nearest
construct is SymmetricHashJoinExec's range pruning); training-data and
event pipelines need one constantly (enrich an event with the most
recent prior dimension state).  Spark-first implementation uses the
union-and-carry-forward pattern:

  1. tag right rows (0) and left rows (1), union by shared schema;
  2. single shuffle: partition by key, order by (time, tag);
  3. `last_value(right_payload) IGNORE NULLS` over the running window
     carries the most recent right payload forward onto each left row.

One shuffle total, no range explosion, no skew amplification from
near-duplicate timestamps — strictly better at scale than the naive
range-join + row_number plan (which shuffles twice and can blow up on
wide time ranges).  DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
) -> DataFrame:
    """Left as-of join; output = left columns + right_payload columns
    (null when no right row precedes the left row for that key)."""
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rp_{c}") for c in right_payload],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        *[
            F.last(f"_rp_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_asof_{c}").alias(c) for c in right_payload],
    )
