"""AS-OF join: for each left row, the latest right row with the same key
and right.time <= left.time.

The reference has NO dedicated as-of join (SURVEY.md §2.3 — its nearest
construct is SymmetricHashJoinExec's range pruning); training-data and
event pipelines need one constantly (enrich an event with the most
recent prior dimension state).  Spark-first implementation uses the
union-and-carry-forward pattern:

  1. tag right rows (0) and left rows (1), union by shared schema;
  2. single shuffle: partition by key, order by (time, tag);
  3. `last_value(struct(right_payload...)) IGNORE NULLS` over the
     running window carries the most recent right ROW forward onto each
     left row.

The carried value is a single STRUCT of all payload columns (non-null
exactly for right rows), not per-column last(): per-column carry would
skip a matched right row's NULL payload field and splice in a stale
value from an older row — the struct guarantees every output payload
column comes from the same matched right row and NULL fields survive.

Precondition: (key, time) pairs should be unique on the right side —
with duplicates, "the" latest right row is ambiguous (every SQL engine's
ASOF join shares this caveat). Pass validate_unique=True to assert it.

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
    validate_unique: bool = False,
) -> DataFrame:
    """Left as-of join; output = left columns + right_payload columns
    (null when no right row precedes the left row for that key).

    validate_unique=True runs an extra aggregation job asserting the
    right side has no duplicate (key, time) pair before joining.
    """
    if validate_unique:
        dup = (
            right.groupBy(on, right_time)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"asof_join: right side has duplicate ({on}, {right_time}) "
                f"pair {dup[0][0]!r}/{dup[0][1]!r} — latest-row is ambiguous"
            )
    lcols = left.columns
    from pyspark.sql.types import StructField, StructType

    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_payload]
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_type).alias("_rp"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("_rp"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*", F.last("_rp", ignorenulls=True).over(w).alias("_asof")
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        # getField: access by literal field name, so payload columns
        # containing dots/backticks resolve correctly (no path parsing)
        *[F.col("_asof").getField(c).alias(c) for c in right_payload],
    )
