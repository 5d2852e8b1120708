"""date_bin: fixed-stride timestamp bucketing.

Reference: `date_bin(stride, ts, origin)` scalar function
(reference datafusion/functions/src/datetime/date_bin.rs) — the
tumbling-window primitive (SURVEY.md §2.11).

Spark-first implementation: pure column arithmetic on epoch microseconds
(all JVM-side, codegen-friendly, no UDF):

    bin(ts) = origin + floor((ts - origin) / stride) * stride

`F.window(ts, w)` covers the origin-aligned tumbling case too; this
helper exists for arbitrary origins and exact integer semantics shared
with the DuckDB oracle twin (make_timestamp/epoch_us arithmetic).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_bin(ts: Column | str, stride_seconds: int, origin: str = "1970-01-01 00:00:00") -> Column:
    """Bucket `ts` into fixed `stride_seconds` windows anchored at `origin`.

    Returns the bucket start as TIMESTAMP_NTZ. Integer µs arithmetic —
    exact, deterministic, and identical to the oracle twin
    `make_timestamp(o + (epoch_us(ts) - o) // s * s)`.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    # unix_micros requires TIMESTAMP (LTZ); events ts is TIMESTAMP_NTZ.
    # Session TZ is pinned UTC, so the cast is wall-clock exact.
    c = c.cast("timestamp")
    origin_dt = datetime.datetime.fromisoformat(origin)
    origin_us = int(origin_dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    stride_us = stride_seconds * 1_000_000
    delta = F.unix_micros(c) - F.lit(origin_us)
    # floor-division semantics for ts >= origin (our domain); DIV on longs
    binned = F.lit(origin_us) + (delta - (delta % F.lit(stride_us)))
    return F.timestamp_micros(binned).cast("timestamp_ntz")


def date_bin_oracle_sql(ts_expr: str, stride_seconds: int, origin: str = "1970-01-01 00:00:00") -> str:
    """DuckDB twin of `date_bin` (same integer arithmetic)."""
    origin_dt = datetime.datetime.fromisoformat(origin)
    origin_us = int(origin_dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    stride_us = stride_seconds * 1_000_000
    d = f"(epoch_us({ts_expr}) - {origin_us})"
    return f"make_timestamp({origin_us} + ({d} - ({d} % {stride_us})))"
