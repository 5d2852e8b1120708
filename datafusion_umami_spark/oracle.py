"""DuckDB oracle harness — local mirror of the driver's correctness gate.

The driver runs each `queries()[name]` on Spark and `oracle_sql()[name]`
on DuckDB over the same parquet files, then compares row count + schema +
an order-insensitive value hash.  This module reproduces that comparison
so `pytest` catches mismatches before the driver does.

Mirrors the reference's test strategy of cross-checking against an
independent engine (its sqllogictest postgres engine,
reference `datafusion/sqllogictest/src/engines/mod.rs:32-36`).
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from datafusion_umami_spark.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v: object) -> str:
    """Canonical string for one cell (order-insensitive hash input)."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # repr is exact for float64; -0.0 normalized
        return repr(v + 0.0) if v == 0 else repr(v)
    if v is pd.NaT:  # NaT subclasses datetime — must be caught first
        return "<null>"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        # promote to midnight so arrow date32 compares equal whether pandas
        # surfaced it as datetime.date (Spark) or Timestamp (DuckDB .df())
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_value(x.item() if hasattr(x, "item") else x) for x in v) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (np.integer, np.floating, np.bool_)):
        return _canon_value(v.item())
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(x)}" for k, x in sorted(v.items())) + "}"
    try:
        if pd.isna(v):  # covers pd.NaT, pd.NA, np.nan-in-object
            return "<null>"
    except (TypeError, ValueError):
        pass
    return repr(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, each row canonicalized, rows sorted."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    return rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> CompareResult:
    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    d_cols = sorted(c.lower() for c in duck_pdf.columns)
    if s_cols != d_cols:
        return CompareResult(name, False, f"column mismatch: spark={s_cols} duck={d_cols}")
    if len(spark_pdf) != len(duck_pdf):
        return CompareResult(
            name, False, f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
        )
    spark_pdf = spark_pdf.rename(columns=str.lower)
    duck_pdf = duck_pdf.rename(columns=str.lower)
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        return CompareResult(name, False, f"value mismatch; first diffs: {diffs}")
    return CompareResult(name, True)
