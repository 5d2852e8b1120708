"""The local mirror of the driver's t2 correctness gate: run every
registered query on Spark AND its oracle SQL on DuckDB over the same
parquet, compare row count + columns + order-insensitive canonical rows.

Mirrors the reference's sqllogictest cross-engine checking
(reference datafusion/sqllogictest/src/engines/mod.rs:32-36).
"""

from __future__ import annotations

import pytest

from datafusion_umami_spark.oracle import compare_frames
from datafusion_umami_spark.registry import REGISTRY, _load_all

_load_all()
ALL = sorted(REGISTRY)
WITH_ORACLE = [n for n in ALL if REGISTRY[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if REGISTRY[n].oracle is None]


# Driver-sweep cost guard (CLAUDE.md): outputs stay small via a
# total-order ORDER BY + LIMIT on both sides.  sf0.001 here → the cap
# scales ~10× at the driver's sf0.01, still cheap to canonicalize.
MAX_OUTPUT_ROWS = 5000


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    res = compare_frames(name, spark_pdf, duck_pdf)
    assert res.ok, res.detail
    assert len(spark_pdf) <= MAX_OUTPUT_ROWS, (
        f"{name} returns {len(spark_pdf)} rows at sf0.001 — cap it with a "
        "total-order ORDER BY + LIMIT on both sides (driver-cost rule)"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0  # runs end-to-end with a stable schema
    assert len(df.schema.fields) > 0
