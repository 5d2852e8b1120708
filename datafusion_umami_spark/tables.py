"""Table catalog for the driver's star schema (FIXTURES.md).

Equivalent of the reference's `ListingTable` + catalog registration
(reference `datafusion/core/src/datasource/listing/table.rs:922`,
`catalog/src/memory/table.rs:58`): `spark.read.parquet` already gives us
partition discovery, projection/predicate pushdown, and vectorized scans.

At 100 TB each table would be a partitioned directory (or an external
catalog table); the loader only needs the root path to change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcastable (well under the 64 MiB
# threshold even at SF100; nation/region are constant-size in TPC-H).
BROADCAST_TABLES = frozenset({"region", "nation"})


def normalize_events_ts(df: DataFrame, target: str = "timestamp_ntz") -> DataFrame:
    """Normalize the events ts column to `target` regardless of its
    on-disk encoding, which varies by generator version: parquet
    timestamp[ns] (surfaced as LongType via nanosAsLong — truncate to µs
    with integer division; double division would lose precision,
    epoch-ns ~1.7e18 > 2^53) or native timestamp[us].  Batch uses
    TIMESTAMP_NTZ (matches DuckDB's naive timestamps; session TZ pinned
    UTC ⇒ identical wall-clock); streaming uses TIMESTAMP because
    withWatermark rejects NTZ event time.

    KNOWN ASYMMETRY (r12 windows.py review): this truncation happens on
    the SPARK side only — the DuckDB oracle (local mirror AND the
    driver's view registration) reads the raw parquet, so under the
    ns-as-long generator variant a ts with NONZERO sub-µs components
    would be µs-truncated here but ns-precise there, flipping
    RANGE-frame membership / LAG peers at exact-µs boundaries.  Every
    generator version observed so far emits zero sub-µs components
    (probed r12: current fixtures are native-µs; the historical ns
    encoding was µs-grained values stored as ns), so the divergence set
    is empty in practice; if a future generator emits true sub-µs
    ticks, the oracle texts of the ts-ordered specs need a matching
    epoch-µs truncation (date_trunc cannot express it in DuckDB —
    use make_timestamp(epoch_us(ts)))."""
    from pyspark.sql import functions as F

    if dict(df.dtypes)["ts"] == "bigint":
        return df.withColumn(
            "ts", F.expr("timestamp_micros(ts DIV 1000)").cast(target)
        )
    return df.withColumn("ts", F.col("ts").cast(target))


# Parquet footer-schema cache (r14 guide §1/§6: driver-side fixed cost).
# `spark.read.parquet(path)` pays ~90-110ms of footer/schema inference per
# call on this host; `spark.read.schema(s).parquet(path)` pays ~10ms.  The
# cache holds only STRUCTTYPE METADATA — never data or results — keyed on
# (realpath, mtime_ns, size, relevant confs), so any rewrite of the file
# invalidates the entry and every query still computes from the parquet
# bytes.  Single-file fixtures only: directory tables (the 100 TB layout)
# skip the cache because a directory's stat does not witness its leaves.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _cached_schema(spark: SparkSession, path: str, conf_key: tuple = ()):
    """Inferred parquet schema for a single-file `path`, memoized on the
    file's identity; None when `path` is not a plain file (caller should
    fall back to normal inference)."""
    import os
    import stat as statmod

    try:
        st = os.stat(path)
    except OSError:
        return None
    if not statmod.S_ISREG(st.st_mode):
        return None
    key = (os.path.realpath(path), st.st_mtime_ns, st.st_size) + conf_key
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = sch
    return sch


def events_ts_is_ns(spark: SparkSession, sf_dir: str) -> bool:
    """True when events.parquet stores ts as timestamp[ns] (read back as
    LongType under nanosAsLong) rather than native timestamp[us]."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = _cached_schema(
        spark, f"{sf_dir}/events.parquet", ("nanosAsLong=true",)
    )
    if sch is None:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return dict(df.dtypes)["ts"] == "bigint"
    return any(
        f.name == "ts" and f.dataType.typeName() == "long" for f in sch.fields
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table as a lazy DataFrame scan."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    conf_key: tuple = ()
    if name == "events":
        # Runtime-set (not only in the session factory) so the loader also
        # works under a driver-owned SparkSession we didn't configure.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        conf_key = ("nanosAsLong=true",)
    path = f"{sf_dir}/{name}.parquet"
    sch = _cached_schema(spark, path, conf_key)
    reader = spark.read.schema(sch) if sch is not None else spark.read
    df = reader.parquet(path)
    if name == "events":
        df = normalize_events_ts(df, "timestamp_ntz")
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table; returns {name: DataFrame}."""
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so `spark.sql` queries resolve.

    Mirrors the reference's `SessionContext::register_parquet` flow; views
    are lazy — no data is read until a query over them executes.
    """
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
