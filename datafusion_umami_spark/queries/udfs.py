"""User-defined function surface: scalar / aggregate / window UDFs,
SQL-registered functions, grouped-map transforms.

Covers SURVEY.md §2.10's UDF row — the reference's `ScalarUDFImpl`
(datafusion/expr/src/udf.rs:413), `AggregateUDFImpl` (udaf.rs:428),
`WindowUDFImpl` (udwf.rs:306) and `TableFunctionImpl`
(catalog/src/table.rs:317) — re-expressed as Spark's UDF tiers:

- Arrow-batched `pandas_udf` (scalar)            ≈ ScalarUDFImpl
- `pandas_udf(..., GROUPED_AGG)` in groupBy      ≈ AggregateUDFImpl
- the same GROUPED_AGG udf `.over(Window...)`    ≈ WindowUDFImpl
- `spark.udf.register` + use inside `spark.sql`  ≈ SQL function registry
- `applyInPandas` grouped-map                    ≈ arbitrary per-group op

Each query keeps the UDF's math EXACT (integer or string outputs) so the
DuckDB oracle hash-matches — proving the UDF plumbing, not approximating
it.  Scale notes: every UDF here is Arrow-batched (10-100× over
row-at-a-time Python, per the PySpark guide); the one deliberately
row-at-a-time function (`udf_sql_registered`) runs on a 25-row dimension
table — the registration surface is the point, not the hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from datafusion_umami_spark.registry import register
from datafusion_umami_spark.tables import table


def _round_half_away(s: "pd.Series") -> "pd.Series":
    """SQL-round semantics (half away from zero) for pandas/numpy data:
    pandas .round() is banker's (half-to-even), which diverges from the
    DuckDB oracle's round() exactly on representable .5 boundaries —
    the ADVICE-class bug that only surfaces at sf>=0.01."""
    import numpy as np

    return np.sign(s) * np.floor(np.abs(s) + 0.5)



# --- scalar pandas UDF (Arrow-batched) --------------------------------------
@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split_regex(trim(p_name), '\\s+')) AS BIGINT) AS n_tokens,
           upper(substr(p_type, 1, 1)) AS type_initial
    FROM part
    WHERE p_partkey < 500 AND length(trim(p_name)) > 0
    """,
    tags=("udf", "pandas-udf", "scalar", "arrow"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(LongType())
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.split().str.len().astype("int64")

    @F.pandas_udf(StringType())
    def initial_upper(s: pd.Series) -> pd.Series:
        return s.str[:1].str.upper()

    p = table(spark, sf_dir, "part")
    return (
        p.filter((F.col("p_partkey") < 500) & (F.length(F.trim("p_name")) > 0))
        .select(
            "p_partkey",
            n_tokens(F.trim("p_name")).alias("n_tokens"),
            initial_upper("p_type").alias("type_initial"),
        )
    )


# --- aggregate pandas UDF (GROUPED_AGG) -------------------------------------
@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
           CAST(MAX(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "udaf", "pandas-udf", "grouped-agg"),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate: exact integer-cents sum — the arithmetic is done
    inside the UDF so the partial/final merge (Spark splits GROUPED_AGG
    per partition then combines) is exercised with hash-exact output."""

    @F.pandas_udf(LongType())
    def cents_sum(p: pd.Series) -> int:
        return int(_round_half_away(p.mul(100)).astype("int64").sum())

    @F.pandas_udf(LongType())
    def round_max(p: pd.Series) -> int:
        return int(_round_half_away(p).astype("int64").max())

    li = table(spark, sf_dir, "lineitem")
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() — both metrics are pandas UDFs.
    return li.groupBy("l_returnflag").agg(
        cents_sum("l_extendedprice").alias("price_cents"),
        round_max("l_quantity").alias("max_qty"),
    )


# --- the same GROUPED_AGG UDF as a WINDOW function --------------------------
@register(
    "udf_pandas_window_agg",
    oracle="""
    SELECT n_nationkey, n_name,
           CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT))
             OVER (PARTITION BY s_nationkey) AS BIGINT) AS nation_bal_cents
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey <= 60
    QUALIFY row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) = 1
    """,
    tags=("udf", "udwf", "pandas-udf", "window"),
)
def udf_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF evaluated `.over(Window.partitionBy(...))` —
    Spark's route to the reference's WindowUDFImpl (udwf.rs:306)."""

    @F.pandas_udf(LongType())
    def cents_sum(p: pd.Series) -> int:
        return int(_round_half_away(p.mul(100)).astype("int64").sum())

    s = table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 60)
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    wn = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "n_nationkey",
            "n_name",
            "s_suppkey",
            cents_sum("s_acctbal").over(w).alias("nation_bal_cents"),
            F.row_number().over(wn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "s_suppkey")
    )


# --- SQL-registered UDF used from spark.sql ---------------------------------
@register(
    "udf_sql_registered",
    oracle="""
    SELECT r_regionkey,
           substr(r_name, 1, 2) || '-' || CAST(length(r_name) AS VARCHAR) AS region_code
    FROM region
    """,
    tags=("udf", "sql-registration"),
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`spark.udf.register` + use in SQL text — the function-registry
    surface (reference registers UDFs into the SessionContext the same
    way). Row-at-a-time Python on a 5-row table; the registration path
    is what's under test."""

    def region_code(name: str) -> str:
        return f"{name[:2]}-{len(name)}"

    spark.udf.register("region_code", region_code, StringType())
    table(spark, sf_dir, "region").createOrReplaceTempView("_region_udf")
    return spark.sql(
        "SELECT r_regionkey, region_code(r_name) AS region_code FROM _region_udf"
    )


# --- grouped-map applyInPandas ----------------------------------------------
@register(
    "udf_grouped_map_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders WHERE o_custkey <= 200
    ) WHERE rnk <= 2
    """,
    tags=("udf", "grouped-map", "applyInPandas"),
)
def udf_grouped_map_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via `applyInPandas` — the escape hatch for operators
    Spark lacks (the pattern the dedup/ANN modules build on).  Shuffles
    once on the grouping key; each group is a pandas frame in one task."""

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(2)
        pdf["rnk"] = range(1, len(pdf) + 1)
        return pdf[["o_custkey", "o_orderkey", "rnk"]]

    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    return o.groupBy("o_custkey").applyInPandas(
        top2, "o_custkey bigint, o_orderkey bigint, rnk int"
    )


# --- raw Arrow batches: mapInArrow ------------------------------------------
@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT o_custkey % 10 AS bucket,
           CAST(SUM(CAST(round(o_totalprice * 2 * 100) AS BIGINT)) AS BIGINT)
             AS doubled_cents,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey % 10
    """,
    tags=("udf", "map-in-arrow", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow`: the lowest-overhead Python hook — RecordBatch in,
    RecordBatch out, no pandas materialization at all (pyarrow.compute
    kernels are C++). The right tier when the Python logic is itself
    expressible as Arrow compute; per-value work here is a vectorized
    multiply + round, so nothing is row-at-a-time anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def double_price(batches):
        for batch in batches:
            cents = pc.cast(
                pc.round(
                    pc.multiply(batch.column("o_totalprice"), 200.0),
                    # SQL half-away-from-zero; pyarrow defaults to
                    # half_to_even (banker's), diverging from the oracle
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("o_custkey"), cents],
                ["o_custkey", "doubled_cents"],
            )

    mapped = o.mapInArrow(double_price, "o_custkey long, doubled_cents long")
    return mapped.groupBy((F.col("o_custkey") % 10).alias("bucket")).agg(
        F.sum("doubled_cents").alias("doubled_cents"),
        F.count("*").alias("n"),
    )


# --- cogrouped applyInPandas ------------------------------------------------
@register(
    "udf_cogroup_merge",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS cents,
           MIN(c.c_mktsegment) AS segment
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey < 150
    GROUP BY c.c_custkey
    """,
    tags=("udf", "cogroup", "applyInPandas"),
)
def udf_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().cogroup().applyInPandas`: both sides shuffle on the key
    once, then each (customer-group, orders-group) pair meets in a
    single pandas call — the escape hatch for custom keyed merges (the
    API the reference has no analog for; SURVEY §3.2 DataFrame surface).
    Semantics here mirror a LEFT JOIN + aggregate so DuckDB can oracle
    the result exactly."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150).select(
        "c_custkey", "c_mktsegment"
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150).select(
        "o_custkey", "o_totalprice"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "cents", "segment"]
            )
        cents = int(_round_half_away(right["o_totalprice"] * 100).sum()) if len(right) else 0
        return pd.DataFrame(
            {
                "c_custkey": [int(left["c_custkey"].iloc[0])],
                "n_orders": [len(right)],
                "cents": [cents],
                "segment": [left["c_mktsegment"].min()],
            }
        )

    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            merge, "c_custkey bigint, n_orders bigint, cents bigint, segment string"
        )
    )


# --- iterator-of-batches scalar UDF (amortized per-partition init) ---------
@register(
    "udf_scalar_iter_amortized",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                AS BIGINT) AS n_bpe_ish,
           CAST(1 AS BIGINT) AS init_count
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    tags=("udf", "pandas-udf", "scalar-iter", "arrow"),
)
def udf_scalar_iter_amortized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF: the init block runs ONCE per
    partition/executor, then streams Arrow batches through — the
    pattern for loading a tokenizer/model once instead of per batch
    (the decisive shape for LLM pipelines at 1000 executors; a per-call
    load would dominate runtime).  init_count proves the amortization:
    it is 1 for every row because the "expensive" init happened once
    per partition, not once per batch.  Math stays exact (regex token
    count) so DuckDB hash-matches."""
    import re

    @F.pandas_udf("n_bpe_ish long, init_count long")
    def tokenize_iter(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # amortized init: the "expensive" load goes through a counting
        # gate, so if a refactor ever moves it inside the batch loop the
        # counter exceeds 1, rows disagree with the oracle's constant 1,
        # and the regression fails the gate instead of shipping silently
        state = {"inits": 0}

        def expensive_init():
            state["inits"] += 1
            # Explicit whitespace class matching RE2's \s EXACTLY
            # ([\t\n\f\r ] — no \v, no Unicode): Python's default \s is
            # Unicode-aware and even re.ASCII \s still includes \v,
            # either of which would diverge the token count from the
            # DuckDB oracle on NBSP / vertical-tab bytes.
            return re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\t\n\f\r ]")

        pattern = expensive_init()
        for s in batches:
            yield pd.DataFrame(
                {
                    "n_bpe_ish": s.map(lambda t: len(pattern.findall(t))).astype(
                        "int64"
                    ),
                    "init_count": state["inits"],
                }
            )

    d = table(spark, sf_dir, "documents")
    out = (
        d.filter(F.col("doc_id") < 200)
        .select("doc_id", tokenize_iter(F.col("text")).alias("r"))
        .select(
            "doc_id",
            F.col("r.n_bpe_ish").alias("n_bpe_ish"),
            F.col("r.init_count").alias("init_count"),
        )
        .orderBy("doc_id")
    )
    return out
