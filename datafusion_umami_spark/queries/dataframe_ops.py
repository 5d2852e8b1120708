"""DataFrame-API conveniences + pipeline sampling operators.

Covers the reference's DataFrame-only surface (SURVEY.md §3.2:
`fill_null` core/src/dataframe/mod.rs:2268, `drop_columns`,
`with_column:2021`) and adds the deterministic sampling operators a
training-data pipeline needs (hash-Bernoulli, stratified top-k) —
expressed so the SAME rows are chosen on any engine / partitioning
(`rand()`-based sampling can't be oracle-checked; hash-based can, and
at 100 TB deterministic sampling is also what you want for
reproducibility).

Portable hash convention (same as dedup.py): 60-bit prefix of md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

from datafusion_umami_spark.queries.hashing import DUCK_H64, SPARK_H64


# --- fill_null / dropna ------------------------------------------------------
@register(
    "df_fill_drop_null",
    oracle="""
    WITH holey AS (
      SELECT c_custkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg,
             CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer WHERE c_custkey < 400)
    SELECT c_custkey, COALESCE(seg, 'UNKNOWN') AS seg,
           CAST(COALESCE(bal, 0.0) AS DOUBLE) AS bal
    FROM holey
    WHERE NOT (seg IS NULL AND bal IS NULL)
    """,
    tags=("dataframe-api", "fill-null", "dropna"),
)
def df_fill_drop_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.na.fill / df.na.drop — the reference's DataFrame::fill_null
    (core/src/dataframe/mod.rs:2268)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    holey = c.select(
        "c_custkey",
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_custkey") % 5 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return (
        holey.na.drop(how="all", subset=["seg", "bal"])
        .na.fill({"seg": "UNKNOWN", "bal": 0.0})
        .select("c_custkey", "seg", F.col("bal").cast("double").alias("bal"))
    )


# --- deterministic hash-Bernoulli sample -------------------------------------
# built from the shared 60-bit hash pair (queries/hashing.py) — the
# r13 review found this was the third hand-copied instance of the
# convention; the .format() output is byte-identical to the old inline
# text, so the proven fingerprint is unchanged.  A NULL doc_id hashes
# to NULL and `NULL % 10 = 0` is NULL-false on both engines, so the
# bernoulli filter is null-safe as-is.
register_sql(
    "sample_hash_bernoulli",
    f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {SPARK_H64.format(s='CAST(doc_id AS STRING)')} % 10 = 0
    """,
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {DUCK_H64.format(s='CAST(doc_id AS VARCHAR)')} % 10 = 0
    """,
    tags=("sampling", "bernoulli", "llm-pipeline"),
)

# --- stratified sample: deterministic top-k per stratum ----------------------
# doc_id IS NOT NULL fence (r13 review): a NULL doc_id hashes to a
# NULL md5 key, and the engines place ORDER BY NULLs on OPPOSITE ends
# by default (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST) — a
# single null-id row would flip the selected top-5 of its stratum.
# Deterministic hash sampling of a row with no id is undefined anyway;
# the fence drops them identically on both engines.
register_sql(
    "sample_stratified_topk",
    """
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
      FROM documents
      WHERE doc_id IS NOT NULL
    ) WHERE rn <= 5
    """,
    oracle="""
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
      WHERE doc_id IS NOT NULL
    ) WHERE rn <= 5
    """,
    tags=("sampling", "stratified", "llm-pipeline"),
)


# --- multi-column unnest: arrays_zip + posexplode ----------------------------
@register(
    "unnest_multi_posexplode",
    oracle="""
    WITH src AS (
      SELECT n_nationkey,
             string_split(n_name, 'A') AS parts
      FROM nation WHERE n_nationkey < 10)
    SELECT n_nationkey,
           CAST(i - 1 AS INT) AS pos,
           parts[i] AS part,
           CAST(length(parts[i]) AS INT) AS part_len
    FROM src CROSS JOIN LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i) t
    """,
    tags=("unnest", "posexplode", "multi-column"),
)
def unnest_multi_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of zipped parallel arrays (reference UnnestExec
    multi-column mode, physical-plan/src/unnest.rs:60): position +
    value + derived column unnested in lockstep."""
    n = table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10)
    src = n.select(
        "n_nationkey",
        F.split("n_name", "A").alias("parts"),
    )
    named = src.select(
        "n_nationkey",
        "parts",
        F.transform("parts", lambda x: F.length(x)).alias("lens"),
    )
    zipped = named.select(
        "n_nationkey", F.arrays_zip("parts", "lens").alias("z")
    )
    return zipped.select(
        "n_nationkey", F.posexplode("z").alias("pos", "pv")
    ).select(
        "n_nationkey",
        "pos",
        F.col("pv.parts").alias("part"),
        F.col("pv.lens").alias("part_len"),
    )


# --- pivot: long -> wide conditional aggregation ---------------------------
@register(
    "pivot_wide_agg",
    oracle="""
    SELECT user_id % 10 AS ug,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_cents,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS error_cents,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS signup_cents,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_cents
    FROM events
    GROUP BY user_id % 10
    """,
    tags=("pivot", "wide", "dataframe-api"),
)
def pivot_wide_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().pivot(col, values).agg(...)` — long→wide reshaping with
    an EXPLICIT value list (no extra distinct-scan job, and a stable
    column set — the form that scales; an implicit pivot must first
    collect the distinct keys to the driver). Oracle is the equivalent
    conditional aggregation."""
    types = ["click", "error", "purchase", "signup", "view"]
    e = (
        table(spark, sf_dir, "events")
        .withColumn("ug", F.col("user_id") % 10)
        .withColumn("cents", F.round(F.col("value") * 100).cast("bigint"))
    )
    wide = e.groupBy("ug").pivot("event_type", types).agg(F.sum("cents"))
    return wide.select(
        "ug",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_cents") for t in types],
    )


# --- unpivot / melt: wide -> long -------------------------------------------
@register(
    "unpivot_melt",
    oracle="""
    SELECT l_returnflag, metric,
           CAST(SUM(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
    GROUP BY l_returnflag, metric
    """,
    tags=("unpivot", "melt", "dataframe-api"),
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.unpivot` (wide→long melt; SQL `stack()` equivalent), then
    re-aggregated so the oracle is a UNION ALL reshape over the same
    table. Pure map-side reshape — 3× the rows, zero extra shuffles
    beyond the final aggregation."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "v",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.sum(F.round(F.col("v") * 100).cast("bigint")).alias("cents")
    )


# --- range repartitioning (sort-based partitioner) --------------------------
@register(
    "repartition_by_range",
    oracle="""
    SELECT l_shipdate,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem
    WHERE l_shipdate >= DATE '1998-01-01'
    GROUP BY l_shipdate
    ORDER BY l_shipdate
    LIMIT 400
    """,
    tags=("repartition", "range-partitioning", "dataframe-api"),
)
def repartition_by_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartitionByRange: contiguous key ranges per partition (sampled
    range boundaries — the partitioner behind sorted/clustered layouts;
    at 100 TB this is how time-ordered data lands in time-contiguous
    files for pruning). Results must be partitioning-invariant; the
    oracle checks exactly that."""
    # boundary INSIDE the data range (r13 review: the fixtures span
    # 1995-01-02..2001-11-04, so the old 1995-01-01 filter matched every
    # row and the date-predicate path was never load-bearing)
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("date")
    )
    return (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .groupBy("l_shipdate")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cents"),
        )
        .orderBy("l_shipdate")
        .limit(400)
    )


# --- upsert via FULL OUTER JOIN (MERGE INTO without a table format) -------
# The reference rejects UPDATE/DELETE DML for listing tables
# (SCALE.md documented gap); the relational equivalent every warehouse
# runs instead is a full-outer-join merge: existing dimension rows
# COALESCE'd against a batch of per-key updates, new keys inserted,
# untouched keys passed through.  Keyed equi-join → one shuffle (or
# broadcast when the update batch is small, the common case).
register_sql(
    "merge_upsert_latest_wins",
    """
    WITH updates AS (
      SELECT user_id AS custkey,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS spend_c
      FROM events GROUP BY user_id),
    merged AS (
      SELECT COALESCE(c.c_custkey, u.custkey) AS custkey,
             CASE WHEN c.c_custkey IS NULL THEN 'inserted'
                  WHEN u.custkey IS NULL THEN 'unchanged'
                  ELSE 'updated' END AS status,
             COALESCE(u.spend_c, 0) AS spend_c,
             c.c_mktsegment AS segment
      FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.custkey)
    SELECT custkey, status, spend_c, segment
    FROM merged
    -- explicit NULLS LAST (r13 review): a NULL-user_id events group
    -- would merge to a NULL custkey, and the engines' default NULL
    -- placement differs (Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST)
    -- so the LIMIT truncation would keep different row sets once the
    -- join output exceeds 2000 rows (sf0.1+)
    ORDER BY custkey NULLS LAST
    LIMIT 2000
    """,
    tags=("merge", "upsert", "full-outer-join"),
)
