"""Semi-structured (JSON) column processing over events.props.

The reference core has no JSON functions (they live in a separate
datafusion-functions-json extension), but a data-pipeline engine needs
them: event payloads, API dumps and crawl metadata are JSON columns at
rest.  Spark-first: `get_json_object` / `from_json` are JVM-side
expressions (no Python), fully codegen'd, and `from_json` with an
explicit schema lets Catalyst prune untouched fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.registry import register, register_sql
from datafusion_umami_spark.tables import table

# --- path extraction + aggregation ------------------------------------------
register_sql(
    "json_extract_agg",
    """
    SELECT CAST(get_json_object(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS events,
           COUNT(DISTINCT event_type) AS types
    FROM events
    WHERE get_json_object(props, '$.k') IS NOT NULL
    GROUP BY CAST(get_json_object(props, '$.k') AS BIGINT) % 10
    """,
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS events,
           COUNT(DISTINCT event_type) AS types
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
    tags=("json", "semi-structured", "llm-pipeline"),
)


# --- from_json with explicit schema → typed struct ---------------------------
@register(
    "json_from_json_struct",
    # TRY_CAST, not CAST: Spark's from_json is PERMISSIVE (a
    # non-integer k parses to NULL and the filter drops the row), so
    # the oracle must mirror that — a strict CAST would raise a
    # DuckDB Conversion Error on the same row the Spark side handles
    # gracefully (r12 json review; latent while the generator emits
    # only clean integer k).
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type
    FROM events
    WHERE event_id < 400
      AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    tags=("json", "struct", "schema"),
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    parsed = ev.withColumn("p", F.from_json("props", "k bigint"))
    return (
        parsed.filter(F.col("p.k") > 50)
        .select("event_id", F.col("p.k").alias("k"), "event_type")
    )


# --- to_json roundtrip (struct → json text → extract) -------------------------
register_sql(
    "json_to_json_roundtrip",
    """
    SELECT n_nationkey,
           get_json_object(to_json(named_struct('name', n_name, 'region', n_regionkey)),
                           '$.name') AS name_from_json
    FROM nation
    """,
    oracle="""
    SELECT n_nationkey,
           json_extract_string(to_json(struct_pack(name := n_name, region := n_regionkey)),
                               '$.name') AS name_from_json
    FROM nation
    """,
    tags=("json", "to-json"),
)


# --- multi-path extraction: json_tuple (real single-pass multi-field
# extraction via LATERAL VIEW — top-level fields only, by design),
# array length, nested paths via get_json_object ----------------------------
register_sql(
    "json_tuple_arrays",
    """
    WITH j AS (
      SELECT n_nationkey,
             to_json(named_struct(
               'name', n_name,
               'region', n_regionkey,
               'tags', array(concat('r', CAST(n_regionkey AS STRING)),
                             'nation'),
               'meta', named_struct('len', length(n_name)))) AS doc
      FROM nation)
    SELECT n_nationkey,
           jt.jname AS name,
           CAST(jt.jregion AS BIGINT) AS region,
           CAST(json_array_length(get_json_object(doc, '$.tags')) AS BIGINT)
             AS n_tags,
           get_json_object(doc, '$.tags[0]') AS first_tag,
           CAST(get_json_object(doc, '$.meta.len') AS BIGINT) AS name_len
    FROM j
    LATERAL VIEW json_tuple(doc, 'name', 'region') jt AS jname, jregion
    """,
    oracle="""
    WITH j AS (
      SELECT n_nationkey,
             to_json(struct_pack(
               name := n_name,
               region := n_regionkey,
               tags := [concat('r', CAST(n_regionkey AS VARCHAR)), 'nation'],
               meta := struct_pack(len := length(n_name)))) AS doc
      FROM nation)
    SELECT n_nationkey,
           json_extract_string(doc, '$.name') AS name,
           CAST(json_extract_string(doc, '$.region') AS BIGINT) AS region,
           CAST(json_array_length(doc, '$.tags') AS BIGINT) AS n_tags,
           json_extract_string(doc, '$.tags[0]') AS first_tag,
           CAST(json_extract_string(doc, '$.meta.len') AS BIGINT) AS name_len
    FROM j
    """,
    tags=("json", "nested-paths", "json-array"),
)


# --- VARIANT: open-schema semi-structured type (Spark 4) --------------------
# The VARIANT doc is built with to_json(named_struct(...)), never by
# string concatenation (r12 json review): hand-spliced text (a) nulls
# the WHOLE doc when one field is NULL while the oracle stays
# field-wise, and (b) breaks on any quote/backslash in a value, which
# parse_json turns into a query-killing error under the session's
# pinned ANSI mode.  to_json escapes correctly.  r13 (ADVICE item 2):
# the k extraction is TRY_CAST on both sides and the row fence is
# `try_cast(k) IS NOT NULL` — the old strict CAST under ANSI mode
# crashed the whole query on one MALFORMED (non-integer) k string,
# the exact crash class the r12 json_from_json_struct fix closed; the
# IS-NOT-NULL-on-try_cast form drops missing AND malformed k rows
# identically on both engines.
register_sql(
    "json_variant_ops",
    """
    WITH v AS (
      SELECT event_id,
             parse_json(to_json(named_struct(
               'k', try_cast(get_json_object(props, '$.k') AS BIGINT),
               'type', event_type,
               'nested', named_struct(
                 'half', CAST(try_cast(get_json_object(props, '$.k')
                                       AS BIGINT) AS DOUBLE) / 2.0)))) AS doc
      FROM events
      WHERE event_id < 500
        AND try_cast(get_json_object(props, '$.k') AS BIGINT) IS NOT NULL)
    SELECT event_id,
           variant_get(doc, '$.k', 'bigint') AS k,
           variant_get(doc, '$.type', 'string') AS type,
           ROUND(variant_get(doc, '$.nested.half', 'double'), 6) AS half,
           try_variant_get(doc, '$.absent', 'bigint') AS absent
    FROM v
    """,
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_type AS type,
           ROUND(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                 / 2.0, 6) AS half,
           CAST(NULL AS BIGINT) AS absent
    FROM events
    WHERE event_id < 500
      AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    tags=("json", "variant", "semi-structured", "spark4"),
)
