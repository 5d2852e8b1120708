"""Scalar function surface: string / unicode / regex / math / datetime /
conditional / crypto / encoding.

Covers SURVEY.md §2.8 — the reference's `datafusion/functions/src/`
modules (string/, unicode/, regex/, datetime/, math/, core/, crypto/,
encoding/). Functions are batched into per-module catalog queries; where
Spark and DuckDB spell a function differently the oracle text adapts
(e.g. startswith↔starts_with, sha2(x,256)↔sha256, regexp_count↔
len(regexp_extract_all)).

Transcendental float results are rounded to 9 digits on both sides
(JVM vs libm may differ in the last ulp); integer/string functions are
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_umami_spark.operators.date_bin import date_bin, date_bin_oracle_sql
from datafusion_umami_spark.registry import probe, register, register_sql
from datafusion_umami_spark.tables import table

# --- string module ---------------------------------------------------------
register_sql(
    "fn_string_basic",
    """
    SELECT p_partkey,
           ascii(p_name) AS first_code,
           CAST(bit_length(p_name) AS BIGINT) AS bits,
           CAST(octet_length(p_name) AS BIGINT) AS octets,
           CAST(length(p_name) AS BIGINT) AS chars,
           btrim(concat('  ', p_name, '  ')) AS trimmed,
           TRIM(LEADING 'x' FROM concat('xx', p_name)) AS l_trimmed,
           TRIM(TRAILING 'y' FROM concat(p_name, 'yy')) AS r_trimmed,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
           concat(p_brand, '/', p_type) AS brand_type,
           concat_ws('-', p_brand, p_type, CAST(p_size AS STRING)) AS joined,
           upper(p_name) AS up, lower(p_brand) AS lo,
           repeat(p_type, 2) AS doubled,
           replace(p_name, ' ', '_') AS underscored,
           reverse(p_name) AS rev
    FROM part WHERE p_partkey < 100
    """,
    oracle="""
    SELECT p_partkey,
           ascii(p_name) AS first_code,
           CAST(bit_length(p_name) AS BIGINT) AS bits,
           CAST(octet_length(CAST(p_name AS BLOB)) AS BIGINT) AS octets,
           CAST(length(p_name) AS BIGINT) AS chars,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           ltrim(concat('xx', p_name), 'x') AS l_trimmed,
           rtrim(concat(p_name, 'yy'), 'y') AS r_trimmed,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS letter,
           concat(p_brand, '/', p_type) AS brand_type,
           concat_ws('-', p_brand, p_type, CAST(p_size AS VARCHAR)) AS joined,
           upper(p_name) AS up, lower(p_brand) AS lo,
           repeat(p_type, 2) AS doubled,
           replace(p_name, ' ', '_') AS underscored,
           reverse(p_name) AS rev
    FROM part WHERE p_partkey < 100
    """,
    tags=("scalar", "string"),
)

register_sql(
    "fn_string_predicates",
    """
    SELECT doc_id,
           contains(text, 'spark') AS has_spark,
           startswith(text, 'the') AS starts_the,
           endswith(source, '1') AS src_ends_1,
           CAST(levenshtein(lang, 'en') AS BIGINT) AS lev_en,
           split_part(source, 'c', 2) AS after_c,
           CAST(position('data' IN text) AS BIGINT) AS data_pos
    FROM documents WHERE doc_id < 200
    """,
    oracle="""
    SELECT doc_id,
           contains(text, 'spark') AS has_spark,
           starts_with(text, 'the') AS starts_the,
           ends_with(source, '1') AS src_ends_1,
           CAST(levenshtein(lang, 'en') AS BIGINT) AS lev_en,
           split_part(source, 'c', 2) AS after_c,
           CAST(position('data' IN text) AS BIGINT) AS data_pos
    FROM documents WHERE doc_id < 200
    """,
    tags=("scalar", "string", "predicates"),
)

register_sql(
    "fn_unicode_pad_extract",
    """
    SELECT s_suppkey,
           initcap(lower(s_name)) AS cap_name,
           left(s_name, 8) AS l8,
           right(s_name, 4) AS r4,
           lpad(CAST(s_suppkey AS STRING), 6, '0') AS padded,
           rpad(s_name, 25, '.') AS dotted,
           substr(s_name, 1, 8) AS sub8,
           translate(s_name, '#0', '_O') AS translated,
           overlay(s_name PLACING 'XX' FROM 2 FOR 2) AS overlaid
    FROM supplier WHERE s_suppkey < 50
    """,
    oracle="""
    SELECT s_suppkey,
           concat(upper(substr(lower(s_name),1,1)), substr(lower(s_name),2)) AS cap_name,
           left(s_name, 8) AS l8,
           right(s_name, 4) AS r4,
           lpad(CAST(s_suppkey AS VARCHAR), 6, '0') AS padded,
           rpad(s_name, 25, '.') AS dotted,
           substr(s_name, 1, 8) AS sub8,
           translate(s_name, '#0', '_O') AS translated,
           concat(substr(s_name, 1, 1), 'XX', substr(s_name, 4)) AS overlaid
    FROM supplier WHERE s_suppkey < 50
    """,
    tags=("scalar", "unicode"),
)

register_sql(
    "fn_regex",
    """
    SELECT doc_id,
           CAST(regexp_count(text, 'a[a-z]+') AS BIGINT) AS n_awords,
           regexp_like(text, 'join|merge') AS mentions_join,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(text, '[aeiou]', '') AS no_vowels,
           CAST(regexp_instr(text, 'scan') AS BIGINT) AS scan_pos
    FROM documents WHERE doc_id < 100
    """,
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'a[a-z]+')) AS BIGINT) AS n_awords,
           regexp_matches(text, 'join|merge') AS mentions_join,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(text, '[aeiou]', '', 'g') AS no_vowels,
           CAST(CASE WHEN instr(text, 'scan') > 0 THEN instr(text, 'scan') ELSE 0 END AS BIGINT) AS scan_pos
    FROM documents WHERE doc_id < 100
    """,
    tags=("scalar", "regex"),
)

# --- math module -----------------------------------------------------------
register_sql(
    "fn_math_exact",
    """
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS dist_1000,
           CAST(factorial(CAST(p_size % 10 AS INT)) AS BIGINT) AS fact,
           CAST(floor(p_retailprice) AS BIGINT) AS fl,
           CAST(ceil(p_retailprice) AS BIGINT) AS ce,
           round(p_retailprice, 1) AS r1,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sgn,
           CAST(p_size AS DOUBLE) AS sz,
           power(CAST(p_size AS DOUBLE), 2.0) AS sz2,
           CAST(pmod(p_partkey, 7) AS BIGINT) AS m7
    FROM part WHERE p_partkey < 120
    """,
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS dist_1000,
           CAST(factorial(CAST(p_size % 10 AS INT)) AS BIGINT) AS fact,
           CAST(floor(p_retailprice) AS BIGINT) AS fl,
           CAST(ceil(p_retailprice) AS BIGINT) AS ce,
           round(p_retailprice, 1) AS r1,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sgn,
           CAST(p_size AS DOUBLE) AS sz,
           power(CAST(p_size AS DOUBLE), 2.0) AS sz2,
           CAST(p_partkey % 7 AS BIGINT) AS m7
    FROM part WHERE p_partkey < 120
    """,
    tags=("scalar", "math"),
)

register_sql(
    "fn_math_transcendental",
    """
    SELECT p_partkey,
           round(sqrt(CAST(p_size AS DOUBLE)), 9) AS sq,
           round(cbrt(CAST(p_size AS DOUBLE)), 9) AS cb,
           round(exp(CAST(p_size AS DOUBLE) / 50.0), 9) AS ex,
           round(ln(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg,
           round(log2(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg2,
           round(log10(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg10,
           round(log(3.0, CAST(p_size AS DOUBLE) + 1.0), 9) AS lg3,
           round(sin(CAST(p_size AS DOUBLE)), 9) AS sn,
           round(cos(CAST(p_size AS DOUBLE)), 9) AS cs,
           round(tan(CAST(p_size AS DOUBLE) / 10.0), 9) AS tn,
           round(atan2(CAST(p_size AS DOUBLE), 7.0), 9) AS at2,
           round(degrees(CAST(p_size AS DOUBLE) / 10.0), 9) AS degs,
           round(radians(CAST(p_size AS DOUBLE)), 9) AS rads,
           round(pi(), 9) AS pi_val
    FROM part WHERE p_partkey < 100
    """,
    oracle="""
    SELECT p_partkey,
           round(sqrt(CAST(p_size AS DOUBLE)), 9) AS sq,
           round(cbrt(CAST(p_size AS DOUBLE)), 9) AS cb,
           round(exp(CAST(p_size AS DOUBLE) / 50.0), 9) AS ex,
           round(ln(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg,
           round(log2(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg2,
           round(log10(CAST(p_size AS DOUBLE) + 1.0), 9) AS lg10,
           round(ln(CAST(p_size AS DOUBLE) + 1.0) / ln(3.0), 9) AS lg3,
           round(sin(CAST(p_size AS DOUBLE)), 9) AS sn,
           round(cos(CAST(p_size AS DOUBLE)), 9) AS cs,
           round(tan(CAST(p_size AS DOUBLE) / 10.0), 9) AS tn,
           round(atan2(CAST(p_size AS DOUBLE), 7.0), 9) AS at2,
           round(degrees(CAST(p_size AS DOUBLE) / 10.0), 9) AS degs,
           round(radians(CAST(p_size AS DOUBLE)), 9) AS rads,
           round(pi(), 9) AS pi_val
    FROM part WHERE p_partkey < 100
    """,
    tags=("scalar", "math", "transcendental"),
)

# --- datetime module -------------------------------------------------------
register_sql(
    "fn_datetime_parts",
    """
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS mo,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(minute(ts) AS BIGINT) AS mi,
           CAST(second(ts) AS BIGINT) AS s,
           CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(dayofyear(ts) AS BIGINT) AS doy,
           CAST(quarter(ts) AS BIGINT) AS q,
           CAST(weekofyear(ts) AS BIGINT) AS woy,
           CAST(to_date(ts) AS DATE) AS dt,
           CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
    FROM events WHERE event_id < 150
    """,
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS mo,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(minute(ts) AS BIGINT) AS mi,
           CAST(date_part('second', ts) AS BIGINT) AS s,
           CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(dayofyear(ts) AS BIGINT) AS doy,
           CAST(quarter(ts) AS BIGINT) AS q,
           CAST(weekofyear(ts) AS BIGINT) AS woy,
           CAST(ts AS DATE) AS dt,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
    FROM events WHERE event_id < 150
    """,
    tags=("scalar", "datetime"),
)

register_sql(
    "fn_datetime_arith",
    """
    SELECT o_orderkey,
           CAST(date_add(CAST(o_orderdate AS DATE), 30) AS DATE) AS due,
           CAST(add_months(CAST(o_orderdate AS DATE), 2) AS DATE) AS due2mo,
           CAST(datediff(DATE '2002-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_to_2002,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mo_start,
           CAST(date_trunc('year', o_orderdate) AS DATE) AS yr_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
           date_format(o_orderdate, 'yyyy-MM') AS ym
    FROM orders WHERE o_orderkey < 200
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS due,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS due2mo,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mo_start,
           CAST(date_trunc('year', o_orderdate) AS DATE) AS yr_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey < 200
    """,
    tags=("scalar", "datetime", "arith"),
)

# reparsed carries the TIMESTAMP_NTZ output cast (r13 registry-wide
# LTZ audit: to_timestamp yields LTZ — the last raw-LTZ output in the
# registry; green only under the UTC session pin before the cast)
register_sql(
    "fn_datetime_make_parse",
    """
    SELECT e.event_id,
           make_date(2024, CAST(month(e.ts) AS INT), 1) AS month_anchor,
           CAST(to_timestamp(date_format(e.ts, 'yyyy-MM-dd HH:mm:ss'))
                AS TIMESTAMP_NTZ) AS reparsed,
           from_unixtime(e.event_id * 3600, 'yyyy-MM-dd HH:mm:ss') AS synth_ts
    FROM events e WHERE e.event_id < 100
    """,
    oracle="""
    SELECT e.event_id,
           make_date(2024, CAST(month(e.ts) AS INT), 1) AS month_anchor,
           CAST(strptime(strftime(e.ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS reparsed,
           strftime(to_timestamp(e.event_id * 3600), '%Y-%m-%d %H:%M:%S') AS synth_ts
    FROM events e WHERE e.event_id < 100
    """,
    tags=("scalar", "datetime", "parse"),
)


@register(
    "fn_date_bin",
    oracle=f"""
    SELECT {date_bin_oracle_sql('ts', 900, '2024-01-01 00:00:00')} AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    LIMIT 1000
    """,
    tags=("scalar", "datetime", "date-bin", "tumbling-window"),
)
def fn_date_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_bin 15-minute tumbling buckets (reference
    functions/src/datetime/date_bin.rs; SURVEY §2.11 streaming analog)."""
    e = table(spark, sf_dir, "events")
    from datafusion_umami_spark.registry import dec

    return (
        e.groupBy(date_bin("ts", 900, "2024-01-01 00:00:00").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("value")).cast("double").alias("total"))
        .orderBy("bucket")
        .limit(1000)
    )


# --- conditional / core ----------------------------------------------------
register_sql(
    "fn_conditional",
    """
    SELECT c_custkey,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'was_building') AS seg,
           nvl(NULLIF(c_nationkey, 5), -1) AS nk_or_neg1,
           nvl2(NULLIF(c_nationkey, 5), 'present', 'absent') AS nk_flag,
           ifnull(NULLIF(c_name, c_name), 'self_null') AS always_default,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           greatest(c_acctbal, 0.0) AS bal_floor,
           least(c_acctbal, 5000.0) AS bal_cap
    FROM customer WHERE c_custkey < 150
    """,
    oracle="""
    SELECT c_custkey,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'was_building') AS seg,
           coalesce(NULLIF(c_nationkey, 5), -1) AS nk_or_neg1,
           CASE WHEN NULLIF(c_nationkey, 5) IS NOT NULL THEN 'present' ELSE 'absent' END AS nk_flag,
           coalesce(NULLIF(c_name, c_name), 'self_null') AS always_default,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           greatest(c_acctbal, 0.0) AS bal_floor,
           least(c_acctbal, 5000.0) AS bal_cap
    FROM customer WHERE c_custkey < 150
    """,
    tags=("scalar", "conditional"),
    discrimination=probe(
        nullif_fires_building="""SELECT COUNT(*) FROM customer
            WHERE c_custkey < 150 AND c_mktsegment = 'BUILDING'""",
        nullif_passes_other="""SELECT COUNT(*) FROM customer
            WHERE c_custkey < 150 AND c_mktsegment <> 'BUILDING'""",
        nation5_absent_branch="""SELECT COUNT(*) FROM customer
            WHERE c_custkey < 150 AND c_nationkey = 5""",
        nation_present_branch="""SELECT COUNT(*) FROM customer
            WHERE c_custkey < 150 AND c_nationkey <> 5""",
        bal_bucket_neg="""SELECT COUNT(*) FROM customer
            WHERE c_custkey < 150 AND c_acctbal < 0""",
        bal_bucket_mid="""SELECT COUNT(*) FROM customer
            WHERE c_custkey < 150 AND c_acctbal >= 0
              AND c_acctbal < 5000""",
        bal_bucket_high="""SELECT COUNT(*) FROM customer
            WHERE c_custkey < 150 AND c_acctbal >= 5000""",
    ),
)

# --- crypto / encoding -----------------------------------------------------
register_sql(
    "fn_crypto_encoding",
    """
    SELECT doc_id,
           md5(lang) AS md5_lang,
           sha2(source, 256) AS sha_src,
           lower(hex(encode(lang, 'UTF-8'))) AS hex_lang,
           base64(encode(source, 'UTF-8')) AS b64_src
    FROM documents WHERE doc_id < 80
    """,
    oracle="""
    SELECT doc_id,
           md5(lang) AS md5_lang,
           sha256(source) AS sha_src,
           lower(hex(CAST(lang AS BLOB))) AS hex_lang,
           base64(CAST(source AS BLOB)) AS b64_src
    FROM documents WHERE doc_id < 80
    """,
    tags=("scalar", "crypto", "encoding"),
)

# --- uuid (nondeterministic value → check shape only) ----------------------
register_sql(
    "fn_uuid_shape",
    """
    SELECT CAST(length(uuid()) AS BIGINT) AS len, substr(uuid(), 15, 1) AS version
    """,
    oracle="""
    SELECT CAST(length(CAST(uuid() AS VARCHAR)) AS BIGINT) AS len,
           substr(CAST(uuid() AS VARCHAR), 15, 1) AS version
    """,
    tags=("scalar", "uuid"),
)

# --- find_in_set / substring_index / strpos / nanvl -------------------------
# (reference unicode/find_in_set.rs, substr_index.rs, strpos.rs,
# math/nanvl.rs).  DuckDB lacks find_in_set / substring_index / nanvl —
# the oracle emulates them with list functions / CASE-isnan.
register_sql(
    "fn_string_set_index",
    """
    SELECT p_partkey,
           find_in_set(p_brand, 'Brand#11,Brand#22,Brand#33,Brand#44,Brand#55')
             AS brand_pos,
           substring_index(p_type, ' ', 2) AS type_prefix2,
           CAST(position('a' IN p_name) AS BIGINT) AS first_a,
           CAST(locate('b', p_name, 3) AS BIGINT) AS b_from_3,
           nanvl(CASE WHEN p_size % 3 = 0 THEN CAST('NaN' AS DOUBLE)
                      ELSE CAST(p_retailprice AS DOUBLE) END, -1.0)
             AS price_or_nan_guard
    FROM part WHERE p_partkey < 300
    """,
    oracle="""
    SELECT p_partkey,
           CAST(coalesce(list_position(string_split(
                 'Brand#11,Brand#22,Brand#33,Brand#44,Brand#55', ','), p_brand), 0)
             AS INT) AS brand_pos,
           array_to_string(list_slice(string_split(p_type, ' '), 1, 2), ' ')
             AS type_prefix2,
           CAST(position('a' IN p_name) AS BIGINT) AS first_a,
           CAST(CASE WHEN strpos(substr(p_name, 3), 'b') = 0 THEN 0
                     ELSE strpos(substr(p_name, 3), 'b') + 2 END AS BIGINT)
             AS b_from_3,
           CASE WHEN p_size % 3 = 0 THEN -1.0
                ELSE CAST(p_retailprice AS DOUBLE) END
             AS price_or_nan_guard
    FROM part WHERE p_partkey < 300
    """,
    tags=("scalar", "string", "find-in-set", "nanvl"),
    discrimination=probe(
        brand_in_list="""SELECT COUNT(*) FROM part
            WHERE p_partkey < 300 AND p_brand IN
              ('Brand#11', 'Brand#22', 'Brand#33', 'Brand#44',
               'Brand#55')""",
        brand_not_in_list="""SELECT COUNT(*) FROM part
            WHERE p_partkey < 300 AND p_brand NOT IN
              ('Brand#11', 'Brand#22', 'Brand#33', 'Brand#44',
               'Brand#55')""",
        size_mod3_arm="""SELECT COUNT(*) FROM part
            WHERE p_partkey < 300 AND p_size % 3 = 0""",
        size_other_arm="""SELECT COUNT(*) FROM part
            WHERE p_partkey < 300 AND p_size % 3 <> 0""",
        b_missing_arm="""SELECT COUNT(*) FROM part
            WHERE p_partkey < 300
              AND strpos(substr(p_name, 3), 'b') = 0""",
        b_found_arm="""SELECT COUNT(*) FROM part
            WHERE p_partkey < 300
              AND strpos(substr(p_name, 3), 'b') > 0""",
    ),
)


# --- gcd / lcm (no Spark builtin → Catalyst Euclid fold) ---------------------
@register(
    "fn_math_gcd_lcm",
    oracle="""
    SELECT p_partkey,
           gcd(p_partkey + 4, CAST(p_size AS BIGINT) * 3) AS g,
           lcm(p_size, (p_partkey % 7) + 1) AS l
    FROM part WHERE p_partkey < 300
    """,
    tags=("scalar", "math", "gcd", "lcm"),
)
def fn_math_gcd_lcm(spark, sf_dir):
    """gcd/lcm (reference functions/src/math/gcd.rs, lcm.rs): Spark has
    no builtin, so `functions.math_extra` expresses Euclid's algorithm
    as a bounded JVM-side `aggregate` fold — no Python UDF."""
    from pyspark.sql import functions as F

    from datafusion_umami_spark.functions.math_extra import gcd_col, lcm_col
    from datafusion_umami_spark.tables import table

    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        gcd_col(F.col("p_partkey") + 4, F.col("p_size").cast("bigint") * 3).alias("g"),
        lcm_col(F.col("p_size"), (F.col("p_partkey") % 7) + 1).alias("l"),
    )


# --- LIKE ANY / LIKE ALL quantified pattern matching ------------------------
register_sql(
    "fn_like_any_all",
    """
    SELECT c_custkey, c_name,
           c_mktsegment LIKE ANY ('%ING%', '%HOLD%') AS seg_any,
           c_name LIKE ALL ('Customer%', '%0%') AS name_all
    FROM customer
    WHERE c_custkey < 200
    """,
    oracle="""
    SELECT c_custkey, c_name,
           (c_mktsegment LIKE '%ING%' OR c_mktsegment LIKE '%HOLD%') AS seg_any,
           (c_name LIKE 'Customer%' AND c_name LIKE '%0%') AS name_all
    FROM customer
    WHERE c_custkey < 200
    """,
    tags=("scalar", "like-any-all", "pattern"),
)

# --- bitwise expression family (reference arrow bitwise kernels;
# Spark operators &, |, ^, shiftleft/shiftright, bit_count) ------------------
register_sql(
    "fn_bitwise_ops",
    """
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(l_orderkey | 4096 AS BIGINT) AS bor,
           CAST(l_orderkey ^ l_partkey AS BIGINT) AS bxor,
           CAST(shiftleft(l_linenumber, 4) AS BIGINT) AS shl,
           CAST(shiftright(l_orderkey, 3) AS BIGINT) AS shr,
           CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_partkey, l_linenumber
    LIMIT 400
    """,
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(l_orderkey | 4096 AS BIGINT) AS bor,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS bxor,
           CAST(l_linenumber << 4 AS BIGINT) AS shl,
           CAST(l_orderkey >> 3 AS BIGINT) AS shr,
           CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_partkey, l_linenumber
    LIMIT 400
    """,
    tags=("scalar", "bitwise"),
)

# --- string transform extras: translate / repeat / left / right / ascii ------
register_sql(
    "fn_string_transform_extra",
    """
    SELECT p_partkey,
           translate(p_name, 'aeiou', '01234') AS tr,
           repeat(p_brand, 2) AS rep,
           left(p_name, 4) AS l4,
           right(p_name, 3) AS r3,
           CAST(ascii(p_name) AS BIGINT) AS first_code,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS cyc
    FROM part
    WHERE p_partkey < 300
    ORDER BY p_partkey
    """,
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', '01234') AS tr,
           repeat(p_brand, 2) AS rep,
           left(p_name, 4) AS l4,
           right(p_name, 3) AS r3,
           CAST(ascii(p_name) AS BIGINT) AS first_code,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS cyc
    FROM part
    WHERE p_partkey < 300
    ORDER BY p_partkey
    """,
    tags=("scalar", "string", "transform"),
)


# --- greatest/least NULL semantics -----------------------------------------
# Both Spark and DuckDB (>=1.1; older DuckDB propagated NULL) SKIP NULL
# arguments in greatest/least, returning NULL only when every argument
# is NULL — matching PostgreSQL, and diverging from the
# MySQL/SQL Server any-NULL-poisons semantics that silently change
# outlier fencing if assumed wrong.  This pins the contract: NULLIF
# fabricates NULL arguments from real data and the outputs hash-match.
register_sql(
    "fn_greatest_least_null_semantics",
    """
    SELECT c_custkey,
           greatest(NULLIF(c_acctbal, 0.0), -1000.0, NULL) AS g_skipnull,
           least(NULLIF(c_acctbal, 0.0), 10000.0, NULL) AS l_skipnull,
           greatest(CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)) AS g_allnull,
           CAST(CASE WHEN greatest(NULLIF(c_acctbal, 0.0), NULL) IS NULL
                     THEN 1 ELSE 0 END AS BIGINT) AS was_zero_bal
    FROM customer
    ORDER BY c_custkey
    LIMIT 2000
    """,
    tags=("scalar", "greatest-least", "null-semantics"),
)
