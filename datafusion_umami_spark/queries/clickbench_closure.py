"""ClickBench main-suite 1:1 closure — dedicated entries for the 12
files previously covered only by merged shapes (r7 verdict item 3).

Reference: benchmarks/queries/clickbench/queries/q{3,5,9,11,17,18,22,
24,32,33,37,38}.sql.  Each query here re-expresses ONE reference file
over the driver star schema (hits → events/documents column mapping as
in clickbench.py), so every one of the 43 canonical files now has a
dedicated registry entry; the previously-merged shapes remain as the
primary entries for their first file (q2→cb_global_scan_battery,
q4→cb_multi_distinct, q8→cb_region_segmentation, q10→cb_mobile_model_
segmentation, q14→cb_engine_phrase_minute, q16→cb_two_key_topk,
q21→cb_like_notlike_minurl, q24/q26 split below, q31→cb_watch_client_
mixed_agg, q36→cb_fenced_pageviews_offset).

All scan→agg→topk, zero joins: map-side partial aggregation into a
TakeOrderedAndProject — the plan family that stays scan-bound at
100 TB.  Determinism per registry.py conventions: integer-exact money
(cents), ROUND on divisions, CAST(SUM(BIGINT) AS BIGINT) for DuckDB,
TIMESTAMP_NTZ/TIMESTAMP split oracles, total-order ORDER BY + LIMIT on
both sides.
"""

from __future__ import annotations

from datafusion_umami_spark.registry import probe, register_sql

# q3: SELECT AVG("UserID") FROM hits — single global average over a
# 64-bit id column; integer SUM stays exact, division at the end.
register_sql(
    "cb_q3_avg_userid",
    """
    SELECT ROUND(CAST(SUM(user_id) AS DOUBLE) / COUNT(*), 6) AS avg_user
    FROM events
    """,
    tags=("clickbench", "scan", "avg"),
)

# q5: COUNT(DISTINCT "SearchPhrase") — single global distinct over the
# wide string column (q4's sibling; cb_multi_distinct keeps q4).
register_sql(
    "cb_q5_distinct_phrases",
    """
    SELECT COUNT(DISTINCT props) AS d_phrases FROM events
    """,
    tags=("clickbench", "distinct-agg"),
)

# q9: region key + the full mixed battery (SUM, COUNT(*), AVG,
# COUNT(DISTINCT)) ranked by count — q8 plus three more aggregates.
register_sql(
    "cb_q9_region_battery",
    """
    SELECT user_id % 32 AS region,
           CAST(SUM(event_id % 11) AS BIGINT) AS sum_adv,
           COUNT(*) AS c,
           ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * COUNT(*)), 6) AS avg_value,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY user_id % 32
    ORDER BY c DESC, region
    LIMIT 10
    """,
    tags=("clickbench", "segmentation", "mixed-agg", "distinct-agg"),
)

# q11: the two-key variant of q10 — ("MobilePhone", "MobilePhoneModel")
# grouping by distinct users behind the non-empty fence.
register_sql(
    "cb_q11_phone_model_two_key",
    r"""
    SELECT event_id % 7 AS phone,
           regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS model,
           COUNT(DISTINCT user_id) AS u
    FROM events
    WHERE props <> ''
    GROUP BY event_id % 7, regexp_extract(props, '"k":\\s*([0-9]+)', 1)
    ORDER BY u DESC, phone, model
    LIMIT 10
    """,
    oracle=r"""
    SELECT event_id % 7 AS phone,
           regexp_extract(props, '"k":\s*([0-9]+)', 1) AS model,
           COUNT(DISTINCT user_id) AS u
    FROM events
    WHERE props <> ''
    GROUP BY 1, 2
    ORDER BY u DESC, phone, model
    LIMIT 10
    """,
    tags=("clickbench", "segmentation", "regex", "distinct-agg"),
)

# q17: q16's aggregation WITHOUT the rank-by-count — the reference
# emits an arbitrary 10 groups (GROUP BY ... LIMIT, no ORDER BY).  An
# arbitrary subset can't be oracle-hashed, so the dedicated entry keys
# the limit by group key instead: same aggregate, cheap key-order sort
# rather than q16's ORDER BY c DESC — the plan difference the file
# exists to probe (no TakeOrdered on the count) stays visible in the
# sort expression.
register_sql(
    "cb_q17_two_key_unranked",
    """
    SELECT user_id, event_type, COUNT(*) AS c
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    LIMIT 10
    """,
    tags=("clickbench", "two-key", "key-ordered"),
)

# q18: user + extracted minute + phrase three-key grouping (q14 minus
# the engine key, plus the datetime extraction on the grouping path).
register_sql(
    "cb_q18_user_minute_phrase",
    """
    SELECT user_id AS uid,
           CAST(extract(MINUTE FROM ts) AS BIGINT) AS m,
           event_type AS phrase,
           COUNT(*) AS c
    FROM events
    GROUP BY user_id, extract(MINUTE FROM ts), event_type
    ORDER BY c DESC, uid, m, phrase
    LIMIT 10
    """,
    tags=("clickbench", "datetime", "multi-key"),
)

# q22: the Title-fenced sibling of q21 — LIKE on title, NOT LIKE on
# url, plus MIN(title) and the distinct-user count q21 lacks.
register_sql(
    "cb_q22_title_fence_battery",
    """
    WITH h AS (
        SELECT concat('https://www.', source, '.example.com/', lang, '/',
                      CAST(doc_id AS STRING)) AS url,
               substr(text, 1, 30) AS title,
               doc_id % 89 AS user_id, lang
        FROM documents
    )
    SELECT lang, MIN(url) AS min_url, MIN(title) AS min_title,
           COUNT(*) AS c, COUNT(DISTINCT user_id) AS u
    FROM h
    WHERE title LIKE '%e%' AND url NOT LIKE '%.src2.%' AND lang <> ''
    GROUP BY lang
    ORDER BY c DESC, lang
    LIMIT 10
    """,
    oracle="""
    WITH h AS (
        SELECT concat('https://www.', source, '.example.com/', lang, '/',
                      CAST(doc_id AS VARCHAR)) AS url,
               substr(text, 1, 30) AS title,
               doc_id % 89 AS user_id, lang
        FROM documents
    )
    SELECT lang, MIN(url) AS min_url, MIN(title) AS min_title,
           COUNT(*) AS c, COUNT(DISTINCT user_id) AS u
    FROM h
    WHERE title LIKE '%e%' AND url NOT LIKE '%.src2.%' AND lang <> ''
    GROUP BY lang
    ORDER BY c DESC, lang
    LIMIT 10
    """,
    tags=("clickbench", "like", "string-agg", "distinct-agg"),
)

# q24: time-ordered scan returning ONLY the phrase column (q26 keeps
# cb_ts_ordered_phrases, which adds the phrase to the sort key and
# projects two columns).  event_id is row-unique, so the tiebreak makes
# the projected column deterministic without changing the q24 shape:
# sort by event time, take 10.
register_sql(
    "cb_q24_time_ordered_phrase",
    """
    SELECT props
    FROM events
    WHERE props <> ''
    ORDER BY CAST(ts AS TIMESTAMP_NTZ), event_id, props
    LIMIT 10
    """,
    oracle="""
    SELECT props
    FROM events
    WHERE props <> ''
    ORDER BY CAST(ts AS TIMESTAMP), event_id, props
    LIMIT 10
    """,
    tags=("clickbench", "ordered-scan", "topk"),
)

# q32: q31 without the SearchPhrase fence — the full-table two-key
# mixed-aggregate ranking (cb_watch_client_mixed_agg keeps q31).
register_sql(
    "cb_q32_watch_client_unfenced",
    """
    SELECT event_id % 1000 AS watch_id, user_id,
           COUNT(*) AS c,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
               AS refreshes,
           ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * COUNT(*)), 6) AS avg_v
    FROM events
    GROUP BY event_id % 1000, user_id
    ORDER BY c DESC, watch_id, user_id
    LIMIT 10
    """,
    tags=("clickbench", "two-key", "mixed-agg"),
    discrimination=probe(
        view_rows_refresh_arm="""SELECT COUNT(*) FROM events
            WHERE event_type = 'view'""",
        non_view_rows_else_arm="""SELECT COUNT(*) FROM events
            WHERE event_type <> 'view'""",
    ),
)

# q33: single-key URL frequency top-k (q16 keeps the two-key shape);
# the url key is derived so the plan groups on a computed expression,
# as the reference groups on the raw URL column.
register_sql(
    "cb_q33_url_count_topk",
    """
    SELECT concat(event_type, '/', CAST(user_id % 64 AS STRING)) AS url,
           COUNT(*) AS c
    FROM events
    GROUP BY concat(event_type, '/', CAST(user_id % 64 AS STRING))
    ORDER BY c DESC, url
    LIMIT 10
    """,
    oracle="""
    SELECT concat(event_type, '/', CAST(user_id % 64 AS VARCHAR)) AS url,
           COUNT(*) AS c
    FROM events
    GROUP BY 1
    ORDER BY c DESC, url
    LIMIT 10
    """,
    tags=("clickbench", "topk"),
)

# q37: the Title-grouped sibling of q36 — same date/type/counter
# fences, grouping key cut from the wide string column, no OFFSET.
register_sql(
    "cb_q37_title_pageviews",
    """
    SELECT substr(props, 1, 16) AS title, COUNT(*) AS pageviews
    FROM events
    WHERE ts >= TIMESTAMP_NTZ '2024-01-01 00:00:00'
      AND ts < TIMESTAMP_NTZ '2025-01-01 00:00:00'
      AND event_type IN ('click', 'view')
      AND user_id % 2 = 0
      AND props <> ''
    GROUP BY substr(props, 1, 16)
    ORDER BY pageviews DESC, title
    LIMIT 10
    """,
    oracle="""
    SELECT substr(props, 1, 16) AS title, COUNT(*) AS pageviews
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
      AND ts < TIMESTAMP '2025-01-01 00:00:00'
      AND event_type IN ('click', 'view')
      AND user_id % 2 = 0
      AND props <> ''
    GROUP BY 1
    ORDER BY pageviews DESC, title
    LIMIT 10
    """,
    tags=("clickbench", "date-fence", "pushdown"),
)

# q38: q36 with the link/download fence pair swapped in and the deep
# OFFSET — pagination past the head of the ranking (offset scaled to
# the driver SFs' ~100 distinct props groups).
register_sql(
    "cb_q38_link_pageviews_offset",
    """
    SELECT props AS url, COUNT(*) AS pageviews
    FROM events
    WHERE ts >= TIMESTAMP_NTZ '2024-01-01 00:00:00'
      AND ts < TIMESTAMP_NTZ '2025-01-01 00:00:00'
      AND event_id % 3 <> 0
      AND event_id % 5 = 0
      AND props <> ''
    GROUP BY props
    ORDER BY pageviews DESC, url
    LIMIT 10 OFFSET 50
    """,
    oracle="""
    SELECT props AS url, COUNT(*) AS pageviews
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
      AND ts < TIMESTAMP '2025-01-01 00:00:00'
      AND event_id % 3 <> 0
      AND event_id % 5 = 0
      AND props <> ''
    GROUP BY props
    ORDER BY pageviews DESC, url
    LIMIT 10 OFFSET 50
    """,
    tags=("clickbench", "date-fence", "offset"),
)
