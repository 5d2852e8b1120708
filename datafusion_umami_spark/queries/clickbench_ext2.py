"""ClickBench extended suite, strict 1:1 closure (q4-q7).

The reference ships 8 extended ClickBench queries
(reference benchmarks/queries/clickbench/extended/q0-q7.sql).  q0-q3
map 1:1 onto cb_multi_distinct / cb_grouped_multi_distinct /
cb_ext_stddev_var_having; q4-q7 were previously represented by MERGED
shapes (cb_ext_quantiles_per_pair covered q4+q5 in one entry).  This
module closes the set with one dedicated entry per remaining file,
re-expressed on the events table:

- q4: per-(ClientIP, WatchID) COUNT/MIN/MEDIAN/MAX of a timing column,
  HAVING c > 1, ranked by the MEDIAN (q4.sql ranks by tmed where the
  merged shape ranked by p95);
- q5: the same profile with APPROX_PERCENTILE_CONT(0.95) — Spark's
  percentile_approx, hash-checked through a tolerance band (the
  agg_approx_* convention): the sketch value must land between the
  exact 0.91 and 0.99 quantiles, which bracket any estimate whose rank
  error is within 1/n + 1e-4 for groups of n >= 50;
- q6: the campaign-funnel monster — alternation-group regex, IN-list
  network ids, BETWEEN on a derived timezone, guarded int extraction
  from a key=value string compared against a threshold, and a
  levenshtein similarity between two COLUMNS (q6 compares UTMSource to
  UTMCampaign; the earlier merged shape compared against a literal);
- q7: per-WatchID min/max + flag-sum ordered by the key descending.

Determinism: money/timing through integer cents, quantiles ROUND(..,4),
total-order ORDER BY + LIMIT on every multi-row output, identical
aliases both sides.  Registered in a module imported LAST so these
never-swept additions queue BEHIND the legacy backlog (sweep-rotation
contract, queries/__init__.py).
"""

from __future__ import annotations

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import probe, register_sql

# extended q4: rank pairs by their EXACT MEDIAN timing.
# r14 discrimination fix (found by the round's own probes run at
# sf0.1): HAVING COUNT(*) > 1 against FIXED-cardinality mod buckets
# (256x32 keys) with corpus-growing counts is the absolute-floor
# antipattern — at sf0.1 every surviving bucket holds >= 2 rows so the
# fence rejected NOTHING (and never would at 100 TB).  Scale-free
# median-count fence instead (kept/rejected 96/140, 811/1273,
# 1878/2218 probed at sf0.001/0.01/0.1); the grouped aggregate
# materializes once on the Spark side (one events scan, plan-gated).
_CBQ4_G_SPARK = """
      SELECT client_ip, watch_id,
             COUNT(*) AS c,
             MIN(cents) AS tmin,
             ROUND(percentile(cents, 0.5), 4) AS tmed,
             MAX(cents) AS tmax
      FROM (SELECT user_id % 256 AS client_ip, event_id % 32 AS watch_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE user_id % 2 = 0) c
      GROUP BY client_ip, watch_id"""
_CBQ4_G_DUCK = """
      SELECT client_ip, watch_id,
             COUNT(*) AS c,
             MIN(cents) AS tmin,
             ROUND(quantile_cont(cents, 0.5), 4) AS tmed,
             MAX(cents) AS tmax
      FROM (SELECT user_id % 256 AS client_ip, event_id % 32 AS watch_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE user_id % 2 = 0) c
      GROUP BY client_ip, watch_id"""
_CBQ4_FINAL = """
    SELECT client_ip, watch_id, c, tmin, tmed, tmax
    FROM {g}
    WHERE c > (SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
                       AS BIGINT) FROM {g})
    ORDER BY tmed DESC, client_ip, watch_id
    LIMIT 10
    """

register_split_sql(
    "cb_ext_q4_median_rank",
    stages=[(_CBQ4_G_SPARK, "cbq4_g_m")],
    final_sql=_CBQ4_FINAL.format(g="cbq4_g_m"),
    oracle="WITH g AS (" + _CBQ4_G_DUCK + ")" + _CBQ4_FINAL.format(g="g"),
    tags=("clickbench-extended", "median", "median-fence"),
    discrimination=probe(
        above_median_kept=f"""WITH g AS ({_CBQ4_G_DUCK})
            SELECT COUNT(*) FROM g
            WHERE c > (SELECT CAST(percentile_disc(0.5) WITHIN GROUP
                               (ORDER BY c) AS BIGINT) FROM g)""",
        at_or_below_median_rejected=f"""WITH g AS ({_CBQ4_G_DUCK})
            SELECT COUNT(*) FROM g
            WHERE c <= (SELECT CAST(percentile_disc(0.5) WITHIN GROUP
                                (ORDER BY c) AS BIGINT) FROM g)""",
        odd_users_fenced="""SELECT COUNT(*) FROM events
            WHERE user_id % 2 = 1""",
    ),
)

# extended q5: APPROX p95 per pair, tolerance-banded (the sketch value
# must land between the exact 0.91/0.99 quantiles — brackets any
# estimate with rank error <= 1/n + 1e-4 once n >= 50, and
# percentile_approx at accuracy 10000 is far inside that).
# TRIAGE NOTE (r7 ADVICE item 3): the oracle pins tp95_in_band = 1, so
# a driver hash mismatch on THIS query at a larger SF most likely means
# the band check tripped (the sketch landed outside the 0.91-0.99 exact
# quantiles), not that the exact columns diverged — re-run with the
# CASE expression projected separately before suspecting the rest.
# r14 discrimination fix (probe-found): HAVING COUNT(*) >= 50 made the
# whole query EMPTY at sf0.001 (all 32 groups hold ~47 rows) and
# rejected nothing at sf0.01 (~469 per group) — an absolute floor
# against corpus-growing counts fails in both directions.  Scale-free
# median-count fence instead (14/32, 16/32, 16/32 above-median probed
# at sf0.001/0.01/0.1); the grouped aggregate materializes once on the
# Spark side (one events scan).  The tolerance band widened 0.91-0.99
# -> 0.85-1.0: the old floor guaranteed n >= 50 so ±0.04 rank slack
# sufficed; above-median groups bottom out at n=19 at sf0.001, and the
# band guarantee (rank error <= 1/n + 1e-4) needs n >= 10 at ±0.10 —
# the probe pins min kept group size >= 10 so the guarantee can never
# silently lapse at a new SF.
_CBQ5_G_SPARK = """
      SELECT client_ip, watch_id,
             COUNT(*) AS c,
             MIN(cents) AS tmin,
             ROUND(percentile(cents, 0.95), 4) AS tp95_exact,
             CAST(CASE WHEN percentile_approx(cents, 0.95, 10000)
                            BETWEEN percentile(cents, 0.85)
                                AND percentile(cents, 1.0)
                  THEN 1 ELSE 0 END AS BIGINT) AS tp95_in_band,
             MAX(cents) AS tmax
      FROM (SELECT user_id % 16 AS client_ip, event_id % 4 AS watch_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE user_id % 2 = 0) c
      GROUP BY client_ip, watch_id"""
_CBQ5_G_DUCK = """
      SELECT client_ip, watch_id,
             COUNT(*) AS c,
             MIN(cents) AS tmin,
             ROUND(quantile_cont(cents, 0.95), 4) AS tp95_exact,
             CAST(1 AS BIGINT) AS tp95_in_band,
             MAX(cents) AS tmax
      FROM (SELECT user_id % 16 AS client_ip, event_id % 4 AS watch_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE user_id % 2 = 0) c
      GROUP BY client_ip, watch_id"""
_CBQ5_FINAL = """
    SELECT client_ip, watch_id, c, tmin, tp95_exact, tp95_in_band, tmax
    FROM {g}
    WHERE c > (SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
                       AS BIGINT) FROM {g})
    ORDER BY tp95_exact DESC, client_ip, watch_id
    LIMIT 10
    """

register_split_sql(
    "cb_ext_q5_p95_approx",
    stages=[(_CBQ5_G_SPARK, "cbq5_g_m")],
    final_sql=_CBQ5_FINAL.format(g="cbq5_g_m"),
    oracle="WITH g AS (" + _CBQ5_G_DUCK + ")" + _CBQ5_FINAL.format(g="g"),
    tags=("clickbench-extended", "approx-percentile", "tolerance-band"),
    discrimination=probe(
        above_median_kept=f"""WITH g AS ({_CBQ5_G_DUCK})
            SELECT COUNT(*) FROM g
            WHERE c > (SELECT CAST(percentile_disc(0.5) WITHIN GROUP
                               (ORDER BY c) AS BIGINT) FROM g)""",
        at_or_below_median_rejected=f"""WITH g AS ({_CBQ5_G_DUCK})
            SELECT COUNT(*) FROM g
            WHERE c <= (SELECT CAST(percentile_disc(0.5) WITHIN GROUP
                                (ORDER BY c) AS BIGINT) FROM g)""",
        min_kept_group_big_enough_for_band=f"""WITH g AS ({_CBQ5_G_DUCK})
            SELECT CASE WHEN MIN(c) >= 10 THEN 1 ELSE 0 END FROM g
            WHERE c > (SELECT CAST(percentile_disc(0.5) WITHIN GROUP
                               (ORDER BY c) AS BIGINT) FROM g)""",
    ),
)

# extended q6: the campaign funnel — alternation regex + IN network ids
# + BETWEEN derived timezone + guarded int extract > threshold +
# levenshtein between two COLUMN expressions, collapsing to one COUNT.
register_sql(
    "cb_ext_q6_campaign_funnel",
    r"""
    SELECT COUNT(*) AS share_count
    FROM events
    WHERE user_id % 2 = 1
      AND event_type LIKE 'c%'
      AND user_id % 16 IN (5, 12)
      AND (event_id % 24) - 12 BETWEEN -5 AND 5
      AND props RLIKE '"k": (1|2|3|4)[0-9]'
      AND CASE WHEN split_part(split_part(props, '"k": ', 2), '}', 1)
                    RLIKE '^[0-9]+$'
               THEN CAST(split_part(split_part(props, '"k": ', 2), '}', 1)
                         AS INT)
               ELSE 0 END > 15
      AND levenshtein(event_type, substr(props, 3, 4)) < 6
    """,
    oracle=r"""
    SELECT COUNT(*) AS share_count
    FROM events
    WHERE user_id % 2 = 1
      AND event_type LIKE 'c%'
      AND user_id % 16 IN (5, 12)
      AND (event_id % 24) - 12 BETWEEN -5 AND 5
      AND regexp_matches(props, '"k": (1|2|3|4)[0-9]')
      AND CASE WHEN regexp_matches(
                        split_part(split_part(props, '"k": ', 2), '}', 1),
                        '^[0-9]+$')
               THEN CAST(split_part(split_part(props, '"k": ', 2), '}', 1)
                         AS INT)
               ELSE 0 END > 15
      AND levenshtein(event_type, substr(props, 3, 4)) < 6
    """,
    tags=("clickbench-extended", "funnel", "regex", "levenshtein"),
)

# extended q7: per-WatchID width min/max + refresh-flag sum, ordered by
# the KEY descending (sort on the group key, not an aggregate).
register_sql(
    "cb_ext_q7_refresh_profile",
    """
    SELECT user_id % 2048 AS watch_id,
           MIN(CAST(round(value * 100) AS BIGINT)) AS wmin,
           MAX(CAST(round(value * 100) AS BIGINT)) AS wmax,
           CAST(SUM(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS srefresh
    FROM events
    GROUP BY user_id % 2048
    ORDER BY watch_id DESC
    LIMIT 10
    """,
    tags=("clickbench-extended", "minmax", "key-ordered"),
    discrimination=probe(
        refresh_rows="SELECT COUNT(*) FROM events WHERE value < 50",
        non_refresh_rows="SELECT COUNT(*) FROM events WHERE value >= 50",
    ),
)
