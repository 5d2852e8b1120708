"""Behavioral / product-analytics operators over the events stream table:
cohort retention, strictly-ordered funnels, RFM segmentation, value
histograms.

These are the batch-side siblings of the streaming sessionization
family (queries/streaming_queries.py) — the standard shapes any events
warehouse (and any user-interaction training-data pipeline) runs daily.
The reference engine has no events/analytics surface (SURVEY.md §2.11:
no event-time semantics at all), so like decontam.py this is
capability-superset work from the build brief.

100 TB design notes:
- every query is scan → per-user partial aggregate → small join; the
  per-user tables are |users|-sized (orders of magnitude under the raw
  events), so every post-aggregation join broadcasts;
- the cohort matrix and histogram group on (low-card, low-card) keys —
  the final exchanges carry KBs;
- the RFM quartiles are BOUNDARY-BANDED (r13, closing the r12 KNOWN
  EXCEPTION / r12 verdict weak item): the three per-metric quartile
  boundaries come from percentile_disc (a 9-value ordered-set
  aggregate — probed value-identical Spark vs DuckDB across ties,
  n<k, all-equal, and DESC orders; see tests/test_fuzz.py round-13
  banding pins), broadcast via scalar subqueries, and every user is
  banded by comparison — no global window, no single-partition sort
  of the |users|-sized table.  percentile_disc's aggregation state is
  a value→count map (distinct metric values, not rows), the
  documented exact-boundary compromise; the production path at
  extreme cardinality swaps in approx_percentile.  Boundary-tie
  semantics differ from NTILE by design: ALL ties on a boundary take
  the better band (a pure function of the metric value), identical on
  both engines;
- money/value arithmetic is integer cents end-to-end (registry.py
  determinism conventions), window tie-breaks are total orders; the
  funnel conversion is exact integer ppm (engine ROUND(double)
  midpoint behavior differs — see _FUNNEL_OUT);
- the funnel's hand-rolled stage materialization predates
  operators/materialize.register_split_sql; migrating it would add
  the split-vs-inlined equivalence gate for free (deferred r12 — a
  refactor, not a defect; the oracle already checks end-to-end
  equivalence cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import register, register_sql

# --- day-cohort retention matrix ------------------------------------------
# Users cohorted by first-seen day; n_active = distinct users of cohort
# C active at day offset K.  The activity×first_seen join is per-user
# (tiny right side → broadcast); the matrix groupBy is (day, offset).
register_sql(
    "evt_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
      FROM events),
    matrix AS (
      SELECT f.cohort_day,
             datediff(a.active_day, f.cohort_day) AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN first_seen f ON a.user_id = f.user_id
      GROUP BY f.cohort_day, datediff(a.active_day, f.cohort_day))
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(n_active AS BIGINT) AS n_active
    FROM matrix
    ORDER BY cohort_day, day_offset
    LIMIT 2000
    """,
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
      FROM events),
    matrix AS (
      SELECT f.cohort_day,
             date_diff('day', f.cohort_day, a.active_day) AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN first_seen f ON a.user_id = f.user_id
      GROUP BY f.cohort_day, date_diff('day', f.cohort_day, a.active_day))
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(n_active AS BIGINT) AS n_active
    FROM matrix
    ORDER BY cohort_day, day_offset
    LIMIT 2000
    """,
    tags=("events", "cohort", "retention", "analytics"),
)

# --- strictly-ordered funnel: view → click (after) → purchase (after) -----
# Each stage is MIN(ts) per user constrained to be AFTER the previous
# stage's MIN — the standard "ordered funnel" semantics (a click before
# the first view does not count).  Stage tables are per-user aggregates
# (broadcastable); no window over raw events is needed.
_FUNNEL_V = """
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id"""
_FUNNEL_C = """
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN {v} v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id"""
_FUNNEL_P = """
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN {c} c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id"""
# conversion as EXACT integer ppm, not ROUND(double, 6): the engines
# round doubles differently (Spark HALF_UP on the shortest decimal
# repr, DuckDB FP multiply/round), and real count pairs diverge —
# probed r12: round(41/640.0, 6) = 0.064063 on Spark, 0.064062 on
# DuckDB (36 diverging pairs under q=5000).  Native integer division
# per engine ({idiv} = Spark DIV / DuckDB //), exact at any corpus
# scale (counts*1e6 < 2^63).
_FUNNEL_OUT = """
    SELECT CAST((SELECT COUNT(*) FROM {v}) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM {c}) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM {p}) AS BIGINT) AS n_full_funnel,
           CAST((1000000 * (SELECT COUNT(*) FROM {p}))
                {idiv} greatest((SELECT COUNT(*) FROM {v}), 1) AS BIGINT)
             AS conversion_ppm
    """


@register(
    "evt_funnel_ordered",
    # single-statement twin for DuckDB (which materializes shared CTEs)
    oracle=(
        f"WITH v AS ({_FUNNEL_V}),\n"
        f"c AS ({_FUNNEL_C.format(v='v')}),\n"
        f"p AS ({_FUNNEL_P.format(c='c')})\n"
        f"{_FUNNEL_OUT.format(v='v', c='c', p='p', idiv='//')}"
    ),
    tags=("events", "funnel", "analytics"),
)
def evt_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with per-stage materialization: each |users|-sized
    stage aggregate is checkpointed once, so events is scanned exactly
    three times (once per stage, each with its event_type pushed) —
    the inlined single-statement SQL re-executed the stage chain per
    reference and scanned events 10× (operators/materialize.py)."""
    from datafusion_umami_spark.operators.materialize import materialize_view
    from datafusion_umami_spark.tables import register_views

    register_views(spark, sf_dir)
    materialize_view("funnel_v", spark.sql(_FUNNEL_V), "funnel_v_m")
    materialize_view(
        "funnel_c", spark.sql(_FUNNEL_C.format(v="funnel_v_m")), "funnel_c_m"
    )
    materialize_view(
        "funnel_p", spark.sql(_FUNNEL_P.format(c="funnel_c_m")), "funnel_p_m"
    )
    return spark.sql(
        _FUNNEL_OUT.format(
            v="funnel_v_m", c="funnel_c_m", p="funnel_p_m", idiv="DIV"
        )
    )

# --- RFM quartile segmentation (boundary-banded) ---------------------------
# Recency/Frequency/Monetary per user, quartile-banded by comparison
# against percentile_disc boundaries (scale-safe: no global window —
# see the module docstring).  Ties on a boundary take the BETTER band
# on both engines: the band is a pure function of the metric value.
_RFM_REC_SPARK = """
    WITH mx AS (
      SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS max_day FROM events),
    rfm AS (
      SELECT user_id,
             MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM events
      GROUP BY user_id)
    -- scalar subquery, not CROSS JOIN mx: the 1-row cross join
    -- planned a BroadcastNestedLoopJoin (the pattern the TF-IDF
    -- spec removed); Spark inlines the uncorrelated scalar once
    SELECT user_id,
           datediff((SELECT max_day FROM mx), last_day) AS recency_days,
           frequency, monetary_c
    FROM rfm"""

_RFM_REC_DUCK = """
    rfm AS (
      SELECT user_id,
             MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM events
      GROUP BY user_id),
    rec AS (
      SELECT user_id,
             date_diff('day', last_day,
                       (SELECT MAX(CAST(date_trunc('day', ts) AS DATE))
                        FROM events)) AS recency_days,
             frequency, monetary_c
      FROM rfm)"""

# shared banding text: {rec} = per-user relation, {vc} = STRING/VARCHAR.
# Spark's percentile_disc returns DOUBLE -> CAST back to BIGINT; every
# metric here is per-user bounded (cents of one user's lifetime spend),
# so the double round-trip is exact (value-level class, CLAUDE.md).
_RFM_BAND_T = """
    bounds AS (
      SELECT
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days)
             AS BIGINT) AS r1,
        CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days)
             AS BIGINT) AS r2,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days)
             AS BIGINT) AS r3,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency DESC)
             AS BIGINT) AS f1,
        CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency DESC)
             AS BIGINT) AS f2,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency DESC)
             AS BIGINT) AS f3,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary_c DESC)
             AS BIGINT) AS m1,
        CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary_c DESC)
             AS BIGINT) AS m2,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary_c DESC)
             AS BIGINT) AS m3
      FROM {rec}),
    seg AS (
      SELECT user_id, recency_days, frequency, monetary_c,
             CASE WHEN recency_days <= (SELECT r1 FROM bounds) THEN 1
                  WHEN recency_days <= (SELECT r2 FROM bounds) THEN 2
                  WHEN recency_days <= (SELECT r3 FROM bounds) THEN 3
                  ELSE 4 END AS r_q,
             CASE WHEN frequency >= (SELECT f1 FROM bounds) THEN 1
                  WHEN frequency >= (SELECT f2 FROM bounds) THEN 2
                  WHEN frequency >= (SELECT f3 FROM bounds) THEN 3
                  ELSE 4 END AS f_q,
             CASE WHEN monetary_c >= (SELECT m1 FROM bounds) THEN 1
                  WHEN monetary_c >= (SELECT m2 FROM bounds) THEN 2
                  WHEN monetary_c >= (SELECT m3 FROM bounds) THEN 3
                  ELSE 4 END AS m_q
      FROM {rec})
    SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary_c,
           CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           concat(CAST(r_q AS {vc}), CAST(f_q AS {vc}),
                  CAST(m_q AS {vc})) AS segment
    FROM seg
    ORDER BY user_id
    LIMIT 2000
"""

register_split_sql(
    "evt_rfm_segments",
    # the |users|-sized per-user table feeds the boundary aggregate AND
    # the banding pass — materialized once so events is scanned exactly
    # twice (max_day + the per-user rollup), not once per reference.
    stages=[(_RFM_REC_SPARK, "rfm_rec_m")],
    final_sql="WITH "
    + _RFM_BAND_T.format(rec="rfm_rec_m", vc="STRING").lstrip(),
    oracle="WITH "
    + _RFM_REC_DUCK.lstrip()
    + ",\n"
    + _RFM_BAND_T.format(rec="rec", vc="VARCHAR").lstrip(),
    tags=("events", "rfm", "segmentation", "analytics"),
)

# --- fixed-width value histogram per event type ---------------------------
# Bands of 50 currency units computed on integer cents.  The division
# must go through an EXPLICIT double cast: BIGINT/5000.0 types as
# exact DECIMAL(27,6) in Spark but DOUBLE in DuckDB (the CLAUDE.md
# x/100.0 decimal-literal rule), so the un-cast form's floor can
# disagree once cents magnitudes pass 2^53 — with the cast both
# engines do identical IEEE division (per-row cents are bounded, so
# the double path is exact here anyway).
register_sql(
    "evt_value_band_histogram",
    """
    WITH b AS (
      SELECT event_type,
             CAST(floor(CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)
                        / 5000.0) AS BIGINT)
               AS band
      FROM events)
    SELECT event_type, band, band * 50 AS band_lo_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b
    GROUP BY event_type, band
    ORDER BY event_type, band
    LIMIT 500
    """,
    tags=("events", "histogram", "analytics"),
)
