"""TPC-DS-shaped planning queries adapted to the driver star schema.

The reference plans all 99 TPC-DS queries as a planning-regression corpus
(reference core/tests/tpcds_planning.rs); every individual operator they
exercise is covered elsewhere in this repo, so these ten shapes close
the corpus-family gap with the *combinations* TPC-DS is known for:

- q67: ROLLUP over a multi-join with in-group ranking
- q36: windowed share-of-total (ratio to PARTITION BY sum)
- q71: cross-channel UNION ALL feeding one aggregation
- q34: frequent-buyer HAVING band joined back to the dimension
- q88: many filter-band scalar-subquery counts in a single row
- q75: year-over-year delta via LAG over a yearly rollup
- q93: returns-adjusted revenue (fact LEFT JOIN its own slice)
- q59: period-over-period via equi self-join of one aggregate
- q1/q30: entities above 1.2x their group average (agg joined back)
- q89: deviation from the partition average via exact window sums

Determinism: money through integer cents (`round(x*100)` → BIGINT sum),
ratios as exact-int divisions rounded to 6 places, EXTRACT(YEAR) cast to
BIGINT on both sides (Spark's year() is int32, DuckDB's int64).
All outputs carry a total-order ORDER BY.

At 100 TB: every shape is join→partial-agg→final-agg or window-over-agg;
dimension joins (nation/region/customer-band) broadcast, rollups add one
extra exchange per grouping set column, windows partition on low-card
keys AFTER aggregation so the window input is already tiny.
"""

from __future__ import annotations

from datafusion_umami_spark.operators.materialize import register_split_sql
from datafusion_umami_spark.registry import register_sql

# q67-ish: revenue rollup over a 4-way join, ranked within each nation.
register_sql(
    "tpcds_rollup_rank",
    """
    WITH sales AS (
        SELECT n.n_name AS nation, o.o_orderpriority AS priority,
               CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
    )
    SELECT COALESCE(nation, 'ALL') AS nation,
           COALESCE(priority, 'ALL') AS priority,
           rev_cents,
           RANK() OVER (PARTITION BY nation
                        ORDER BY rev_cents DESC,
                                 COALESCE(priority, 'ALL')) AS rnk
    FROM sales
    ORDER BY nation, priority
    LIMIT 500
    """,
    tags=("tpcds", "rollup", "window", "multi-join"),
    bench=True,
    spread_tables=("lineitem",),
)

# q36-ish: nation revenue as a share of its region's total + in-region rank.
register_sql(
    "tpcds_share_of_total",
    """
    WITH nat AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, rev_cents,
           ROUND(CAST(rev_cents AS DOUBLE)
                 / SUM(rev_cents) OVER (PARTITION BY region), 6) AS share,
           RANK() OVER (PARTITION BY region
                        ORDER BY rev_cents DESC, nation) AS rnk
    FROM nat
    ORDER BY region, rnk, nation
    """,
    tags=("tpcds", "window", "share-of-total"),
)

# q71-ish: three event "channels" unioned, aggregated as one relation.
register_sql(
    "tpcds_cross_channel_union",
    """
    WITH channels AS (
        SELECT 'web' AS channel, user_id % 100 AS cust_band,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT 'store' AS channel, user_id % 100 AS cust_band,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT 'catalog' AS channel, user_id % 100 AS cust_band,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'view'
    )
    SELECT channel, cust_band,
           CAST(SUM(cents) AS BIGINT) AS rev_cents,
           COUNT(*) AS n
    FROM channels
    GROUP BY channel, cust_band
    ORDER BY channel, cust_band
    LIMIT 500
    """,
    tags=("tpcds", "union", "cross-channel"),
)

# q34-ish: order-count band (HAVING BETWEEN) joined back to the dimension.
register_sql(
    "tpcds_frequent_buyers",
    """
    WITH cnt AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) BETWEEN 8 AND 12
    )
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, cnt.n_orders
    FROM cnt
    JOIN customer c ON cnt.o_custkey = c.c_custkey
    ORDER BY cnt.n_orders DESC, c.c_custkey
    LIMIT 100
    """,
    tags=("tpcds", "having-band", "join-back"),
)

# q88-ish: one output row of independent filter-band counts (each a
# scalar subquery; Spark plans them as parallel aggs joined on nothing).
register_sql(
    "tpcds_band_counts",
    """
    SELECT
        CAST((SELECT COUNT(*) FROM lineitem
              WHERE l_quantity BETWEEN 1 AND 10) AS BIGINT) AS band_01_10,
        CAST((SELECT COUNT(*) FROM lineitem
              WHERE l_quantity BETWEEN 11 AND 20) AS BIGINT) AS band_11_20,
        CAST((SELECT COUNT(*) FROM lineitem
              WHERE l_quantity BETWEEN 21 AND 30) AS BIGINT) AS band_21_30,
        CAST((SELECT COUNT(*) FROM lineitem
              WHERE l_quantity BETWEEN 31 AND 40) AS BIGINT) AS band_31_40,
        CAST((SELECT COUNT(*) FROM lineitem
              WHERE l_quantity BETWEEN 41 AND 50) AS BIGINT) AS band_41_50,
        CAST((SELECT COUNT(*) FROM orders
              WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent_orders
    """,
    tags=("tpcds", "scalar-subquery", "band-counts"),
)

# q75-ish: year-over-year revenue ratio per priority via LAG.
register_sql(
    "tpcds_yoy_growth",
    """
    WITH yearly AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               o_orderpriority AS priority,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                 o_orderpriority
    )
    SELECT yr, priority, rev_cents,
           LAG(rev_cents) OVER (PARTITION BY priority ORDER BY yr)
               AS prev_cents,
           ROUND(CAST(rev_cents AS DOUBLE) /
                 LAG(rev_cents) OVER (PARTITION BY priority ORDER BY yr),
                 6) AS yoy_ratio
    FROM yearly
    ORDER BY priority, yr
    LIMIT 500
    """,
    tags=("tpcds", "window", "yoy"),
)

# q93-ish: returns-adjusted revenue — the fact table left-joined against
# its own "returned" slice, COALESCE-corrected, then ranked.
register_sql(
    "tpcds_returns_adjusted",
    """
    WITH returned AS (
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   AS ret_cents
        FROM lineitem
        WHERE l_returnflag = 'R'
    )
    SELECT o.o_custkey,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)
                    - COALESCE(r.ret_cents, 0)) AS BIGINT) AS net_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN returned r
      ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber
    GROUP BY o.o_custkey
    ORDER BY net_cents DESC, o.o_custkey
    LIMIT 100
    """,
    tags=("tpcds", "left-join", "returns"),
)

# q59-ish: period-over-period via equi self-join of the SAME aggregate
# at two period offsets (the join-based sibling of the LAG variant).
register_split_sql(
    "tpcds_period_self_join",
    # monthly (reduced aggregate) is referenced twice; materialized
    # once on the Spark side so its shuffle runs once (split-SQL;
    # oracle keeps the single statement).
    stages=[
        (
            """
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                 CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
    """,
            "monthly_m",
        )
    ],
    final_sql="""
    SELECT cur.yr, cur.mo, cur.rev_cents,
           prev.rev_cents AS prev_year_cents,
           ROUND(CAST(cur.rev_cents AS DOUBLE) / prev.rev_cents, 6) AS yoy
    FROM monthly_m cur
    JOIN monthly_m prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    ORDER BY cur.yr, cur.mo
    LIMIT 500
    """,
    oracle="""
    WITH monthly AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                 CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
    )
    SELECT cur.yr, cur.mo, cur.rev_cents,
           prev.rev_cents AS prev_year_cents,
           ROUND(CAST(cur.rev_cents AS DOUBLE) / prev.rev_cents, 6) AS yoy
    FROM monthly cur
    JOIN monthly prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
    ORDER BY cur.yr, cur.mo
    LIMIT 500
    """,
    tags=("tpcds", "self-join", "period-over-period"),
)

# q1/q30-ish: entities exceeding 1.2× their group's average — two-level
# aggregate, the group average broadcast-joined back onto the detail.
_AGA_STAGE = """
        SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey"""
_AGA_FINAL = """
    WITH per_nation AS (
        SELECT nationkey,
               CAST(SUM(spend_cents) AS BIGINT) AS total_cents,
               COUNT(*) AS n_cust
        FROM {pc}
        GROUP BY nationkey
    )
    SELECT p.nationkey, p.custkey, p.spend_cents
    FROM {pc} p
    JOIN per_nation n ON p.nationkey = n.nationkey
    WHERE CAST(p.spend_cents AS DOUBLE)
          > 1.2 * (CAST(n.total_cents AS DOUBLE) / n.n_cust)
    ORDER BY p.nationkey, p.spend_cents DESC, p.custkey
    LIMIT 500
    """

register_split_sql(
    "tpcds_above_group_avg",
    # per_cust is referenced by per_nation AND the final probe;
    # materialized once (split-SQL; oracle keeps the single statement).
    stages=[(_AGA_STAGE, "per_cust_m")],
    final_sql=_AGA_FINAL.replace("{pc}", "per_cust_m"),
    oracle='\n    WITH per_cust AS (' + _AGA_STAGE + '),'
    + _AGA_FINAL.replace("{pc}", "per_cust").lstrip().removeprefix("WITH"),
    tags=("tpcds", "above-average", "two-level-agg"),
)

# q89-ish: monthly revenue per priority vs the priority's overall monthly
# average — windowed deviation, keep the biggest deviations.
register_sql(
    "tpcds_deviation_from_avg",
    """
    WITH monthly AS (
        SELECT o_orderpriority AS priority,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY o_orderpriority,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                 CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
    ),
    dev AS (
        SELECT priority, yr, mo, rev_cents,
               ROUND(CAST(rev_cents AS DOUBLE)
                     - CAST(SUM(rev_cents) OVER (PARTITION BY priority)
                            AS DOUBLE)
                       / COUNT(*) OVER (PARTITION BY priority),
                     4) AS dev_cents
        FROM monthly
    )
    SELECT priority, yr, mo, rev_cents, dev_cents
    FROM dev
    ORDER BY abs(dev_cents) DESC, priority, yr, mo
    LIMIT 100
    """,
    tags=("tpcds", "window", "deviation"),
)

# ---------------------------------------------------------------------------
# Round-4 tranche — the remaining hallmark TPC-DS combinations
# (reference core/tests/tpc-ds/10,11,14,38,51,58.sql): EXISTS-OR channel
# participation, two-channel growth comparison, cross-channel
# INTERSECT/EXCEPT on entity sets, cumulative full-outer channel
# compare, and the channel-consistency tolerance band.
# ---------------------------------------------------------------------------

# q10/q35-ish: demographic counts for customers active in the URGENT
# channel AND in at least one of two other channels (EXISTS + OR of two
# EXISTS — the mark-join decorrelation stress)
register_sql(
    "tpcds_exists_or_channels",
    """
    SELECT c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
           COUNT(*) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT * FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND (EXISTS (SELECT * FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '5-LOW')
           OR EXISTS (SELECT * FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P'))
    GROUP BY c_mktsegment, CAST(floor(c_acctbal / 2000) AS BIGINT)
    ORDER BY c_mktsegment, bal_band
    LIMIT 100
    """,
    oracle="""
    SELECT c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
           COUNT(*) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT * FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND (EXISTS (SELECT * FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '5-LOW')
           OR EXISTS (SELECT * FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P'))
    GROUP BY 1, 2
    ORDER BY c_mktsegment, bal_band
    LIMIT 100
    """,
    tags=("tpcds", "exists-or", "mark-join"),
)

# q11/q74-ish: customers whose URGENT-channel revenue grew faster
# year-over-year than their other-channel revenue (two CTE rollups,
# joined at two year offsets each — four joins on one aggregate)
register_sql(
    "tpcds_two_channel_growth_compare",
    """
    WITH chan AS (
      SELECT o_custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'u' ELSE 'n' END AS ch,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
      FROM orders
      GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
               CASE WHEN o_orderpriority = '1-URGENT' THEN 'u' ELSE 'n' END
    )
    SELECT u2.o_custkey AS custkey,
           u2.rev_cents AS urgent_now,
           n2.rev_cents AS normal_now
    FROM chan u1, chan u2, chan n1, chan n2
    WHERE u1.o_custkey = u2.o_custkey AND u2.o_custkey = n1.o_custkey
      AND n1.o_custkey = n2.o_custkey
      AND u1.ch = 'u' AND u2.ch = 'u' AND n1.ch = 'n' AND n2.ch = 'n'
      AND u1.yr = 1997 AND u2.yr = 1998 AND n1.yr = 1997 AND n2.yr = 1998
      AND u1.rev_cents > 0 AND n1.rev_cents > 0
      AND CAST(u2.rev_cents AS DOUBLE) / u1.rev_cents
          > CAST(n2.rev_cents AS DOUBLE) / n1.rev_cents
    ORDER BY custkey
    LIMIT 100
    """,
    tags=("tpcds", "yoy-compare", "cte-self-join"),
)

# q14-ish: parts sold through BOTH order-status channels (INTERSECT on
# the entity key) feeding a revenue aggregation of just those parts
register_sql(
    "tpcds_cross_channel_intersect",
    """
    WITH both_parts AS (
      SELECT l_partkey FROM lineitem, orders
      WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
      INTERSECT
      SELECT l_partkey FROM lineitem, orders
      WHERE l_orderkey = o_orderkey AND o_orderstatus = 'O'
    )
    SELECT p_brand,
           COUNT(*) AS line_count,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM lineitem l, part, both_parts bp
    WHERE l.l_partkey = p_partkey AND p_partkey = bp.l_partkey
    GROUP BY p_brand
    ORDER BY rev_cents DESC, p_brand
    LIMIT 25
    """,
    tags=("tpcds", "intersect", "semi-join"),
)

# q38/q87-ish: how many customers bought in the F channel but never in
# the O channel (EXCEPT of entity sets, counted)
register_sql(
    "tpcds_customer_set_except",
    """
    SELECT COUNT(*) AS only_f_customers
    FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ) t
    """,
    tags=("tpcds", "except", "anti-join"),
)

# q51-ish: month-cumulative revenue of two channels FULL OUTER joined on
# month, keeping months where the URGENT cumulative overtakes the other
register_sql(
    "tpcds_cumulative_channel_compare",
    """
    WITH u AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY date_trunc('month', o_orderdate)
    ),
    n AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev
      FROM orders WHERE o_orderpriority = '5-LOW'
      GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT mon, CAST(cum_u AS BIGINT) AS cum_u, CAST(cum_n AS BIGINT) AS cum_n
    FROM (
      SELECT COALESCE(u.mon, n.mon) AS mon,
             SUM(COALESCE(u.rev, 0))
                 OVER (ORDER BY COALESCE(u.mon, n.mon)) AS cum_u,
             SUM(COALESCE(n.rev, 0))
                 OVER (ORDER BY COALESCE(u.mon, n.mon)) AS cum_n
      FROM u FULL OUTER JOIN n ON u.mon = n.mon
    ) t
    WHERE cum_u > cum_n
    ORDER BY mon
    LIMIT 100
    """,
    tags=("tpcds", "full-outer", "cumulative-window"),
)

# q58-ish: brands whose revenue is consistent across all three
# return-flag channels (each channel within ±20% of the brand average)
register_sql(
    "tpcds_channel_consistency",
    """
    WITH per_chan AS (
      SELECT p_brand, l_returnflag,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev
      FROM lineitem, part
      WHERE l_partkey = p_partkey
      GROUP BY p_brand, l_returnflag
    )
    SELECT p_brand,
           CAST(MIN(rev) AS BIGINT) AS min_rev,
           CAST(MAX(rev) AS BIGINT) AS max_rev
    FROM per_chan
    GROUP BY p_brand
    HAVING COUNT(*) = 3
       AND CAST(MIN(rev) AS DOUBLE) >= 0.8 * (CAST(SUM(rev) AS DOUBLE) / 3)
       AND CAST(MAX(rev) AS DOUBLE) <= 1.2 * (CAST(SUM(rev) AS DOUBLE) / 3)
    ORDER BY p_brand
    LIMIT 50
    """,
    tags=("tpcds", "consistency-band", "two-level-agg"),
)

# q23-ish: frequent parts (bought in many orders) restricted to
# best-customer orders — two independent CTE filters meeting in semi-joins
register_sql(
    "tpcds_frequent_items_best_customers",
    """
    WITH freq_parts AS (
      SELECT l_partkey FROM lineitem, orders
      WHERE l_orderkey = o_orderkey
      GROUP BY l_partkey HAVING COUNT(DISTINCT o_orderkey) > 4
    ),
    best_cust AS (
      SELECT o_custkey FROM orders
      GROUP BY o_custkey
      HAVING CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             > 20000000
    )
    SELECT COUNT(*) AS lines,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM lineitem l, orders o
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_partkey IN (SELECT l_partkey FROM freq_parts)
      AND o.o_custkey IN (SELECT o_custkey FROM best_cust)
    """,
    tags=("tpcds", "semi-join-chain", "having"),
)

# q17-ish: coefficient of variation — stddev/mean of quantity per
# (brand, returnflag-channel), keep high-variation pairs
register_sql(
    "tpcds_quantity_cov",
    """
    SELECT p_brand, l_returnflag,
           COUNT(*) AS n,
           ROUND(STDDEV(l_quantity) /
                 (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)),
                 4) AS cov
    FROM lineitem, part
    WHERE l_partkey = p_partkey
    GROUP BY p_brand, l_returnflag
    HAVING COUNT(*) > 20
       AND STDDEV(l_quantity) /
           (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) > 0.5
    ORDER BY cov DESC, p_brand, l_returnflag
    LIMIT 50
    """,
    tags=("tpcds", "cov", "stddev-ratio"),
)

# q54-ish: customers segmented into revenue bands of a computed aggregate
register_sql(
    "tpcds_revenue_bands",
    """
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(floor(rev_cents / 5000000) AS BIGINT) AS band,
           COUNT(*) AS customers
    FROM rev
    GROUP BY CAST(floor(rev_cents / 5000000) AS BIGINT)
    ORDER BY band
    LIMIT 200
    """,
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(floor(rev_cents / 5000000) AS BIGINT) AS band,
           COUNT(*) AS customers
    FROM rev
    GROUP BY 1
    ORDER BY band
    LIMIT 200
    """,
    tags=("tpcds", "banding", "two-level-agg"),
)

# q90-ish: ratio of two disjoint time-window counts via scalar subqueries
register_sql(
    "tpcds_am_pm_ratio",
    """
    SELECT ROUND(
             CAST((SELECT COUNT(*) FROM events
                   WHERE CAST(extract(HOUR FROM ts) AS BIGINT) BETWEEN 6 AND 11)
                  AS DOUBLE)
             / (SELECT COUNT(*) FROM events
                WHERE CAST(extract(HOUR FROM ts) AS BIGINT) BETWEEN 18 AND 23),
             6) AS am_pm_ratio
    """,
    tags=("tpcds", "scalar-subquery", "time-window"),
)

# q66-ish: manual month pivot — one SUM(CASE) column per quarter, one
# scan, partial-aggregated map-side
register_sql(
    "tpcds_monthly_pivot",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN CAST(extract(MONTH FROM o_orderdate) AS BIGINT)
                              BETWEEN 1 AND 3
                         THEN CAST(round(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS q1_cents,
           CAST(SUM(CASE WHEN CAST(extract(MONTH FROM o_orderdate) AS BIGINT)
                              BETWEEN 4 AND 6
                         THEN CAST(round(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS q2_cents,
           CAST(SUM(CASE WHEN CAST(extract(MONTH FROM o_orderdate) AS BIGINT)
                              BETWEEN 7 AND 9
                         THEN CAST(round(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS q3_cents,
           CAST(SUM(CASE WHEN CAST(extract(MONTH FROM o_orderdate) AS BIGINT)
                              BETWEEN 10 AND 12
                         THEN CAST(round(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS q4_cents
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpcds", "manual-pivot", "sum-case"),
)

# ---------------------------------------------------------------------------
# Round-4 third tranche: ten more TPC-DS idioms (reference
# core/tests/tpcds_planning.rs families not yet represented).
# Same determinism rules as above: integer-cents money, exact-int window
# sums, full total-order ORDER BY + LIMIT caps.
# ---------------------------------------------------------------------------

# q51-ish crossover: daily revenue vs its trailing 7-row moving average.
# The moving average is computed from EXACT integer window sums
# (SUM/COUNT over cents), so no float accumulation order can diverge;
# DuckDB's window SUM(BIGINT) is HUGEINT → cast back.
register_sql(
    "tpcds_moving_avg_flag",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    ma AS (
      SELECT d, rev_c,
             CAST(SUM(rev_c) OVER (ORDER BY d
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS s7,
             CAST(COUNT(*) OVER (ORDER BY d
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
      FROM daily)
    SELECT d, rev_c,
           ROUND(CAST(s7 AS DOUBLE) / 100.0 / n7, 4) AS ma7,
           CAST(CASE WHEN rev_c * n7 > s7 THEN 1 ELSE 0 END AS BIGINT)
             AS above_ma
    FROM ma
    ORDER BY d
    LIMIT 2000
    """,
    tags=("tpcds", "moving-average", "window"),
)

# q37-ish item lifecycle: first/last sale per brand + active-span days.
# date arithmetic differs by engine → separate oracle text.
register_sql(
    "tpcds_item_lifecycle",
    """
    SELECT p_brand,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           CAST(datediff(MAX(l_shipdate), MIN(l_shipdate)) AS BIGINT)
             AS span_days
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 200
    """,
    oracle="""
    SELECT p_brand,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           CAST(date_diff('day', MIN(l_shipdate), MAX(l_shipdate)) AS BIGINT)
             AS span_days
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 200
    """,
    tags=("tpcds", "lifecycle", "date-arith"),
)

# Top-k with ties: RANK (gap-ties) vs DENSE_RANK vs ROW_NUMBER on the
# same ordering — the classic q67-addendum divergence TPC-DS audits.
register_sql(
    "tpcds_rank_tie_semantics",
    """
    WITH spend AS (
      SELECT c_nationkey AS nationkey, o_custkey AS custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey, o_custkey),
    r AS (
      SELECT nationkey, custkey, rev_c,
             RANK() OVER (PARTITION BY nationkey ORDER BY rev_c DESC)
               AS rk,
             DENSE_RANK() OVER (PARTITION BY nationkey ORDER BY rev_c DESC)
               AS drk,
             ROW_NUMBER() OVER (PARTITION BY nationkey
                                ORDER BY rev_c DESC, custkey) AS rn
      FROM spend)
    SELECT nationkey, custkey, ROUND(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
           CAST(rk AS BIGINT) AS rk, CAST(drk AS BIGINT) AS drk,
           CAST(rn AS BIGINT) AS rn
    FROM r
    WHERE rk <= 3
    ORDER BY nationkey, rn
    LIMIT 2000
    """,
    tags=("tpcds", "rank-ties", "window"),
)

# q11-ish consecutive-period growth: customers whose spend in year Y+1
# exceeds year Y — equi self-join of one per-(customer, year) aggregate.
register_split_sql(
    "tpcds_consecutive_year_growth",
    # cy (reduced aggregate) is referenced twice; materialized
    # once on the Spark side so its shuffle runs once (split-SQL;
    # oracle keeps the single statement).
    stages=[
        (
            """
      SELECT o_custkey AS custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)""",
            "cy_m",
        )
    ],
    final_sql="""
    SELECT a.custkey, a.yr AS yr1,
           ROUND(CAST(a.rev_c AS DOUBLE) / 100.0, 2) AS rev1,
           ROUND(CAST(b.rev_c AS DOUBLE) / 100.0, 2) AS rev2,
           ROUND(CAST(b.rev_c AS DOUBLE) / a.rev_c, 6) AS growth
    FROM cy_m a JOIN cy_m b ON a.custkey = b.custkey AND b.yr = a.yr + 1
    WHERE b.rev_c > a.rev_c
    ORDER BY a.custkey, a.yr
    LIMIT 2000
    """,
    oracle="""
    WITH cy AS (
      SELECT o_custkey AS custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate))
    SELECT a.custkey, a.yr AS yr1,
           ROUND(CAST(a.rev_c AS DOUBLE) / 100.0, 2) AS rev1,
           ROUND(CAST(b.rev_c AS DOUBLE) / 100.0, 2) AS rev2,
           ROUND(CAST(b.rev_c AS DOUBLE) / a.rev_c, 6) AS growth
    FROM cy a JOIN cy b ON a.custkey = b.custkey AND b.yr = a.yr + 1
    WHERE b.rev_c > a.rev_c
    ORDER BY a.custkey, a.yr
    LIMIT 2000
    """,
    tags=("tpcds", "self-join", "growth"),
)

# q34/q73 basket bands: orders with 5-7 items, customers placing >= 2
# such orders — HAVING band on the fact, joined back to the dimension.
register_sql(
    "tpcds_basket_band_customers",
    """
    WITH baskets AS (
      SELECT l_orderkey, COUNT(*) AS n_items
      FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(*) BETWEEN 5 AND 7),
    cust AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_band_orders
      FROM orders JOIN baskets ON o_orderkey = l_orderkey
      GROUP BY o_custkey
      HAVING COUNT(*) >= 2)
    SELECT c_name, n_band_orders
    FROM cust JOIN customer ON c_custkey = o_custkey
    ORDER BY n_band_orders DESC, c_name
    LIMIT 1000
    """,
    tags=("tpcds", "basket-band", "having"),
)

# Top decile of spenders per nation via PERCENT_RANK — exact rational
# (rank-1)/(n-1) over integer cents, no float accumulation.
register_sql(
    "tpcds_percent_rank_decile",
    """
    WITH spend AS (
      SELECT c_nationkey AS nationkey, o_custkey AS custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey, o_custkey),
    pr AS (
      SELECT nationkey, custkey, rev_c,
             PERCENT_RANK() OVER (PARTITION BY nationkey ORDER BY rev_c)
               AS prk
      FROM spend)
    SELECT nationkey, custkey, ROUND(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(prk, 6) AS pct_rank
    FROM pr
    WHERE prk >= 0.9
    ORDER BY nationkey, custkey
    LIMIT 2000
    """,
    tags=("tpcds", "percent-rank", "window"),
)

# Largest order-to-order gap per customer (LAG + date subtraction) —
# churn-detection idiom; date arithmetic differs by engine.
register_sql(
    "tpcds_order_gap_stats",
    """
    WITH seq AS (
      SELECT o_custkey,
             o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
               AS prev_d
      FROM orders),
    gaps AS (
      SELECT o_custkey, datediff(o_orderdate, prev_d) AS gap
      FROM seq WHERE prev_d IS NOT NULL)
    SELECT o_custkey AS custkey,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM gaps
    GROUP BY o_custkey
    HAVING MAX(gap) > 200
    ORDER BY max_gap_days DESC, custkey
    LIMIT 1000
    """,
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
               AS prev_d
      FROM orders),
    gaps AS (
      SELECT o_custkey, date_diff('day', prev_d, o_orderdate) AS gap
      FROM seq WHERE prev_d IS NOT NULL)
    SELECT o_custkey AS custkey,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM gaps
    GROUP BY o_custkey
    HAVING MAX(gap) > 200
    ORDER BY max_gap_days DESC, custkey
    LIMIT 1000
    """,
    tags=("tpcds", "lag-gap", "window"),
)

# ROLLUP keeping ONLY the subtotal rows (GROUPING() flags in HAVING) —
# the q18/q22 summary-row harvest.
register_sql(
    "tpcds_rollup_subtotals_only",
    """
    SELECT region, nation, rev_c, g_region, g_nation
    FROM (
      SELECT COALESCE(r_name, 'ALL') AS region,
             COALESCE(n_name, 'ALL') AS nation,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c,
             CAST(GROUPING(r_name) AS BIGINT) AS g_region,
             CAST(GROUPING(n_name) AS BIGINT) AS g_nation
      FROM region
        JOIN nation ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders ON c_custkey = o_custkey
      GROUP BY ROLLUP(r_name, n_name)) sub
    WHERE g_nation = 1
    ORDER BY region, nation
    LIMIT 100
    """,
    tags=("tpcds", "rollup", "grouping-flags"),
)

# Decile segmentation of customers by spend, then per-decile aggregate
# — the customer-value banding TPC-DS uses for mailing lists.
# r13 (verdict weak item): boundary-banded, not NTILE — the global
# NTILE(10) window sorted ALL customers through one partition; the
# nine decile boundaries are now a percentile_disc ordered-set
# aggregate (state = distinct spend values, not rows), broadcast as
# scalar subqueries, and each customer bands by comparison.  Ties on a
# boundary take the better decile on both engines (band is a pure
# function of rev_c).  Probed cross-engine in tests/test_fuzz.py.
# r14 (ADVICE item 1): decile_revenue was ROUND(SUM(rev_c)/100.0, 2)
# — a fixed-decimal ROUND of a corpus-growing double (ulp > 0.005 past
# ~$2.3e13 per decile) over a bare-BIGINT cents sum (ANSI overflow at
# 2^63 where DuckDB widens to HUGEINT).  Now exact integer cents
# accumulated in DECIMAL(38,0) on both engines, output as STRING per
# the hash-sum convention; min/max_revenue are per-customer-bounded
# and keep the fixed-decimal form.
_DECILE_BOUNDS = ",\n".join(
    f"        CAST(percentile_disc(0.{k}) WITHIN GROUP (ORDER BY rev_c DESC)"
    f" AS BIGINT) AS b{k}"
    for k in range(1, 10)
)
_DECILE_CASE = (
    "CASE "
    + " ".join(
        f"WHEN rev_c >= (SELECT b{k} FROM bounds) THEN {k}"
        for k in range(1, 10)
    )
    + " ELSE 10 END"
)
_DECILE_SPEND = """
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey"""
_DECILE_BODY = f"""
    bounds AS (
      SELECT
{_DECILE_BOUNDS}
      FROM {{sp}}),
    d AS (
      SELECT custkey, rev_c,
             {_DECILE_CASE} AS decile
      FROM {{sp}})
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                AS STRING) AS decile_revenue_c,
           ROUND(CAST(MIN(rev_c) AS DOUBLE) / 100.0, 2) AS min_revenue,
           ROUND(CAST(MAX(rev_c) AS DOUBLE) / 100.0, 2) AS max_revenue
    FROM d
    GROUP BY decile
    ORDER BY decile
"""

register_split_sql(
    "tpcds_ntile_decile_profile",
    # the per-customer spend rollup feeds the boundary aggregate AND
    # the banding pass — materialized once.
    stages=[(_DECILE_SPEND, "decile_spend_m")],
    final_sql="WITH " + _DECILE_BODY.format(sp="decile_spend_m").lstrip(),
    oracle="WITH spend AS ("
    + _DECILE_SPEND
    + "),\n"
    + _DECILE_BODY.format(sp="spend").lstrip(),
    tags=("tpcds", "ntile", "segmentation"),
)

# q49-ish worst return ratios: returned-quantity share per part, ranked.
# Quantities are integral doubles → exact BIGINT casts; the ratio is one
# int/int division (identical IEEE result on both engines).
register_sql(
    "tpcds_return_ratio_rank",
    """
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS ret_qty,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS tot_qty
      FROM lineitem GROUP BY l_partkey),
    r AS (
      SELECT l_partkey, ret_qty, tot_qty,
             ROUND(CAST(ret_qty AS DOUBLE) / tot_qty, 6) AS ret_ratio
      FROM pr WHERE tot_qty >= 20),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY ret_ratio DESC, l_partkey) AS rn
      FROM r)
    SELECT l_partkey, ret_qty, tot_qty, ret_ratio, CAST(rn AS BIGINT) AS rn
    FROM ranked
    WHERE rn <= 100
    ORDER BY rn
    """,
    tags=("tpcds", "return-ratio", "rank"),
)

# ---------------------------------------------------------------------------
# Round-4 fourth tranche: eight more idioms, each a combination family
# not yet represented (aggregates of aggregates, seasonality, quartile
# cross-tabs, pareto coverage).
# ---------------------------------------------------------------------------

# aggregate OF an aggregate + HAVING at both levels: nations whose
# count of frequent customers (>= 5 orders each) exceeds a floor.
register_sql(
    "tpcds_two_level_having",
    """
    WITH per_cust AS (
      SELECT c_nationkey, o_custkey, COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey, o_custkey
      HAVING COUNT(*) >= 5)
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_frequent_customers,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders
    FROM per_cust JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING COUNT(*) >= 2
    ORDER BY n_name
    LIMIT 200
    """,
    tags=("tpcds", "two-level-having", "agg-of-agg"),
)

# quarter-of-year seasonality: each quarter's share of its year's
# revenue — integer cents, exact int/int division for the share.
_QY_STAGE = """
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders
      GROUP BY EXTRACT(YEAR FROM o_orderdate),
               EXTRACT(QUARTER FROM o_orderdate)"""

register_split_sql(
    "tpcds_quarter_seasonality",
    # qy (quarter rollup) feeds the year total AND the share join;
    # materialized once (split-SQL; oracle keeps the single statement).
    stages=[(_QY_STAGE, "qy_m")],
    final_sql="""
    WITH yt AS (SELECT yr, CAST(SUM(rev_c) AS BIGINT) AS yr_c FROM qy_m GROUP BY yr)
    SELECT q.yr, q.qtr,
           ROUND(CAST(q.rev_c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(q.rev_c AS DOUBLE) / y.yr_c, 6) AS share_of_year
    FROM qy_m q JOIN yt y ON q.yr = y.yr
    ORDER BY q.yr, q.qtr
    LIMIT 100
    """,
    oracle='\n    WITH qy AS (' + _QY_STAGE + '),\n    yt AS' + """ (SELECT yr, CAST(SUM(rev_c) AS BIGINT) AS yr_c FROM qy GROUP BY yr)
    SELECT q.yr, q.qtr,
           ROUND(CAST(q.rev_c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(q.rev_c AS DOUBLE) / y.yr_c, 6) AS share_of_year
    FROM qy q JOIN yt y ON q.yr = y.yr
    ORDER BY q.yr, q.qtr
    LIMIT 100
    """,
    tags=("tpcds", "seasonality", "share"),
)

# frequency-quartile × monetary-quartile customer cross-tab.
# r13 (verdict weak item): boundary-banded like the decile profile
# above — six percentile_disc boundaries replace the two global
# NTILE(4) windows; ties on a boundary take the better quartile.
_FMM_PC = """
      SELECT o_custkey AS custkey, COUNT(*) AS freq,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey"""
_FMM_BODY = """
    bounds AS (
      SELECT
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY freq DESC)
             AS BIGINT) AS f1,
        CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY freq DESC)
             AS BIGINT) AS f2,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY freq DESC)
             AS BIGINT) AS f3,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY rev_c DESC)
             AS BIGINT) AS m1,
        CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY rev_c DESC)
             AS BIGINT) AS m2,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY rev_c DESC)
             AS BIGINT) AS m3
      FROM {pc}),
    banded AS (
      SELECT custkey,
             CASE WHEN freq >= (SELECT f1 FROM bounds) THEN 1
                  WHEN freq >= (SELECT f2 FROM bounds) THEN 2
                  WHEN freq >= (SELECT f3 FROM bounds) THEN 3
                  ELSE 4 END AS f_q,
             CASE WHEN rev_c >= (SELECT m1 FROM bounds) THEN 1
                  WHEN rev_c >= (SELECT m2 FROM bounds) THEN 2
                  WHEN rev_c >= (SELECT m3 FROM bounds) THEN 3
                  ELSE 4 END AS m_q
      FROM {pc})
    SELECT CAST(f_q AS BIGINT) AS f_q, CAST(m_q AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM banded
    GROUP BY f_q, m_q
    ORDER BY f_q, m_q
"""

register_split_sql(
    "tpcds_freq_monetary_matrix",
    stages=[(_FMM_PC, "fmm_per_cust_m")],
    final_sql="WITH " + _FMM_BODY.format(pc="fmm_per_cust_m").lstrip(),
    oracle="WITH per_cust AS ("
    + _FMM_PC
    + "),\n"
    + _FMM_BODY.format(pc="per_cust").lstrip(),
    tags=("tpcds", "cross-tab", "ntile"),
)

# relative spread per brand: (max - min) / mean net price, exact cents.
register_sql(
    "tpcds_spread_by_group",
    """
    WITH pc AS (
      SELECT p_brand,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      FROM lineitem JOIN part ON l_partkey = p_partkey)
    SELECT p_brand,
           CAST(MIN(price_c) AS BIGINT) AS min_c,
           CAST(MAX(price_c) AS BIGINT) AS max_c,
           ROUND(CAST(MAX(price_c) - MIN(price_c) AS DOUBLE) * COUNT(*)
                 / SUM(price_c), 6) AS rel_spread
    FROM pc
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 200
    """,
    oracle="""
    WITH pc AS (
      SELECT p_brand,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      FROM lineitem JOIN part ON l_partkey = p_partkey)
    SELECT p_brand,
           CAST(MIN(price_c) AS BIGINT) AS min_c,
           CAST(MAX(price_c) AS BIGINT) AS max_c,
           ROUND(CAST(MAX(price_c) - MIN(price_c) AS DOUBLE) * COUNT(*)
                 / CAST(SUM(price_c) AS BIGINT), 6) AS rel_spread
    FROM pc
    GROUP BY p_brand
    ORDER BY p_brand
    LIMIT 200
    """,
    tags=("tpcds", "spread", "exact-stats"),
)

# month-over-month change of each month's share of total revenue:
# a window (share) of a window (LAG) over an aggregate.
_LSC_STAGE = """
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY date_trunc('month', o_orderdate)"""
_LSC_FINAL = """
    WITH tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS all_c FROM {m}),
    shares AS (
      SELECT mon, rev_c,
             ROUND(CAST(rev_c AS DOUBLE) / (SELECT all_c FROM tot), 6)
               AS share,
             LAG(rev_c) OVER (ORDER BY mon) AS prev_c
      FROM {m})
    SELECT mon, rev_c, share,
           ROUND(CAST(rev_c - COALESCE(prev_c, rev_c) AS DOUBLE)
                 / (SELECT all_c FROM tot), 6) AS share_change
    FROM shares
    ORDER BY mon
    LIMIT 200
    """

register_split_sql(
    "tpcds_lagged_share_change",
    # the monthly rollup m feeds the grand total AND the share window;
    # materialized once (split-SQL; oracle keeps the single statement).
    stages=[(_LSC_STAGE, "lsc_m")],
    final_sql=_LSC_FINAL.replace("{m}", "lsc_m"),
    oracle='\n    WITH m AS (' + _LSC_STAGE + '),'
    + _LSC_FINAL.replace("{m}", "m").lstrip().removeprefix("WITH"),
    tags=("tpcds", "share-change", "window-over-agg"),
)

# exact median vs mean gap per market segment (integer cents).
register_sql(
    "tpcds_median_vs_mean_gap",
    """
    WITH oc AS (
      SELECT c_mktsegment,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders JOIN customer ON o_custkey = c_custkey)
    SELECT c_mktsegment,
           ROUND(median(price_c) / 100.0, 4) AS median_price,
           ROUND(CAST(SUM(price_c) AS DOUBLE) / COUNT(*) / 100.0, 4)
             AS mean_price,
           ROUND((CAST(SUM(price_c) AS DOUBLE) / COUNT(*)
                  - median(price_c)) / 100.0, 4) AS mean_minus_median
    FROM oc
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("tpcds", "median", "exact-stats"),
)

# first-order value by first-order month (acquisition-cohort economics):
# ROW_NUMBER to isolate each customer's first order, then one aggregate.
register_sql(
    "tpcds_first_order_cohort_value",
    """
    WITH firsts AS (
      SELECT o_custkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS cohort_mon,
           CAST(COUNT(*) AS BIGINT) AS n_new_customers,
           ROUND(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 100.0, 4)
             AS avg_first_order_value
    FROM firsts
    WHERE rn = 1
    GROUP BY date_trunc('month', o_orderdate)
    ORDER BY cohort_mon
    LIMIT 200
    """,
    tags=("tpcds", "cohort", "first-order"),
)

# Pareto coverage: how many top customers cover 80% of revenue —
# exact integer cumulative sums (prefix*5 < total*4 avoids any float).
# r14 (r13 verdict weak item — the LAST corpus-cardinality global
# window in the registry): the old text ran SUM(rev_c) OVER (ORDER BY
# rev_c DESC, custkey ROWS UNBOUNDED PRECEDING) + ROW_NUMBER over ALL
# customers in ONE partition.  Now the cur_token_budget_greedy
# two-level prefix sum (queries/curation.py): (1) coarse-band each
# customer by rev_c decile boundaries (percentile_disc — a tiny
# ordered-set aggregate, broadcast); bands are order-prefixes of
# (rev_c DESC, custkey) because the band is a monotone function of
# rev_c alone (ties share a band); (2) per-band revenue totals (≤10
# rows) turn into per-band OFFSETS via a tiny band<band self-join;
# (3) the running sum windows PARTITION BY band, offset by the band's
# predecessor total.  rev_before = offset + within-band exclusive
# prefix is IDENTICAL to the old global cum_c - rev_c — same output,
# bit for bit (pinned against a pure-Python pareto reference in
# tests/test_fuzz.py) — but the widest window partition is one decile,
# not the corpus.  Revenue accumulates in DECIMAL(38,0) (Spark) /
# DECIMAL(38,0)-sum (DuckDB): corpus-growing cents would overflow a
# bare BIGINT*5 under ANSI past ~1.8e18; exact below 1e38 on both
# engines.  Worst case (all rev_c equal) degenerates to one band — a
# data-skew bound, not a plan bound.
_PARETO_SPEND = """
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey"""
_PARETO_BOUNDS = ",\n".join(
    f"        CAST(percentile_disc(0.{k}) WITHIN GROUP (ORDER BY rev_c DESC)"
    f" AS BIGINT) AS b{k}"
    for k in range(1, 10)
)
_PARETO_CASE = (
    "CASE "
    + " ".join(
        f"WHEN rev_c >= (SELECT b{k} FROM pbounds) THEN {k}"
        for k in range(1, 10)
    )
    + " ELSE 10 END"
)
_PARETO_BODY = f"""
    pbounds AS (
      SELECT
{_PARETO_BOUNDS}
      FROM {{pc}}),
    banded AS (
      SELECT custkey, rev_c,
             {_PARETO_CASE} AS band
      FROM {{pc}}),
    btot AS (
      SELECT band,
             CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS brev,
             CAST(COUNT(*) AS BIGINT) AS bn
      FROM banded GROUP BY band),
    boff AS (
      SELECT a.band,
             CAST(COALESCE(SUM(b.brev), 0) AS DECIMAL(38,0)) AS off_rev
      FROM btot a LEFT JOIN btot b ON b.band < a.band
      GROUP BY a.band),
    totals AS (
      SELECT CAST(SUM(brev) AS DECIMAL(38,0)) AS total_rev,
             CAST(SUM(bn) AS BIGINT) AS n_cust
      FROM btot),
    ranked AS (
      SELECT d.custkey,
             CAST(o.off_rev
               + COALESCE(SUM(CAST(d.rev_c AS DECIMAL(38,0))) OVER (
                        PARTITION BY d.band
                        ORDER BY d.rev_c DESC, d.custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS DECIMAL(38,0)) AS rev_before
      FROM banded d JOIN boff o ON d.band = o.band)
    SELECT CAST(MAX(t.n_cust) AS BIGINT) AS total_customers,
           CAST(SUM(CASE WHEN r.rev_before * 5 < t.total_rev * 4
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS customers_for_80pct,
           ROUND(CAST(SUM(CASE WHEN r.rev_before * 5 < t.total_rev * 4
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / MAX(t.n_cust), 6) AS pareto_fraction
    FROM ranked r CROSS JOIN totals t
"""

register_split_sql(
    "tpcds_pareto_coverage",
    # the per-customer spend rollup feeds the boundary aggregate AND
    # the banding pass — materialized once (one orders scan).
    stages=[(_PARETO_SPEND, "pareto_spend_m")],
    final_sql="WITH " + _PARETO_BODY.format(pc="pareto_spend_m").lstrip(),
    oracle="WITH per_cust AS ("
    + _PARETO_SPEND
    + "),\n"
    + _PARETO_BODY.format(pc="per_cust").lstrip(),
    tags=("tpcds", "pareto", "two-level-prefix"),
)

# ---------------------------------------------------------------------------
# Round-4 fifth tranche: set-operation trios (q38/q87), FULL OUTER
# classification (q97), channel tagging (q76), OR-chain dim subquery
# (q41), quarter-share chain (q31).
# ---------------------------------------------------------------------------

# q38-ish: customers active in ALL THREE segments-of-interest
# (INTERSECT of three projections).
register_sql(
    "tpcds_three_way_intersect",
    """
    SELECT COUNT(*) AS n_triple_active FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
    """,
    tags=("tpcds", "intersect-trio", "set-ops"),
)

# q87-ish: customers in the first slice but NEITHER of the other two
# (chained EXCEPT).
register_sql(
    "tpcds_three_way_except",
    """
    SELECT COUNT(*) AS n_only_first FROM (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') t
    """,
    tags=("tpcds", "except-chain", "set-ops"),
)

# q97-ish: FULL OUTER JOIN of two per-customer aggregates, classified
# into both/left-only/right-only counts in one scan of the join.
register_sql(
    "tpcds_full_outer_classify",
    """
    WITH urgent AS (
      SELECT o_custkey AS ck, COUNT(*) AS n
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
    low AS (
      SELECT o_custkey AS ck, COUNT(*) AS n
      FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey)
    SELECT CAST(SUM(CASE WHEN u.ck IS NOT NULL AND l.ck IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS both_priorities,
           CAST(SUM(CASE WHEN l.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS urgent_only,
           CAST(SUM(CASE WHEN u.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS low_only
    FROM urgent u FULL OUTER JOIN low l ON u.ck = l.ck
    """,
    tags=("tpcds", "full-outer", "classification"),
)

# q76-ish: UNION ALL channels tagged with their source label feeding one
# aggregation (the "which channel produced this row" audit).
register_sql(
    "tpcds_union_channel_tagging",
    """
    WITH tagged AS (
      SELECT 'order' AS channel,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS amount_c
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'lineitem' AS channel,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS amount_c
      FROM lineitem WHERE l_returnflag = 'R')
    SELECT channel, yr,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(amount_c) AS BIGINT) AS cents
    FROM tagged
    GROUP BY channel, yr
    ORDER BY channel, yr
    LIMIT 100
    """,
    tags=("tpcds", "union-tagging", "channels"),
)

# q41-ish: dimension subquery with a deep OR-chain of attribute
# combinations, probed with IN.
register_sql(
    "tpcds_or_chain_dim_subquery",
    """
    SELECT CAST(MIN(l_partkey) AS BIGINT) AS first_partkey,
           COUNT(*) AS matches
    FROM lineitem
    WHERE l_partkey IN (
      SELECT p_partkey FROM part
      WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15)
         OR (p_type = 'ECONOMY' AND p_size BETWEEN 20 AND 35)
         OR (p_brand IN ('Brand#11', 'Brand#12') AND p_size > 40))
      AND l_quantity > 25
    """,
    tags=("tpcds", "or-chain", "in-subquery"),
)

# q31-ish: quarter-over-quarter share growth compared across two
# segments via chained equi self-joins of one quarterly aggregate.
_QSC_STAGE = """
      SELECT c_mktsegment AS seg,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      GROUP BY c_mktsegment, EXTRACT(YEAR FROM o_orderdate),
               EXTRACT(QUARTER FROM o_orderdate)"""
_QSC_FINAL = """
    SELECT a.seg, a.yr, a.qtr,
           ROUND(CAST(b.rev_c AS DOUBLE) / a.rev_c, 6) AS qoq_growth
    FROM {q} a JOIN {q} b
      ON a.seg = b.seg AND b.yr = a.yr AND b.qtr = a.qtr + 1
    WHERE a.qtr < 4
    ORDER BY a.seg, a.yr, a.qtr
    LIMIT 200
    """

register_split_sql(
    "tpcds_quarter_share_chain",
    # the quarter rollup q is self-joined; materialized once (split-SQL).
    stages=[(_QSC_STAGE, "qsc_m")],
    final_sql=_QSC_FINAL.replace("{q}", "qsc_m"),
    oracle='\n    WITH q AS (' + _QSC_STAGE + ')'
    + _QSC_FINAL.replace("{q}", "q"),
    tags=("tpcds", "qoq-chain", "self-join"),
)

# q25/q29-ish triple-fact chain: bought, returned, bought again later —
# three instances of the fact joined on (customer via order, part) with
# event ordering enforced by ship dates.
register_sql(
    "tpcds_buy_return_rebuy",
    """
    WITH buys AS (
      -- per (customer, brand, day) at most one row per role: collapsing
      -- to first/last dates per role keeps the three-way join linear in
      -- |customer x brand| instead of fanning out per lineitem
      SELECT o_custkey AS ck, p_brand AS bk,
             MIN(CASE WHEN l_returnflag <> 'R' THEN l_shipdate END)
               AS first_buy,
             MAX(CASE WHEN l_returnflag <> 'R' THEN l_shipdate END)
               AS last_buy,
             MIN(CASE WHEN l_returnflag = 'R' THEN l_shipdate END)
               AS first_ret,
             MAX(CASE WHEN l_returnflag = 'R' THEN l_shipdate END)
               AS last_ret
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
      GROUP BY o_custkey, p_brand)
    SELECT CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_rebuy_customers,
           CAST(COUNT(*) AS BIGINT) AS n_chains
    FROM buys
    WHERE first_buy IS NOT NULL AND first_ret IS NOT NULL
      AND first_ret > first_buy AND last_buy > first_ret
    """,
    tags=("tpcds", "triple-fact", "buy-return-rebuy"),
)

# q13-ish OR-of-ANDs: disjoint demographic band conjunctions united by
# OR, each band pairing a dimension filter with a fact range.
register_sql(
    "tpcds_or_of_ands_bands",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING'
           AND o_totalprice BETWEEN 10000 AND 120000
           AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
       OR (c_mktsegment = 'MACHINERY'
           AND o_totalprice BETWEEN 120000 AND 240000
           AND o_orderpriority = '3-MEDIUM')
       OR (c_mktsegment = 'AUTOMOBILE'
           AND o_totalprice > 240000)
    """,
    tags=("tpcds", "or-of-ands", "bands"),
)

# q58-ish: parts whose revenue in two "channels" (return-flagged vs
# clean lineitems) is within 10% of each other.
register_sql(
    "tpcds_within_pct_two_channels",
    """
    WITH clean AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey),
    flagged AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
    SELECT c.pk AS partkey,
           ROUND(CAST(c.rev_c AS DOUBLE) / 100.0, 2) AS clean_rev,
           ROUND(CAST(f.rev_c AS DOUBLE) / 100.0, 2) AS flagged_rev
    FROM clean c JOIN flagged f ON c.pk = f.pk
    WHERE c.rev_c * 10 BETWEEN f.rev_c * 9 AND f.rev_c * 11
    ORDER BY partkey
    LIMIT 1000
    """,
    tags=("tpcds", "within-pct", "two-channel"),
)

# ---------------------------------------------------------------------------
# Full mapping of the 99 TPC-DS planning-corpus queries (reference
# core/tests/tpc-ds/1.sql..99.sql, exercised by core/tests/tpcds_planning.rs)
# to the registry entry that re-expresses each query's idiom on the driver
# star schema.  Many-to-one where the corpus itself repeats a template
# across channels (e.g. q47/q57, q62/q99, q33/q56/q60 are the same shape
# over store/catalog/web): the template maps once and its channel clones
# map to the same entry.  tests/test_registry_inventory.py parses this
# block and enforces: every number 1..99 exactly once, every mapped name a
# registered "tpcds"-tagged query.
#
# q1→tpcds_t7_returns_above_nation_avg q2→tpcds_weekday_share_two_years
# q3→tpcds_rollup_rank q4→tpcds_t7_multi_year_profile_stack
# q5→tpcds_t8_channel_pnl_union_rollup q6→tpcds_above_group_avg
# q7→tpcds_demographic_stats_gated q8→tpcds_t8_zip_prefix_dense
# q9→tpcds_scalar_subqueries_in_case q10→tpcds_exists_or_channels
# q11→tpcds_two_channel_growth_compare q12→tpcds_share_of_total
# q13→tpcds_or_of_ands_bands q14→tpcds_intersect_driven_sales
# q15→tpcds_t8_cross_dim_or_fence q16→tpcds_t8_ship_exists_notexists
# q17→tpcds_quantity_cov q18→tpcds_rollup_subtotals_only
# q19→tpcds_t7_differing_nation_orders q20→tpcds_share_of_total
# q21→tpcds_t7_before_after_pivot_band q22→tpcds_rollup_subtotals_only
# q23→tpcds_frequent_items_best_customers q24→tpcds_t8_above_avg_of_sums
# q25→tpcds_buy_return_rebuy q26→tpcds_demographic_stats_gated
# q27→tpcds_rollup_subtotals_only q28→tpcds_band_counts
# q29→tpcds_buy_return_rebuy q30→tpcds_t7_returns_above_nation_avg
# q31→tpcds_qoq_web_vs_store q32→tpcds_correlated_avg_discount
# q33→tpcds_t8_triple_leg_dim_union q34→tpcds_t7_bulk_ticket_households
# q35→tpcds_demographic_stats_gated q36→tpcds_share_of_total
# q37→tpcds_t8_inventory_band_items q38→tpcds_three_way_intersect
# q39→tpcds_t7_cv_pairs_cross_month q40→tpcds_t7_before_after_pivot_band
# q41→tpcds_t7_and_of_ors_distinct_dim q42→tpcds_rollup_rank
# q43→tpcds_weekday_share_two_years q44→tpcds_top_bottom_rank_join
# q45→tpcds_or_local_or_subquery q46→tpcds_t7_differing_nation_orders
# q47→tpcds_lag_lead_sandwich q48→tpcds_or_of_ands_bands
# q49→tpcds_dual_rank_return_ratio q50→tpcds_days_to_ship_buckets
# q51→tpcds_cumulative_max_channel_join q52→tpcds_rollup_rank
# q53→tpcds_deviation_from_avg q54→tpcds_revenue_bands
# q55→tpcds_rollup_rank q56→tpcds_t8_triple_leg_dim_union
# q57→tpcds_lag_lead_sandwich q58→tpcds_t7_three_channel_band
# q59→tpcds_period_self_join q60→tpcds_t8_triple_leg_dim_union
# q61→tpcds_t7_promo_share q62→tpcds_days_to_ship_buckets
# q63→tpcds_deviation_from_avg q64→tpcds_twice_joined_wide_star
# q65→tpcds_t7_low_revenue_supplier_parts q66→tpcds_carrier_pivot_union
# q67→tpcds_rollup_rank q68→tpcds_t7_differing_nation_orders
# q69→tpcds_gated_demographics_notexists q70→tpcds_rollup_rank
# q71→tpcds_cross_channel_union q72→tpcds_t8_qty_demand_offset_join
# q73→tpcds_basket_band_customers q74→tpcds_consecutive_year_growth
# q75→tpcds_yearly_decline_union q76→tpcds_union_channel_tagging
# q77→tpcds_channel_profit_rollup q78→tpcds_three_channel_fullouter_profile
# q79→tpcds_t7_max_profit_order_per_customer
# q80→tpcds_t8_leftjoin_returns_profit q81→tpcds_t7_returns_above_nation_avg
# q82→tpcds_t8_inventory_band_items q83→tpcds_t8_week_seq_three_legs
# q84→tpcds_t8_income_band_chain q85→tpcds_t8_triple_or_demo_pairs
# q86→tpcds_rollup_rank q87→tpcds_except_chain_count
# q88→tpcds_timeslot_matrix q89→tpcds_t7_deviation_from_year_mean
# q90→tpcds_am_pm_ratio q91→tpcds_t8_ored_demo_pairs_returns
# q92→tpcds_correlated_avg_discount q93→tpcds_returns_adjusted
# q94→tpcds_t8_ship_exists_notexists q95→tpcds_multi_exists_same_fact
# q96→tpcds_t8_time_of_day_count q97→tpcds_full_outer_classify
# q98→tpcds_share_of_total q99→tpcds_days_to_ship_buckets
# ---------------------------------------------------------------------------
