"""Physical-plan assertions — the 100 TB efficiency gate.

Correctness tests prove WHAT is computed; these prove HOW: filters reach
the parquet scan, projections prune the read schema, small dims
broadcast, aggregates split partial/final, hot paths stay inside
whole-stage codegen, and rank-limit windows use the group-limit
optimization.  Mirrors the reference's plan-snapshot tests
(reference datafusion/sqllogictest/test_files/explain.slt,
parquet_filter_pushdown.slt, tpch plans/).
"""

from __future__ import annotations

import re

import pytest

from datafusion_umami_spark.registry import REGISTRY, _load_all

_load_all()


def plan_str(df, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """tpch_q6 is a pure scan-filter-agg: its predicates must appear in
    PushedFilters on the parquet scan node."""
    plan = plan_str(q("tpch_q6", spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(
        "GreaterThanOrEqual" in ln or "LessThan" in ln or "IsNotNull" in ln
        for ln in pushed
    ), pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    """q6 reads 4 of lineitem's 11 columns — ReadSchema must not contain
    the unused ones (a scan reading all columns for a narrow projection
    is wrong at any scale, fatal at 100 TB)."""
    plan = plan_str(q("tpch_q6", spark, sf_dir))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    schema_line = " ".join(read)
    for needed in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert needed in schema_line
    for unused in ("l_returnflag", "l_partkey", "l_tax"):
        assert unused not in schema_line


def test_small_dims_broadcast(spark, sf_dir):
    """Multi-join TPC-H queries must broadcast the small dimension sides
    instead of shuffling the fact table against them."""
    plan = plan_str(q("tpch_q5", spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_partial_final_aggregation(spark, sf_dir):
    """Grouped aggregation must be map-side partial + final (the
    reference's Partial/FinalPartitioned AggregateExec modes) — one full
    shuffle of raw rows would dominate at scale."""
    plan = plan_str(q("tpch_q1", spark, sf_dir))
    assert "partial_" in plan, plan


def test_whole_stage_codegen(spark, sf_dir):
    """The scan→filter→project→partial-agg pipeline must fuse into
    WholeStageCodegen (JVM-side, no Python in the hot path).  codegen
    explain mode is used because AQE hides codegen markers in the
    not-yet-final simple plan."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_str(q("tpch_q1", spark, sf_dir), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen" in plan
    n = int(plan.split("WholeStageCodegen subtrees.")[0].strip().split()[-1])
    assert n >= 1


def test_window_group_limit(spark, sf_dir):
    """rank()<=k per group must plan a WindowGroupLimit (partial top-k
    before the shuffle) rather than materializing full partitions."""
    plan = plan_str(q("window_topk_per_group", spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_partition_pruning_on_hive_layout(spark, sf_dir):
    """Scanning the hive-partitioned sink with a partition-column filter
    must prune at the directory level (PartitionFilters), not post-scan."""
    plan = plan_str(q("partitioned_write_pruned_scan", spark, sf_dir))
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part and any("l_returnflag" in ln for ln in part), plan


def test_topk_plans_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must fuse into TakeOrderedAndProject (the
    reference's TopK operator), never a global sort."""
    plan = plan_str(q("sort_limit_topk", spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize(
    "name", sorted(n for n, s in REGISTRY.items() if s.bench)
)
def test_no_python_row_udf_in_headline_queries(name, spark, sf_dir):
    """Headline/bench queries must not fall back to row-at-a-time Python
    (BatchEvalPython); only Arrow-batched eval (ArrowEvalPython /
    mapInPandas stages) is acceptable where Python is needed at all."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python UDF"


def test_point_lookup_pushes_equality(spark, sf_dir):
    """cb_point_lookup's equality predicate must reach the parquet scan
    (row-group/page pruning at scale, not a full scan + post-filter)."""
    plan = plan_str(q("cb_point_lookup", spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("EqualTo" in ln for ln in pushed), plan


@pytest.mark.parametrize(
    "name", ["dedup_simhash", "dedup_embedding_cosine", "dedup_minhash_lsh"]
)
def test_dedup_candidate_generation_is_equi_join(name, spark, sf_dir):
    """Near-dup candidate generation must be a bucketed EQUI-join (band
    signature / simhash band / hyperplane bucket) — an all-pairs
    BroadcastNestedLoopJoin or CartesianProduct is O(n^2) comparisons
    and never finishes at 100 TB."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: all-pairs join\n{plan}"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"


def test_jaccard_prunes_high_df_words(spark, sf_dir):
    """dedup_jaccard_words must keep its document-frequency pruning join
    (the stopword-skew guard): the registered Spark text and the DuckDB
    oracle both filter words through `wdf.df <= 50` BEFORE the candidate
    join, and the full corpus genuinely contains words above the cap
    (so the guard is not vacuous)."""
    from datafusion_umami_spark.queries.dedup import _JACCARD_W_SQL
    from datafusion_umami_spark.tables import register_views

    spec = REGISTRY["dedup_jaccard_words"]
    assert "df <= 50" in _JACCARD_W_SQL, "pruning guard removed from Spark side"
    assert "wdf.df <= 50" in spec.oracle, "pruning join removed from oracle side"
    register_views(spark, sf_dir)
    over_cap = spark.sql(
        r"""
        SELECT COUNT(*) AS n FROM (
          SELECT word, COUNT(*) AS df FROM (
            SELECT DISTINCT doc_id,
                   explode(split(trim(text), '\\s+')) AS word
            FROM documents) GROUP BY word
          HAVING COUNT(*) > 50)
        """
    ).collect()[0]["n"]
    assert over_cap > 0, "corpus has no high-df words; pruning test is vacuous"


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key → the sort-merge join must
    read pre-distributed buckets with NO Exchange before the join (the
    co-located join that removes the dominant shuffle at 100 TB)."""
    from datafusion_umami_spark.queries.bucketing import bucketed_join_df

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_str(bucketed_join_df(spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    join_part = plan.split("SortMergeJoin")[-1]  # subtree below the join
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in join_part, plan


def test_sum_series_single_scan_partial_agg(spark, sf_dir):
    """cb_sum_series (20-term SUM battery) must stay ONE scan of events
    with a partial/final HashAggregate split — no plan should re-read
    the table per term, and map-side combine keeps the shuffle tiny."""
    plan = plan_str(q("cb_sum_series", spark, sf_dir), "simple")
    assert plan.count("FileScan parquet") == 1, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_shifted_key_groupby_partial_agg(spark, sf_dir):
    """cb_shifted_key_groupby groups on an arithmetic key family; the
    derived keys must not block the partial-aggregation split (at scale
    the map-side combine is what bounds the shuffle on high-card keys)."""
    plan = plan_str(q("cb_shifted_key_groupby", spark, sf_dir), "simple")
    assert plan.count("HashAggregate") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize(
    "name",
    ["job_widest_9way_star", "job_episode_range_8way", "job_four_inlist_dims"],
)
def test_job_stars_broadcast_dims_no_cartesian(name, spark, sf_dir):
    """The round-4 JOB stars join 7-9 relations via comma-join text; the
    planner must (a) broadcast the small dimension arms instead of
    shuffling the fact against them and (b) never fall back to a
    cartesian/BNLJ even with every join predicate buried in WHERE."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast of dims\n{plan}"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"


def test_crossed_bridges_is_equi_self_join(spark, sf_dir):
    """job_crossed_bridges self-joins lineitem on (partkey, suppkey);
    the inequality l1.l_orderkey < l2.l_orderkey must ride along as a
    join/filter condition on an EQUI join, not force a nested loop."""
    plan = plan_str(q("job_crossed_bridges", spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_day_histogram_pushes_time_fence(spark, sf_dir):
    """cb_day_histogram's half-open ts fence must reach the parquet scan
    as min/max pushed filters — at 100 TB the fence is what turns a
    full-table scan into a two-month scan."""
    plan = plan_str(q("cb_day_histogram", spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(
        "GreaterThanOrEqual" in ln and "LessThan" in ln for ln in pushed
    ), plan


@pytest.mark.parametrize(
    "name",
    [
        "job_double_aliased_arms_8way",
        "job_three_fenced_arms",
        "job_two_nation_arms_crossed",
    ],
)
def test_round4_job_tranche_broadcasts(name, spark, sf_dir):
    """Second JOB tranche: role-played dimension arms (nation/region
    aliased twice) must still broadcast — 7 BroadcastHashJoins for the
    8-way — and never degrade to cartesian/BNLJ."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast of dims\n{plan}"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"


@pytest.mark.parametrize(
    "name", ["text_decontam_flags", "text_decontam_pair_overlap"]
)
def test_decontam_broadcasts_eval_side_jvm_only(name, spark, sf_dir):
    """Decontamination probes the tiny eval-set n-gram table: the hash
    join must broadcast it (at 100 TB the corpus side never reshuffles
    for the probe), stay fully JVM-side, and never plan an all-pairs
    fallback."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tfidf_uses_window_group_limit_no_nlj(spark, sf_dir):
    """TF-IDF top-3 per doc must plan as WindowGroupLimit (rank pushed
    into the sort, no full per-partition materialization), and the
    corpus-size scalar must be inlined (no 1-row nested-loop join)."""
    plan = plan_str(q("text_tfidf_top_terms", spark, sf_dir), "simple")
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_cohort_retention_broadcasts_user_table(spark, sf_dir):
    """The cohort matrix joins per-user first-seen days against per-user
    activity days — both |users|-sized aggregates; the join must
    broadcast, with partial/final aggregate splits on both inputs."""
    plan = plan_str(q("evt_cohort_retention", spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_balanced_sample_uses_window_group_limit(spark, sf_dir):
    """Per-class sampling keeps 40 rows per language via ROW_NUMBER —
    the plan must prune with WindowGroupLimit so each map task emits at
    most K rows per class before the exchange."""
    plan = plan_str(q("cur_balanced_per_class_sample", spark, sf_dir), "simple")
    assert "WindowGroupLimit" in plan, plan
    assert "BatchEvalPython" not in plan, plan


# --- round-5 bench promotions (r4 verdict item 7) --------------------------
def test_pagerank_bench_plan_equi_joins_topk(spark, sf_dir):
    """graph_pagerank_purchases: every per-iteration step must plan as
    equi-joins over the checkpointed frames (no cartesian/BNLJ fallback
    from the CASE/DECIMAL damping expression), and the final top-50 must
    fuse into TakeOrderedAndProject, not a global sort."""
    plan = plan_str(q("graph_pagerank_purchases", spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_c4_pipeline_pushes_gates_to_scan(spark, sf_dir):
    """pipeline_c4_style_filter: the language and length gates are plain
    column predicates and must reach the parquet scan as pushed filters
    — at 100 TB the gates run during the scan, and the only exchange
    carries (content_hash, doc_id) aggregate state.  Since the r14
    split the documents scan lives in the materialized `kept` STAGE
    (the final reads only the checkpointed view — gated by the
    fact-rescan cap test), so the pushdown assert targets the stage
    plan."""
    from datafusion_umami_spark.registry import REGISTRY, _load_all
    from datafusion_umami_spark.tables import register_views

    _load_all()
    spec = REGISTRY["pipeline_c4_style_filter"]
    register_views(spark, sf_dir)
    (stage_sql, _view), = spec.fn._split_stages
    stage_plan = plan_str(spark.sql(stage_sql))
    pushed = [ln for ln in stage_plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(
        "In(lang" in ln and "GreaterThanOrEqual(n_chars" in ln for ln in pushed
    ), stage_plan
    df = q("pipeline_c4_style_filter", spark, sf_dir)
    simple = plan_str(df, "simple")
    assert "BatchEvalPython" not in simple, simple
    assert "CartesianProduct" not in simple, simple


def test_tpcds_rollup_rank_expands_and_broadcasts(spark, sf_dir):
    """tpcds_rollup_rank: ROLLUP must plan as a single Expand over one
    aggregated pass (not one scan per grouping set), the dimension arms
    (customer/nation) must broadcast against the fact, and the window
    runs on the already-aggregated rollup output."""
    plan = plan_str(q("tpcds_rollup_rank", spark, sf_dir), "simple")
    assert "Expand" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


@pytest.mark.parametrize(
    "name", ["job_full_clique_preds_10way", "job_three_like_fences_chain"]
)
def test_job_tranche3_bench_broadcasts_no_cartesian(name, spark, sf_dir):
    """Tranche-3 bench promotions: the full-clique 10-way must collapse
    the redundant pairwise join predicates into one equi-join tree with
    broadcast dimension arms (never a cartesian or a repeated join of
    the same pair), and the fenced deep chain must broadcast its LIKE-
    filtered dims."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast of dims\n{plan}"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"


@pytest.mark.parametrize(
    "name",
    [
        "job_triple_bridge_three_chains",
        "job_five_alias_fact_clique",
        "tpcds_twice_joined_wide_star",
    ],
)
def test_round6_bench_promotions_broadcast_no_cartesian(name, spark, sf_dir):
    """Round-6 bench promotions: the 19d triple-bridge fanout and the
    30c five-alias clique must collapse their pairwise-equality closures
    into equi-join trees with broadcast dimension arms; the q64
    twice-joined wide star's dims (customer/part) must broadcast against
    the materialized year aggregate.  Never a cartesian or BNLJ."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast of dims\n{plan}"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-Python in plan\n{plan}"


@pytest.mark.parametrize(
    "name,want_broadcast",
    [
        # dim arms (part / supplier) must broadcast against the fact
        ("job_keyword_in8_triple_clique", True),
        ("job_double_link_two_hops", True),
    ],
)
def test_round7_bench_promotions_equi_join_no_cartesian(
    name, want_broadcast, spark, sf_dir
):
    """Round-7 bench promotions: the 20a IN-8 triple clique must collapse
    its pairwise orderkey closure into an equi-join tree with the
    IN-fenced part dim broadcast; the two-hop link chain's part/supplier
    links must broadcast.  Never a cartesian, BNLJ, or row-Python."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    if want_broadcast:
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast of dims\n{plan}"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-Python in plan\n{plan}"


@pytest.mark.parametrize(
    "name,part_keys",
    [
        # r15 self-join -> window restructures: the consecutive-year
        # partner is LEAD/LAG over the aggregate, so the plan must be
        # join-free over the aggregate (wide_star keeps only its two
        # broadcast DIM joins) and the aggregate + window must SHARE
        # one exchange — the REPARTITION(entity) hint's
        # subset-of-group-keys clustering satisfies both, so exactly
        # one data Exchange may appear.
        ("tpcds_yearly_decline_union", "ch"),
        ("tpcds_twice_joined_wide_star", "cust"),
    ],
)
def test_r15_consecutive_year_windows_single_exchange(
    name, part_keys, spark, sf_dir
):
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "Window" in plan, f"{name}: window missing\n{plan}"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        f"{name}: the self-join came back\n{plan}"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    n_exchange = sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )
    assert n_exchange == 1, (
        f"{name}: expected exactly 1 data exchange (the REPARTITION "
        f"hint on ({part_keys}, part)), got {n_exchange}\n{plan}"
    )


# --- round-5 CTE-materialization gates (SCALE.md audit) --------------------
# Spark inlines deterministic CTEs; these queries were re-executing
# shuffle-bearing subtrees once per reference (triangle count: 32
# lineitem scans). After the materialize.py split, the FINAL stage must
# read checkpoints — at most `cap` scans of the big fact tables, the
# deliberate map-only/point-lookup re-scans documented in SCALE.md.
@pytest.mark.parametrize(
    "name,cap",
    [
        ("graph_triangle_count", 0),
        ("evt_funnel_ordered", 0),
        ("dedup_jaccard_words", 0),
        ("dedup_minhash_lsh", 0),
        ("dedup_simhash", 0),
        ("dedup_embedding_cosine", 2),   # normed: map-only re-scans
        ("ann_ivf_trained", 0),
        ("cur_source_mixture_budget", 0),
        ("tpch_q15", 0),
        ("ts_anomaly_zscore_minutes", 0),
        ("ts_multires_rollup", 0),
        ("tpcds_above_group_avg", 0),
        ("tpcds_consecutive_year_growth", 0),
        ("tpcds_lagged_share_change", 0),
        ("tpcds_period_self_join", 0),
        ("tpcds_quarter_seasonality", 0),
        ("tpcds_quarter_share_chain", 0),
        # round-6 split registrations: finals read only materialized
        # views (cap 0) except where the final itself carries textual
        # fact references (q14's two INTERSECT arms; q23's third-year
        # sales join = 1 lineitem + 1 orders)
        # r15: the consecutive-year self-join became LEAD over the
        # aggregate in ONE statement — no split, no re-reference; the
        # single plan textually scans lineitem + orders once each
        ("tpcds_twice_joined_wide_star", 2),
        ("tpcds_weekday_share_two_years", 0),
        ("tpcds_top_bottom_rank_join", 0),
        ("tpcds_volatile_items_cross_month", 0),
        ("tpcds_intersect_driven_sales", 2),
        ("tpcds_frequent_item_cross_year", 2),
        # round-7 split registrations: finals self-join materialized
        # views only — zero fact scans in the final stage
        # r15: q75's curr/prev self-join became LAG over the aggregate
        # in ONE statement (same class as wide_star above)
        ("tpcds_yearly_decline_union", 2),
        ("tpcds_qoq_web_vs_store", 0),
        # round-8 split registrations (tpcds tranche 7): every final
        # reads the materialized aggregate (x4 for the q4 stack) plus
        # dim tables only — zero fact scans
        ("tpcds_t7_multi_year_profile_stack", 0),
        ("tpcds_t7_second_sale_volume_leg", 0),
        ("tpcds_t7_returns_above_nation_avg", 0),
        ("tpcds_t7_low_revenue_supplier_parts", 0),
        # r14 split: `kept` (regex-heavy documents map, referenced by
        # the dedup aggregate AND the detail join-back) materialized
        # once — the final reads only the checkpointed view
        ("pipeline_c4_style_filter", 0),
    ],
)
def test_materialized_queries_do_not_rescan_facts(name, cap, spark, sf_dir):
    from datafusion_umami_spark.operators.materialize import fact_scan_counts

    scans = fact_scan_counts(q(name, spark, sf_dir))
    assert sum(scans.values()) <= cap, (
        f"{name}: final stage re-scans facts {scans} (cap {cap}) — the "
        "CTE materialization regressed (see operators/materialize.py)"
    )


def test_twice_aliased_final_reads_no_parquet(spark, sf_dir):
    """job_from_subquery_twice_aliased's materialized stage reads only
    customer x nation — neither is in FACT_TABLES, so the fact-scan cap
    gate above would be vacuous for it (r7 self-review finding).  Pin
    the materialization directly: the final self-join must contain NO
    parquet scan at all (both arms read the checkpointed view)."""
    plan = q("job_from_subquery_twice_aliased", spark, sf_dir)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, (
        "final stage re-scans base tables — the register_split_sql "
        f"materialization regressed\n{plan}"
    )
    assert "Scan ExistingRDD" in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "mm_decode_features",
        "mm_frame_sample",
        "mm_audio_window_rms",
        "mm_image_resize_pool",
    ],
)
def test_multimodal_plans_are_arrow_batched_and_pruned(name, spark, sf_dir):
    """Multimodal kernels must run Python ONLY through Arrow-batched
    MapInPandas (never row-at-a-time BatchEvalPython), and the scan
    must prune to exactly the two columns the kernel needs — at 100 TB
    a multimodal pass that reads the full documents schema moves the
    corpus through Python for nothing."""
    df = q(name, spark, sf_dir)
    plan = plan_str(df)
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and all(
        "doc_id:bigint,text:string" in ln and "lang" not in ln for ln in read
    ), f"{name}: scan not pruned to (doc_id, text)\n{read}"


def test_fact_scan_counts_positive_control(spark, sf_dir):
    """fact_scan_counts silently returns {} if its plan-string path
    pattern (<table>.parquet) drifts — which would make every cap-0
    assertion above pass vacuously.  A bare fact scan must register as
    exactly one scan, so regex/layout drift fails HERE, loudly."""
    from datafusion_umami_spark.operators.materialize import fact_scan_counts
    from datafusion_umami_spark.tables import table

    scans = fact_scan_counts(table(spark, sf_dir, "lineitem").select("l_orderkey"))
    assert scans.get("lineitem") == 1, (
        f"detector disarmed: bare lineitem scan counted as {scans} — "
        "fact_scan_counts' plan-string pattern no longer matches"
    )
    both = fact_scan_counts(
        table(spark, sf_dir, "lineitem").unionByName(
            table(spark, sf_dir, "lineitem")
        )
    )
    assert both.get("lineitem") == 2


@pytest.mark.parametrize(
    "name",
    [
        "job_t6_four_bridge_clique",
        "tpcds_t7_multi_year_profile_stack",
    ],
)
def test_round8_bench_promotions_equi_join_no_cartesian(name, spark, sf_dir):
    """Round-8 bench promotions: the 25c four-bridge clique must
    collapse its C(5,2) pairwise orderkey closure into an equi-join
    tree with the IN-fenced part and supplier dims broadcast; the q4
    multi-year profile stack's final joins the materialized aggregate
    four times on the customer key — equi-joins only.  Never a
    cartesian, BNLJ, or row-Python."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-Python in plan\n{plan}"
    if name == "job_t6_four_bridge_clique":
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast of dims\n{plan}"


@pytest.mark.parametrize(
    "name",
    [
        "job_t7_all_point_star",
        "job_t7_point_center_mega_star",
        "tpcds_t8_qty_demand_offset_join",
        "tpcds_t8_above_avg_of_sums",
        "tpcds_t8_ship_exists_notexists",
    ],
)
def test_round9_additions_equi_join_no_cartesian(name, spark, sf_dir):
    """Round-9 heavy additions: the all-point star and the point-center
    mega star must collapse their spelled-out bridge closures into
    equi-join trees with dims broadcast; the q72 demand-offset join's
    quantity/date inequalities must RIDE the partkey equi-join (a
    post-join condition, never a cartesian); the q24 avg-of-sums fence
    runs its scalar aggregates as subqueries (no BNLJ against the
    1-row side); the q16 audit plans EXISTS/NOT EXISTS as semi/anti
    joins.  Never a cartesian, BNLJ, or row-Python."""
    plan = plan_str(q(name, spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-Python in plan\n{plan}"
    if name in ("job_t7_all_point_star", "job_t7_point_center_mega_star"):
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast of dims\n{plan}"


@pytest.mark.parametrize("name", [
    "distinct_on_first_order_per_customer",
    "distinct_on_expression_keys",
])
def test_distinct_on_emulation_plans_window_group_limit(name, spark, sf_dir):
    """r10 pg-compat tranche: the DISTINCT ON rewrite (rn=1 window) must
    plan a WindowGroupLimit — each executor forwards ONE candidate row
    per key before the shuffle instead of the full group, which is what
    makes the emulation survive a 100 TB fact table."""
    plan = plan_str(q(name, spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_pg_empty_over_rewrite_avoids_global_window(spark, sf_dir):
    """r11 pg-compat stretch: the empty-OVER() aggregate spec must NOT
    plan a Window node — a literal OVER () moves every row to a single
    partition (WindowExec warns; fatal at 100 TB).  The re-expression
    is a one-row global aggregate joined back onto the distributed
    rows, so the plan shows the aggregate + a broadcast join and the
    rows never single-partition."""
    plan = plan_str(q("pg_window_empty_over_aggregates", spark, sf_dir))
    # match the exec node, not the bare substring (r11 ADVICE item 3):
    # WindowGroupLimit is a DIFFERENT, desirable operator this suite
    # asserts FOR elsewhere and must not trip this gate — the trailing
    # \b alone spares it (no word boundary inside "WindowGroupLimit")
    hit = re.search(r"\bWindow\b", plan)
    assert not hit, f"global window survived the rewrite\n{plan}"
    assert "HashAggregate" in plan or "SortAggregate" in plan, plan


def test_pg_setop_base_scans_lineitem_once(spark, sf_dir):
    """r11 pg-compat stretch: the EXCEPT ALL / INTERSECT ALL spec feeds
    FOUR set-op inputs from one pruned base; split-materialization must
    leave at most one lineitem parquet scan in the final plan (the
    other three reads hit the checkpoint)."""
    from datafusion_umami_spark.operators.materialize import (
        fact_scan_counts,
        release_all,
    )

    try:
        df = q("pg_setop_all_multiplicity", spark, sf_dir)
        counts = fact_scan_counts(df)
    finally:
        release_all()
    assert counts.get("lineitem", 0) <= 1, counts


def _window_partition_group_counts(plan: str) -> list[tuple[str, int]]:
    """For every Window exec node line, return (line, n_bracket_groups).
    Spark prints `Window [exprs], [partSpec], [orderSpec]` for a
    partitioned window (3 top-level groups) and `Window [exprs],
    [orderSpec]` for a GLOBAL one (2 groups) — probed on Spark 4.1.
    Depth-counted so commas/brackets inside expressions don't split."""
    out = []
    for ln in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", ln.strip())
        if not m:
            continue
        depth = 0
        groups = 0
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        out.append((ln.strip(), groups))
    return out


@pytest.mark.parametrize(
    "name",
    [
        "evt_rfm_segments",
        "tpcds_ntile_decile_profile",
        "tpcds_freq_monetary_matrix",
        "cur_quality_curriculum_buckets",
        "cur_token_budget_greedy",
        "tpcds_pareto_coverage",
    ],
)
def test_quantile_banding_has_no_global_window(name, spark, sf_dir):
    """r12 verdict item 2 (the five `weak` specs, demanded by name): an
    unpartitioned NTILE/running-sum window forces every row of a
    users/docs-cardinality input through ONE task — fatal at 100 TB.
    The boundary-banding rewrites must plan ZERO global Window nodes:
    the four pure-banding specs have no Window at all, and the greedy
    budget's running sum must PARTITION BY its coarse band.  The
    ≤10-row band-offset self-join is allowed to BNLJ (both sides are
    band aggregates, bounded by the band count)."""
    from datafusion_umami_spark.operators.materialize import release_all

    try:
        df = q(name, spark, sf_dir)
        df.collect()  # executedPlan is authoritative post-AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_all()
    for line, groups in _window_partition_group_counts(plan):
        assert groups >= 3, (
            f"{name}: GLOBAL window survived the banding rewrite:\n"
            f"{line}\n{plan}"
        )
    # the two prefix-sum specs keep a band-PARTITIONed window (asserted
    # non-global above); the pure-banding specs plan no Window at all
    if name not in ("cur_token_budget_greedy", "tpcds_pareto_coverage"):
        assert not re.search(r"\bWindow\b", plan), (
            f"{name}: banding spec should plan no Window at all\n{plan}"
        )


@pytest.mark.parametrize(
    "name,fact",
    [
        ("evt_rfm_segments", "events"),
        ("tpcds_ntile_decile_profile", "orders"),
        ("tpcds_freq_monetary_matrix", "orders"),
        ("cur_quality_curriculum_buckets", "documents"),
        ("cur_token_budget_greedy", "documents"),
        ("tpcds_pareto_coverage", "orders"),
    ],
)
def test_quantile_banding_scans_fact_once(name, fact, spark, sf_dir):
    """The r13 banding rewrites reference their per-entity stage from
    BOTH the boundary aggregate and the banding pass; the split
    materialization must leave at most two fact scans in the final plan
    (two for RFM, whose stage itself reads events twice for max_day +
    the rollup; one for the rest) — an inlined composition would
    re-scan per reference."""
    from datafusion_umami_spark.operators.materialize import (
        fact_scan_counts,
        release_all,
    )

    try:
        df = q(name, spark, sf_dir)
        counts = fact_scan_counts(df)
    finally:
        release_all()
    assert counts.get(fact, 0) <= (2 if name == "evt_rfm_segments" else 1), (
        name,
        counts,
    )


@pytest.mark.parametrize(
    "name,fact",
    [
        ("tpch_q11", "lineitem"),
        ("cb_regex_extract_agg", "events"),
        ("cb_stats_having", "events"),
        ("cb_url_length_having", "documents"),
        ("cb_referer_domain_agg", "documents"),
        ("cb_ext_q5_p95_approx", "events"),
        ("cb_ext_q4_median_rank", "events"),
        ("cb_ext_quantiles_per_pair", "events"),
    ],
)
def test_median_fence_splits_scan_fact_once(name, fact, spark, sf_dir):
    """The r14 discrimination rewrites fence groups against a median (or
    mean-multiple) computed over the SAME group aggregate; the split
    materialization must leave at most one fact scan in the final plan
    — an inlined composition would re-scan the fact per reference
    (fence subquery + filter + output)."""
    from datafusion_umami_spark.operators.materialize import (
        fact_scan_counts,
        release_all,
    )

    try:
        df = q(name, spark, sf_dir)
        counts = fact_scan_counts(df)
    finally:
        release_all()
    assert counts.get(fact, 0) <= 1, (name, counts)
