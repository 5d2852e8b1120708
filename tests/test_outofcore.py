"""Out-of-core / plan-perturbation parity — the umami semantics gate.

The reference's umami layer (SURVEY.md §0) exists so joins and
aggregations return IDENTICAL results whether the build side fits in
memory, is partially spilled, or fully grace-partitioned.  Spark's
equivalents are shuffle partitioning + AQE + executor-side spill, all
config-driven — so the testable contract is: the same query under
hostile execution configs (tiny shuffle partition count → huge
per-partition state; broadcast disabled → shuffle joins; AQE off → no
runtime rescue) produces hash-identical results.

Mirrors the reference's memory-limit tests (core/tests/memory_limit/)
and its fuzz strategy of cross-checking alternate plans of one query
(core/tests/fuzz_cases/, SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from datafusion_umami_spark.oracle import canonical_rows
from datafusion_umami_spark.registry import REGISTRY, _load_all

_load_all()

# Heavy-state queries: big hash aggregation, multi-join with large build
# sides, semi/anti joins, windowed dedup — the shapes umami targets.
HEAVY = [
    "agg_high_cardinality",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "window_dedup_latest",
    "dedup_exact",
    # banded candidate-generation plans: band equi-joins + integer-exact
    # bucket projections must be partition-count independent
    "dedup_simhash",
    "dedup_embedding_cosine",
    "stream_stream_interval_join",
    # round-3 additions: iterative star-contraction must be partition-
    # order independent; rollup+rank over a 4-way join and the deepest
    # JOB chain are the largest multi-join states in the corpus
    "dedup_connected_components",
    "tpcds_rollup_rank",
    "job_deep_7way_chain",
    "cb_shifted_key_groupby",
    # multi-level aggregate cascade: partial/final splits at three grains
    "ts_multires_rollup",
    # round-4 additions: the widest star (9 relations, two role-played
    # dim arms) and a bridge self-join — the largest build states of the
    # new JOB tranche; the regex-keyed two-level distinct segmentation
    "job_widest_9way_star",
    "job_crossed_bridges",
    "cb_mobile_model_segmentation",
    # trained IVF: two k-means rounds whose centroid means must be
    # partition-order independent (exact scaled-int sums)
    "ann_ivf_trained",
    # round-4 families: n-gram decontamination (explode + broadcast
    # probe + per-doc agg), TF-IDF (two agg grains + group-limit
    # window), exact-integer moving-average window, cohort matrix
    "text_decontam_flags",
    "text_tfidf_top_terms",
    "tpcds_moving_avg_flag",
    "evt_cohort_retention",
    # integer-exact iterative PageRank: per-round shuffle aggregation
    # must be partition-order independent
    "graph_pagerank_purchases",
    # associativity-dependent shapes: summary+delta merge must equal the
    # recompute under any partitioning; exact-integer cumulative window
    "inc_rollup_merge",
    "tpcds_pareto_coverage",
    # round-5 additions: the full-clique 10-way and the 11-relation
    # role-play star are now the widest join states in the corpus (with
    # broadcast disabled every dim arm becomes a shuffle join); the
    # double-bridge self-join shares two keys; degree-oriented triangle
    # counting chains three self-equi-joins over the oriented edge set
    "job_full_clique_preds_10way",
    "job_eleven_rel_roleplay_star",
    "job_double_bridge_clique",
    "graph_triangle_count",
    # round-6 additions: the five-alias fact clique (three lineitem
    # self-join shuffles) and the q64 twice-joined wide star are the
    # new largest join states; the q23 semi-join stack layers two
    # materialized stages under IN-subqueries; the q39 volatility
    # cross-month self-join must be exact under any partitioning
    "job_five_alias_fact_clique",
    "tpcds_twice_joined_wide_star",
    "tpcds_frequent_item_cross_year",
    "tpcds_volatile_items_cross_month",
    # round-7 additions: the IN-8 triple clique and two-hop link chain
    # (3 fact aliases each, the largest new join states), the q75
    # decline self-join over the materialized channel aggregate, the
    # q51 full-outer-of-cumulatives window join, and the q78
    # three-channel double full-outer
    "job_keyword_in8_triple_clique",
    "job_double_link_two_hops",
    "tpcds_yearly_decline_union",
    "tpcds_cumulative_max_channel_join",
    "tpcds_three_channel_fullouter_profile",
    # round-8 additions: the four-bridge clique and the q4 four-ref
    # profile stack were gated in test_plans; round-9 adds the three-
    # bridge all-point star (broadcast disabled -> every dim arm a
    # shuffle join), the q72 demand-offset non-equi fence riding the
    # partkey equi-join, and the q24 avg-of-sums scalar fence over the
    # materialized shared aggregate
    "job_t7_all_point_star",
    "tpcds_t8_qty_demand_offset_join",
    "tpcds_t8_above_avg_of_sums",
    # round-10 additions: the DISTINCT ON rank-1 emulation (3 shuffle
    # partitions -> WindowGroupLimit partial top-1 must pick the same
    # row per key under giant partitions) and the mixed NULLS FIRST/
    # LAST sort over a derived nullable key
    "distinct_on_first_order_per_customer",
    "pg_null_ordering_matrix",
    # round-11 additions: the GROUPS-frame emulation (dense_rank +
    # RANGE must bin identical peer groups when 3 partitions force
    # giant window buffers) and the EXCEPT/INTERSECT ALL multiplicity
    # pair over one split-materialized base (no broadcast -> both set
    # ops replan as shuffle joins over the same checkpoint)
    "pg_window_groups_asymmetric_frames",
    "pg_setop_all_multiplicity",
]

HOSTILE_CONF = {
    # 3 shuffle partitions → each task holds ~10× more state than the
    # tuned default: forces the spill/large-hash-table path.
    "spark.sql.shuffle.partitions": "3",
    # no broadcast: every join must run as a shuffle (SMJ/SHJ) — the
    # grace-hash-join-equivalent path.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # no AQE rescue: the static plan must already be correct.
    "spark.sql.adaptive.enabled": "false",
}


def test_hostile_confs_are_fingerprinted_by_shared_cache():
    """Every conf this suite perturbs must re-key the shared-checkpoint
    cache (operators/materialize.py), or the hostile leg could silently
    read blocks computed under the default config and the parity check
    would be vacuous (r6 self-review finding; list unified per ADVICE)."""
    from datafusion_umami_spark.operators.materialize import PLAN_SHAPE_CONFS

    assert set(HOSTILE_CONF) <= set(PLAN_SHAPE_CONFS)


def _with_conf(spark, conf: dict[str, str]):
    saved = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    return saved


@pytest.mark.parametrize("name", HEAVY)
def test_hostile_config_same_result(name, spark, sf_dir):
    spec = REGISTRY[name]
    baseline = canonical_rows(spec.fn(spark, sf_dir).toPandas())
    saved = _with_conf(spark, HOSTILE_CONF)
    try:
        hostile = canonical_rows(spec.fn(spark, sf_dir).toPandas())
    finally:
        _with_conf(spark, saved)
    assert baseline == hostile, f"{name}: result depends on execution config"


def test_shuffle_join_plan_used_under_hostile_conf(spark, sf_dir):
    """Sanity: the hostile config really does change the physical plan
    (otherwise the parity test proves nothing)."""
    from tests.test_plans import plan_str

    # q13 has no explicit broadcast hint (hints rightly survive the conf,
    # so q5's F.broadcast(nation) would still broadcast here)
    spec = REGISTRY["tpch_q13"]
    saved = _with_conf(spark, HOSTILE_CONF)
    try:
        plan = plan_str(spec.fn(spark, sf_dir), "simple")
    finally:
        _with_conf(spark, saved)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
