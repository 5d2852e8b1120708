"""Shared-subtree materialization: the CTE-inlining countermeasure.

Spark INLINES deterministic CTEs (InlineCTE, no public conf to force
materialization), so a WITH-clause subtree referenced k times executes
k times — and reference counts MULTIPLY down a CTE chain: the SQL-text
triangle count executed its `pairs` CTE 32 times; minhash-LSH computed
the signature matrix 4 times.  Exchange reuse never rescues these
because the consuming branches differ above the exchange.

`materialize_once` eagerly localCheckpoints a DataFrame so every
downstream reference reads ONE materialization, freeing the previous
checkpoint registered under the same key (caller-holds-one hygiene, as
operators/connected_components.py / pagerank.py).

100 TB rule of thumb encoded here: only materialize REDUCED
intermediates — aggregates, distinct edge sets, per-doc signatures,
bucketed candidates — whose size is ≪ the fact table.  A raw filtered
fact scan used twice should stay a double scan (parquet pushdown makes
re-scanning cheap; checkpointing ~fact-sized data trades a columnar
scan for a full write+read).  What must never happen is the
multiplicative re-execution of a reduced subtree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from datafusion_umami_spark.operators.connected_components import _free_checkpoint

_LIVE: dict[str, DataFrame] = {}

# In-session confs that perturb physical plan shape.  ONE list, two
# consumers (r6 ADVICE — keep them from drifting): the shared-checkpoint
# fingerprint below re-keys the cache when any of these changes, and the
# hostile-config parity suite (tests/test_outofcore.py) asserts its
# HOSTILE_CONF keys are a subset — so a conf the parity gate perturbs is
# never invisible to the cache.  maxPartitionBytes is fingerprinted too:
# verify_subset --max-split covers it only via a fresh application, but
# an IN-SESSION change must also miss the cache.
PLAN_SHAPE_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.enabled",
    "spark.sql.files.maxPartitionBytes",
)

# The big fact tables of the driver schema — single source of truth for
# the CTE-inlining detector (tools/audit_scans.py) and its pinning gate
# (tests/test_plans.py::test_materialized_queries_do_not_rescan_facts).
FACT_TABLES = frozenset(
    {"lineitem", "orders", "events", "documents", "embeddings"}
)


def fact_scan_counts(df: DataFrame) -> dict[str, int]:
    """Count parquet scans of each fact table in the FINAL stage's
    executed plan — a value above the SQL's textual reference count
    means a shared subtree is re-executed per reference.

    Caveat (round-6 finding): this reads the PRE-execution plan, which
    OVER-counts scalar-subquery-bearing queries — MergeScalarSubqueries
    + ReusedSubquery collapse identical subquery plans only in the
    runtime adaptive plan (q9 shape: 9 textual refs → 3 executed
    passes, but 9 in this string).  For CTE/join shapes (no scalar
    subqueries) the pre-execution count is exact, which is what the
    cap gates in tests/test_plans.py pin."""
    import re
    from collections import Counter

    plan = df._jdf.queryExecution().executedPlan().toString()
    return dict(
        Counter(
            t
            for t in re.findall(r"file:\S*?/(\w+)\.parquet", plan)
            if t in FACT_TABLES
        )
    )


def release(key: str, blocking: bool = False) -> None:
    """Free the checkpoint held under `key` (no-op if absent) — the
    hook a sweep/bench runner calls once a query's result is collected,
    so aggregate held storage stays O(live pipeline), not O(all keys
    ever materialized across the session)."""
    prev = _LIVE.pop(key, None)
    if prev is not None:
        _free_checkpoint(prev, blocking=blocking)


def release_all(blocking: bool = False) -> None:
    """Free every held checkpoint (sequential runners call this between
    queries; the next build simply re-materializes what it needs).
    `blocking=True` waits for eviction so a timed run that follows pays
    the full build cost with no eviction overlap (bench.py)."""
    for key in list(_LIVE):
        release(key, blocking=blocking)


def live_keys() -> tuple[str, ...]:
    """Snapshot of the currently-held checkpoint keys — the hook the
    generation-deferred auto-free (__spark_entry__.queries()) uses to
    decide staleness from the ACTUAL live set rather than from key
    naming conventions (a query may pin keys not prefixed by its own
    name: 'jac_w', 'sh_sig', 'tri_pairs', ...)."""
    return tuple(_LIVE)


def materialize_view_shared(spark, key: str, view: str, build) -> DataFrame:
    """Generation-tagged SHARED materialization: sequential consumers of
    the same reduced intermediate (e.g. the MinHash signature matrix read
    by dedup_minhash_lsh, dedup_connected_components, and the cluster
    profile) reuse ONE live checkpoint instead of each recomputing and
    separately pinning it.  `key` must embed the inputs' identity
    (sf_dir) — a hit returns the existing checkpoint untouched, so a
    prior consumer's still-unconsumed plan is never unpersisted (the
    use-after-free the old per-consumer namespacing guarded against).
    Nothing is freed implicitly; call release()/release_all() when the
    pipeline is done.  `build` is a zero-arg DataFrame factory, invoked
    only on a miss.

    The effective cache key additionally fingerprints the Spark
    APPLICATION and the execution-shape confs (shuffle partitions /
    broadcast threshold / AQE): a hit must never (a) hand out a frame
    whose checkpoint blocks live in a stopped SparkContext, or
    (b) satisfy a changed-config leg with blocks computed under the
    OLD config — the hostile-config parity gate exists precisely to
    re-execute the build under the hostile shape, and a config-blind
    cache would make it vacuous (round-6 self-review finding)."""
    def conf(key: str) -> str:
        # no fallback arg: Spark 4.1 type-validates a provided default
        # (an empty-string fallback raises INVALID_CONF_VALUE on byte
        # confs); the no-arg form resolves the conf's own default.
        try:
            return str(spark.conf.get(key))
        except Exception:
            return "?"

    fp = ":".join(
        (spark.sparkContext.applicationId, *(conf(k) for k in PLAN_SHAPE_CONFS))
    )
    full_key = f"{key}@{fp}"
    df = _LIVE.get(full_key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        _LIVE[full_key] = df
    out = df.toDF(*df.columns)
    out.createOrReplaceTempView(view)
    return out


def materialize_once(key: str, df: DataFrame) -> DataFrame:
    """Eagerly checkpoint `df`; free the checkpoint previously held
    under `key`.  Returns a frame with fresh attribute ids (toDF), so
    re-joining materializations of related lineage is safe (Spark 4.1
    optimizer attribute-id gotcha, CLAUDE.md)."""
    ck = df.localCheckpoint(eager=True)
    prev = _LIVE.pop(key, None)
    if prev is not None:
        _free_checkpoint(prev)
    _LIVE[key] = ck
    return ck.toDF(*ck.columns)


def materialize_view(key: str, df: DataFrame, view: str) -> DataFrame:
    """materialize_once + register the result as a temp view so a
    follow-up spark.sql() text can reference the single materialization
    by name (the split-SQL pattern for de-inlining a WITH clause)."""
    out = materialize_once(key, df)
    out.createOrReplaceTempView(view)
    return out


def _plain_split_fn(name, stages, final_sql):
    """Runner for split specs WITHOUT a spread opt-in.  BYTE-IDENTITY
    NOTE (r14): the nested `fn` reproduces the pre-r14 closure exactly
    (text + nesting depth) — `inspect.getsource(spec.fn)` is salted
    into the ledger fingerprint, so keeping this byte-stable keeps
    unedited split specs proven-as-written (see registry._plain_sql_fn)."""
    from datafusion_umami_spark.tables import register_views

    def fn(spark, sf_dir):  # type: ignore[no-untyped-def]
        register_views(spark, sf_dir)
        for stage_sql, view in stages:
            materialize_view(f"{name}:{view}", spark.sql(stage_sql), view)
        return spark.sql(final_sql)

    return fn


def register_split_sql(
    name: str,
    stages: list[tuple[str, str]],
    final_sql: str,
    oracle: str,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    discrimination: str | None = None,
    spread_tables: tuple[str, ...] = (),
) -> None:
    """Register a query whose Spark side materializes each (sql, view)
    stage once, then runs `final_sql` over the views — for the common
    "reduced aggregate referenced twice" shape where the inlined WITH
    clause would re-execute the aggregation shuffle per reference.  The
    DuckDB oracle stays the single ANSI statement (DuckDB materializes
    shared CTEs natively)."""
    from datafusion_umami_spark.registry import register
    from datafusion_umami_spark.tables import register_views

    if spread_tables:
        # fingerprint-distinct by design: the spread path demotes the
        # spec until a fresh driver row proves it (registry.register_sql)
        def fn(spark, sf_dir):  # type: ignore[no-untyped-def]
            register_views(spark, sf_dir, spread=spread_tables)
            for stage_sql, view in stages:
                materialize_view(f"{name}:{view}", spark.sql(stage_sql), view)
            return spark.sql(final_sql)

    else:
        fn = _plain_split_fn(name, stages, final_sql)

    fn.__name__ = name
    fn.__doc__ = "\n-- stage: materialized once --\n".join(
        [s for s, _ in stages] + [final_sql]
    )
    # exposed for the split-vs-inlined equivalence gate
    # (tests/test_fuzz.py): naming each stage CTE by its view name makes
    # `WITH <view> AS (<stage>) <final>` a valid inlined composition.
    fn._split_stages = list(stages)
    fn._split_final = final_sql
    register(name, oracle=oracle, tags=tags, bench=bench,
             discrimination=discrimination)(fn)
