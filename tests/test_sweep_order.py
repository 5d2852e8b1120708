"""The driver-sweep rotation contract (queries/__init__.py).

The driver proves ~50 queries per round in REGISTRY insertion order;
the reorder must therefore (a) put no already-proven query ahead of
unproven work, (b) lead with the explicit priority backlog, and (c)
stay deterministic so two imports agree.
"""

from __future__ import annotations

from datafusion_umami_spark.queries import SWEEP_PRIORITY, _driver_history
from datafusion_umami_spark.registry import REGISTRY, _load_all

_load_all()


def test_priority_names_all_registered():
    missing = [n for n in SWEEP_PRIORITY if n not in REGISTRY]
    assert not missing, f"SWEEP_PRIORITY names not in registry: {missing}"


def test_no_proven_green_query_ahead_of_unproven():
    green, _failed = _driver_history()
    names = list(REGISTRY)
    unproven = [n for n in names if n not in green]
    if not unproven:
        return
    last_unproven = max(names.index(n) for n in unproven)
    early_greens = [n for n in names[:last_unproven] if n in green]
    assert not early_greens, (
        "proven-green queries would burn sweep budget ahead of unproven "
        f"ones: {early_greens[:5]}"
    )


def test_unproven_set_occupies_a_contiguous_prefix():
    """The remaining sweeps cover the whole backlog only if every
    unproven name sits within the first len(unproven) positions — i.e.
    no unproven query hides past a green one where a 50-row/round
    budget based at position 0 could never reach it."""
    green, _failed = _driver_history()
    names = list(REGISTRY)
    unproven = {n for n in names if n not in green}
    prefix = set(names[: len(unproven)])
    assert prefix == unproven, (
        f"unproven names past position {len(unproven)}: "
        f"{sorted(unproven - prefix)[:5]}"
    )


def test_red_row_and_streaming_lead_the_queue():
    """Round-3 verdict directives 1 and 6: the single red driver row and
    the four unproven streaming queries must fit any plausible budget."""
    green, _failed = _driver_history()
    front = list(REGISTRY)[:5]
    want = [n for n in (
        "agg_approx_percentile", "stream_tumbling_counts",
        "stream_sliding_window", "stream_static_join", "session_window_agg",
    ) if n not in green]
    assert front[: len(want)] == want, f"queue front diverged: {front}"


def test_front_of_queue_is_the_priority_backlog():
    green, _failed = _driver_history()
    want = [n for n in SWEEP_PRIORITY if n not in green]
    got = list(REGISTRY)[: len(want)]
    assert got == want, f"front of sweep queue diverged: {got[:5]} != {want[:5]}"


def test_r6_r7_r8_fronts_exhaust_the_legacy_backlog():
    """r5 verdict item 2: the prove-down horizon is exactly three more
    sweeps — the r6 front (50) + r7 front (50) + r8 tail (59) must
    jointly exhaust the never-swept backlog that existed BEFORE the
    round-6 additions, and the round-6 additions (job_shapes_t4,
    tpcds_shapes_t5) must queue strictly BEHIND that legacy backlog so
    they never displace a legacy query out of the three-round window.
    The contiguous-prefix test above guarantees reachability; this one
    pins the ROUND COUNT."""
    import inspect
    import re

    from datafusion_umami_spark.queries import job_shapes_t4, tpcds_shapes_t5

    src = inspect.getsource(job_shapes_t4) + inspect.getsource(tpcds_shapes_t5)
    additions = set(re.findall(r'"((?:job|tpcds)_\w+)"', src))
    assert additions, "addition-name extraction broke"

    green, _failed = _driver_history()
    names = list(REGISTRY)
    unproven = [n for n in names if n not in green]
    legacy = [n for n in unproven if n not in additions]
    # 159 = 50 (r6) + 50 (r7) + 59 (r8) as of the r5 artifacts; shrinks
    # as sweeps land, must never grow past the three-sweep horizon.
    assert len(legacy) <= 159, (
        f"legacy backlog is {len(legacy)} — past the r6+r7+r8 horizon"
    )
    assert set(names[: len(legacy)]) == set(legacy), (
        "legacy backlog is not the exact queue front — additions or "
        "greens displaced it"
    )
    in_queue_additions = [n for n in unproven if n in additions]
    if in_queue_additions:
        first = min(names.index(n) for n in in_queue_additions)
        assert first >= len(legacy), (
            f"round-6 addition at position {first} jumps the legacy backlog"
        )


def test_latest_record_wins(tmp_path):
    """A regression after an earlier pass must re-enter the failed set
    (and a later fix must clear it)."""
    import json

    from datafusion_umami_spark.queries import _driver_history_from

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 5, "oracle_rows": 5, "err": None}
    boom = {"rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": "TypeError"}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 3, "oracle_rows": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_regressed": ok, "q_fixed": boom, "q_stable": ok,
                    "q_rowsonly": rows_only})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_regressed": boom, "q_fixed": ok})
    )
    green, failed = _driver_history_from(tmp_path)
    assert green == {"q_fixed", "q_stable", "q_rowsonly"}
    assert failed == {"q_regressed"}
