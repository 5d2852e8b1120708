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


def test_front_of_queue_is_the_priority_backlog():
    green, _failed = _driver_history()
    want = [n for n in SWEEP_PRIORITY if n not in green]
    got = list(REGISTRY)[: len(want)]
    assert got == want, f"front of sweep queue diverged: {got[:5]} != {want[:5]}"


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
