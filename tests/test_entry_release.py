"""The driver-contract auto-free hygiene (__spark_entry__.queries()).

Frees are deferred one generation: building query C frees everything
except {shared:, previous build B, C} — so a sequential driver holds at
most two queries' checkpoints, and a depth-1 pipelining consumer never
reads freed blocks (r6 ADVICE item 1)."""

from __future__ import annotations

import importlib.util
from pathlib import Path


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_autofree_defers_one_generation(monkeypatch):
    from datafusion_umami_spark.operators import materialize

    m = _load_entry()
    live = materialize._LIVE
    saved = dict(live)
    live.clear()
    try:
        def make(name):
            def fn(spark, sf_dir):
                live[f"{name}:stage"] = object()  # stands in for a checkpoint
                return f"df:{name}"
            return fn

        monkeypatch.setattr(
            m, "all_queries", lambda: {n: make(n) for n in ("qa", "qb", "qc")}
        )
        live["shared:sig"] = object()
        q = m.queries()

        assert q["qa"]("spark", "sf") == "df:qa"
        assert set(live) == {"shared:sig", "qa:stage"}
        q["qb"]("spark", "sf")
        # qa survives qb's build (a pipelining driver may not have
        # collected qa yet); shared keys always survive
        assert set(live) == {"shared:sig", "qa:stage", "qb:stage"}
        q["qc"]("spark", "sf")
        # qa freed only now, two builds later
        assert set(live) == {"shared:sig", "qb:stage", "qc:stage"}
        # a rerun of the same query keeps its own keys alive
        q["qc"]("spark", "sf")
        assert set(live) == {"shared:sig", "qc:stage"}
    finally:
        live.clear()
        live.update(saved)
