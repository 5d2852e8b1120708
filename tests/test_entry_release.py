"""The driver-contract auto-free hygiene (__spark_entry__.queries()).

Frees are deferred one BUILD GENERATION over the actual live key set:
at build N+1 the only keys freed are those already live when build N
started — so a sequential driver holds at most two queries'
checkpoints, and a depth-1 pipelining consumer never reads freed
blocks (r6 ADVICE item 1).  Staleness is decided from the live set,
NOT from key-name prefixes: queries that pin bare keys ('jac_w',
'sh_sig', 'tri_pairs', ...) get the same one-generation grace as
name-prefixed ones (round-7 review finding)."""

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


def test_autofree_defers_one_generation_for_bare_keys(monkeypatch):
    """Keys NOT prefixed by the query name (dedup_jaccard_words pins
    'jac_w', simhash 'sh_sig', triangle counting 'tri_pairs', ...) must
    get the same one-generation grace: a depth-1 pipelining consumer
    that builds B before collecting A must not see A's bare keys freed
    at B's build (the round-7 review's use-after-free scenario)."""
    from datafusion_umami_spark.operators import materialize

    m = _load_entry()
    live = materialize._LIVE
    saved = dict(live)
    live.clear()
    try:
        def make(name, key):
            def fn(spark, sf_dir):
                live[key] = object()
                return f"df:{name}"
            return fn

        monkeypatch.setattr(
            m,
            "all_queries",
            lambda: {
                "qa": make("qa", "jac_w"),
                "qb": make("qb", "sh_sig"),
                "qc": make("qc", "tri_pairs"),
            },
        )
        live["shared:sig"] = object()
        q = m.queries()

        q["qa"]("spark", "sf")
        assert set(live) == {"shared:sig", "jac_w"}
        q["qb"]("spark", "sf")
        # qa's bare key survives qb's build (pipelining consumer may
        # not have collected qa yet) — the old prefix-based keep-list
        # freed it here
        assert set(live) == {"shared:sig", "jac_w", "sh_sig"}
        q["qc"]("spark", "sf")
        # freed only now, two builds later
        assert set(live) == {"shared:sig", "sh_sig", "tri_pairs"}
    finally:
        live.clear()
        live.update(saved)
