"""Registry-wide discrimination probes (r13 verdict item 4).

A spec is only as good as its DISCRIMINATION: a hash-green row proves
nothing about a branch whose population is empty at every proof SF
(r13 found five such specs — an anti-join matching zero rows, a semi
retaining 100%, INTERSECT ALL on an extensionally-distinct side, ...).
Any spec may carry a `discrimination` probe: DuckDB SQL over the proof
tables returning (branch VARCHAR, pop BIGINT) rows, one per
load-bearing branch.  This module asserts every declared population is
non-empty at sf0.001 AND sf0.01 — both proof scales the local gate and
the driver mirror run at — so the vacuous-branch class cannot regrow
silently on probed specs, and an SF bump that starves a branch fails
loudly instead of staying green by luck.

Probes run on DuckDB only (no Spark session): they assert about the
DATA a fixed text runs on, not about engine semantics — the engine
parity of the text itself is the oracle gate's job.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import duckdb
import pytest

from datafusion_umami_spark.registry import REGISTRY, _load_all

_load_all()

PROBED = sorted(n for n, s in REGISTRY.items() if s.discrimination)

_SF_ROOT = Path(
    os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
)
# sf0.1 joined r14: the round-close probe run at bench scale caught two
# HAVING floors that were vacuous ONLY there (fixed-cardinality mod
# buckets vs corpus-growing counts) — asserting all three proof scales
# makes both directions of the threshold class (empty-at-small-SF and
# reject-nothing-at-big-SF) regression-proof.
SF_DIRS = [
    d for d in ("sf0.001", "sf0.01", "sf0.1") if (_SF_ROOT / d).exists()
]


@pytest.fixture(scope="module", params=SF_DIRS)
def duck(request):
    # the oracle gate's own view registration, so probes see exactly the
    # tables the DuckDB oracle texts run against
    from datafusion_umami_spark.oracle import duckdb_connect

    con = duckdb_connect(str(_SF_ROOT / request.param))
    yield con
    con.close()


@pytest.mark.parametrize("name", PROBED)
def test_probe_populations_nonzero(name, duck):
    rows = duck.execute(REGISTRY[name].discrimination).fetchall()
    assert rows, f"{name}: probe returned no branches"
    labels = [r[0] for r in rows]
    assert len(labels) == len(set(labels)), f"{name}: duplicate branch labels"
    for label, pop in rows:
        assert pop and pop > 0, (
            f"{name}: branch {label!r} has empty population — the spec "
            f"cannot discriminate on this clause at this proof scale"
        )


# Registry-wide mechanical LIKE-fence audit (r14).  A LIKE/NOT LIKE
# against a dimension column is degenerate when it matches everything
# or nothing on its base table — the fence then proves no filter
# semantics at that proof scale.  The allowlist pins the KNOWN
# degenerate predicates so the class cannot grow silently; each entry
# is (spec, column, op, pattern) with its classification.  Fixing one
# must remove it here (the assert is exact both ways).
_LIKE_ALLOWLIST = {
    # DELIBERATE: the dead capital-variant arm IS the case-sensitivity
    # proof (its ILIKE twin in the same spec matches)
    ("job_t7_case_variant_or_likes", "p_name", "LIKE", "%Widget%"),
    # DELIBERATE-ish: redundant always-true conjunct on the same column
    # as a selective one (optimizer stress); r15 review candidate
    ("job_t7_conj_same_column_likes", "c_name", "LIKE", "%Customer%"),
    # r15 queue — always-true prefix/containment fences at proof scale
    # (entity names are zero-padded ids below the pattern's cut):
    ("fn_like_any_all", "c_name", "LIKE", "Customer%"),
    ("fn_like_any_all", "c_name", "LIKE", "%0%"),
    ("job_eleven_rel_roleplay_star", "n_name", "LIKE", "NATION_%"),
    ("job_five_selective_like_arms", "s_name", "LIKE", "Supplier#000000%"),
    ("job_inlist_role_prefix_probe", "s_name", "LIKE", "Supplier#0000000%"),
    ("job_t6_four_bridge_clique", "s_name", "LIKE", "Supplier#%"),
    ("job_t6_negated_dim_mixed_in8", "s_name", "LIKE", "%0%"),
    ("job_three_like_fences_chain", "c_name", "LIKE", "Customer#00000%"),
    ("tpcds_t8_ored_demo_pairs_returns", "c_name", "LIKE", "Customer#%"),
    ("job_five_selective_like_arms", "n_name", "LIKE", "NATION_%"),
    ("job_t6_prefix_company_wide_star", "s_name", "LIKE",
     "Supplier#0000000%"),
    ("job_t7_double_conj_like_pairs", "c_name", "LIKE", "%Customer%"),
    # every generated props JSON contains the "k" key, so the
    # containment fence matches all rows (r15 queue)
    ("cb_substring_search", "props", "LIKE", '%"k"%'),
    ("cb_select_star_like_ordered", "props", "LIKE", '%"k"%'),
}

_TBL_BY_PREFIX = {"c_": "customer", "s_": "supplier", "n_": "nation",
                  "p_": "part", "o_": "orders", "l_": "lineitem",
                  "r_": "region"}
# non-prefixed raw columns of the non-TPC-H tables; derived columns
# (url/title synthesized inside a spec) are out of mechanical scope —
# their specs carry hand probes instead
_TBL_BY_COLUMN = {"props": "events", "event_type": "events",
                  "source": "documents", "lang": "documents",
                  "text": "documents"}
_LIKE_RE = re.compile(
    r"\b(\w+)\s+(NOT\s+)?(I?LIKE)\s+'([^']*)'(\s+ESCAPE\s+'(.)')?", re.I
)


def test_like_fences_discriminate_or_are_allowlisted(duck):
    degenerate = set()
    seen = set()
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        for m in _LIKE_RE.finditer(spec.oracle):
            col, _neg, op, pat, _, esc = m.groups()
            table = _TBL_BY_PREFIX.get(col[:2].lower())
            if table is not None and not col[2:]:
                table = None
            if table is None:
                table = _TBL_BY_COLUMN.get(col.lower())
            if table is None:
                continue
            key = (name, col.lower(), op.upper(), pat)
            if key in seen:
                continue
            seen.add(key)
            esc_sql = f" ESCAPE '{esc}'" if esc else ""
            n_match = duck.execute(
                f"SELECT COUNT(*) FROM {table} "
                f"WHERE {col} {op} '{pat}'{esc_sql}"
            ).fetchone()[0]
            n_not = duck.execute(
                f"SELECT COUNT(*) FROM {table} "
                f"WHERE NOT ({col} {op} '{pat}'{esc_sql})"
            ).fetchone()[0]
            if n_match == 0 or n_not == 0:
                degenerate.add(key)
    new = degenerate - _LIKE_ALLOWLIST
    assert not new, f"new degenerate LIKE fences: {sorted(new)}"
    # exact pin is per-SF-union, checked by the looser direction only
    # at each SF (a fence can be degenerate at one SF and not another);
    # allowlist entries that are degenerate at NEITHER proof SF are
    # caught by the full-union check in CI over both fixture params
    assert seen, "LIKE audit scanned nothing"


def test_probe_coverage_floor():
    """The campaign's ratchet: probes may be added, never silently
    dropped.  Raise the floor when a new batch lands."""
    # r14: TPC-H + tpcds t5-t8 + clickbench/h2o/job/pg having-anti-setop
    # + windows/graph/conditional + null-fence/casewhen batteries
    assert len(PROBED) >= 56, PROBED


# r15 weak-arm queue (probed this round, fix under sanction next):
# - job_leftjoin_null_reject: p_retailprice > 500 excludes nothing
# - cb_case_src_dst_funnel: the 2024 ts-window and value >= 0 fences
#   exclude nothing (all events are 2024, non-negative)
# - cb_ext_q6_campaign_funnel: the levenshtein(<6) arm rejects nothing
#   within the preceding conjuncts at sf0.001/0.01
# - fn_greatest_least_null_semantics: NULLIF(c_acctbal, 0.0) never
#   fires (no zero balances) — was_zero_bal is constant 0
# - cb_q22_title_fence_battery: lang <> '' excludes nothing
# plus the _LIKE_ALLOWLIST entries above.
