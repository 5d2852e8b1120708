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
from pathlib import Path

import duckdb
import pytest

from datafusion_umami_spark.registry import REGISTRY, _load_all

_load_all()

PROBED = sorted(n for n, s in REGISTRY.items() if s.discrimination)

_SF_ROOT = Path(
    os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
)
SF_DIRS = [d for d in ("sf0.001", "sf0.01") if (_SF_ROOT / d).exists()]


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


def test_probe_coverage_floor():
    """The campaign's ratchet: probes may be added, never silently
    dropped.  Raise the floor when a new batch lands."""
    # r14: TPC-H + tpcds t5-t8 + clickbench/h2o/job/pg having-anti-setop
    assert len(PROBED) >= 38, PROBED
