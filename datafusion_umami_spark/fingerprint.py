"""Spec-text fingerprints for the sweep ledger (r8 verdict item 4).

"Proven" must mean proven-as-written: a driver green row certifies the
spec TEXT the driver ran, not the name.  Each QuerySpec is fingerprinted
over its SPEC-LOCAL text — the Spark SQL / docstring, the DuckDB oracle
text, the Python source of the callable (captures DataFrame-code edits
that leave the docstring alone) — plus a shared salt over ALL shared
semantic helpers every oracle relies on (`registry.dec/dsum/davg/
money/ntz` — widened from dec/dsum in round 10, r9 ADVICE item 3, with
an in-place verified ledger migration; byte-stable since round 1, so
salting them is free until the day someone edits them — at which point
demoting every green is exactly right).  BOUNDARY (explicit, not an
oversight): edits to the
broader shared infrastructure (tables.py loading/normalization,
operators/materialize.py, streaming/runner.py) are NOT fingerprinted —
they changed in most rounds, so salting them would mass-demote the
proven ledger; their correctness is instead re-proven every round by
the full-registry sf0.01/sf0.1 verify legs (README verification
paragraphs), which execute every spec end-to-end against DuckDB.

The committed ledger `queries/sweep_fingerprints.json` maps
name -> {fp, round, sha} (sha = the swept tree the green row executed,
r9 verdict item 2); the sweep classifier
(`queries/__init__._driver_history`) demotes a driver-green name back
to "unproven" whenever its CURRENT fingerprint differs from the ledger
entry — and, fail-safe, whenever the name is MISSING from the ledger
unless its green row is from the latest artifact AND the round-start
blessing has not yet landed for it (fresh evidence only; once the
ledger's max round catches up, absent == dropped and demotes).  A
dropped ledger entry therefore re-queues a spec rather than laundering
it into proven.

Maintenance: `tools/update_sweep_fingerprints.py`, run at ROUND START
(before any spec edits) so newly-green rows are blessed against the text
the driver actually swept.  The round-1..8 entries were bootstrapped from
each round's snapshot commit (the verdict commit's parent), i.e. from the
exact text each green row ran against.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from functools import lru_cache
from pathlib import Path

LEDGER_PATH = Path(__file__).resolve().parent / "queries" / "sweep_fingerprints.json"

_FP_SHAPE = re.compile(r"[0-9a-f]{64}")


def record_fp(rec) -> str | None:  # type: ignore[no-untyped-def]
    """The driver-stamped spec fingerprint of a CORRECTNESS record, iff
    it carries a WELL-FORMED one (64-char lowercase-hex sha256).

    Single extraction point for both consumers (r11 ADVICE item 4): the
    sweep classifier (`queries/__init__._artifact_fp_split`) and the
    blessing tool (`tools/update_sweep_fingerprints.py`) must agree on
    what counts as an fp-carrying record or blessing and demotion
    drift.  A malformed/truncated value is treated as fp-ABSENT, which
    routes the record to the fail-safe ledger path (demotes unless the
    ledger proves the current text) rather than trusting garbage on
    either path."""
    fp = rec.get("fp") if isinstance(rec, dict) else None
    return fp if isinstance(fp, str) and _FP_SHAPE.fullmatch(fp) else None


@lru_cache(maxsize=1)
def _shared_salt() -> str:
    """Source hash of ALL shared semantic helpers (dec/dsum/davg/money/
    ntz) mixed into every fingerprint: an edit to decimal-money or
    timestamp-normalization semantics changes what every proven oracle
    row meant, so it must demote ALL greens.  The set was dec/dsum only
    until round 10; the r9 advisor observed that editing e.g. money()'s
    price*(1-disc) formula would silently change proven TPC-H revenue
    semantics — all five are byte-stable since round 1, so widening the
    salt was free (the r10 ledger was migrated in the same commit, each
    entry's swept text verified against the old salt first —
    tools/migrate_ledger_salt_r10.py)."""
    from datafusion_umami_spark import registry

    parts = []
    for fn in (registry.dec, registry.dsum, registry.davg, registry.money,
               registry.ntz):
        try:
            parts.append(inspect.getsource(fn))
        except (OSError, TypeError):
            parts.append(fn.__name__)
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()


def spec_fingerprint(spec) -> str:  # type: ignore[no-untyped-def]
    """sha256 over (fn docstring, oracle SQL, fn source, shared salt).

    The docstring carries the full Spark SQL for `register_sql` /
    `register_split_sql` specs; the source carries DataFrame-code bodies
    for decorator-registered specs (for SQL specs it is the shared
    registrar closure — constant, harmless).  Comment-only edits do
    invalidate a fingerprint: conservative by design.
    """
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = ""
    blob = "\x00".join(
        (spec.fn.__doc__ or "", spec.oracle or "", src, _shared_salt())
    )
    return hashlib.sha256(blob.encode()).hexdigest()


def load_ledger(path: Path | None = None) -> dict[str, dict]:
    p = path or LEDGER_PATH
    try:
        data = json.loads(p.read_text())
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def save_ledger(ledger: dict[str, dict], path: Path | None = None) -> None:
    p = path or LEDGER_PATH
    p.write_text(json.dumps(dict(sorted(ledger.items())), indent=1) + "\n")
