"""Spec-text fingerprints for the sweep ledger (r8 verdict item 4).

"Proven" must mean proven-as-written: a driver green row certifies the
spec TEXT the driver ran, not the name.  Each QuerySpec is fingerprinted
over everything that determines its behavior — the Spark SQL / docstring,
the DuckDB oracle text, and the Python source of the callable (captures
DataFrame-code edits that leave the docstring alone).  The committed
ledger `queries/sweep_fingerprints.json` maps name -> {fp, round}; the
sweep classifier (`queries/__init__._reorder_for_sweep`) demotes a
driver-green name back to "unproven" whenever its CURRENT fingerprint
differs from the ledger entry, so an edited spec re-queues ahead of
proven greens and earns a fresh driver row on the new text.

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
from pathlib import Path

LEDGER_PATH = Path(__file__).resolve().parent / "queries" / "sweep_fingerprints.json"


def spec_fingerprint(spec) -> str:  # type: ignore[no-untyped-def]
    """sha256 over (fn docstring, oracle SQL, fn source).

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
    blob = "\x00".join((spec.fn.__doc__ or "", spec.oracle or "", src))
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
