"""Refresh queries/sweep_fingerprints.json from the driver artifacts.

Run at ROUND START, before any spec edits, so each newly-green driver row
is blessed against the text the driver actually swept (r8 verdict item 4:
"proven" = proven-as-written).

Rules per driver-green name (latest record wins, same classification as
`queries/__init__._driver_history`):
  - no ledger entry            -> add (current fingerprint, green round)
  - ledger round < green round -> the driver re-proved since the entry
                                  was recorded: update fp + round
  - ledger round == green round and fp differs -> LEAVE STALE: the spec
    was edited after its proof; the sweep classifier re-queues it until
    a later round's green row re-blesses it.

The round-1..8 entries were bootstrapped from each round's snapshot
commit (the verdict commit's parent), i.e. from the exact historical
text each green row ran against.

Usage: python tools/update_sweep_fingerprints.py [--dry-run]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def green_rounds(root: Path, oracled: set[str]) -> dict[str, int]:
    """name -> round of its latest driver record, for names whose latest
    record passes (hash match, or rows-only for a still-oracle-less spec)."""
    latest: dict[str, tuple[bool, int]] = {}
    for artifact in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", artifact.name).group(1))
        try:
            rows = json.loads(artifact.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            rows_only_ok = (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
                and name not in oracled
            )
            latest[name] = (bool(rec.get("hash_match")) or rows_only_ok, rnd)
    return {n: rnd for n, (ok, rnd) in latest.items() if ok}


def main() -> int:
    dry = "--dry-run" in sys.argv

    from datafusion_umami_spark.fingerprint import (
        load_ledger,
        save_ledger,
        spec_fingerprint,
    )
    from datafusion_umami_spark.registry import REGISTRY
    import datafusion_umami_spark.queries  # noqa: F401  (registers specs)

    oracled = {n for n, s in REGISTRY.items() if s.oracle is not None}
    greens = green_rounds(ROOT, oracled)
    ledger = load_ledger()

    added, updated, stale = [], [], []
    for name, rnd in sorted(greens.items()):
        spec = REGISTRY.get(name)
        if spec is None:
            continue  # spec deleted; keep any ledger entry harmlessly
        fp = spec_fingerprint(spec)
        ent = ledger.get(name)
        if ent is None:
            ledger[name] = {"fp": fp, "round": rnd}
            added.append(name)
        elif ent.get("round", 0) < rnd:
            ledger[name] = {"fp": fp, "round": rnd}
            updated.append(name)
        elif ent.get("fp") != fp:
            stale.append(name)  # edited after proof — left for re-sweep

    print(f"green={len(greens)} added={len(added)} updated={len(updated)} "
          f"stale(left)={len(stale)}")
    if stale:
        print("stale:", ", ".join(stale))
    if not dry:
        save_ledger(ledger)
        print("ledger written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
