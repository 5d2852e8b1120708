"""Refresh queries/sweep_fingerprints.json from the driver artifacts.

Run at ROUND START, before any spec edits, so each newly-green driver row
is blessed against the text the driver actually swept (r8 verdict item 4:
"proven" = proven-as-written).

Rules per driver-green name (latest record wins — classification is
SHARED with the sweep classifier via `queries/__init__._latest_records`
/ `_classify`, so blessing and demotion cannot drift):
  - no ledger entry AND green round == the latest artifact round
    -> add (current fingerprint, green round): fresh evidence, and the
       tool runs at round start before any edits;
  - no ledger entry AND green round < latest artifact round
    -> WARN and SKIP: the swept text cannot be recovered from the
       working tree, and blessing current text would launder a
       post-proof edit.  The classifier fail-safe keeps such names
       unproven, so they re-queue and earn a fresh row;
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

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def green_rounds(root: Path, oracled: set[str]) -> tuple[dict[str, int], int]:
    """({green name -> round of its latest record}, latest artifact round).

    Reuses the classifier's own record walk and green semantics
    (`_latest_records` / `_classify`) so the ledger can never bless a
    name the sweep considers unproven, or vice versa."""
    from datafusion_umami_spark.queries import _classify, _latest_records

    records = _latest_records(root)
    green, _failed = _classify(records, oracled)
    max_round = max((rnd for _, rnd in records.values()), default=0)
    return {n: records[n][1] for n in green}, max_round


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
    greens, max_round = green_rounds(ROOT, oracled)
    ledger = load_ledger()

    added, updated, stale, skipped = [], [], [], []
    for name, rnd in sorted(greens.items()):
        spec = REGISTRY.get(name)
        if spec is None:
            continue  # spec deleted; keep any ledger entry harmlessly
        fp = spec_fingerprint(spec)
        ent = ledger.get(name)
        if ent is None:
            if rnd == max_round:
                ledger[name] = {"fp": fp, "round": rnd}
                added.append(name)
            else:
                skipped.append(name)  # stale missing entry: cannot
                # recover the swept text — classifier keeps it unproven
        elif ent.get("round", 0) < rnd:
            ledger[name] = {"fp": fp, "round": rnd}
            updated.append(name)
        elif ent.get("fp") != fp:
            stale.append(name)  # edited after proof — left for re-sweep

    print(f"green={len(greens)} added={len(added)} updated={len(updated)} "
          f"stale(left)={len(stale)} skipped(missing,old)={len(skipped)}")
    if stale:
        print("stale:", ", ".join(stale))
    if skipped:
        print("WARN skipped (missing entry, pre-latest green row — will "
              "re-queue):", ", ".join(skipped))
    if not dry:
        save_ledger(ledger)
        print("ledger written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
