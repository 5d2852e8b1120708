"""One-time round-10 ledger migration: widen the shared salt, stamp shas.

Round 10 extends `fingerprint._shared_salt` from (dec, dsum) to the full
shared-semantic-helper set (dec, dsum, davg, money, ntz) — r9 ADVICE
item 3: editing `registry.money`'s price*(1-disc) formula would have
changed what every proven TPC-H revenue row meant without demoting any
green.  Changing the salt changes EVERY fingerprint, so the committed
ledger must be rewritten in the same commit or all 424 proven rows
mass-demote.

The rewrite is sound only for entries whose recorded fingerprint still
matches the CURRENT tree under the OLD salt — i.e. the spec text is
provably the text the driver swept (the salted helpers themselves are
byte-stable since round 1, verified here).  Entries that fail that check
(specs edited after their proof, e.g. the r10 ADVICE-directed
`ts_anomaly_zscore_minutes` overflow fix) are left untouched: their old
fingerprint mismatches under either salt, so they stay demoted and
re-queue — exactly the fail-safe the ledger exists to provide.

Also stamps each entry with the `sha` of the tree its green row executed
(r9 verdict "What's wrong" item 2): for a row green in round N, that is
the PARENT of the commit that added CORRECTNESS_r0N.json — the driver
sweeps the builder's final HEAD, then commits the artifacts on top.

Usage: python tools/migrate_ledger_salt_r10.py [--dry-run]
"""

from __future__ import annotations

import hashlib
import inspect
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout.strip()


def old_salt() -> str:
    """The pre-r10 salt: dec + dsum only (fingerprint.py history)."""
    from datafusion_umami_spark import registry

    parts = [inspect.getsource(registry.dec), inspect.getsource(registry.dsum)]
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()


def old_fingerprint(spec, salt: str) -> str:  # type: ignore[no-untyped-def]
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = ""
    blob = "\x00".join((spec.fn.__doc__ or "", spec.oracle or "", src, salt))
    return hashlib.sha256(blob.encode()).hexdigest()


def swept_sha_by_round() -> dict[int, str]:
    """round N -> sha of the tree the round-N sweep executed.

    Delegates to the blessing tool's helper so the derivation has ONE
    source (r11 review: this logic was triplicated and the adds[-1] →
    adds[0] fix had to be hand-synced across copies; the provenance CI
    test keeps its own inline copy deliberately, as the independent
    check)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from update_sweep_fingerprints import swept_sha_by_round as shared

    return shared(ROOT)


def main() -> int:
    dry = "--dry-run" in sys.argv
    from datafusion_umami_spark.fingerprint import (
        load_ledger,
        save_ledger,
        spec_fingerprint,
    )
    from datafusion_umami_spark.registry import REGISTRY, _load_all

    _load_all()
    ledger = load_ledger()
    salt = old_salt()
    shas = swept_sha_by_round()

    migrated, left, missing = [], [], []
    for name, ent in ledger.items():
        sha = shas.get(ent.get("round", 0))
        if sha and "sha" not in ent:
            ent["sha"] = sha
        spec = REGISTRY.get(name)
        if spec is None:
            missing.append(name)
            continue
        if ent.get("fp") == old_fingerprint(spec, salt):
            ent["fp"] = spec_fingerprint(spec)
            migrated.append(name)
        else:
            left.append(name)  # edited after proof — stays demoted

    print(f"entries={len(ledger)} migrated={len(migrated)} "
          f"left-stale={len(left)} spec-missing={len(missing)}")
    if left:
        print("left stale (demoted, will re-queue):", ", ".join(left))
    if not dry:
        save_ledger(ledger)
        print("ledger written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
