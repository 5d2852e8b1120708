"""README's status paragraph carries the load-bearing inventory numbers
auditors read; hand-edited counts drifted twice (rounds 2 and 3).  Pin
them mechanically to the registry import count so any new registration
without a README bump fails CI.
"""

from __future__ import annotations

import re
from pathlib import Path

from datafusion_umami_spark.registry import REGISTRY, _load_all

_load_all()

README = Path(__file__).resolve().parents[1] / "README.md"


def test_readme_status_counts_match_registry():
    text = README.read_text()
    m = re.search(
        r"Status \(round \d+\): (\d+) registered queries \((\d+) oracle-checked, (\d+)\s*\nrows-only",
        text,
    )
    assert m, "README status paragraph not found / format changed"
    total, oracle, rows_only = map(int, m.groups())
    real_total = len(REGISTRY)
    real_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    assert (total, oracle, rows_only) == (
        real_total,
        real_oracle,
        real_total - real_oracle,
    ), (
        f"README says {total}/{oracle}/{rows_only}, registry has "
        f"{real_total}/{real_oracle}/{real_total - real_oracle} — "
        "update the README status paragraph"
    )
