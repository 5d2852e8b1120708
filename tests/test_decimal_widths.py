"""Pin the DuckDB decimal-multiply width model the oracle fences rely on.

Round-8 root cause (VERDICT r8): the repo assumed DuckDB widens
DECIMAL(a,0) * DECIMAL(b,0) to a+b digits.  DuckDB 1.0.0 actually keeps
the product at DECIMAL(18,0) (int64 storage) whenever BOTH operands are
<= 18 wide — the product overflows at 1e18 — and only widens to
min(a+b, 38) when at least one operand is >= 19 wide (int128).  Every
agg x agg fence in the repo therefore casts exactly one factor to
DECIMAL(19,0)+ (CLAUDE.md rule).

These tests probe the ENGINE, not the repo: if a DuckDB upgrade changes
the width model, they fail loudly before a fence silently overflows (or
before we keep paying int128 cost we no longer need).  No Spark needed.
"""

from __future__ import annotations

import re

import duckdb
import pytest


def _product_type(con, a: int, b: int) -> tuple[int, int]:
    t = con.sql(
        f"SELECT CAST(2 AS DECIMAL({a},0)) * CAST(3 AS DECIMAL({b},0)) AS p"
    ).types[0]
    m = re.match(r"DECIMAL\((\d+),(\d+)\)", str(t))
    assert m, f"unexpected product type {t}"
    return int(m.group(1)), int(m.group(2))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.parametrize("a,b", [(17, 17), (18, 18), (12, 16), (9, 16)])
def test_both_le18_product_stays_decimal18(con, a, b):
    assert _product_type(con, a, b) == (18, 0)


@pytest.mark.parametrize(
    "a,b,want", [(18, 19, 37), (19, 19, 38), (12, 19, 31), (4, 19, 23)]
)
def test_ge19_operand_forces_real_widening(con, a, b, want):
    assert _product_type(con, a, b) == (want, 0)


def test_wider_than_38_clamps_not_errors(con):
    # 11 + 32 = 43 > 38: DuckDB clamps the declared width to 38 (the
    # repo's outer x (diff) fences rely on this, values stay < 1e38)
    assert _product_type(con, 11, 32) == (38, 0)


def test_le18_product_overflows_past_1e18(con):
    with pytest.raises(duckdb.OutOfRangeException):
        con.sql(
            "SELECT CAST(2000000000 AS DECIMAL(18,0))"
            "     * CAST(2000000000 AS DECIMAL(18,0))"
        ).fetchall()


def test_widened_product_exact_past_1e18(con):
    (v,) = con.sql(
        "SELECT CAST(2000000000 AS DECIMAL(19,0))"
        "     * CAST(2000000000 AS DECIMAL(18,0)) AS p"
    ).fetchone()
    assert int(v) == 4_000_000_000_000_000_000


def test_no_le18_pair_products_left_in_oracle_texts():
    """Repo-side guard: no DuckDB-visible text may multiply two <=18-wide
    integer-decimal casts DIRECTLY (the round-8 defect class).  The
    junk class between `*` and `CAST` deliberately excludes `(`, so
    `X * (CAST(...) - CAST(...))` composites — whose inner products are
    separately matched and must carry their own >= 19 operand — do not
    pair the outer factor with the composite's first inner cast.
    Value-level DECIMAL(p,2) money casts (bounded per-row magnitudes)
    don't match the `,0)` pattern and stay exempt per CLAUDE.md."""
    from pathlib import Path

    pat = re.compile(
        r"DECIMAL\((\d+),0\)\)[\s\"f']*\n?[\s\"f']*\*[\s\"f']*"
        r"CAST\([^()]*(?:\([^()]*\))?[^()]* AS DECIMAL\((\d+),0\)\)",
        re.S,
    )
    root = Path(__file__).resolve().parents[1]
    offenders = []
    files = list((root / "datafusion_umami_spark").rglob("*.py")) + list(
        (root / "tests").glob("*.py")
    ) + [root / "bench.py", root / "__spark_entry__.py"]
    here = Path(__file__)
    for f in files:
        if f == here:  # this file's probes multiply D(18)xD(18) on purpose
            continue
        s = f.read_text()
        for m in pat.finditer(s):
            a, b = int(m.group(1)), int(m.group(2))
            if a <= 18 and b <= 18:
                ln = s[: m.start()].count("\n") + 1
                offenders.append(f"{f.relative_to(root)}:{ln} D({a})xD({b})")
    assert not offenders, (
        f"unwidened <=18 x <=18 decimal products: {offenders}"
    )


def test_le18_times_subtract_only_composite_stays_decimal18(con):
    # A parenthesized composite with NO >= 19-wide inner node stays
    # <= D(18) (D(17)-D(17) -> D(18)), so the outer product is again a
    # <=18 x <=18 multiply and overflows past 1e18 — the same defect
    # class one nesting level deeper.
    t = con.sql(
        "SELECT CAST(2 AS DECIMAL(11,0))"
        " * (CAST(3 AS DECIMAL(17,0)) - CAST(1 AS DECIMAL(17,0))) AS p"
    ).types[0]
    assert str(t) == "DECIMAL(18,0)"
    with pytest.raises(duckdb.OutOfRangeException):
        con.sql(
            "SELECT CAST(2000000000 AS DECIMAL(11,0))"
            " * (CAST(1000000000 AS DECIMAL(17,0))"
            "    - CAST(0 AS DECIMAL(17,0)))"
        ).fetchall()


def test_no_le18_times_narrow_composite_in_oracle_texts():
    """Composite-operand guard: an outer <=18-wide cast multiplied by a
    parenthesized group whose decimal casts are ALL <=18 wide is the
    same defect one nesting level deeper (probe above).  Walks the
    balanced paren group programmatically; composites carrying a >=19
    inner cast (the repo's sanctioned X * (A*B' - C*D') fences) pass."""
    from pathlib import Path

    head = re.compile(
        r"AS DECIMAL\((\d+),0\)\)[\s\"f']*\n?[\s\"f']*\*[\s\"f']*\("
    )
    width = re.compile(r"AS DECIMAL\((\d+),0\)")
    root = Path(__file__).resolve().parents[1]
    here = Path(__file__)
    offenders = []
    files = list((root / "datafusion_umami_spark").rglob("*.py")) + [
        f for f in (root / "tests").glob("*.py") if f != here
    ] + [root / "bench.py", root / "__spark_entry__.py"]
    for f in files:
        s = f.read_text()
        for m in head.finditer(s):
            outer = int(m.group(1))
            if outer > 18:
                continue
            # walk the balanced group starting at the '(' the head ends on
            i, depth = m.end() - 1, 0
            for j in range(i, min(len(s), i + 4000)):
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            group = s[i:j + 1]
            inner = [int(w) for w in width.findall(group)]
            if inner and max(inner) <= 18:
                ln = s[: m.start()].count("\n") + 1
                offenders.append(
                    f"{f.relative_to(root)}:{ln} D({outer})x(max inner "
                    f"D({max(inner)}))"
                )
    assert not offenders, (
        f"<=18-wide outer x all-<=18 composite products: {offenders}"
    )
