"""gcd / lcm as pure Catalyst expressions.

The reference ships gcd/lcm scalar functions
(reference datafusion/functions/src/math/gcd.rs, lcm.rs); Spark has no
builtin, so Euclid's algorithm is expressed as a bounded `aggregate`
fold over a struct accumulator — stays JVM-side / codegen-able (no
Python UDF).  Euclid needs ≤ log_φ(min(a,b)) ≈ 1.44·log2(min(a,b))
steps; the worst case for 63-bit inputs (consecutive Fibonacci numbers)
is 91 iterations, so _ITERS = 92 is safe for the FULL int64 range.  The
fold short-circuits through the s.b == 0 branch once converged, so the
spare iterations cost almost nothing.

LONG_MIN edge (ANSI mode: abs(-2^63) raises ARITHMETIC_OVERFLOW): one
Euclid pre-step gcd(a, b) = gcd(a % b, b) maps -2^63 into range before
abs whenever the other operand can host it.  The two degenerate pairs
whose gcd is 2^63 itself — (-2^63, 0) and (-2^63, -2^63) — are
deliberately left to raise: the mathematically correct result is not
representable in int64, matching the checked-kernel convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ITERS = 92
_LONG_MIN = -(2**63)


def _abs_safe(x: Column, other: Column) -> Column:
    """abs() that survives LONG_MIN via one Euclid pre-step (see module
    docstring); stays raising for the two unrepresentable-gcd pairs.
    NULL `other` takes the reducible branch (x % NULL = NULL) so NULL
    propagates instead of abs(LONG_MIN) raising."""
    reducible = (
        (x == _LONG_MIN) & ~other.eqNullSafe(0) & ~other.eqNullSafe(_LONG_MIN)
    )
    return F.abs(F.when(reducible, x % other).otherwise(x))


def gcd_col(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a, b = a.cast("bigint"), b.cast("bigint")
    a, b = _abs_safe(a, b), _abs_safe(b, a)
    acc = F.struct(a.alias("a"), b.alias("b"))
    fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(_ITERS)),
        acc,
        lambda s, _i: F.when(s.b == 0, s).otherwise(
            F.struct(s.b.alias("a"), (s.a % s.b).alias("b"))
        ),
    )
    return fold.a


def lcm_col(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a, b = F.abs(a.cast("bigint")), F.abs(b.cast("bigint"))
    g = gcd_col(a, b)
    return F.when((a == 0) | (b == 0), F.lit(0)).otherwise(a / g * b).cast("bigint")
