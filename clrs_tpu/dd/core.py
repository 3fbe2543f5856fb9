"""Double-word (compensated float64, "double-double") arithmetic primitives.

This is the numeric substrate of the TPU build: it replaces the reference's
Arb ball arithmetic (ClusteredLowRankSolver.jl, src/tools.jl and Arblib calls
throughout src/solver.jl) with ~106-bit double-word float64, which is enough
for the duality-gap / feasibility thresholds used by the reference test
oracles (gap 1e-15, feasibility errors ~1e-30).

All functions are generic over the array namespace: pass ``xp=jax.numpy`` for
device code or ``xp=numpy`` for host-side compile-time arithmetic.  A value is
represented as a pair ``(hi, lo)`` with ``|lo| <= ulp(hi)/2`` after
renormalisation; the represented value is exactly ``hi + lo``.

Algorithms follow the classical error-free transformations (Dekker/Knuth,
and the Ogita-Rump-Oishi Dot2 accumulation used in :mod:`.linalg`), written
without FMA so they are exact under plain IEEE round-to-nearest f64.
"""

from __future__ import annotations

import numpy as np

_SPLIT = 134217729.0  # 2**27 + 1, Dekker split constant for binary64


def _bar(*vals):
    """Optimization barrier: stop XLA/LLVM from FMA-contracting or
    algebraically simplifying across error-free-transform boundaries.

    Without this, XLA contracts patterns like add(mul(a,b), c) into fma and
    rewrites t-(t-a) -> a, silently destroying the compensation (measured:
    dd_matmul degraded to ~1e-16 relative error). No-op for numpy inputs.
    """
    if any(type(v).__module__.split(".")[0] in ("jax", "jaxlib") for v in vals):
        import jax

        out = jax.lax.optimization_barrier(vals)
        return out if len(vals) > 1 else out[0]
    return vals if len(vals) > 1 else vals[0]


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a+b), s + e = a + b exactly."""
    s = _bar(a + b)
    bb = _bar(s - a)
    e = (a - _bar(s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = _bar(a + b)
    e = b - _bar(s - a)
    return s, e


def split(a):
    """Dekker split of a float64 into two non-overlapping ~26-bit halves."""
    t = _bar(_SPLIT * a)
    ahi = _bar(t - _bar(t - a))
    alo = a - ahi
    return ahi, alo


def two_prod(a, b):
    """Error-free product: returns (p, e) with p = fl(a*b), p + e = a*b exactly."""
    p = _bar(a * b)
    ahi, alo = split(a)
    bhi, blo = split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# double-word ops; operands are (hi, lo) tuples of same-shape arrays
# ---------------------------------------------------------------------------

def dd_normalize(hi, lo):
    return quick_two_sum(hi, lo)


def dd_add(x, y):
    """Accurate double-word addition (IEEE-style, ~0.5 ulp^2)."""
    s1, s2 = two_sum(x[0], y[0])
    t1, t2 = two_sum(x[1], y[1])
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def dd_add_f64(x, a):
    """double-word + float64."""
    s1, s2 = two_sum(x[0], a)
    s2 = s2 + x[1]
    return quick_two_sum(s1, s2)


def dd_neg(x):
    return (-x[0], -x[1])


def dd_sub(x, y):
    return dd_add(x, dd_neg(y))


def dd_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def dd_mul_f64(x, a):
    p, e = two_prod(x[0], a)
    e = e + x[1] * a
    return quick_two_sum(p, e)


def dd_div(x, y):
    q1 = x[0] / y[0]
    r = dd_sub(x, dd_mul_f64(y, q1))
    q2 = r[0] / y[0]
    r = dd_sub(r, dd_mul_f64(y, q2))
    q3 = r[0] / y[0]
    q1, q2 = quick_two_sum(q1, q2)
    return dd_add_f64((q1, q2), q3)


def dd_sqrt(x, xp=np):
    """Double-word square root (Karp-Markstein style refinement).

    Caller must guard non-positive inputs (returns garbage / inf there);
    the solver substitutes safe values via a mask before calling.
    """
    r = xp.sqrt(x[0])
    # one Newton step in double-word: r_dd = r + (x - r^2) / (2r)
    r2 = two_prod(r, r)
    diff = dd_sub(x, r2)
    corr = diff[0] / (2.0 * r)
    return quick_two_sum(r, corr)


def dd_abs(x, xp=np):
    sgn = xp.where(x[0] < 0, -1.0, 1.0)
    return (x[0] * sgn, x[1] * sgn)


def dd_max(x, y, xp=np):
    take_x = (x[0] > y[0]) | ((x[0] == y[0]) & (x[1] >= y[1]))
    return (xp.where(take_x, x[0], y[0]), xp.where(take_x, x[1], y[1]))


def dd_min(x, y, xp=np):
    take_x = (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] <= y[1]))
    return (xp.where(take_x, x[0], y[0]), xp.where(take_x, x[1], y[1]))


def dd_where(cond, x, y, xp=np):
    return (xp.where(cond, x[0], y[0]), xp.where(cond, x[1], y[1]))


def dd_lt(x, y):
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] < y[1]))


def from_float(a, xp=np):
    a = xp.asarray(a, dtype=xp.float64)
    return (a, xp.zeros_like(a))


def to_float(x):
    return x[0] + x[1]
