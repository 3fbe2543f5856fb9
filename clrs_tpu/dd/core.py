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
_SPLIT32 = np.float32(4097.0)  # 2**12 + 1, Dekker split constant for binary32


def _split_const(a):
    """Dekker split constant for the dtype of ``a`` (f64 or f32).

    The f32 words are the TPU-sound substrate: on this chip f32 add/mul are
    exactly IEEE while f64 is an unsound emulation (NOTES_TPU_NUMERICS.md),
    so error-free transforms built on f32 are valid on-device."""
    dt = getattr(a, "dtype", None)
    if dt is not None and dt == np.float32:
        return _SPLIT32
    return _SPLIT


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
    """Dekker split into two non-overlapping halves (f64: ~26 bits each,
    f32: ~12 bits each, so half-products are exact in the working dtype)."""
    t = _bar(_split_const(a) * a)
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
# multi-word ops; operands are tuples of same-shape float64 arrays.
# len 2 = double-word (~106 bits, the fast default); len 4 = quad-word
# (~212 bits, the high-precision backend — the reference's prec=256 regime,
# ClusteredLowRankSolver.jl src/solver.jl:100-128). The quad-word algorithms
# are floating-point-expansion style (VecSum renormalization sweeps, cf.
# Joldes-Muller-Popescu and the CAMPARY/QD libraries), built only on the
# error-free transforms above so they stay exact under IEEE f64.
# ---------------------------------------------------------------------------

def dd_normalize(hi, lo):
    return quick_two_sum(hi, lo)


def _vec_sum(cs):
    """One bottom-up two_sum sweep: value-preserving; cs[0] becomes fl(sum)."""
    n = len(cs)
    out = [None] * n
    s = cs[n - 1]
    for i in range(n - 2, -1, -1):
        s, e = two_sum(cs[i], s)
        out[i + 1] = e
    out[0] = s
    return out


def _is_jax(v):
    return type(v).__module__.split(".")[0] in ("jax", "jaxlib")


def _renorm_scan(cs, nw, sweeps):
    """Scan-based renorm for jax arrays: the two_sum sweeps run as
    `lax.scan` over a word-stacked array, so each multi-word op costs
    O(1) top-level jaxpr equations instead of O(words * sweeps * 6).
    This is what makes the quad-word solver graph compilable (measured:
    615k primitives -> small for the cohnelkies step at nw=4)."""
    import jax.numpy as jnp
    from jax import lax

    dt = None
    for c in cs:
        d = getattr(c, "dtype", None)
        if d is not None and d in (jnp.float32, jnp.float64):
            dt = d
            break
    dt = dt or jnp.float64
    cs = jnp.broadcast_arrays(*[jnp.asarray(c, dtype=dt) for c in cs])
    W = jnp.stack(cs)

    def sweep(W, _):
        def body(s, w):
            s2, e = two_sum(w, s)
            return s2, e
        s, es = lax.scan(body, W[-1], W[:-1], reverse=True)
        return jnp.concatenate([s[None], es], axis=0), None

    W, _ = lax.scan(sweep, W, None, length=sweeps)
    out = list(W[:nw])
    # fold sub-target words into the last kept word (below eps^nw relative)
    for i in range(nw, W.shape[0]):
        out[-1] = out[-1] + W[i]
    return tuple(out)


def _renorm(cs, nw, sweeps=3):
    """Compress an expansion (list, roughly decreasing) to nw words."""
    if len(cs) > nw and any(_is_jax(c) for c in cs):
        return _renorm_scan(cs, nw, sweeps)
    for _ in range(sweeps):
        cs = _vec_sum(cs)
    cs = list(cs)
    while len(cs) > nw:
        t = cs.pop()
        cs[-1] = cs[-1] + t      # O(eps^nw) relative; below the last word
    return tuple(cs)


def qd_add(x, y):
    """Generic n-word expansion add (any word count, any float dtype)."""
    merged = []
    for a, b in zip(x, y):
        merged.append(a)
        merged.append(b)
    return _renorm(merged, len(x))


def _newton_iters(nw):
    """Newton doublings needed to reach nw words from a 1-word seed."""
    it = 0
    reach = 1
    while reach < nw:
        reach *= 2
        it += 1
    return max(it, 2)


def qd_mul(x, y):
    """Generic n-word expansion product, accurate to O(eps^nw).

    Diagonal d (= i+j) terms are order eps^d relative to the result:
    error-free products for d < nw-1 (their residuals are order eps^(d+1)),
    plain products on the last kept diagonal d = nw-1 (their own rounding
    is order eps^nw, below the target). Matches the hand-written quad-word
    version for nw = 4 and extends to the f32-expansion substrate."""
    nw = len(x)
    if nw == 1:
        return (x[0] * y[0],)
    cs = []
    prev_errs = []
    for d in range(nw - 1):
        ps, errs = [], []
        for i in range(d + 1):
            p, e = two_prod(x[i], y[d - i])
            ps.append(p)
            errs.append(e)
        cs.extend(ps)
        cs.extend(prev_errs)
        prev_errs = errs
    last = x[0] * y[nw - 1]
    for i in range(1, nw):
        last = last + x[i] * y[nw - 1 - i]
    for e in prev_errs:
        last = last + e
    cs.append(last)
    return _renorm(cs, nw)


def qd_mul_f64(x, a):
    """n-word expansion times a single working-precision float."""
    nw = len(x)
    cs = []
    prev_e = None
    for i in range(nw - 1):
        p, e = two_prod(x[i], a)
        cs.append(p)
        if prev_e is not None:
            cs.append(prev_e)
        prev_e = e
    cs.append(x[nw - 1] * a + prev_e)
    return _renorm(cs, nw)


def _ex_scalar(v, like, nw):
    """nw-word expansion of scalar v broadcast like ``like``."""
    z = like * 0.0
    return (v + z,) + (z,) * (nw - 1)


def qd_div(x, y):
    """Newton iteration on the reciprocal (doublings + one refinement)."""
    nw = len(x)
    one = _ex_scalar(1.0, y[0], nw)
    r0 = 1.0 / y[0]
    r = _ex_scalar(0.0, r0, nw)
    r = (r0,) + r[1:]
    for _ in range(_newton_iters(nw) + 1):
        e = qd_add(one, qd_neg(qd_mul(y, r)))
        r = qd_add(r, qd_mul(r, e))
    q = qd_mul(x, r)
    resid = qd_add(x, qd_neg(qd_mul(y, q)))
    return qd_add(q, qd_mul(resid, r))


def qd_sqrt(x, xp=np):
    """n-word sqrt via Newton on the inverse square root (no division)."""
    nw = len(x)
    y0 = 1.0 / xp.sqrt(x[0])
    y = (y0,) + tuple(y0 * 0.0 for _ in range(nw - 1))
    half = -0.5
    for _ in range(_newton_iters(nw) + 1):
        # y <- y + y * (1 - x*y*y)/2
        t = qd_mul(x, qd_mul(y, y))
        e = qd_mul_f64(qd_add(t, _ex_scalar(-1.0, t[0], nw)), half)
        y = qd_add(y, qd_mul(y, e))
    r = qd_mul(x, y)
    # one final correction: r <- r + (x - r^2) * y / 2
    resid = qd_add(x, qd_neg(qd_mul(r, r)))
    return qd_add(r, qd_mul_f64(qd_mul(resid, y), 0.5))


def qd_neg(x):
    return tuple(-c for c in x)


def dd_add(x, y):
    """Accurate multi-word addition (dispatches on word count)."""
    if len(x) != 2:
        return qd_add(x, y)
    s1, s2 = two_sum(x[0], y[0])
    t1, t2 = two_sum(x[1], y[1])
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def dd_add_f64(x, a):
    """multi-word + single working-precision float."""
    if len(x) != 2:
        return _renorm([x[0], a] + list(x[1:]), len(x))
    s1, s2 = two_sum(x[0], a)
    s2 = s2 + x[1]
    return quick_two_sum(s1, s2)


def dd_neg(x):
    return tuple(-c for c in x)


def dd_sub(x, y):
    return dd_add(x, dd_neg(y))


def dd_mul(x, y):
    if len(x) != 2:
        return qd_mul(x, y)
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def dd_mul_f64(x, a):
    if len(x) != 2:
        return qd_mul_f64(x, a)
    p, e = two_prod(x[0], a)
    e = e + x[1] * a
    return quick_two_sum(p, e)


def dd_div(x, y):
    if len(x) != 2:
        return qd_div(x, y)
    q1 = x[0] / y[0]
    r = dd_sub(x, dd_mul_f64(y, q1))
    q2 = r[0] / y[0]
    r = dd_sub(r, dd_mul_f64(y, q2))
    q3 = r[0] / y[0]
    q1, q2 = quick_two_sum(q1, q2)
    return dd_add_f64((q1, q2), q3)


def dd_sqrt(x, xp=np):
    """Multi-word square root.

    Caller must guard non-positive inputs (returns garbage / inf there);
    the solver substitutes safe values via a mask before calling.
    """
    if len(x) != 2:
        return qd_sqrt(x, xp=xp)
    r = xp.sqrt(x[0])
    # one Newton step in double-word: r_dd = r + (x - r^2) / (2r)
    r2 = two_prod(r, r)
    diff = dd_sub(x, r2)
    corr = diff[0] / (2.0 * r)
    return quick_two_sum(r, corr)


def dd_abs(x, xp=np):
    sgn = xp.where(x[0] < 0, -1.0, 1.0)
    return tuple(c * sgn for c in x)


def _lex_after_first(x, y, i, xp, op_strict):
    """strict comparison on words i.. (x op y) for normalized expansions."""
    if i == len(x) - 1:
        return op_strict(x[i], y[i])
    return op_strict(x[i], y[i]) | (
        (x[i] == y[i]) & _lex_after_first(x, y, i + 1, xp, op_strict))


def dd_max(x, y, xp=np):
    ge = ~dd_lt(x, y)
    return tuple(xp.where(ge, a, b) for a, b in zip(x, y))


def dd_min(x, y, xp=np):
    le = ~dd_lt(y, x)
    return tuple(xp.where(le, a, b) for a, b in zip(x, y))


def dd_where(cond, x, y, xp=np):
    return tuple(xp.where(cond, a, b) for a, b in zip(x, y))


def dd_lt(x, y):
    import operator
    return _lex_after_first(x, y, 0, np, operator.lt)


def from_float(a, xp=np, nw=2, dtype=None):
    a = xp.asarray(a, dtype=dtype or xp.float64)
    z = xp.zeros_like(a)
    return (a,) + (z,) * (nw - 1)


def to_float(x):
    out = x[0]
    for c in x[1:]:
        out = out + c
    return out
