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


def _presort_stack(W, xp):
    """Sort words of a stacked expansion by descending magnitude, per
    element (exact permutation). VecSum sweeps converge for sorted inputs;
    unsorted merges (e.g. adding operands of very different magnitudes)
    can otherwise leave overlapping words after a fixed sweep count
    (measured: qd_add error 2^-98 instead of 2^-120 for 1e8 + 1e-8)."""
    order = xp.argsort(-xp.abs(W), axis=0, kind="stable") \
        if xp is np else None
    if order is None:
        import jax.numpy as jnp

        order = jnp.argsort(-jnp.abs(W), axis=0)
        return jnp.take_along_axis(W, order, axis=0)
    return np.take_along_axis(W, order, axis=0)


def _renorm_scan(cs, nw, sweeps, presort=False):
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
    if presort:
        W = _presort_stack(W, jnp)

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


# Unrolled-vs-scan policy: on TPU every lax-loop iteration costs
# microseconds of control overhead, so nested renorm scans dominated the
# Cholesky/trisolve phases — unroll small renorms there. On CPU the
# unrolled form runs much SLOWER (measured 25x on dd_cholesky: the barrier
# soup defeats LLVM vectorization), so keep the scan form.
_UNROLL_MAX_OPS = 80


def on_tpu():
    """True when jitted computations will LOWER to a real TPU.

    Every backend gate in the package must use this, not
    ``jax.default_backend()`` alone: the axon TPU plugin ignores
    JAX_PLATFORMS (tests/conftest.py), so the driver's virtual-CPU-mesh
    dryrun runs in a process whose default backend is "tpu" while a
    ``jax.default_device(cpu)`` override points every computation at CPU —
    there the TPU-variant graphs (unrolled expansions, Mosaic kernels)
    either fail to lower or compile pathologically slowly under LLVM."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    dev = jax.config.jax_default_device
    if dev is None:
        return True
    platform = dev if isinstance(dev, str) else getattr(dev, "platform", "tpu")
    return platform == "tpu"


def _unroll_renorms():
    return on_tpu()


def _renorm(cs, nw, sweeps=3, presort=False):
    """Compress an expansion (list, roughly decreasing) to nw words.

    ``presort=True`` sorts words by magnitude first — needed when the input
    order can be far from decreasing (adding operands of very different
    magnitudes); see :func:`_presort_stack`."""
    if (len(cs) > nw and any(_is_jax(c) for c in cs)
            and (len(cs) * sweeps > _UNROLL_MAX_OPS or not _unroll_renorms())):
        return _renorm_scan(cs, nw, sweeps, presort=presort)
    if presort and any(_is_jax(c) for c in cs):
        import jax.numpy as jnp

        W = jnp.stack(jnp.broadcast_arrays(*cs))
        cs = list(_presort_stack(W, jnp))
    elif presort:
        W = np.stack(np.broadcast_arrays(*[np.asarray(c, dtype=np.float64)
                                           for c in cs]))
        cs = list(_presort_stack(W, np))
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
    return _renorm(merged, len(x), presort=True)


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


def _widen(r, w):
    """Zero-pad an expansion to w words (exact embed)."""
    z = r[0] * 0.0
    return tuple(r) + (z,) * (w - len(r))


def _is_f32(x):
    dt = getattr(x[0], "dtype", None)
    return dt is not None and dt == np.float32


def _f32_exp(v, xp):
    """Floor exponent e with v = m * 2^e, m in [1, 2), for f32 v (exact bit
    math; jnp.frexp is rejected by the TPU X64-rewrite pass)."""
    if xp is np:
        _, e = np.frexp(v)
        return (e - 1).astype(np.int32)
    import jax

    bits = jax.lax.bitcast_convert_type(v, np.uint32)
    return ((bits >> 23) & np.uint32(0xFF)).astype(np.int32) - 127


def _f32_pow2(e, xp):
    """Exact f32 power of two for |e| <= 126."""
    if xp is np:
        return np.ldexp(np.float32(1.0), e).astype(np.float32)
    import jax

    bits = ((e + 127).astype(np.uint32) << 23)
    return jax.lax.bitcast_convert_type(bits, np.float32)


def _f32_scale_pow2(x, e, xp):
    """Multiply every word of an f32 expansion by 2^e (exact where the
    result is representable); |e| <= 378 covered."""
    fs = []
    rem = e
    for _ in range(3):
        h = xp.clip(rem, -126, 126)
        fs.append(_f32_pow2(h, xp))
        rem = rem - h
    out = []
    for c in x:
        for f in fs:
            c = c * f
        out.append(c)
    return tuple(out)


def _qd_recip(y):
    """Reciprocal by progressively widening Newton: iteration k only needs
    2^k words of precision, so early iterations run on short (cheap)
    expansions — ~2x fewer primitives than full-width iterations, which
    matters both for runtime and for XLA compile time of the traced graph."""
    nw = len(y)
    r = (1.0 / y[0],)
    w = 1
    while w < nw:
        w = min(2 * w, nw)
        rw = _widen(r, w)
        e = qd_add(_ex_scalar(1.0, y[0], w), qd_neg(dd_mul(y[:w], rw)))
        r = qd_add(rw, dd_mul(rw, e))
    return r


def qd_div(x, y):
    """Newton reciprocal (progressive widening) + one full-width refinement.

    For f32 expansions, Newton runs in exponent-scaled space (y' = y * 2^-k
    with y' ~ 1, exact scaling) so its intermediates never sink into the f32
    subnormal floor — without this, dividing by solver-scale pivots (1e10+)
    silently capped accuracy at ~2^-80 (measured)."""
    if not _is_f32(y):
        r = _qd_recip(y)
        q = qd_mul(x, r)
        resid = qd_add(x, qd_neg(qd_mul(y, q)))
        return qd_add(q, qd_mul(resid, r))
    import jax.numpy as jnp

    xp = np if not _is_jax(y[0]) else jnp
    k = _f32_exp(y[0], xp)
    ys = _f32_scale_pow2(y, -k, xp)              # ~ [1, 2)
    r = _qd_recip(ys)                            # ~ (0.5, 1]
    q1 = qd_mul(x, r)                            # = (x/y) * 2^k, ~ x scale
    resid = qd_add(x, qd_neg(qd_mul(ys, q1)))
    q = qd_add(q1, qd_mul(resid, r))
    return _f32_scale_pow2(q, -k, xp)


def _qd_rsqrt_core(x, xp):
    """Progressively widening Newton on the inverse square root."""
    nw = len(x)
    r = (1.0 / xp.sqrt(x[0]),)
    w = 1
    while w < nw:
        w = min(2 * w, nw)
        rw = _widen(r, w)
        # r <- r + r*(1 - x r^2)/2
        t = dd_mul(x[:w], dd_mul(rw, rw))
        e = dd_mul_f64(qd_add(t, _ex_scalar(-1.0, t[0], w)), -0.5)
        r = qd_add(rw, dd_mul(rw, e))
    return r


def _f32_sqrt_scaled(x, xp):
    """(x_scaled ~ [1,4), rsqrt(x_scaled), m) with x = x_scaled * 4^m."""
    e = _f32_exp(x[0], xp)
    m = e >> 1                                   # floor(e/2)
    xs = _f32_scale_pow2(x, -2 * m, xp)          # ~ [1, 4)
    return xs, _qd_rsqrt_core(xs, xp), m


def qd_rsqrt(x, xp=np):
    """n-word inverse square root (Newton in exponent-scaled space for f32,
    see :func:`qd_div`)."""
    if not _is_f32(x):
        return _qd_rsqrt_core(x, xp)
    import jax.numpy as jnp

    xp = np if not _is_jax(x[0]) else jnp
    _, r, m = _f32_sqrt_scaled(x, xp)
    return _f32_scale_pow2(r, -m, xp)


def qd_sqrt(x, xp=np):
    """n-word sqrt via the inverse square root (no division)."""
    if not _is_f32(x):
        y = _qd_rsqrt_core(x, xp)
        r = qd_mul(x, y)
        # one final correction: r <- r + (x - r^2) * y / 2
        resid = qd_add(x, qd_neg(qd_mul(r, r)))
        return qd_add(r, qd_mul_f64(qd_mul(resid, y), 0.5))
    import jax.numpy as jnp

    xp = np if not _is_jax(x[0]) else jnp
    xs, y, m = _f32_sqrt_scaled(x, xp)
    r = qd_mul(xs, y)                            # sqrt(xs) ~ [1, 2)
    resid = qd_add(xs, qd_neg(qd_mul(r, r)))
    r = qd_add(r, qd_mul_f64(qd_mul(resid, y), 0.5))
    return _f32_scale_pow2(r, m, xp)


def qd_neg(x):
    return tuple(-c for c in x)


def _route_expops(x):
    """f32 expansions on the real TPU route to the Mosaic-safe barrier-free
    primitives (expops.py): same accuracy contract (Fraction-validated),
    ~2x fewer HLO ops, and no argsort presort. Off-TPU keeps the barriered
    forms: the CPU LLVM pipeline needs the AVX cap + barriers story
    (NOTES_TPU_NUMERICS.md), and compiles the expops graphs pathologically
    slowly at large shapes."""
    import jax

    return (len(x) > 2 and _is_f32(x) and _is_jax(x[0])
            and on_tpu())


def dd_add(x, y):
    """Accurate multi-word addition (dispatches on word count)."""
    if len(x) != 2:
        if _route_expops(x):
            from . import expops

            return expops.exp_add(x, y)
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
        return _renorm([x[0], a] + list(x[1:]), len(x), presort=True)
    s1, s2 = two_sum(x[0], a)
    s2 = s2 + x[1]
    return quick_two_sum(s1, s2)


def dd_neg(x):
    return tuple(-c for c in x)


def dd_sub(x, y):
    return dd_add(x, dd_neg(y))


def dd_mul(x, y):
    if len(x) != 2:
        if _route_expops(x):
            from . import expops

            return expops.exp_mul(x, y)
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


def dd_rsqrt(x, xp=np):
    """Multi-word inverse square root (non-positive inputs must be guarded
    by the caller, as for :func:`dd_sqrt`)."""
    return qd_rsqrt(x, xp=xp)


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
