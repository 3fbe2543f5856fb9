"""Mosaic-safe f32-expansion primitives (for inside Pallas kernels).

The generic expansion ops in :mod:`.core` lean on `optimization_barrier`
(not lowerable by Mosaic) and `argsort` presorting (expensive / unsupported
in kernels). This module provides the same contracts with constructions
that are exact on IEEE-f32 hardware *by algebraic structure*, so they need
no barriers:

- ``two_prod``: Dekker-style with a BIT-MASK split (clear the low 12
  mantissa bits). Every sub-product of two 12-bit halves is exact in f32,
  so even if the compiler contracts `a*b - p` into an FMA the result is
  bit-identical — the transform cannot be miscompiled, unlike the
  multiplicative Dekker split that `.core` protects with barriers.
- ``exp_add``: word-wise two_sum + diagonal-ordered renormalization sweeps
  (no sort needed: the error of word i is order eps^(i+1), so emitting
  [s0; s1 e0; s2 e1; ...] is already sorted by magnitude class — this is
  the property the argsort in `.core._presort_stack` establishes for
  arbitrarily-ordered inputs).
- ``exp_mul``: hoisted splits (each word split once, not once per pair)
  + per-diagonal products + renorm.
- ``exp_div`` / ``exp_rsqrt``: progressively-widening Newton in
  exponent-scaled space (mirrors `.core.qd_div`/`qd_rsqrt`).

two_sum is plain branch-free Knuth (6 flops, no mul -> no FMA hazard; XLA
does not apply unsafe FP reassociation, verified on-chip: see
tests/test_expops.py and the on-chip run recorded in PARITY.md).

All functions take/return tuples of same-shape f32 arrays, like `.core`.
Reference context: this layer replaces Arb ball arithmetic
(ClusteredLowRankSolver.jl src/tools.jl) inside the hot device kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["two_sum", "quick_two_sum", "two_prod", "split_f32",
           "exp_add", "exp_sub", "exp_mul", "exp_mul_pow2", "exp_scale_f64",
           "exp_div", "exp_rsqrt", "exp_sqrt", "exp_neg", "renorm"]

_MASK12 = np.uint32(0xFFFFF000)  # clear low 12 of the 23 mantissa bits


def two_sum(a, b):
    """Error-free sum (Knuth, branch-free). No barriers: contains no
    multiply, so FMA contraction cannot apply; sub/add reassociation is not
    performed by XLA under default (non-fast-math) semantics."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split_f32(a):
    """Exact split of f32 a into (hi, lo): hi carries the top 12 mantissa
    bits (bit mask, exact by construction), lo = a - hi has <= 12
    significant bits (the subtraction is exact: hi and a share an exponent
    window). 12+12 <= 24 keeps every half-product exact in f32.

    Host scalars are split with numpy (Mosaic's tpu.bitcast requires
    vectors, and a static operand should be folded anyway)."""
    if isinstance(a, (int, float, np.floating)):
        av = np.float32(a)
        hi = np.uint32(av.view(np.uint32) & _MASK12).view(np.float32)
        return np.float32(hi), np.float32(av - hi)
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & _MASK12, jnp.float32)
    return hi, a - hi


def two_prod(a, b, a_split=None, b_split=None):
    """Error-free product via mask splits. FMA-contraction-immune: all four
    half-products are exact f32 values, so any mul+add fusion computes the
    same bits."""
    ahi, alo = a_split if a_split is not None else split_f32(a)
    bhi, blo = b_split if b_split is not None else split_f32(b)
    p = a * b
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _vec_sum(cs):
    """One bottom-up two_sum sweep (value-preserving)."""
    n = len(cs)
    out = [None] * n
    s = cs[n - 1]
    for i in range(n - 2, -1, -1):
        s, e = two_sum(cs[i], s)
        out[i + 1] = e
    out[0] = s
    return out


def renorm(cs, nw, sweeps=3):
    """Compress a magnitude-class-ordered list of f32 arrays to nw words.
    Inputs must be roughly decreasing (same contract as `.core._renorm`
    without presort)."""
    cs = list(cs)
    for _ in range(sweeps):
        cs = _vec_sum(cs)
    while len(cs) > nw:
        t = cs.pop()
        cs[-1] = cs[-1] + t
    return tuple(cs)


def exp_neg(x):
    return tuple(-c for c in x)


def exp_add(x, y):
    """nw-word + nw-word -> nw words, error O(eps^nw) of the result.

    Word-wise two_sum; emitted in diagonal order [s0; s1 e0; s2 e1; ...]
    which is sorted by magnitude class, so plain sweeps converge (the
    1e8+1e-8 case that defeats unsorted interleaving lands e0 right next
    to the words of its own magnitude class here)."""
    nw = len(x)
    ss, es = [], []
    for a, b in zip(x, y):
        s, e = two_sum(a, b)
        ss.append(s)
        es.append(e)
    cs = [ss[0]]
    for i in range(1, nw):
        cs.append(ss[i])
        cs.append(es[i - 1])
    cs.append(es[-1])
    return renorm(cs, nw)


def exp_sub(x, y):
    return exp_add(x, exp_neg(y))


def exp_mul(x, y):
    """nw-word product, error O(eps^nw). Splits hoisted: each word is split
    once (the diagonal loop in `.core.qd_mul` re-splits per pair)."""
    nw = len(x)
    if nw == 1:
        return (x[0] * y[0],)
    xs = [split_f32(c) for c in x[: nw - 1]]
    ys = [split_f32(c) for c in y[: nw - 1]]
    cs = []
    prev_errs = []
    for d in range(nw - 1):
        ps, errs = [], []
        for i in range(d + 1):
            p, e = two_prod(x[i], y[d - i], xs[i], ys[d - i])
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
    return renorm(cs, nw)


def exp_mul_f32(x, a, a_split=None):
    """nw-word times one f32 word."""
    nw = len(x)
    if nw == 1:
        return (x[0] * a,)
    asp = a_split if a_split is not None else split_f32(a)
    cs = []
    prev_e = None
    for i in range(nw - 1):
        p, e = two_prod(x[i], a, None, asp)
        cs.append(p)
        if prev_e is not None:
            cs.append(prev_e)
        prev_e = e
    cs.append(x[nw - 1] * a + prev_e)
    return renorm(cs, nw)


# -- exponent-scaled Newton helpers (mirror .core's f32 handling) -----------

def _f32_exp(v):
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return ((bits >> np.uint32(23)) & jnp.uint32(0xFF)).astype(jnp.int32) \
        - np.int32(127)


def _f32_pow2(e):
    bits = ((e + np.int32(127)).astype(jnp.uint32) << np.uint32(23))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def exp_mul_pow2(x, e, steps=3):
    """Exact scaling of every word by 2^e (int32 array e, |e| <= 126*steps)."""
    fs = []
    rem = e
    for _ in range(steps):
        h = jnp.clip(rem, np.int32(-126), np.int32(126))
        fs.append(_f32_pow2(h))
        rem = rem - h
    out = []
    for c in x:
        for f in fs:
            c = c * f
        out.append(c)
    return tuple(out)


def _ex_scalar(v, like, nw):
    z = like * np.float32(0.0)
    return (np.float32(v) + z,) + (z,) * (nw - 1)


def _widen(r, w):
    z = r[0] * np.float32(0.0)
    return tuple(r) + (z,) * (w - len(r))


def _recip_core(y):
    """Progressively-widening Newton reciprocal; y ~ [1, 2)."""
    nw = len(y)
    r = (np.float32(1.0) / y[0],)
    w = 1
    while w < nw:
        w = min(2 * w, nw)
        rw = _widen(r, w)
        e = exp_add(_ex_scalar(1.0, y[0], w), exp_neg(exp_mul(y[:w], rw)))
        r = exp_add(rw, exp_mul(rw, e))
    return r


def exp_div(x, y):
    """x / y in exponent-scaled space (pivots of solver scale must not sink
    intermediates into the f32 subnormal floor; cf. `.core.qd_div`)."""
    k = _f32_exp(y[0])
    ys = exp_mul_pow2(y, -k)
    r = _recip_core(ys)
    q1 = exp_mul(x, r)
    resid = exp_add(x, exp_neg(exp_mul(ys, q1)))
    q = exp_add(q1, exp_mul(resid, r))
    return exp_mul_pow2(q, -k)


def _rsqrt_core(x):
    nw = len(x)
    r = (jax.lax.rsqrt(x[0]),)
    w = 1
    while w < nw:
        w = min(2 * w, nw)
        rw = _widen(r, w)
        t = exp_mul(x[:w], exp_mul(rw, rw))
        e = exp_mul_f32(exp_add(t, _ex_scalar(-1.0, t[0], w)),
                        np.float32(-0.5))
        r = exp_add(rw, exp_mul(rw, e))
    return r


def exp_rsqrt(x):
    """Inverse square root (positive inputs; caller guards)."""
    e = _f32_exp(x[0])
    m = e >> np.int32(1)
    xs = exp_mul_pow2(x, np.int32(-2) * m)                 # ~ [1, 4)
    r = _rsqrt_core(xs)
    return exp_mul_pow2(r, -m)


def exp_sqrt(x):
    e = _f32_exp(x[0])
    m = e >> np.int32(1)
    xs = exp_mul_pow2(x, np.int32(-2) * m)
    y = _rsqrt_core(xs)
    r = exp_mul(xs, y)
    resid = exp_add(xs, exp_neg(exp_mul(r, r)))
    r = exp_add(r, exp_mul_f32(exp_mul(resid, y), np.float32(0.5)))
    return exp_mul_pow2(r, m)


def exp_scale_f64(x, v):
    """Multiply an expansion by a host/traced f64 scalar: the scalar is
    split into three exactly-representable f32 words first (cf.
    `..solver.step._scalar_split`)."""
    v = jnp.asarray(v, jnp.float64)
    words = []
    r = v
    for _ in range(3):
        w = r.astype(jnp.float32)
        words.append(w)
        r = r - w.astype(jnp.float64)
    nw = len(x)
    out = exp_mul_f32(x, words[0])
    for wv in words[1:]:
        out = exp_add(out, exp_mul_f32(x, wv))
    return out[:nw]
