"""Exact multi-word GEMM via Ozaki-style mantissa slicing.

Replaces the serial Dot2 fori_loop GEMM (reference kernel equivalent:
ClusteredLowRankSolver.jl src/tools.jl:175-266 `matmul_threaded!` on Arb
matrices) with a *single* large dense GEMM over slice-stacked operands:

 1. scale each row of A (column of B) by a power of two so the multi-word
    value lies in (-1, 1),
 2. extract T slices of S bits each; every slice is an integer stored
    exactly in f64 (the extraction folds the lower words in with
    error-free vec_sum passes, so the slices represent the FULL
    multi-word value, not just the leading word),
 3. run ONE (T*M, K) @ (K, T*N) GEMM — all slice-pair products and their
    K-accumulations are exact in IEEE f64 because 2S + log2(K) + margin
    <= 53 (S is chosen from K at trace time),
 4. sum the slice-pair tiles per significance diagonal d = ta + tb
    (still exact), scale by the exact power-of-two row/column exponents,
    and cascade the ~2T diagonals into an nw-word expansion with
    error-free transforms.

Why this shape: the MXU/BLAS sees one big static GEMM instead of K
sequential rank-1 updates, XLA's traced graph stays small (no
per-K-iteration multi-word arithmetic), and the result is exact up to
the final rounding into nw words plus a truncation strictly below
2^-(53*nw + 12) relative to rowmax(A)*colmax(B)*K — at least as accurate
as the Dot2 path it replaces.

On IEEE-f64 backends (CPU) every step above is exact. On this TPU the
f64 emulation is approximate (NOTES_TPU_NUMERICS.md), as it was for the
previous GEMM path; the int8-limb MXU backend (limb_gemm.py) is the
device-exact variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import _bar, _renorm, _vec_sum, on_tpu

_MAGIC = 1.5 * 2.0 ** 52  # round-to-nearest-integer magic constant


def _ceil_log2(n: int) -> int:
    return max(0, (int(n) - 1).bit_length())


def _on_tpu() -> bool:
    return on_tpu()


def _pow2_f32bits(e):
    """Exact f64 power of two for |e| <= 126 via f32 bit construction
    (64-bit bitcasts are rejected by the TPU X64-rewrite pass)."""
    e = jnp.asarray(e, dtype=jnp.int32)
    bits = ((e + 127).astype(jnp.uint32) << 23)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.float64)


def mul_pow2(x, e):
    """x * 2^e exactly, e an int32 array.

    CPU: ldexp (exact, full f64 exponent range). TPU: chained f32-built
    power-of-two factors (ldexp is rejected by the TPU X64-rewrite pass;
    the chip's emulated f64 cannot exceed the covered range anyway)."""
    e = jnp.asarray(e, dtype=jnp.int32)
    if not _on_tpu():
        return jnp.ldexp(x, e)
    out = x
    rem = e
    for _ in range(5):  # covers |e| <= 630
        h = jnp.clip(rem, -126, 126)
        out = out * _pow2_f32bits(h)
        rem = rem - h
    return out


def _row_exponents(hi, axis):
    """Power-of-two exponent e per row/col with |value| * 2^-e < 1.

    CPU: exact via frexp. TPU: f32 exponent field (values beyond the f32
    range are not representable on the chip's emulated f64 anyway)."""
    mag = jnp.max(jnp.abs(hi), axis=axis, keepdims=True)
    mag = jnp.where(mag == 0, 1.0, mag)
    if not _on_tpu():
        _, e = jnp.frexp(mag)
        return e.astype(jnp.int32) + 1
    m32 = mag.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(m32, jnp.uint32)
    e = ((bits >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 126
    # f32 rounding of mag may round up across a power of two; +1 margin
    return e + 1


def _extract_slices(words, nslices, sbits):
    """Slice a scaled multi-word value (|v| < 1) into integer f64 slices.

    Returns `nslices` arrays; slice t is an integer with |slice| <= 2^sbits
    and v = sum_t slice_t 2^-(sbits*(t+1)) + r, |r| < 2^-(sbits*nslices).
    Every operation is exact IEEE f64 arithmetic (CPU backends).
    """
    r = list(words)
    scale = float(1 << sbits)
    slices = []
    for _ in range(nslices):
        r = [c * scale for c in r]                # exact pow2 scaling
        if len(r) > 1:
            r = _vec_sum(r)                       # error-free compression
        d = _bar(_bar(r[0] + _MAGIC) - _MAGIC)    # hardware rint (exact)
        r[0] = r[0] - d                           # exact (same ulp grid)
        slices.append(d)
    return slices


def slice_matmul(a, b, nw=None):
    """Multi-word GEMM (M,K)@(K,N) -> nw-word result via mantissa slicing.

    a, b: tuples of same-shape f64 word arrays. Accuracy: exact up to the
    final nw-word rounding + truncation below 2^-(53*nw+12) relative to
    rowscale(A)*colscale(B).
    """
    nw = nw or len(a)
    m, k = a[0].shape
    n = b[0].shape[1]
    if k == 0 or m == 0 or n == 0:
        z = jnp.zeros((m, n), dtype=jnp.float64)
        return (z,) * nw

    # target + guard bits. The guard absorbs the row*col-scale vs per-entry
    # error-model difference: slice truncation is relative to
    # rowmax(A)*colmax(B), while the Dot2 loop it replaces errs relative to
    # each entry's own sum_k |a_ik b_kj|; 29 extra bits keep the slice path
    # at least as accurate unless the mismatch exceeds 2^29.
    bits_needed = 53 * nw + 29
    lk = _ceil_log2(k)
    sbits = (53 - lk - 8) // 2
    sbits = max(4, min(24, sbits))
    nsl = -(-bits_needed // sbits)
    # exactness of diagonal tile sums: 2*sbits + lk + log2(#tiles) + 2 <= 53
    while 2 * sbits + lk + _ceil_log2(nsl) + 2 > 53 and sbits > 4:
        sbits -= 1
        nsl = -(-bits_needed // sbits)

    ea = _row_exponents(a[0], axis=1)             # (M,1)
    eb = _row_exponents(b[0], axis=0)             # (1,N)
    asc = tuple(mul_pow2(c, -ea) for c in a)
    bsc = tuple(mul_pow2(c, -eb) for c in b)

    sa = _extract_slices(asc, nsl, sbits)         # nsl x (M,K)
    sb = _extract_slices(bsc, nsl, sbits)         # nsl x (K,N)

    # one big GEMM over the slice-stacked operands
    A = jnp.concatenate(sa, axis=0)               # (T*M, K)
    B = jnp.concatenate(sb, axis=1)               # (K, T*N)
    C = jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float64)

    # diagonal sums: d = ta + tb over tiles C[ta*m:(ta+1)*m, tb*n:(tb+1)*n]
    diags = [None] * (2 * nsl - 1)
    for ta in range(nsl):
        for tb in range(nsl):
            d = ta + tb
            if d * sbits > bits_needed:
                continue                          # below truncation floor
            tile = jax.lax.slice(C, (ta * m, tb * n),
                                 ((ta + 1) * m, (tb + 1) * n))
            diags[d] = tile if diags[d] is None else diags[d] + tile

    # cascade into an (nw+2)-word expansion, most significant first
    eab = ea + eb                                 # (M,N)
    exp = None
    for d, tile in enumerate(diags):
        if tile is None:
            continue
        contrib = mul_pow2(tile, eab - sbits * (d + 2))
        if exp is None:
            exp = [contrib]
        else:
            exp = list(_renorm(exp + [contrib], nw + 2, sweeps=1))
    return tuple(_renorm(exp, nw, sweeps=2))
