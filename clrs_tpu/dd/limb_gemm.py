"""TPU-exact GEMM for f32-expansion operands via int8 limbs on the MXU.

This is the device GEMM of the TPU-native numeric substrate (the equivalent
of the reference's Arb matmul, ClusteredLowRankSolver.jl src/tools.jl:175-266
`matmul_threaded!`). On this chip f64 is an unsound emulation but f32 add/mul
are exactly IEEE (measured: 0 failures in 500k normal-range samples) and
int8 x int8 -> int32 `dot_general` is exact (NOTES_TPU_NUMERICS.md), so:

 1. scale each row of A (column of B) by a power of two so the expansion
    value lies in [-1/2, 1/2] (exact f32 scaling by bit-built pow2 factors),
 2. extract L limbs of 7 bits each from the scaled expansion (one lax.scan;
    each limb an integer in [-65, 65] stored in int8). Extraction uses exact
    f32 vec_sum compression + the magic-constant rint, so the limbs carry
    the FULL expansion value (truncation below 2^-(7L) of the row scale),
 3. run ONE (L*M, K) @ (K, L*N) int8->int32 GEMM on the MXU — exact for
    K <= 2^13 (limb products <= 2^13, <= L <= 48 summands per diagonal),
 4. sum limb-pair tiles per significance diagonal d = ta + tb (segment_sum,
    exact in int32), split each int32 into two exactly-f32-representable
    halves, scale by the power-of-two row/col exponents, and cascade into
    an nw-word f32 expansion (one lax.scan of error-free transforms).

Every step is exact in IEEE f32 / int8 / int32 arithmetic, all of which this
TPU implements exactly; the only losses are the final rounding into nw words
and the f32 exponent floor (contributions below ~1e-45 absolute flush to
zero — the chip's emulated f64 has the same exponent range).

The graph is compile-friendly by construction: two scans, one segment_sum,
one dot_general — constant op count regardless of L, M, K, N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core import _bar, _vec_sum, on_tpu, two_sum

LIMB_BITS = 7
_MAGIC32 = np.float32(1.5 * 2.0 ** 23)  # round-to-nearest-integer for f32
_F_RADIX = np.float32(1 << LIMB_BITS)
# int8 GEMM accumulates limb products (<= 2^13 each) in int32;
# per-diagonal sums add <= L <= 48 tiles
MAX_K_EXACT = 1 << 13

# pl_cascade_tiles holds the whole int8-GEMM output C [L*m, L*n] in one
# kernel instance; Mosaic's scoped-vmem stack limit is 16 MiB, so past this
# C-size budget fx_matmul routes to the grid-tiled / fused kernels. The
# budget counts C alone: the (nw+2)-word f32 accumulator and eab add
# (nw+3)/L^2 relative — < 2% at the production L = 21..31 — inside the
# 16 MiB / 6 MiB headroom (ADVICE r4 #1).
_PLCASCADE_C_BUDGET = 6 << 20


def _extract_fp(L, nw, m, k):
    """VMEM footprint (bytes) of one pl_extract instance: the int32 limb
    output [L, m, k], the nw f32 input words, and the ~(nw + 2)-word
    sweep temporaries (ADVICE r4 #1: count everything, not just the
    largest array)."""
    return (L + 2 * nw + 2) * m * k * 4


# pl_extract instances must stay within Mosaic's 16 MiB scoped vmem with
# headroom for the compiler's own temporaries
_PLEXTRACT_BUDGET = 12 << 20


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _pow2_f32(e):
    """Exact f32 power of two for |e| <= 126 via bit construction."""
    e = jnp.asarray(e, dtype=jnp.int32)
    bits = ((e + 127).astype(jnp.uint32) << 23)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def mul_pow2_f32(x, e, steps=4):
    """x * 2^e with x f32, e int32 array; exact wherever the result is
    representable (|e| <= 126*steps covered)."""
    e = jnp.asarray(e, dtype=jnp.int32)
    out = x
    rem = e
    for _ in range(steps):
        h = jnp.clip(rem, -126, 126)
        out = out * _pow2_f32(h)
        rem = rem - h
    return out


def _row_exp_f32(hi, axis):
    """int32 exponent e per row/col with |hi| * 2^-e <= 1/2 (exact bit math)."""
    mag = jnp.max(jnp.abs(hi), axis=axis, keepdims=True)
    mag = jnp.where(mag == 0, jnp.float32(1.0), mag)
    bits = jax.lax.bitcast_convert_type(mag, jnp.uint32)
    e = ((bits >> 23) & jnp.uint32(0xFF)).astype(jnp.int32) - 126
    return e + 1  # margin: |v| <= 1/2 after scaling


def _rint32(y):
    """Nearest integer via the magic-constant trick (hardware RN-even add);
    jnp.round may lower differently across fusions of the same graph."""
    return _bar(_bar(y + _MAGIC32) - _MAGIC32)


def _unroll():
    """On TPU every lax-loop iteration costs microseconds of control
    overhead (the dominant cost for these tiny-tensor loops), so unroll the
    fixed-length loops into flat op chains there; CPU keeps the rolled form
    (compiles and runs better under LLVM)."""
    return on_tpu()


# test override: force (True) / disable (False) the Pallas cascade kernel
# (the TPU default); CPU tests force it through the Pallas interpreter
_USE_PLCASCADE = None


def _use_plcascade():
    if _USE_PLCASCADE is not None:
        return _USE_PLCASCADE
    return on_tpu()


# test override: force (True) / disable (False) the Pallas limb-extraction
# kernel (the TPU default); CPU tests force it through the interpreter
_USE_PLEXTRACT = None


def _use_plextract():
    if _USE_PLEXTRACT is not None:
        return _USE_PLEXTRACT
    return on_tpu()


# test override: force (True) / disable (False) the FUSED limb-GEMM kernel
# (dot + cascade in one kernel; the TPU route for GEMMs whose int8 output
# would blow the whole-C VMEM budget)
_USE_PLFUSED = None


def _use_plfused():
    if _USE_PLFUSED is not None:
        return _USE_PLFUSED
    return on_tpu()


# When set to a list, every fx_matmul call site appends its int8 MXU op
# count (2 ops per MAC) during tracing — bench.py traces the IPM step once
# with this enabled to compute MFU (ops actually issued to the MXU,
# including the limb blowup; the fused kernel only multiplies the ndiag
# diagonals it keeps, the XLA path multiplies all L^2 limb pairs).
_MAC_COUNTER = None
_MAC_SCALE = 1          # batch multiplicity inside vmapped call sites


def _count_macs(L, ndiag, m, n, k, fused):
    if fused:
        npairs = sum(min(d, L - 1) - max(0, d - L + 1) + 1
                     for d in range(ndiag))
    else:
        npairs = L * L
    _MAC_COUNTER.append(2 * npairs * m * n * k * _MAC_SCALE)


class mac_scale:
    """Context manager multiplying counted MACs by a vmap batch size
    (vmap hides the batch axis from fx_matmul's traced shapes)."""

    def __init__(self, batch):
        self.batch = batch

    def __enter__(self):
        global _MAC_SCALE
        self._old = _MAC_SCALE
        _MAC_SCALE = self._old * int(self.batch)

    def __exit__(self, *exc):
        global _MAC_SCALE
        _MAC_SCALE = self._old


def _extract_limbs(words, L):
    """Split a scaled f32 expansion (|value| <= ~1/2) into L int8 limbs.

    Returns int8 [L, *shape] with
    value = sum_t limb_t * 2^-(LIMB_BITS*(t+1)) + r, |r| < 2^-(LIMB_BITS*L);
    every limb an integer in [-65, 65]. All f32 ops exact. One lax.scan
    (or a flat unrolled chain on TPU)."""
    if _unroll():
        ws = list(words)
        limbs = []
        for _ in range(L):
            ws = [c * _F_RADIX for c in ws]
            ws = _vec_sum(ws)
            d = _rint32(ws[0])
            ws[0] = ws[0] - d
            limbs.append(d.astype(jnp.int8))
        return jnp.stack(limbs)

    W = jnp.stack(words)  # (nw, ...)

    def body(W, _):
        W = W * _F_RADIX                          # exact pow2 scaling
        ws = _vec_sum([W[i] for i in range(W.shape[0])])
        d = _rint32(ws[0])
        ws[0] = ws[0] - d                         # exact (same ulp grid)
        return jnp.stack(ws), d.astype(jnp.int8)

    _, limbs = jax.lax.scan(body, W, None, length=L)
    return limbs


def fx_matmul(a, b, nw=None, pre_a=None, pre_b=None):
    """f32-expansion GEMM (M,K)@(K,N) -> nw-word f32 expansion.

    a, b: tuples of same-shape f32 word arrays. Exact up to the final
    nw-word rounding + truncation below 2^-(24*nw+21) relative to
    rowscale(A)*colscale(B), on any backend whose f32/int8/int32 are IEEE
    (this TPU, CPU). ``pre_a``/``pre_b`` = (limbs int8, exp int32) from
    :func:`host_precompute` skip that operand's runtime scaling +
    extraction (for constant operands; nw must then be passed)."""
    nw = nw or (len(a) if a is not None else len(b))
    m, k = a[0].shape if pre_a is None else pre_a[0].shape[1:]
    n = b[0].shape[1] if pre_b is None else pre_b[0].shape[2]
    if k == 0 or m == 0 or n == 0:
        z = jnp.zeros((m, n), dtype=jnp.float32)
        return (z,) * nw

    # target + guard bits; the guard absorbs the rowmax*colmax-scale vs
    # per-entry error-model difference (see slice_gemm.py)
    bits_needed = 24 * nw + 21
    L = _ceil_div(bits_needed, LIMB_BITS)
    assert L <= 48 and k <= MAX_K_EXACT, (L, k)

    use_plx = _use_plextract()
    if use_plx:
        from .pallas_linalg import pl_extract

    ndiag = min(2 * L - 1, bits_needed // LIMB_BITS + 1)

    # FUSED route for GEMMs whose int8 output C would exceed the whole-C
    # VMEM budget: MXU dots + diagonal cascade in ONE kernel per output
    # tile, so C (L^2 x the logical result) never touches HBM. Operands in
    # limb-major [L, m, k] / [L, k, n] — exactly host_precompute's layout,
    # so constant operands skip the runtime moveaxis/reshape copies too.
    if (_use_plfused()
            and (L * m) * (L * n) * 4 > _PLCASCADE_C_BUDGET):
        from .pallas_linalg import _fused_tile_sizes, pl_limb_gemm_fused

        if _fused_tile_sizes(m, n, L, k, _PLCASCADE_C_BUDGET) is not None:
            if _MAC_COUNTER is not None:
                _count_macs(L, ndiag, m, n, k, fused=True)
            if pre_a is None:
                if use_plx and _extract_fp(L, nw, m, k) <= _PLEXTRACT_BUDGET:
                    la3, ea = pl_extract(a, L, "a3", LIMB_BITS)
                    A3 = la3.astype(jnp.int8)
                else:
                    ea = _row_exp_f32(a[0], axis=1)
                    asc = tuple(mul_pow2_f32(c, -ea) for c in a)
                    A3 = _extract_limbs(asc, L)          # [L, m, k] int8
            else:
                A3, ea = pre_a
            if pre_b is None:
                if use_plx and _extract_fp(L, nw, k, n) <= _PLEXTRACT_BUDGET:
                    lb3, eb = pl_extract(b, L, "b3", LIMB_BITS)
                    B3 = lb3.astype(jnp.int8)
                else:
                    eb = _row_exp_f32(b[0], axis=0)
                    bsc = tuple(mul_pow2_f32(c, -eb) for c in b)
                    B3 = _extract_limbs(bsc, L)          # [L, k, n] int8
            else:
                B3, eb = pre_b
            eab = jnp.broadcast_to((ea + eb).astype(jnp.int32), (m, n))
            return pl_limb_gemm_fused(A3, B3, eab, nw, LIMB_BITS, L,
                                      ndiag, _PLCASCADE_C_BUDGET)

    if pre_a is None:
        if use_plx and _extract_fp(L, nw, m, k) <= _PLEXTRACT_BUDGET:
            # scaling + extraction + A-layout as ONE Pallas kernel
            la2, ea = pl_extract(a, L, "a", LIMB_BITS)   # (L*M, K) int32
            A = la2.astype(jnp.int8)
        else:
            ea = _row_exp_f32(a[0], axis=1)          # (M,1)
            asc = tuple(mul_pow2_f32(c, -ea) for c in a)
            A = _extract_limbs(asc, L).reshape(L * m, k)   # (L*M, K) int8
    else:
        la, ea = pre_a
        assert la.shape[0] == L, (la.shape, L)
        A = la.reshape(L * m, k)
    if pre_b is None:
        if use_plx and _extract_fp(L, nw, k, n) <= _PLEXTRACT_BUDGET:
            lb2, eb = pl_extract(b, L, "b", LIMB_BITS)   # (K, L*N) int32
            B = lb2.astype(jnp.int8)
        else:
            eb = _row_exp_f32(b[0], axis=0)          # (1,N)
            bsc = tuple(mul_pow2_f32(c, -eb) for c in b)
            B = jnp.moveaxis(_extract_limbs(bsc, L), 0, 1).reshape(k, L * n)
    else:
        lb, eb = pre_b
        assert lb.shape[0] == L, (lb.shape, L)
        B = jnp.moveaxis(lb, 0, 1).reshape(k, L * n)

    if _MAC_COUNTER is not None:
        _count_macs(L, ndiag, m, n, k, fused=False)
    C = jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)

    eab = (ea + eb).astype(jnp.int32)            # (M,N)

    if _use_plcascade():
        # diagonal tile sums + cascade + renorm as ONE Pallas kernel
        # consuming C directly (the XLA segment_sum + tile transpose below
        # measured ~34% of the IPM step's device time; the int32 diagonal
        # sums are associative-exact, so in-kernel summation is
        # value-identical) — see pallas_linalg.pl_cascade_tiles. Above the
        # whole-C VMEM budget, the GRID-TILED variant streams C through
        # VMEM in output tiles (bit-identical; replaces the segment_sum
        # HBM fallback that dominated the Schur-scale panel GEMMs).
        eab_b = jnp.broadcast_to(eab, (m, n))
        if (L * m) * (L * n) * 4 <= _PLCASCADE_C_BUDGET:
            from .pallas_linalg import pl_cascade_tiles

            return pl_cascade_tiles(C, eab_b, nw, LIMB_BITS, L, m, n, ndiag)
        from .pallas_linalg import pl_cascade_tiles_grid

        out = pl_cascade_tiles_grid(C, eab_b, nw, LIMB_BITS, L, m, n,
                                    ndiag, _PLCASCADE_C_BUDGET)
        if out is not None:
            return out
        # degenerate budget (tests) or L too large for any Mosaic-legal
        # tiling: the plain XLA cascade below handles any shape

    # per-diagonal int32 sums D[d] = sum_{ta+tb=d} tile(ta,tb): exact
    # (<= L tiles of <= K products <= 2^13 each)
    tiles = C.reshape(L, m, L, n).transpose(0, 2, 1, 3).reshape(L * L, m, n)
    ta = jnp.repeat(jnp.arange(L), L)
    tb = jnp.tile(jnp.arange(L), L)
    diags = jax.ops.segment_sum(tiles, ta + tb, num_segments=2 * L - 1)
    diags = diags[:ndiag]                        # below truncation floor

    # cascade into an (nw+2)-word expansion, most significant first

    def body(acc, dt_):
        d, tile = dt_
        hi_i = tile >> 15                        # floor shift, |hi| <= 2^16
        lo_i = tile - (hi_i << 15)               # in [0, 2^15)
        sc = eab - LIMB_BITS * (d + 2)
        hi = mul_pow2_f32(hi_i.astype(jnp.float32) * jnp.float32(1 << 15), sc)
        lo = mul_pow2_f32(lo_i.astype(jnp.float32), sc)
        # one error-free sweep folds the two new words into the carry
        # (contributions arrive in decreasing significance)
        cs = [acc[i] for i in range(acc.shape[0])] + [hi, lo]
        cs = _vec_sum(cs)
        low = cs[-2] + cs[-1]                    # below the last kept word
        cs = cs[:-2]
        cs[-1] = cs[-1] + low
        return jnp.stack(cs), None

    acc0 = jnp.zeros((nw + 2, m, n), dtype=jnp.float32)
    if _unroll():
        acc = acc0
        for d in range(ndiag):
            acc, _ = body(acc, (d, diags[d]))
    else:
        acc, _ = jax.lax.scan(body, acc0, (jnp.arange(ndiag), diags))

    # final renorm into nw words (two unrolled sweeps)
    cs = [acc[i] for i in range(nw + 2)]
    cs = _vec_sum(_vec_sum(cs))
    out = list(cs[:nw])
    for i in range(nw, nw + 2):
        out[-1] = out[-1] + cs[i]
    return tuple(out)


# ---------------------------------------------------------------------------
# host-side precomputation of limb forms for CONSTANT operands: the limb
# extraction is ~40% of an fx_matmul's elementwise work, and the solver's
# hottest GEMMs have one constant side (V panels, Ul/Ur term tables, B).
# DeviceSDP extracts those once at build time with bit-identical numpy f32
# arithmetic; fx_matmul then skips that side's scaling + extraction.
# ---------------------------------------------------------------------------

def _np_two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _np_vec_sum(cs):
    n = len(cs)
    out = [None] * n
    s = cs[n - 1]
    for i in range(n - 2, -1, -1):
        s, e = _np_two_sum(cs[i], s)
        out[i + 1] = e
    out[0] = s
    return out


def host_precompute(words, nw, axis):
    """Limb form of a constant operand (numpy f32, IEEE -> same contract as
    the device extraction): returns (limbs int8 [L, *shape], exp int32
    keepdims-shaped). ``axis=1`` for a left operand (row exponents over K),
    ``axis=0`` for a right operand (column exponents)."""
    bits_needed = 24 * nw + 21
    L = _ceil_div(bits_needed, LIMB_BITS)
    ws = [np.asarray(w, np.float32) for w in words]
    mag = np.max(np.abs(ws[0]), axis=axis, keepdims=True)
    mag = np.where(mag == 0, np.float32(1.0), mag).astype(np.float32)
    e = (np.frexp(mag)[1]).astype(np.int32)     # mag = m * 2^e, m in [0.5,1)
    e = e + 1                                   # |v| <= 1/2 after scaling
    ws = [np.ldexp(c.astype(np.float64), -e).astype(np.float32) for c in ws]
    limbs = []
    for _ in range(L):
        ws = [c * np.float32(_F_RADIX) for c in ws]
        ws = _np_vec_sum(ws)
        d = np.rint(ws[0]).astype(np.float32)
        ws[0] = ws[0] - d
        limbs.append(d.astype(np.int8))
    return np.stack(limbs), e
