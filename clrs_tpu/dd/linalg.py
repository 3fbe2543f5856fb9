"""Multi-word linear algebra on JAX (device path).

TPU-native equivalents of the reference's Arb kernels
(`ClusteredLowRankSolver.jl/src/tools.jl`: approx_cholesky!, matmul_threaded!,
Arblib.approx_solve_tril!/triu!, approx_mul!):

- :func:`dd_matmul`   — Dot2-compensated GEMM (Ogita-Rump-Oishi) + cross terms
                        (double-word); expansion GEMM for quad-word
- :func:`dd_cholesky` — right-looking Cholesky with masked rank-1 updates;
                        returns a success flag instead of throwing (the host
                        loop maps it onto the reference's SolverFailure path)
- :func:`dd_solve_tril`/:func:`dd_solve_triu` — row/back substitution
- pairwise compensated reductions (:func:`dd_sum`, :func:`dd_dot`)

All values are tuples of float64 arrays (2 words = ~106 bits, 4 words =
~212 bits — the reference's prec=256 tier); all elementwise primitives from
:mod:`.core` dispatch on word count and broadcast, so these routines work on
batched operands via ``jax.vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .core import (
    dd_add,
    on_tpu,
    dd_div,
    dd_mul,
    dd_rsqrt,
    dd_sqrt,
    dd_sub,
    dd_where,
    quick_two_sum,
    to_float,
    two_prod,
    two_sum,
)

__all__ = [
    "b_cholesky",
    "b_solve_tril",
    "b_solve_tril_t",
    "b_solve_cholesky",
    "s_cholesky",
    "s_solve_tril",
    "s_solve_tril_t",
    "s_solve_cholesky",
    "dd_array",
    "dd_array_b",
    "dd_transpose_b",
    "dd_zeros",
    "dd_eye",
    "dd_transpose",
    "dd_sum",
    "dd_dot",
    "dd_max_abs",
    "dd_matmul",
    "dd_cholesky",
    "dd_solve_tril",
    "dd_solve_triu",
    "dd_solve_cholesky",
    "dd_symmetrize",
    "cmap",
]


def cmap(f, x):
    """Apply f to every word of a multi-word value."""
    return tuple(f(c) for c in x)


def wdtype(x):
    """Working dtype of a multi-word value."""
    return getattr(x[0], "dtype", jnp.float64)


def dd_array(a, nw=2, dtype=None):
    a = jnp.asarray(a, dtype=dtype or jnp.float64)
    z = jnp.zeros_like(a)
    return (a,) + (z,) * (nw - 1)


def dd_zeros(shape, nw=2, dtype=None):
    z = jnp.zeros(shape, dtype=dtype or jnp.float64)
    return (z,) * nw


def dd_eye(n, nw=2, dtype=None):
    e = jnp.eye(n, dtype=dtype or jnp.float64)
    return (e,) + (jnp.zeros_like(e),) * (nw - 1)


def dd_transpose(x):
    """Transpose the last two axes (batched-safe)."""
    return cmap(lambda c: jnp.swapaxes(c, -1, -2), x)


# alias: batched transpose over a leading class axis is the same operation
dd_transpose_b = dd_transpose


def dd_array_b(a, nw=2, dtype=None):
    """Batched constant array -> multi-word value (exact embed)."""
    return dd_array(a, nw, dtype=dtype)


def dd_sum(x, axis):
    """Pairwise (tree) compensated sum along ``axis``. Static shapes only."""
    ws = [jnp.moveaxis(c, axis, 0) for c in x]
    n = ws[0].shape[0]
    while n > 1:
        half = (n + 1) // 2
        a = tuple(c[:n // 2] for c in ws)
        b = tuple(c[half:half + n // 2] for c in ws)
        s = dd_add(a, b)
        if n % 2 == 1:
            s = tuple(jnp.concatenate([sc, c[n // 2:half]], axis=0)
                      for sc, c in zip(s, ws))
        ws = list(s)
        n = half
    if ws[0].shape[0] == 0:
        z = jnp.zeros(ws[0].shape[1:], dtype=ws[0].dtype)
        return (z,) * len(ws)
    return tuple(c[0] for c in ws)


def dd_dot(x, y):
    """Compensated trace inner product sum(x * y) over all elements."""
    p = dd_mul(x, y)
    return dd_sum(cmap(lambda c: c.reshape(-1), p), axis=0)


def dd_max_abs(x):
    """max |x| as a plain float64 (used only for error reporting/termination;
    words are cast to f64 before summing so f32-substrate errors keep their
    full precision)."""
    s = x[0].astype(jnp.float64)
    for c in x[1:]:
        s = s + c.astype(jnp.float64)
    v = jnp.abs(s)
    return jnp.max(v) if v.size else jnp.zeros((), jnp.float64)


def dd_matmul(a, b):
    """Multi-word GEMM: (M,K) @ (K,N) -> (M,N).

    Dispatch (the universal hot kernel, the equivalent of the reference's
    `matmul_threaded!`, ClusteredLowRankSolver.jl src/tools.jl:175-266):

    - f32 expansions -> :func:`limb_gemm.fx_matmul`: ONE int8->int32 MXU
      GEMM over limb-stacked operands + exact f32 recombination. This is
      the TPU-sound path (device f64 is an unsound emulation).
    - f64 words on IEEE backends (CPU) -> :func:`slice_gemm.slice_matmul`:
      ONE f64 GEMM over mantissa-slice-stacked operands. Replaces the
      round-1 sequential fori_loop of rank-1 updates (the 0.385x-baseline
      bottleneck) with a single large GEMM.
    - f64 words elsewhere -> compensated fori_loop fallback.
    """
    m, k = a[0].shape
    n = b[0].shape[1]
    nw = len(a)
    dt = wdtype(a)
    if k == 0 or m == 0 or n == 0:
        return dd_zeros((m, n), nw, dtype=dt)

    if dt == jnp.float32:
        from .limb_gemm import fx_matmul

        return fx_matmul(a, b)

    if not on_tpu():
        from .slice_gemm import slice_matmul

        return slice_matmul(a, b)

    if nw == 2:
        ah, al = a
        bh, bl = b

        def body(i, carry):
            s, c = carry
            col = lax.dynamic_slice(ah, (0, i), (m, 1))          # (M,1)
            row = lax.dynamic_slice(bh, (i, 0), (1, n))          # (1,N)
            p, e = two_prod(col, row)
            s, e2 = two_sum(s, p)
            c = c + (e + e2)
            return (s, c)

        z = jnp.zeros((m, n), dtype=jnp.float64)
        s, c = lax.fori_loop(0, k, body, (z, z))
        cross = ah @ bl + al @ bh
        return quick_two_sum(s, c + cross)

    # quad-word: rank-1 accumulation over K (same loop structure as the dd
    # path; a full (M,K,N) expansion-product broadcast makes the traced
    # graph and the working set K times larger for no accuracy gain)
    def body(i, acc):
        col = tuple(lax.dynamic_slice(c, (0, i), (m, 1)) for c in a)
        row = tuple(lax.dynamic_slice(c, (i, 0), (1, n)) for c in b)
        return dd_add(acc, dd_mul(col, row))

    z = jnp.zeros((m, n), dtype=jnp.float64)
    return lax.fori_loop(0, k, body, (z,) * nw)


def dd_symmetrize(x):
    s = dd_add(x, dd_transpose(x))
    return cmap(lambda c: 0.5 * c, s)  # scaling by 0.5 is exact


def _take_all(ws, idx):
    return tuple(c[idx] for c in ws)


def dd_cholesky(a):
    """Cholesky of a multi-word symmetric matrix.

    Returns (L, ok): lower-triangular factor and a bool success flag (all
    pivots strictly positive), mirroring approx_cholesky! in
    `ClusteredLowRankSolver.jl/src/tools.jl:59-107` which zeroes Arb error
    bounds mid-iteration and reports 0/1 success.
    """
    nw = len(a)
    n = a[0].shape[0]
    if n == 0:
        return a, jnp.bool_(True)
    idx = jnp.arange(n)
    dt = wdtype(a)
    one = (jnp.ones((), dt),) + (jnp.zeros((), dt),) * (nw - 1)

    def body(j, carry):
        ws, ok = carry
        d = tuple(c[j, j] for c in ws)
        pos = d[0] > 0
        ok = ok & pos
        d_safe = dd_where(pos, d, one, xp=jnp)
        # one rsqrt serves both the pivot sqrt and the column scaling
        # (saves a full Newton division per column vs sqrt + div)
        rs = dd_rsqrt(d_safe, xp=jnp)
        rt = dd_mul(d_safe, rs)
        col = tuple(c[:, j] for c in ws)
        coll = dd_mul(col, rs)
        below = idx > j
        # final column j of L: rt at (j,j), coll below, 0 above
        newcol = tuple(jnp.where(below, cc, jnp.where(idx == j, rc, 0.0))
                       for cc, rc in zip(coll, rt))
        # rank-1 update of the trailing submatrix
        collb = tuple(jnp.where(below, cc, 0.0) for cc in coll)
        upd = dd_mul(cmap(lambda c: c[:, None], collb),
                     cmap(lambda c: c[None, :], collb))
        mask = below[:, None] & below[None, :]
        u = dd_sub(ws, upd)
        ws = tuple(jnp.where(mask, uc, wc) for uc, wc in zip(u, ws))
        ws = tuple(wc.at[:, j].set(nc) for wc, nc in zip(ws, newcol))
        return (ws, ok)

    ws, ok = lax.fori_loop(0, n, body, (a, jnp.bool_(True)))
    tril = jnp.tril(jnp.ones((n, n), dtype=bool))
    return cmap(lambda c: jnp.where(tril, c, 0.0), ws), ok


def _diag_recip(m):
    """Reciprocals of the diagonal, one vectorized division for all rows
    (hoisted out of the substitution loop: a Newton division per row was
    the dominant compile/run cost of the loop body)."""
    i = jnp.arange(m[0].shape[0])
    diag = tuple(c[i, i] for c in m)
    one = (jnp.ones_like(diag[0]),) + tuple(jnp.zeros_like(d) for d in diag[1:])
    return dd_div(one, diag)


def dd_solve_tril(l, b):
    """Solve L X = B with L lower triangular (unit rhs columns allowed)."""
    nw = len(l)
    n = l[0].shape[0]
    if n == 0:
        return b
    idx = jnp.arange(n)
    dinv = _diag_recip(l)

    def body(i, x):
        row = tuple(c[i, :] for c in l)
        mask = (idx < i).astype(wdtype(l))
        contrib = dd_mul(cmap(lambda c: c[:, None] * mask[:, None], row), x)
        s = dd_sum(contrib, axis=0)
        rhs = dd_sub(tuple(c[i, :] for c in b), s)
        xi = dd_mul(rhs, tuple(c[i] for c in dinv))
        return tuple(xc.at[i, :].set(xic) for xc, xic in zip(x, xi))

    z = jnp.zeros_like(b[0])
    return lax.fori_loop(0, n, body, (z,) * nw)


def dd_solve_triu(u, b):
    """Solve U X = B with U upper triangular."""
    nw = len(u)
    n = u[0].shape[0]
    if n == 0:
        return b
    idx = jnp.arange(n)
    dinv = _diag_recip(u)

    def body(t, x):
        i = n - 1 - t
        row = tuple(c[i, :] for c in u)
        mask = (idx > i).astype(wdtype(u))
        contrib = dd_mul(cmap(lambda c: c[:, None] * mask[:, None], row), x)
        s = dd_sum(contrib, axis=0)
        rhs = dd_sub(tuple(c[i, :] for c in b), s)
        xi = dd_mul(rhs, tuple(c[i] for c in dinv))
        return tuple(xc.at[i, :].set(xic) for xc, xic in zip(x, xi))

    z = jnp.zeros_like(b[0])
    return lax.fori_loop(0, n, body, (z,) * nw)


def dd_solve_cholesky(l, b):
    """Solve (L L^T) X = B given the Cholesky factor L."""
    y = dd_solve_tril(l, b)
    return dd_solve_triu(dd_transpose(l), y)


# ---------------------------------------------------------------------------
# batched front-ends: route to the Pallas TPU kernels (whole factorization
# in ONE kernel, pallas_linalg.py) on the f32 substrate, else vmap the
# XLA-loop versions above. These are the entry points the solver uses.
#
# Large matrices (n >= _BLK_MIN) go through BLOCKED right-looking
# formulations first: the sequential row/column recurrences run only on
# nb x nb diagonal blocks (cheap), while the O(n^3) trailing updates run
# as expansion GEMMs — the exact int8-limb MXU GEMM on the f32 substrate.
# This is what makes the Schur-dominated tier (chol(S^j) and the KKT
# solves on [P, P] with P in the hundreds, the reference's hot loop #2,
# ClusteredLowRankSolver.jl src/solver.jl:1244-1252 + src/tools.jl:59-107)
# MXU-bound instead of VPU-row-sequential, and it is the formulation whose
# trailing GEMMs GSPMD can shard over a mesh (VERDICT r4 item 3).
# ---------------------------------------------------------------------------

_BLK_NB = 64     # diagonal block size of the blocked formulations
_BLK_MIN = 96    # use blocked factorizations from this size up

# test override: force (True) / disable (False) the blocked route
_USE_BLOCKED = None


def _use_blocked(n):
    if _USE_BLOCKED is not None:
        return _USE_BLOCKED and n >= _BLK_MIN
    return n >= _BLK_MIN


def _blk_ranges(n, nb=None):
    nb = nb or _BLK_NB
    return [(k0, min(k0 + nb, n)) for k0 in range(0, n, nb)]


def _sub_b(x, r0, r1, c0, c1):
    return tuple(c[:, r0:r1, c0:c1] for c in x)


def _bmm_b(a, b):
    """Batched expansion GEMM over the leading axis (vmapped dd_matmul:
    fx_matmul limb GEMM on f32, slice/compensated GEMM on f64)."""
    from .limb_gemm import mac_scale

    with mac_scale(a[0].shape[0]):
        return jax.vmap(dd_matmul)(a, b)


def _b_cholesky_blocked(a, nb=None):
    """Blocked right-looking Cholesky of [L, n, n] expansion words.

    Per block column: factor the nb x nb diagonal block with the
    row-sequential kernel, solve the panel below it against L_kk^T, and
    update the trailing matrix with ONE expansion GEMM (MXU on the f32
    substrate). Value-equal to the unblocked factorization up to the
    per-GEMM nw-word rounding (each fold rounds at ~2^-(24 nw) relative)."""
    nw = len(a)
    Lb, n, _ = a[0].shape
    dt = wdtype(a)
    rngs = _blk_ranges(n, nb)
    out = dd_zeros((Lb, n, n), nw, dtype=dt)
    ok = jnp.ones((Lb,), dtype=bool)
    A = a
    for (k0, k1) in rngs:
        Akk = _sub_b(A, k0, k1, k0, k1)
        Lkk, okb = b_cholesky(Akk)              # small: Pallas/vmap route
        ok = ok & okb
        out = tuple(o.at[:, k0:k1, k0:k1].set(lc)
                    for o, lc in zip(out, Lkk))
        if k1 < n:
            A21 = _sub_b(A, k1, n, k0, k1)
            # panel P with P L_kk^T = A21  <=>  L_kk P^T = A21^T
            Pt = b_solve_tril(Lkk, dd_transpose_b(A21))
            Pn = dd_transpose_b(Pt)             # [L, n-k1, nb]
            out = tuple(o.at[:, k1:, k0:k1].set(pc)
                        for o, pc in zip(out, Pn))
            upd = _bmm_b(Pn, Pt)                # trailing GEMM (MXU)
            A22 = dd_sub(_sub_b(A, k1, n, k1, n), upd)
            A = tuple(c.at[:, k1:, k1:].set(uc)
                      for c, uc in zip(A, A22))
    return out, ok


def _b_solve_tril_blocked(l, b, nb=None):
    """Blocked forward substitution L X = B ([L, n, n] @ [L, n, m]):
    x_k = L_kk^-1 (b_k - L_k,<k x_<k); the off-diagonal apply is ONE
    expansion GEMM per block row."""
    nw = len(l)
    Lb, n, _ = l[0].shape
    m = b[0].shape[2]
    dt = wdtype(l)
    x = dd_zeros((Lb, n, m), nw, dtype=dt)
    for (k0, k1) in _blk_ranges(n, nb):
        rhs = _sub_b(b, k0, k1, 0, m)
        if k0 > 0:
            Lrow = _sub_b(l, k0, k1, 0, k0)
            rhs = dd_sub(rhs, _bmm_b(Lrow, _sub_b(x, 0, k0, 0, m)))
        xk = b_solve_tril(_sub_b(l, k0, k1, k0, k1), rhs)
        x = tuple(c.at[:, k0:k1, :].set(xc) for c, xc in zip(x, xk))
    return x


def _b_solve_tril_t_blocked(l, b, nb=None):
    """Blocked backward substitution L^T X = B given the LOWER factor L:
    block rows bottom-up, x_k = L_kk^-T (b_k - L_>k,k^T x_>k)."""
    nw = len(l)
    Lb, n, _ = l[0].shape
    m = b[0].shape[2]
    dt = wdtype(l)
    x = dd_zeros((Lb, n, m), nw, dtype=dt)
    for (k0, k1) in reversed(_blk_ranges(n, nb)):
        rhs = _sub_b(b, k0, k1, 0, m)
        if k1 < n:
            Lcol = _sub_b(l, k1, n, k0, k1)     # [L, n-k1, nb]
            rhs = dd_sub(rhs, _bmm_b(dd_transpose_b(Lcol),
                                     _sub_b(x, k1, n, 0, m)))
        xk = b_solve_tril_t(_sub_b(l, k0, k1, k0, k1), rhs)
        x = tuple(c.at[:, k0:k1, :].set(xc) for c, xc in zip(x, xk))
    return x


# test override: force (True) / disable (False) the Pallas factorization
# kernels — forcing on CPU runs them under the Pallas interpreter (e.g. to
# test that GSPMD sharding composes with the Pallas custom calls off-chip)
_USE_PALLAS_LINALG = None


def _pallas_route(x):
    """True when the batched Pallas kernels apply: f32 expansion words on
    the real TPU, [L, n, n] operands with n >= 2 (1x1 blocks and CPU runs
    keep the plain vmapped loop; off-TPU the kernels would run under the
    slow Pallas interpreter)."""
    shape_ok = (wdtype(x) == jnp.float32
                and x[0].ndim == 3 and x[0].shape[-1] >= 2)
    if _USE_PALLAS_LINALG is not None:
        return _USE_PALLAS_LINALG and shape_ok
    return shape_ok and on_tpu()


def b_cholesky(a):
    """Batched Cholesky of [L, n, n] words -> (L_factor, ok[L])."""
    if a[0].ndim == 3 and _use_blocked(a[0].shape[-1]):
        return _b_cholesky_blocked(a)
    if _pallas_route(a):
        from . import pallas_linalg as P

        return P.pl_cholesky_b(a)
    return jax.vmap(dd_cholesky)(a)


def b_solve_tril(l, b):
    """Batched forward substitution L X = B ([L, n, n] @ [L, n, m])."""
    if b[0].shape[-1] == 0:
        return b
    if l[0].ndim == 3 and _use_blocked(l[0].shape[-1]):
        return _b_solve_tril_blocked(l, b)
    if _pallas_route(l):
        from . import pallas_linalg as P

        return P.pl_solve_tril_b(l, b)
    return jax.vmap(dd_solve_tril)(l, b)


def b_solve_tril_t(l, b):
    """Batched backward substitution L^T X = B given the LOWER factor L
    (the Pallas kernel never forms the transpose)."""
    if b[0].shape[-1] == 0:
        return b
    if l[0].ndim == 3 and _use_blocked(l[0].shape[-1]):
        return _b_solve_tril_t_blocked(l, b)
    if _pallas_route(l):
        from . import pallas_linalg as P

        return P.pl_solve_tril_t_b(l, b)
    return jax.vmap(dd_solve_triu)(dd_transpose(l), b)


def b_solve_cholesky(l, b):
    """Batched (L L^T) X = B."""
    return b_solve_tril_t(l, b_solve_tril(l, b))


def _b1(x):
    return tuple(c[None] for c in x)


def _ub1(x):
    return tuple(c[0] for c in x)


def s_cholesky(a):
    """Unbatched Cholesky routed through the batched/Pallas path."""
    L, ok = b_cholesky(_b1(a))
    return _ub1(L), ok[0]


def s_solve_tril(l, b):
    return _ub1(b_solve_tril(_b1(l), _b1(b)))


def s_solve_tril_t(l, b):
    return _ub1(b_solve_tril_t(_b1(l), _b1(b)))


def s_solve_cholesky(l, b):
    return _ub1(b_solve_cholesky(_b1(l), _b1(b)))
