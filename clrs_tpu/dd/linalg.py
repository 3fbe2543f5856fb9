"""Double-word linear algebra on JAX (device path).

TPU-native equivalents of the reference's Arb kernels
(`ClusteredLowRankSolver.jl/src/tools.jl`: approx_cholesky!, matmul_threaded!,
Arblib.approx_solve_tril!/triu!, approx_mul!):

- :func:`dd_matmul`   — Dot2-compensated GEMM (Ogita-Rump-Oishi) + cross terms
- :func:`dd_cholesky` — right-looking Cholesky with masked rank-1 updates;
                        returns a success flag instead of throwing (the host
                        loop maps it onto the reference's SolverFailure path)
- :func:`dd_solve_tril`/:func:`dd_solve_triu` — row/back substitution
- pairwise compensated reductions (:func:`dd_sum`, :func:`dd_dot`)

All values are (hi, lo) pairs of float64 arrays; all elementwise primitives
from :mod:`.core` broadcast, so these routines work on batched operands via
``jax.vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .core import (
    dd_add,
    dd_div,
    dd_mul,
    dd_neg,
    dd_sqrt,
    dd_sub,
    dd_where,
    quick_two_sum,
    two_prod,
    two_sum,
)

__all__ = [
    "dd_array",
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
]


def dd_array(a):
    a = jnp.asarray(a, dtype=jnp.float64)
    return (a, jnp.zeros_like(a))


def dd_zeros(shape):
    z = jnp.zeros(shape, dtype=jnp.float64)
    return (z, z)


def dd_eye(n):
    e = jnp.eye(n, dtype=jnp.float64)
    return (e, jnp.zeros_like(e))


def dd_transpose(x):
    return (x[0].T, x[1].T)


def dd_sum(x, axis):
    """Pairwise (tree) compensated sum along ``axis``. Static shapes only."""
    hi = jnp.moveaxis(x[0], axis, 0)
    lo = jnp.moveaxis(x[1], axis, 0)
    n = hi.shape[0]
    while n > 1:
        half = (n + 1) // 2
        a = (hi[:n // 2], lo[:n // 2])
        b = (hi[half:half + n // 2], lo[half:half + n // 2])
        shi, slo = dd_add(a, b)
        if n % 2 == 1:
            shi = jnp.concatenate([shi, hi[n // 2:half]], axis=0)
            slo = jnp.concatenate([slo, lo[n // 2:half]], axis=0)
        hi, lo = shi, slo
        n = half
    if hi.shape[0] == 0:
        z = jnp.zeros(hi.shape[1:], dtype=jnp.float64)
        return (z, z)
    return (hi[0], lo[0])


def dd_dot(x, y):
    """Compensated trace inner product sum(x * y) over all elements."""
    p = dd_mul(x, y)
    return dd_sum((p[0].reshape(-1), p[1].reshape(-1)), axis=0)


def dd_max_abs(x):
    """max |x| as a plain float64 (used only for error reporting/termination)."""
    v = jnp.abs(x[0] + x[1])
    return jnp.max(v) if v.size else jnp.zeros((), jnp.float64)


def dd_matmul(a, b):
    """Double-word GEMM: (M,K) @ (K,N) -> (M,N).

    hi*hi contributions use an error-free product with Dot2-style compensated
    accumulation over K; the eps-magnitude cross terms Ah@Bl + Al@Bh are safe
    in plain f64 GEMMs (their rounding is O(eps^2) relative to the result).
    """
    ah, al = a
    bh, bl = b
    m, k = ah.shape
    n = bh.shape[1]
    if k == 0 or m == 0 or n == 0:
        return dd_zeros((m, n))

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


def dd_symmetrize(x):
    s = dd_add(x, dd_transpose(x))
    return (0.5 * s[0], 0.5 * s[1])  # scaling by 0.5 is exact


def dd_cholesky(a):
    """Cholesky of a double-word symmetric matrix.

    Returns (L, ok): lower-triangular factor and a bool success flag (all
    pivots strictly positive), mirroring approx_cholesky! in
    `ClusteredLowRankSolver.jl/src/tools.jl:59-107` which zeroes Arb error
    bounds mid-iteration and reports 0/1 success.
    """
    ah, al = a
    n = ah.shape[0]
    if n == 0:
        return (ah, al), jnp.bool_(True)
    idx = jnp.arange(n)

    def body(j, carry):
        hi, lo, ok = carry
        d = (hi[j, j], lo[j, j])
        pos = d[0] > 0
        ok = ok & pos
        d_safe = dd_where(pos, d, (jnp.float64(1.0), jnp.float64(0.0)), xp=jnp)
        rt = dd_sqrt(d_safe, xp=jnp)
        col = (hi[:, j], lo[:, j])
        coll = dd_div(col, rt)
        below = idx > j
        # final column j of L: rt at (j,j), coll below, 0 above
        newh = jnp.where(below, coll[0], jnp.where(idx == j, rt[0], 0.0))
        newl = jnp.where(below, coll[1], jnp.where(idx == j, rt[1], 0.0))
        # rank-1 update of the trailing submatrix
        collb = (jnp.where(below, coll[0], 0.0), jnp.where(below, coll[1], 0.0))
        upd = dd_mul((collb[0][:, None], collb[1][:, None]),
                     (collb[0][None, :], collb[1][None, :]))
        mask = below[:, None] & below[None, :]
        uh, ul = dd_sub((hi, lo), upd)
        hi = jnp.where(mask, uh, hi)
        lo = jnp.where(mask, ul, lo)
        hi = hi.at[:, j].set(newh)
        lo = lo.at[:, j].set(newl)
        return (hi, lo, ok)

    hi, lo, ok = lax.fori_loop(0, n, body, (ah, al, jnp.bool_(True)))
    tril = jnp.tril(jnp.ones((n, n), dtype=bool))
    return (jnp.where(tril, hi, 0.0), jnp.where(tril, lo, 0.0)), ok


def dd_solve_tril(l, b):
    """Solve L X = B with L lower triangular (unit rhs columns allowed)."""
    lh, ll = l
    bh, bl = b
    n = lh.shape[0]
    if n == 0:
        return b
    idx = jnp.arange(n)

    def body(i, x):
        xh, xl = x
        row = (lh[i, :], ll[i, :])
        mask = (idx < i).astype(jnp.float64)
        contrib = dd_mul((row[0][:, None] * mask[:, None], row[1][:, None] * mask[:, None]),
                         (xh, xl))
        s = dd_sum(contrib, axis=0)
        rhs = dd_sub((bh[i, :], bl[i, :]), s)
        xi = dd_div(rhs, (lh[i, i], ll[i, i]))
        return (xh.at[i, :].set(xi[0]), xl.at[i, :].set(xi[1]))

    z = jnp.zeros_like(bh)
    xh, xl = lax.fori_loop(0, n, body, (z, z))
    return (xh, xl)


def dd_solve_triu(u, b):
    """Solve U X = B with U upper triangular."""
    uh, ul = u
    bh, bl = b
    n = uh.shape[0]
    if n == 0:
        return b
    idx = jnp.arange(n)

    def body(t, x):
        i = n - 1 - t
        xh, xl = x
        row = (uh[i, :], ul[i, :])
        mask = (idx > i).astype(jnp.float64)
        contrib = dd_mul((row[0][:, None] * mask[:, None], row[1][:, None] * mask[:, None]),
                         (xh, xl))
        s = dd_sum(contrib, axis=0)
        rhs = dd_sub((bh[i, :], bl[i, :]), s)
        xi = dd_div(rhs, (uh[i, i], ul[i, i]))
        return (xh.at[i, :].set(xi[0]), xl.at[i, :].set(xi[1]))

    z = jnp.zeros_like(bh)
    xh, xl = lax.fori_loop(0, n, body, (z, z))
    return (xh, xl)


def dd_solve_cholesky(l, b):
    """Solve (L L^T) X = B given the Cholesky factor L."""
    y = dd_solve_tril(l, b)
    return dd_solve_triu(dd_transpose(l), y)
