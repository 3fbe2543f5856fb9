"""Distributed Schur complement + Cholesky for ONE large cluster.

The reference's scale story for a big cluster is threaded Arb GEMM /
Cholesky over the whole S^j (ClusteredLowRankSolver.jl src/solver.jl:
1244-1252, src/tools.jl:175-266). Here the same work distributes over a
jax.sharding.Mesh by ROW PANELS with `shard_map` SPMD (VERDICT r4 item 3):

- Schur assembly: each device builds its row panel S_loc [Pl, P] from the
  row slices of the (lam-weighted) term tables — the pair formulation
  G = U_left M U_right^T needs only LOCAL LEFT rows; the right operands
  (U^T, M) are replicated [n, .] panels.
- chol(S): blocked right-looking; per block column the [P, nb] column
  strip is all-gathered (the classic distributed-Cholesky communication,
  O(P^2) words total), the nb x nb diagonal factor + panel solve run
  replicated (cheap), and the O(P^3) trailing update runs LOCALLY on each
  device's rows — the MXU work divides by the mesh, and so does the S /
  chol(S) memory (each device holds [Pl, P]).
- solves L X = B / L^T X = B: left-/right-looking by block column over
  the same all-gathered strips; compute is O(P^2 m) replicated (m is the
  small KKT right-hand-side count), storage of L stays distributed.

Everything operates on nw-word expansion tuples; cross-device movement is
all_gather / psum of raw words (exact — no arithmetic in transit), and all
word arithmetic stays inside each device's shard, so results are
VALUE-IDENTICAL to the single-device formulation up to the blocked
factorization's per-GEMM roundings (same as the single-device blocked
route in dd/linalg.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..dd import linalg as dl
from ..dd.core import dd_add, dd_mul, dd_sub

def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
    """Version-compat wrapper: jax >= 0.7 renamed check_rep -> check_vma.
    The regions here return values made replicated by explicit
    all_gathers, which the vma tracker cannot always prove through
    Pallas calls — so checking stays off."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)
    except TypeError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=check_rep)

__all__ = ["dist_pairs_schur", "dist_cholesky", "dist_solve_tril",
           "dist_solve_tril_t", "row_shard_ok", "shard_map"]


def row_shard_ok(P, n_devices, nb=64):
    """The row-panel path needs P divisible by the mesh with block-aligned
    panels (each nb-row diagonal block owned by one device)."""
    if P % n_devices:
        return False
    Pl = P // n_devices
    return Pl >= 8


def _row_nb(P, n_devices, nb=64):
    return min(nb, P // n_devices)


def _ag(x, axis):
    """all_gather an nw-word tuple's leading axis (exact movement)."""
    return tuple(lax.all_gather(c, axis, axis=0, tiled=True) for c in x)


def _local_rows(x, dev, Pl):
    """Rows [dev*Pl, (dev+1)*Pl) of a replicated leading axis."""
    return tuple(lax.dynamic_slice_in_dim(c, dev * Pl, Pl, axis=0)
                 for c in x)


def dist_pairs_schur(k, Ulw_loc, Ur_loc, Xinv, Y, axis):
    """Local Schur row panel of one low-rank class (the pair formulation
    of solver/step.py::_schur_cluster, rows only).

    Ulw_loc/Ur_loc: local row slices [Lc, PTl, n] of the lam-weighted /
    plain term tables; Xinv/Y replicated [Lc, n, n]. Returns
    (S_loc [Pl, P], diagGY_loc [PTl]) — the latter feeds trace_A(Y).
    """
    Lc = Ulw_loc[0].shape[0]
    PTl = Ulw_loc[0].shape[1]
    T = k.li.shape[2]
    P = k.li.shape[1]
    Pl = PTl // T
    # GXw_loc = (lam Ul)_loc X^-1 (lam Ur)^T ; GYT_loc = Ur_loc Y Ul^T
    Urw_t = dl.dd_transpose_b(k.Urw)               # replicated [Lc, n, PT]
    Ul_t = dl.dd_transpose_b(k.Ul)
    M2 = tuple(jnp.concatenate([a, b], 0) for a, b in zip(Xinv, Y))
    L2 = tuple(jnp.concatenate([a, b], 0) for a, b in zip(Ulw_loc, Ur_loc))
    R2 = tuple(jnp.concatenate([a, b], 0) for a, b in zip(Urw_t, Ul_t))
    UM = jax.vmap(dl.dd_matmul)(L2, M2)            # [2Lc, PTl, n]
    G2 = jax.vmap(dl.dd_matmul)(UM, R2)            # [2Lc, PTl, PT]
    GXw_loc = tuple(c[:Lc] for c in G2)
    GYT_loc = tuple(c[Lc:] for c in G2)
    gx5 = tuple(c.reshape(Lc, Pl, T, P, T) for c in GXw_loc)
    gy5 = tuple(c.reshape(Lc, Pl, T, P, T) for c in GYT_loc)
    v = dd_mul(gx5, gy5)
    vt = tuple(jnp.moveaxis(c, 2, 3).reshape(Lc, Pl, P, T * T) for c in v)
    contrib = dl.dd_sum(vt, axis=3)                # [Lc, Pl, P]
    S_loc = dl.dd_sum(contrib, axis=0)             # [Pl, P]
    # diag(GY)[pt] for LOCAL pt: GYT_loc[l, pt_local, pt_global]
    dev = lax.axis_index(axis)
    col0 = dev * PTl
    idx = jnp.arange(PTl)
    dgy = tuple(c[:, idx, col0 + idx] for c in GYT_loc)   # [Lc, PTl]
    return S_loc, dgy


def dist_scalar_schur_rows(sa, w, dev, Pl, axis):
    """Scalar-pack Schur rows: S_loc += (sa^T)[rows] diag(w) sa.
    sa replicated [Bs, P]; w [Bs]."""
    sa_cols = tuple(lax.dynamic_slice_in_dim(c, dev * Pl, Pl, axis=1)
                    for c in sa)                   # [Bs, Pl]
    t = dd_mul(sa, tuple(c[:, None] for c in w))   # [Bs, P]
    return dl.dd_matmul(dl.dd_transpose(sa_cols), t)     # [Pl, P]


def dist_cholesky(S_loc, P, axis, nb):
    """Distributed blocked right-looking Cholesky of a row-sharded SPD
    matrix. S_loc: nw-word [Pl, P]. Returns (L_loc [Pl, P], ok)."""
    nw = len(S_loc)
    Pl = S_loc[0].shape[0]
    dt = S_loc[0].dtype
    dev = lax.axis_index(axis)
    grow = dev * Pl + jnp.arange(Pl)               # global row ids [Pl]
    A = S_loc
    L_loc = dl.dd_zeros((Pl, P), nw, dtype=dt)
    ok = jnp.bool_(True)
    for k0 in range(0, P, nb):
        k1 = min(k0 + nb, P)
        nbk = k1 - k0
        strip = _ag(tuple(c[:, k0:k1] for c in A), axis)   # [P, nbk]
        # mirror the upper triangle onto the lower within the diagonal
        # block (the single-device path symmetrizes all of S the same way,
        # solver/step.py::_schur_cluster; here S rows are distributed, but
        # the factorization only consumes the lower panel + the symmetric
        # diagonal blocks, so a local [nbk, nbk] mirror suffices)
        iu = jnp.triu(jnp.ones((nbk, nbk), dtype=bool))
        diag = tuple(jnp.where(iu, c[k0:k1], c[k0:k1].T) for c in strip)
        Lkk, okb = dl.s_cholesky(diag)
        ok = ok & okb
        if k1 < P:
            below = tuple(c[k1:] for c in strip)           # [P-k1, nbk]
            Pt = dl.s_solve_tril(Lkk, dl.dd_transpose(below))
            panel = dl.dd_transpose(Pt)                    # [P-k1, nbk]
            fullcol = tuple(
                jnp.concatenate([jnp.zeros((k0, nbk), dt), lk, pc], axis=0)
                for lk, pc in zip(Lkk, panel))             # [P, nbk]
        else:
            fullcol = tuple(
                jnp.concatenate([jnp.zeros((k0, nbk), dt), lk], axis=0)
                for lk in Lkk)
        loccol = _local_rows(fullcol, dev, Pl)             # [Pl, nbk]
        L_loc = tuple(c.at[:, k0:k1].set(lc)
                      for c, lc in zip(L_loc, loccol))
        if k1 < P:
            # local trailing update: rows >= k1 only
            mask = (grow >= k1).astype(dt)[:, None]
            ploc = tuple(c * mask for c in loccol)         # [Pl, nbk]
            upd = dl.dd_matmul(ploc, dl.dd_transpose(panel))  # [Pl, P-k1]
            A22 = dd_sub(tuple(c[:, k1:] for c in A), upd)
            A = tuple(c.at[:, k1:].set(uc) for c, uc in zip(A, A22))
    return L_loc, ok


def dist_solve_tril(L_loc, B, P, axis, nb):
    """L X = B with L row-sharded [Pl, P] and B replicated [P, m];
    returns X replicated (right-looking over all-gathered column strips)."""
    nw = len(L_loc)
    m = B[0].shape[1]
    dt = L_loc[0].dtype
    X = dl.dd_zeros((P, m), nw, dtype=dt)
    for k0 in range(0, P, nb):
        k1 = min(k0 + nb, P)
        strip = _ag(tuple(c[:, k0:k1] for c in L_loc), axis)   # [P, nbk]
        diag = tuple(c[k0:k1] for c in strip)
        xk = dl.s_solve_tril(diag, tuple(c[k0:k1] for c in B))
        X = tuple(c.at[k0:k1].set(xc) for c, xc in zip(X, xk))
        if k1 < P:
            below = tuple(c[k1:] for c in strip)
            upd = dl.dd_matmul(below, xk)                  # [P-k1, m]
            Bt = dd_sub(tuple(c[k1:] for c in B), upd)
            B = tuple(c.at[k1:].set(bc) for c, bc in zip(B, Bt))
    return X


def dist_solve_tril_t(L_loc, B, P, axis, nb):
    """L^T X = B with L row-sharded and B replicated [P, m]; returns X
    replicated (left-looking, descending block columns)."""
    nw = len(L_loc)
    m = B[0].shape[1]
    dt = L_loc[0].dtype
    X = dl.dd_zeros((P, m), nw, dtype=dt)
    blocks = [(k0, min(k0 + nb, P)) for k0 in range(0, P, nb)]
    for k0, k1 in reversed(blocks):
        strip = _ag(tuple(c[:, k0:k1] for c in L_loc), axis)   # [P, nbk]
        diag = tuple(c[k0:k1] for c in strip)
        rhs = tuple(c[k0:k1] for c in B)
        if k1 < P:
            below = tuple(c[k1:] for c in strip)               # [P-k1,nbk]
            upd = dl.dd_matmul(dl.dd_transpose(below),
                               tuple(c[k1:] for c in X))       # [nbk, m]
            rhs = dd_sub(rhs, upd)
        xk = dl.s_solve_tril_t(diag, rhs)
        X = tuple(c.at[k0:k1].set(xc) for c, xc in zip(X, xk))
    return X
