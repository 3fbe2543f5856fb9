"""Per-phase timing breakdown (the reference's `testing=true` table,
ClusteredLowRankSolver.jl src/solver.jl:664-718).

The production iteration is ONE fused jit (XLA should overlap and fuse
phases), so phase costs cannot be read off the main loop. This module
builds separately jitted phase functions from the same operators and times
them on a representative state — the tool for chasing hot spots
(schur / cholS / LinvB / Q / solve / dX / dY in the reference's breakdown).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from ..dd import linalg as dl
from ..dd.core import dd_div, dd_mul, dd_sub
from . import step as _st

__all__ = ["phase_breakdown", "print_breakdown"]


def _block(x):
    jax.block_until_ready(jax.tree_util.tree_leaves(x)[0])


def _time_it(fn, *args, reps=3):
    out = fn(*args)          # compile
    _block(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _block(out)
    return (time.time() - t0) / reps


def phase_breakdown(ds, state, reps: int = 3) -> Dict[str, float]:
    """Time each IPM phase separately (seconds per call)."""
    nw, dt = ds.nw, ds.dtype

    @jax.jit
    def chol_x(state):
        out = []
        for j, cl in enumerate(ds.clusters):
            for ki, k in enumerate(cl.classes):
                Lc, okb = _st._bchol(state["X"][j][ki])
                eye = dl.dd_eye(k.n, nw, dtype=dt)
                eye_b = tuple(jnp.broadcast_to(c, (k.L, k.n, k.n)) for c in eye)
                out.append(dl.dd_symmetrize(_st._bsolve_cholesky(Lc, eye_b)))
        return out

    Xinv_all = chol_x(state)

    def split_xinv():
        it = iter(Xinv_all)
        return [[next(it) for _ in cl.classes] for cl in ds.clusters]

    Xinv = split_xinv()
    Xinv_s = []
    for j, cl in enumerate(ds.clusters):
        if cl.s_nb:
            Xinv_s.append(dd_div(_st._scalar(jnp.ones((cl.J, cl.s_nb)),
                                             nw, dt),
                                 state["Xs"][j]))
        else:
            Xinv_s.append(dl.dd_zeros((cl.J, 0), nw, dtype=dt))

    @jax.jit
    def schur(Xinv, state):
        return [_st._schur_cluster(cl, Xinv[j], state["Y"][j], Xinv_s[j],
                                   state["Ys"][j])
                for j, cl in enumerate(ds.clusters)]

    Ss = schur(Xinv, state)

    @jax.jit
    def kkt(Ss):
        cholSs, LinvBs = [], []
        for j, cl in enumerate(ds.clusters):
            L, _ = dl.b_cholesky(Ss[j])
            cholSs.append(L)
            LinvBs.append(dl.b_solve_tril(L, cl.B))
        Q = dl.dd_zeros((ds.nfree, ds.nfree), nw, dtype=dt)
        from ..dd.core import dd_add

        for LinvB in LinvBs:
            Bf = tuple(c.reshape(c.shape[0] * c.shape[1], c.shape[2])
                       for c in LinvB)
            Q = dd_add(Q, dl.dd_matmul(dl.dd_transpose(Bf), Bf))
        cholQ, _ = dl.s_cholesky(Q)
        return cholSs, LinvBs, cholQ

    cholSs, LinvBs, cholQ = kkt(Ss)

    @jax.jit
    def residuals(state):
        return _st._residuals(ds, state)

    Pres, Pres_s, pres, dres = residuals(state)

    @jax.jit
    def resid_R(state):
        mu = dd_div(_st._dot_state(ds, state, state),
                    _st._scalar(float(ds.total_size), nw, dt))
        Rs = []
        for j, cl in enumerate(ds.clusters):
            for ki, k in enumerate(cl.classes):
                XY = _st._bmm(state["X"][j][ki], state["Y"][j][ki])
                eye = dl.dd_eye(k.n, nw, dtype=dt)
                eye_b = tuple(jnp.broadcast_to(c, (k.L, k.n, k.n)) for c in eye)
                Rs.append(_st._dd_scale(dd_sub(dd_mul(mu, eye_b), XY), k.maskd))
        return Rs

    @jax.jit
    def trace_A(Xinv):
        return [_st._trace_A_cluster(cl, Xinv[j], Xinv_s[j])
                for j, cl in enumerate(ds.clusters)]

    @jax.jit
    def weighted_A(state):
        return [_st._weighted_A_cluster(cl, state["x"][j])[0]
                for j, cl in enumerate(ds.clusters)]

    @jax.jit
    def steplen(state):
        dX = [[_st._dd_scale(state["X"][j][ki], 0.01)
               for ki in range(len(cl.classes))]
              for j, cl in enumerate(ds.clusters)]
        dXs = [_st._dd_scale(state["Xs"][j], 0.01)
               for j, cl in enumerate(ds.clusters)]
        dY = [[_st._dd_scale(state["Y"][j][ki], 0.01)
               for ki in range(len(cl.classes))]
              for j, cl in enumerate(ds.clusters)]
        dYs = [_st._dd_scale(state["Ys"][j], 0.01)
               for j, cl in enumerate(ds.clusters)]
        cholX = [[_st._bchol(state["X"][j][ki])[0]
                  for ki in range(len(cl.classes))]
                 for j, cl in enumerate(ds.clusters)]
        cholY = [[_st._bchol(state["Y"][j][ki])[0]
                  for ki in range(len(cl.classes))]
                 for j, cl in enumerate(ds.clusters)]
        return _st._step_lengths(ds, state, dX, dXs, dY, dYs, cholX, cholY,
                                 0.9, 1e-12)

    return {
        "chol_X + X^-1": _time_it(chol_x, state, reps=reps),
        "R residual": _time_it(resid_R, state, reps=reps),
        "schur S": _time_it(schur, Xinv, state, reps=reps),
        "chol S + LinvB + Q + chol Q": _time_it(kkt, Ss, reps=reps),
        "residuals P,p,d": _time_it(residuals, state, reps=reps),
        "trace_A": _time_it(trace_A, Xinv, reps=reps),
        "weighted_A (dX assembly)": _time_it(weighted_A, state, reps=reps),
        "step length": _time_it(steplen, state, reps=reps),
    }


def print_breakdown(ds, state, reps: int = 3):
    """Print the per-phase table (solver.jl:685-705 analogue)."""
    bd = phase_breakdown(ds, state, reps=reps)
    total = sum(bd.values())
    print(f"{'phase':<30} {'ms/call':>10} {'share':>7}")
    for k, v in sorted(bd.items(), key=lambda kv: -kv[1]):
        print(f"{k:<30} {1e3 * v:>10.2f} {100 * v / total:>6.1f}%")
    print(f"{'sum of phases':<30} {1e3 * total:>10.2f}")
    return bd
