"""The jitted IPM iteration (device side).

One call = one full Mehrotra predictor-corrector iteration, mirroring the
main loop of `ClusteredLowRankSolver.jl/src/solver.jl:348-593`:

  mu -> R_p -> chol(X) -> X^-1 -> bilinear panels V^T X^-1 V, V^T Y V ->
  Schur S^j (solver.jl:1062-1226) -> chol(S^j) -> L^-1 B -> Q -> chol(Q)
  (solver.jl:1229-1287) -> residuals P,p,d (solver.jl:882-918) ->
  predictor direction (solver.jl:1474-1616) -> corrector mu_c ->
  corrector direction -> step lengths (solver.jl:1618-1693) -> update.

TPU-first design notes:
- 1x1 dense blocks are batched into a per-cluster "scalar pack" so all of
  their per-block work becomes one vector subgraph (LP-cone specialization;
  the reference loops over them as ordinary Arb matrices).
- Low-rank constraint structure drives batched gather/einsum Schur assembly
  via the static term tables produced by the compiler.
- Everything is double-word float64; scalars for termination control are
  returned to the host. Failures (non-PSD Cholesky) surface as boolean
  flags; the host maps them onto the reference's SolverFailure semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from ..compile.sdp import ClusteredLowRankSDP
from ..dd import linalg as dl
from ..dd.core import dd_add, dd_div, dd_mul, dd_mul_f64, dd_neg, dd_sub, to_float

__all__ = ["DeviceSDP", "make_step", "make_assess", "initial_state"]


def _w(a, nw, dtype=jnp.float64):
    """Host multi-word tuple -> device, zero-padded to nw words of ``dtype``.

    The compiler emits correctly rounded double-word f64 data. For an f64
    target, padding with zero words embeds it exactly into a wider
    expansion. For the f32-expansion substrate (the TPU-sound path), each
    double-word value is re-decomposed on the host (IEEE f64) into nw
    non-overlapping f32 words — exact as long as nw >= 5."""
    if dtype == jnp.float32:
        from ..dd.core import dd_add_f64 as _host_dd_add

        h = np.asarray(a[0], dtype=np.float64)
        l = np.asarray(a[1], dtype=np.float64) if len(a) > 1 else np.zeros_like(h)
        words = []
        for _ in range(nw):
            w = (h + l).astype(np.float32)
            words.append(jnp.asarray(w))
            h, l = _host_dd_add((h, l), -w.astype(np.float64))
        return tuple(words)
    ws = tuple(jnp.asarray(c, dtype=jnp.float64) for c in a[:nw])
    return ws + tuple(jnp.zeros_like(ws[0]) for _ in range(nw - len(ws)))


def _scalar(v, nw, dtype=jnp.float64):
    """Broadcastable nw-word scalar from a traced/static float value."""
    v = jnp.asarray(v).astype(dtype)
    return (v,) + (jnp.zeros_like(v),) * (nw - 1)


def dd_take(m, *idx):
    return tuple(c[idx] for c in m)


def _dd_scale(x, a):
    """multiply a multi-word array by an exact {0,1}/power-of-two f64 array."""
    return tuple(c * a for c in x)


@dataclasses.dataclass
class _DevBlock:
    kind: str
    n: int
    C: Any
    V: Any = None
    lam: Any = None
    li: Any = None
    ri: Any = None
    tmask: Any = None
    onehotL: Any = None     # f64 [P*T, m]
    onehotR: Any = None     # f64 [P*T, m]
    A: Any = None           # dd [P, n, n]


@dataclasses.dataclass
class _DevCluster:
    nrows: int
    c: Any
    B: Any
    blocks: List[_DevBlock]
    sa: Any = None          # dd [Bs, P] scalar-pack coefficients
    sC: Any = None          # dd [Bs]
    smask: Any = None       # f64 [Bs]: 1 real, 0 padding
    s_nb: int = 0
    nw: int = 2             # word count of the device expansion arithmetic
    dtype: Any = None       # working dtype of the expansion words


def _col(v):
    """nw-word vector -> column matrix."""
    return tuple(c[:, None] for c in v)


def _col0(m):
    """nw-word single-column matrix -> vector."""
    return tuple(c[:, 0] for c in m)


class DeviceSDP:
    """Device-resident constants built from a compiled SDP.

    ``nw``/``dtype`` select the on-device expansion arithmetic:
    f64 x 2 words (~106 bits, the fast default on IEEE backends), f64 x 4
    (~212 bits — the reference's prec=256 regime, ClusteredLowRankSolver.jl
    src/solver.jl:100-128), or f32 x nw (~24*nw bits) — the TPU-sound
    substrate, since this chip's f64 is an unsound emulation while its f32
    is exactly IEEE (NOTES_TPU_NUMERICS.md)."""

    def __init__(self, sdp: ClusteredLowRankSDP, nw: int = 2, dtype=None):
        self.nw = nw
        self.dtype = dtype = dtype or jnp.float64
        _dd = lambda a: _w(a, nw, dtype)  # noqa: E731
        self.maximize = sdp.maximize
        self.sign = 1.0 if sdp.maximize else -1.0
        self.constant = _w((np.float64(sdp.constant.hi),
                            np.float64(sdp.constant.lo)), nw, dtype)
        self.b = _dd(sdp.b)
        self.nfree = sdp.nfree
        self.clusters = []
        for cl in sdp.clusters:
            blocks = []
            for bd in cl.blocks:
                if bd.kind == "lowrank":
                    P, T = bd.li.shape
                    m = bd.V[0].shape[1]
                    onehotL = np.zeros((P * T, m))
                    onehotR = np.zeros((P * T, m))
                    onehotL[np.arange(P * T), bd.li.reshape(-1)] = bd.tmask.reshape(-1)
                    onehotR[np.arange(P * T), bd.ri.reshape(-1)] = bd.tmask.reshape(-1)
                    blocks.append(_DevBlock(
                        kind="lowrank", n=bd.n, C=_dd(bd.C), V=_dd(bd.V),
                        lam=_dd(bd.lam), li=jnp.asarray(bd.li),
                        ri=jnp.asarray(bd.ri),
                        tmask=jnp.asarray(bd.tmask).astype(dtype),
                        onehotL=jnp.asarray(onehotL).astype(dtype),
                        onehotR=jnp.asarray(onehotR).astype(dtype)))
                else:
                    blocks.append(_DevBlock(kind="dense", n=bd.n, C=_dd(bd.C),
                                            A=_dd(bd.A)))
            dc = _DevCluster(nrows=cl.nrows, c=_dd(cl.c), B=_dd(cl.B),
                             blocks=blocks, nw=nw, dtype=dtype)
            if cl.scalars is not None:
                dc.sa = _dd(cl.scalars.a)
                dc.sC = _dd(cl.scalars.C)
                dc.smask = jnp.asarray(cl.scalars.mask).astype(dtype)
                dc.s_nb = cl.scalars.nblocks
                dc.s_nreal = cl.scalars.nreal
            self.clusters.append(dc)
        self.total_size = sum(b.n for cl in self.clusters for b in cl.blocks) \
            + sum(getattr(cl, 's_nreal', 0) or 0 for cl in self.clusters)
        self.total_rows = sum(cl.nrows for cl in self.clusters)


def initial_state(ds: DeviceSDP, omega_p: float, omega_d: float):
    """x=0, X=omega_p*I, y=0, Y=omega_d*I (solver.jl:186-201)."""
    nw, dt = ds.nw, ds.dtype
    x = [dl.dd_zeros((cl.nrows,), nw, dtype=dt) for cl in ds.clusters]
    y = dl.dd_zeros((ds.nfree,), nw, dtype=dt)
    X = [[_dd_scale(dl.dd_eye(b.n, nw, dtype=dt), omega_p) for b in cl.blocks]
         for cl in ds.clusters]
    Y = [[_dd_scale(dl.dd_eye(b.n, nw, dtype=dt), omega_d) for b in cl.blocks]
         for cl in ds.clusters]
    Xs = [_scalar(omega_p * jnp.ones(cl.s_nb), nw, dt) for cl in ds.clusters]
    Ys = [_scalar(omega_d * jnp.ones(cl.s_nb), nw, dt) for cl in ds.clusters]
    return {"x": x, "y": y, "X": X, "Y": Y, "Xs": Xs, "Ys": Ys}


# ---------------------------------------------------------------------------
# core operators
# ---------------------------------------------------------------------------

def _panel(b: _DevBlock, M):
    """V^T M V for a low-rank block (the bilinear pairing panel)."""
    MV = dl.dd_matmul(M, b.V)
    return dl.dd_matmul(dl.dd_transpose(b.V), MV)


def _trace_A_cluster(cl: _DevCluster, Zs, Zsc):
    """[<A_p, Z>]_p for all rows of one cluster (solver.jl:1289-1366)."""
    tot = dl.dd_zeros((cl.nrows,), cl.nw, dtype=cl.dtype)
    for b, Z in zip(cl.blocks, Zs):
        if b.kind == "lowrank":
            PZ = _panel(b, Z)
            g = dd_take(PZ, b.li, b.ri)          # dd [P, T]
            v = dd_mul(b.lam, g)
            v = _dd_scale(v, b.tmask)
            tot = dd_add(tot, dl.dd_sum(v, axis=1))
        else:
            prod = dd_mul(b.A, tuple(c[None] for c in Z))
            flat = tuple(c.reshape(cl.nrows, -1) for c in prod)
            tot = dd_add(tot, dl.dd_sum(flat, axis=1))
    if cl.s_nb:
        r = dl.dd_matmul(tuple(c[None, :] for c in Zsc), cl.sa)
        tot = dd_add(tot, tuple(c[0] for c in r))
    return tot


def _weighted_A_cluster(cl: _DevCluster, a):
    """sum_p a_p A_p per block + scalar pack (solver.jl:1409-1470)."""
    out = []
    for b in cl.blocks:
        if b.kind == "lowrank":
            P, T = b.li.shape
            w = dd_mul(b.lam, _col(a))
            w = _dd_scale(w, b.tmask)
            wf = tuple(c.reshape(P * T, 1) for c in w)
            wL = _dd_scale(wf, b.onehotL)
            D = dl.dd_matmul(dl.dd_array(b.onehotR.T, cl.nw, dtype=cl.dtype), wL)
            VD = dl.dd_matmul(b.V, D)
            out.append(dl.dd_matmul(VD, dl.dd_transpose(b.V)))
        else:
            prod = dd_mul(b.A, tuple(c[:, None, None] for c in a))
            out.append(dl.dd_sum(prod, axis=0))
    if cl.s_nb:
        r = dl.dd_matmul(cl.sa, _col(a))
        out_s = _col0(r)
    else:
        out_s = dl.dd_zeros((0,), cl.nw, dtype=cl.dtype)
    return out, out_s


def _schur_cluster(cl: _DevCluster, Xinvs, Ys, Xinv_s, Y_s):
    """S^j (upper triangle mirrored), solver.jl:1062-1226."""
    P = cl.nrows
    S = dl.dd_zeros((P, P), cl.nw, dtype=cl.dtype)
    for b, Xinv, Y in zip(cl.blocks, Xinvs, Ys):
        if b.kind == "lowrank":
            PX = _panel(b, Xinv)
            PY = _panel(b, Y)
            # S_pq += sum_{t1,t2} lam[p,t1] lam[q,t2] PX[li[p,t1], ri[q,t2]]
            #                                        * PY[li[q,t2], ri[p,t1]]
            gx = dd_take(PX, b.li[:, :, None, None], b.ri[None, None, :, :])
            gy = dd_take(PY, b.li[None, None, :, :], b.ri[:, :, None, None])
            lam1 = tuple(c[:, :, None, None] for c in b.lam)
            lam2 = tuple(c[None, None, :, :] for c in b.lam)
            v = dd_mul(dd_mul(lam1, lam2), dd_mul(gx, gy))
            mask = b.tmask[:, :, None, None] * b.tmask[None, None, :, :]
            v = _dd_scale(v, mask)
            contrib = dl.dd_sum(dl.dd_sum(v, axis=3), axis=1)
            S = dd_add(S, contrib)
        else:
            XA = jax.vmap(lambda Ai: dl.dd_matmul(Xinv, Ai))(b.A)
            XAY = jax.vmap(lambda Mi: dl.dd_matmul(Mi, Y))(XA)
            prod = dd_mul(tuple(c[:, None] for c in b.A),
                          tuple(c[None] for c in XAY))
            flat = tuple(c.reshape(P, P, -1) for c in prod)
            S = dd_add(S, dl.dd_sum(flat, axis=2))
    if cl.s_nb:
        w = dd_mul(Xinv_s, Y_s)                      # [Bs]
        t = dd_mul(cl.sa, _col(w))
        S = dd_add(S, dl.dd_matmul(dl.dd_transpose(cl.sa), t))
    # keep the upper triangle, mirror it (reference: symmetric!(S), q>=p only)
    iu = jnp.triu(jnp.ones((P, P), dtype=bool))
    return tuple(jnp.where(iu, c, c.T) for c in S)


def _dot_state(ds, A, B, keyX="X", keyXs="Xs", keyY="Y", keyYs="Ys"):
    tot = _scalar(0.0, ds.nw, ds.dtype)
    for j in range(len(ds.clusters)):
        for Xb, Yb in zip(A[keyX][j], B[keyY][j]):
            tot = dd_add(tot, dl.dd_dot(Xb, Yb))
        if ds.clusters[j].s_nb:
            tot = dd_add(tot, dl.dd_dot(
                _dd_scale(A[keyXs][j], ds.clusters[j].smask), B[keyYs][j]))
    return tot


def _max_abs_all(Ms, Ms_s):
    v = jnp.float64(0.0)
    for Mc in Ms:
        for Mb in Mc:
            v = jnp.maximum(v, dl.dd_max_abs(Mb))
    for Mb in Ms_s:
        if Mb[0].shape[0]:
            v = jnp.maximum(v, dl.dd_max_abs(Mb))
    return v


def _residuals(ds: DeviceSDP, state):
    """P = sum_i x_i A_i - X - sign*C;  d = c - <A_*,Y> - By;
    p = sign*b - B^T x  (solver.jl:882-918)."""
    x, y = state["x"], state["y"]
    Pres, Pres_s, dres = [], [], []
    for j, cl in enumerate(ds.clusters):
        wA, wA_s = _weighted_A_cluster(cl, x[j])
        Pc = [dd_sub(dd_sub(wA[l], state["X"][j][l]),
                     _dd_scale(b.C, ds.sign))
              for l, b in enumerate(cl.blocks)]
        Pres.append(Pc)
        if cl.s_nb:
            Ps = dd_sub(dd_sub(wA_s, state["Xs"][j]), _dd_scale(cl.sC, ds.sign))
            Pres_s.append(_dd_scale(Ps, cl.smask))
        else:
            Pres_s.append(dl.dd_zeros((0,), ds.nw, dtype=ds.dtype))
        By = dl.dd_matmul(cl.B, _col(y))
        d_j = dd_sub(dd_sub(cl.c, _col0(By)),
                     _trace_A_cluster(cl, state["Y"][j], state["Ys"][j]))
        dres.append(d_j)
    pres = _dd_scale(ds.b, ds.sign)
    for j, cl in enumerate(ds.clusters):
        Btx = dl.dd_matmul(dl.dd_transpose(cl.B), _col(x[j]))
        pres = dd_sub(pres, _col0(Btx))
    return Pres, Pres_s, pres, dres


def _objectives(ds: DeviceSDP, state):
    x, y = state["x"], state["y"]
    dot_cx = _scalar(0.0, ds.nw, ds.dtype)
    for j, cl in enumerate(ds.clusters):
        dot_cx = dd_add(dot_cx, dl.dd_dot(cl.c, x[j]))
    d_obj = dd_add(_dd_scale(dot_cx, ds.sign), ds.constant)
    CY = _scalar(0.0, ds.nw, ds.dtype)
    for j, cl in enumerate(ds.clusters):
        for l, b in enumerate(cl.blocks):
            CY = dd_add(CY, dl.dd_dot(b.C, state["Y"][j][l]))
        if cl.s_nb:
            CY = dd_add(CY, dl.dd_dot(cl.sC, state["Ys"][j]))
    by = dl.dd_dot(ds.b, y)
    p_obj = dd_add(dd_add(CY, by), ds.constant)
    diff = dd_sub(d_obj, p_obj)
    gap_num = jnp.abs(to_float(diff))
    denom = jnp.maximum(1.0, jnp.abs(to_float(d_obj) + to_float(p_obj)))
    gap = gap_num / denom
    return d_obj, p_obj, gap


def _errors(Pres, Pres_s, pres, dres):
    dual_error = jnp.maximum(_max_abs_all(Pres, Pres_s), dl.dd_max_abs(pres))
    primal_error = jnp.float64(0.0)
    for d_j in dres:
        primal_error = jnp.maximum(primal_error, dl.dd_max_abs(d_j))
    return dual_error, primal_error


def _step_length(ds, state, keyM, keyMs, dM, dMs, gamma, eig_safety):
    """max alpha keeping M + alpha dM PSD, via min eig of L^-1 dM L^-T
    (solver.jl:1618-1693). Returns (alpha_f64, chol_ok)."""
    min_eig = jnp.float64(jnp.inf)
    ok = jnp.bool_(True)
    for j, cl in enumerate(ds.clusters):
        for l, b in enumerate(cl.blocks):
            M, dMb = state[keyM][j][l], dM[j][l]
            if b.n == 1:
                e = to_float(dd_take(dMb, 0, 0)) / to_float(dd_take(M, 0, 0))
                min_eig = jnp.minimum(min_eig, e)
                continue
            L, okb = dl.dd_cholesky(M)
            ok = ok & okb
            W = dl.dd_solve_tril(L, dMb)
            W2 = dl.dd_solve_tril(L, dl.dd_transpose(W))
            A64 = W2[0].astype(jnp.float64)
            for c in W2[1:]:
                A64 = A64 + c.astype(jnp.float64)
            A64 = 0.5 * (A64 + A64.T)
            # float64 eigh like the reference's Float64 Lanczos
            # (solver.jl:1659); f32 on TPU, where f64 lapack is unavailable.
            if jax.default_backend() == "tpu":
                eigs = jnp.linalg.eigvalsh(A64.astype(jnp.float32)).astype(jnp.float64)
                safety = 1e-5
            else:
                eigs = jnp.linalg.eigvalsh(A64)
                safety = eig_safety
            min_eig = jnp.minimum(min_eig, eigs[0] - safety * (1.0 + jnp.abs(eigs[0])))
        if cl.s_nb:
            e = to_float(dMs[j]) / to_float(state[keyMs][j])
            min_eig = jnp.minimum(min_eig, jnp.min(e))
    alpha = jnp.where(min_eig > -gamma, jnp.float64(1.0), -gamma / min_eig)
    return alpha, ok


def _axpy_state(state, dx, dy, dX, dY, dXs, dYs, alpha_d, alpha_p):
    dt = state["y"][0].dtype
    alpha_d = alpha_d.astype(dt)
    alpha_p = alpha_p.astype(dt)
    x = [dd_add(xj, dd_mul_f64(dxj, alpha_d)) for xj, dxj in zip(state["x"], dx)]
    y = dd_add(state["y"], dd_mul_f64(dy, alpha_p))
    X = [[dd_add(Xb, dd_mul_f64(dXb, alpha_d)) for Xb, dXb in zip(Xc, dXc)]
         for Xc, dXc in zip(state["X"], dX)]
    Y = [[dd_add(Yb, dd_mul_f64(dYb, alpha_p)) for Yb, dYb in zip(Yc, dYc)]
         for Yc, dYc in zip(state["Y"], dY)]
    Xs = [dd_add(a, dd_mul_f64(b, alpha_d)) for a, b in zip(state["Xs"], dXs)]
    Ys = [dd_add(a, dd_mul_f64(b, alpha_p)) for a, b in zip(state["Ys"], dYs)]
    return {"x": x, "y": y, "X": X, "Y": Y, "Xs": Xs, "Ys": Ys}


# ---------------------------------------------------------------------------
# assess + step factories
# ---------------------------------------------------------------------------

def make_assess(ds: DeviceSDP):
    def assess(state):
        Pres, Pres_s, pres, dres = _residuals(ds, state)
        dual_error, primal_error = _errors(Pres, Pres_s, pres, dres)
        d_obj, p_obj, gap = _objectives(ds, state)
        mu_dd = dd_div(_dot_state(ds, state, state),
                       _scalar(float(ds.total_size), ds.nw, ds.dtype))
        return {
            "dual_error": dual_error,
            "primal_error": primal_error,
            "d_obj": to_float(d_obj),
            "p_obj": to_float(p_obj),
            "dual_gap": gap,
            "mu": to_float(mu_dd),
        }

    return jax.jit(assess)


def make_step(ds: DeviceSDP, *, gamma: float, beta_feasible: float,
              beta_infeasible: float, dual_error_threshold: float,
              primal_error_threshold: float, safe_step: bool = True,
              correctoronly: bool = False, eig_safety: float = 1e-12):
    """Build the jitted one-iteration function."""

    K = float(ds.total_size)
    nw = ds.nw
    dt = ds.dtype

    def step(state, pd_feas_prev):
        X, Y, Xs, Ys = state["X"], state["Y"], state["Xs"], state["Ys"]
        ok = jnp.bool_(True)
        ok_X = jnp.bool_(True)
        ok_S = jnp.bool_(True)

        # step 3: mu and mu_p
        mu = dd_div(_dot_state(ds, state, state), _scalar(K, nw, dt))
        if correctoronly:
            mu_p = mu
        else:
            mu_p = dd_mul_f64(
                mu, jnp.where(pd_feas_prev, 0.0, beta_infeasible).astype(dt))

        # chol(X) and X^-1 per block (solver.jl:387-400, 1117-1119)
        Xinv, Xinv_s = [], []
        for j, cl in enumerate(ds.clusters):
            xi = []
            for l, b in enumerate(cl.blocks):
                L, okb = dl.dd_cholesky(X[j][l])
                ok = ok & okb
                ok_X = ok_X & okb
                inv = dl.dd_solve_cholesky(L, dl.dd_eye(b.n, nw, dtype=dt))
                xi.append(dl.dd_symmetrize(inv))
            Xinv.append(xi)
            if cl.s_nb:
                ok = ok & jnp.all(Xs[j][0] > 0)
                Xinv_s.append(dd_div(_scalar(jnp.ones(cl.s_nb), nw, dt), Xs[j]))
            else:
                Xinv_s.append(dl.dd_zeros((0,), nw, dtype=dt))

        # R = mu I - X Y [- dX dY] (solver.jl:961-983)
        def _residual_R(mu_val, corr=None):
            Rs, Rs_s = [], []
            for j, cl in enumerate(ds.clusters):
                Rc = []
                for l, b in enumerate(cl.blocks):
                    XY = dl.dd_matmul(X[j][l], Y[j][l])
                    Rb = dd_sub(dd_mul(mu_val, dl.dd_eye(b.n, nw, dtype=dt)), XY)
                    if corr is not None:
                        dXdY = dl.dd_matmul(corr[0][j][l], corr[1][j][l])
                        Rb = dd_sub(Rb, dXdY)
                    Rc.append(Rb)
                Rs.append(Rc)
                if cl.s_nb:
                    Rb = dd_sub(dd_mul(mu_val, _scalar(jnp.ones(cl.s_nb), nw, dt)),
                                dd_mul(Xs[j], Ys[j]))
                    if corr is not None:
                        Rb = dd_sub(Rb, dd_mul(corr[2][j], corr[3][j]))
                    Rs_s.append(_dd_scale(Rb, cl.smask))
                else:
                    Rs_s.append(dl.dd_zeros((0,), nw, dtype=dt))
            return Rs, Rs_s

        R, R_s = _residual_R(mu_p)

        # Schur complement per cluster + KKT decomposition (solver.jl:1229-1287)
        cholSs, LinvBs = [], []
        for j, cl in enumerate(ds.clusters):
            S = _schur_cluster(cl, Xinv[j], Y[j], Xinv_s[j], Ys[j])
            L, okb = dl.dd_cholesky(S)
            ok = ok & okb
            ok_S = ok_S & okb
            LinvB = dl.dd_solve_tril(L, cl.B)
            cholSs.append(L)
            LinvBs.append(LinvB)
        Q = dl.dd_zeros((ds.nfree, ds.nfree), nw, dtype=dt)
        for LinvB in LinvBs:
            Q = dd_add(Q, dl.dd_matmul(dl.dd_transpose(LinvB), LinvB))
        cholQ, okq = dl.dd_cholesky(Q)
        ok = ok & okq

        # residuals for the current point (solver.jl:413-417)
        Pres, Pres_s, pres, dres = _residuals(ds, state)
        dual_error, primal_error = _errors(Pres, Pres_s, pres, dres)
        pd_feas_now = (dual_error < dual_error_threshold) & \
                      (primal_error < primal_error_threshold)

        def search_direction(Rcur, Rcur_s):
            # Z = X^-1 (P Y - R), symmetrized (solver.jl:1499-1515)
            Zs, Zs_s = [], []
            for j, cl in enumerate(ds.clusters):
                Zc = []
                for l, b in enumerate(cl.blocks):
                    PY_ = dl.dd_matmul(Pres[j][l], Y[j][l])
                    Zb = dl.dd_matmul(Xinv[j][l], dd_sub(PY_, Rcur[j][l]))
                    Zc.append(dl.dd_symmetrize(Zb))
                Zs.append(Zc)
                if cl.s_nb:
                    Zs_s.append(dd_mul(Xinv_s[j],
                                       dd_sub(dd_mul(Pres_s[j], Ys[j]), Rcur_s[j])))
                else:
                    Zs_s.append(dl.dd_zeros((0,), nw, dtype=dt))
            # rhs_x = -d - <A_*, Z>  (solver.jl:1519-1525)
            rhs_x = []
            for j, cl in enumerate(ds.clusters):
                tA = _trace_A_cluster(cl, Zs[j], Zs_s[j])
                rhs_x.append(dd_sub(dd_neg(dres[j]), tA))
            # 3-stage triangular solve (solver.jl:1527-1582)
            temp_x, temp_y = [], []
            for j, cl in enumerate(ds.clusters):
                tx = dl.dd_solve_tril(cholSs[j], _col(rhs_x[j]))
                ty = dl.dd_matmul(dl.dd_transpose(LinvBs[j]), tx)
                temp_x.append(tx)
                temp_y.append(ty)
            dy = _col(pres)
            for ty in temp_y:
                dy = dd_sub(dy, ty)
            dy = dl.dd_solve_cholesky(cholQ, dy)
            dx = []
            for j, cl in enumerate(ds.clusters):
                t = dd_add(temp_x[j], dl.dd_matmul(LinvBs[j], dy))
                dxj = dl.dd_solve_triu(dl.dd_transpose(cholSs[j]), t)
                dx.append(_col0(dxj))
            dy = _col0(dy)
            # dX = sum_i dx_i A_i + P (solver.jl:1585-1594)
            dX, dXs = [], []
            for j, cl in enumerate(ds.clusters):
                wA, wA_s = _weighted_A_cluster(cl, dx[j])
                dX.append([dd_add(w, Pb) for w, Pb in zip(wA, Pres[j])])
                dXs.append(dd_add(wA_s, Pres_s[j]) if cl.s_nb
                           else dl.dd_zeros((0,), nw, dtype=dt))
            # dY = X^-1 (R - dX Y), symmetrized (solver.jl:1597-1613)
            dY, dYs = [], []
            for j, cl in enumerate(ds.clusters):
                dYc = []
                for l, b in enumerate(cl.blocks):
                    dXY = dl.dd_matmul(dX[j][l], Y[j][l])
                    dYb = dl.dd_matmul(Xinv[j][l], dd_sub(Rcur[j][l], dXY))
                    dYc.append(dl.dd_symmetrize(dYb))
                dY.append(dYc)
                if cl.s_nb:
                    dYs.append(dd_mul(Xinv_s[j],
                                      dd_sub(Rcur_s[j], dd_mul(dXs[j], Ys[j]))))
                else:
                    dYs.append(dl.dd_zeros((0,), nw, dtype=dt))
            return dx, dy, dX, dY, dXs, dYs

        # predictor (solver.jl:420-425)
        dx, dy, dX, dY, dXs, dYs = search_direction(R, R_s)

        # corrector mu (solver.jl:429-434)
        dstate = {"X": dX, "Y": dY, "Xs": dXs, "Ys": dYs}
        r_num = dd_add(
            dd_add(_dot_state(ds, state, state), _dot_state(ds, state, dstate)),
            dd_add(_dot_state(ds, dstate, state), _dot_state(ds, dstate, dstate)))
        r_val = to_float(r_num) / (to_float(mu) * K)
        beta = jnp.where(r_val < 1.0, r_val ** 2, r_val)
        beta_c = jnp.where(pd_feas_now,
                           jnp.minimum(jnp.maximum(beta_feasible, beta), 1.0),
                           jnp.maximum(beta_infeasible, beta))
        mu_c = dd_mul_f64(mu, beta_c.astype(dt))

        # corrector direction (solver.jl:438-456)
        Rc, Rc_s = _residual_R(mu_c, corr=(dX, dY, dXs, dYs))
        dx, dy, dX, dY, dXs, dYs = search_direction(Rc, Rc_s)

        # step lengths (solver.jl:460-465)
        alpha_d, ok_a1 = _step_length(ds, state, "X", "Xs", dX, dXs, gamma, eig_safety)
        alpha_p, ok_a2 = _step_length(ds, state, "Y", "Ys", dY, dYs, gamma, eig_safety)
        ok = ok & ok_a1 & ok_a2
        if safe_step:
            a = jnp.minimum(alpha_p, alpha_d)
            alpha_p = jnp.where(pd_feas_now, a, alpha_p)
            alpha_d = jnp.where(pd_feas_now, a, alpha_d)

        new_state = _axpy_state(state, dx, dy, dX, dY, dXs, dYs, alpha_d, alpha_p)
        d_obj, p_obj, gap = _objectives(ds, new_state)

        info = {
            "mu": to_float(mu),
            "dual_error": dual_error,
            "primal_error": primal_error,
            "pd_feas": pd_feas_now,
            "alpha_d": alpha_d,
            "alpha_p": alpha_p,
            "beta_c": beta_c,
            "d_obj": to_float(d_obj),
            "p_obj": to_float(p_obj),
            "dual_gap": gap,
            "ok": ok,
            "ok_X": ok_X,
            "ok_S": ok_S,
            "ok_Q": okq,
        }
        return new_state, info

    return jax.jit(step)
