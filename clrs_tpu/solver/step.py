"""The jitted IPM iteration (device side).

One call = one full Mehrotra predictor-corrector iteration, mirroring the
main loop of `ClusteredLowRankSolver.jl/src/solver.jl:348-593`:

  mu -> R_p -> chol(X) -> X^-1 -> bilinear panels V^T X^-1 V, V^T Y V ->
  Schur S^j (solver.jl:1062-1226) -> chol(S^j) -> L^-1 B -> Q -> chol(Q)
  (solver.jl:1229-1287) -> residuals P,p,d (solver.jl:882-918) ->
  predictor direction (solver.jl:1474-1616) -> corrector mu_c ->
  corrector direction -> step lengths (solver.jl:1618-1693) -> update.

TPU-first design notes:
- PSD blocks are grouped into SIZE CLASSES per cluster (the reference's
  ragged `BlockDiagonal` becomes padded dense batches, SURVEY.md section
  7.1): every per-block kernel (Cholesky, panels, Schur gathers, residuals,
  updates, step lengths) runs ONCE per class as a batched kernel over the
  [L, n, n] leading axis instead of once per block. This is what keeps the
  traced graph small (compile time) and the device busy (few large kernels
  instead of hundreds of tiny sequential ones), and the class axis is the
  natural intra-cluster sharding axis. Padding is inert by construction:
  padded diagonal entries of X/Y are pinned at 1 (dX/dY vanish there
  because the P and R residuals are masked), padded rows of V / padded
  lambda terms are zero, and every trace reduction applies the real-area
  mask.
- 1x1 dense blocks are batched into a per-cluster "scalar pack" so all of
  their per-block work becomes one vector subgraph (LP-cone specialization;
  the reference loops over them as ordinary Arb matrices).
- Low-rank constraint structure drives batched gather/einsum Schur assembly
  via the static term tables produced by the compiler.
- All values are multi-word expansions (f64 words on IEEE backends, f32
  words on TPU — see dd/core.py); scalars for termination control are
  returned to the host. Failures (non-PSD Cholesky) surface as boolean
  flags; the host maps them onto the reference's SolverFailure semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..compile.sdp import ClusteredLowRankSDP
from ..dd import linalg as dl
from ..dd.core import dd_add, dd_div, dd_mul, dd_neg, dd_sub, on_tpu
from ..dd.expops import two_prod

__all__ = ["DeviceSDP", "make_step", "make_step_body", "make_run_chunk",
           "make_assess", "initial_state", "zero_info"]


def zero_info(assess_info=None):
    """Initial info carry for :func:`make_run_chunk` (dtypes must match the
    step body's info dict; values are seeded from an assess() result when
    available so an immediately-failing chunk still reports sane errors)."""
    import jax.numpy as jnp

    f = lambda k: jnp.float64(float(assess_info[k]) if assess_info
                              and k in assess_info else 0.0)  # noqa: E731
    return {
        "mu": f("mu"), "dual_error": f("dual_error"),
        "primal_error": f("primal_error"), "P_error": f("P_error"),
        "p_error": f("p_error"), "pd_feas": jnp.bool_(False),
        "alpha_d": jnp.float64(1.0), "alpha_p": jnp.float64(1.0),
        "beta_c": jnp.float64(0.0), "d_obj": f("d_obj"), "p_obj": f("p_obj"),
        "dual_gap": f("dual_gap"), "ok": jnp.bool_(True),
        "ok_X": jnp.bool_(True), "ok_S": jnp.bool_(True),
        "ok_Q": jnp.bool_(True),
    }


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


def _scalar_split(v, nw, dtype=jnp.float64):
    """Traced/static f64 scalar -> nw-word expansion of ``dtype``.

    For f32 targets the value is split into up to three words by successive
    rounding (each residual is exactly representable), so downstream word
    arithmetic keeps the full f64 value instead of rounding it to one f32
    word (a 2^-24 relative error injected straight into the iterate, which
    is what the substrate-equivalence test catches)."""
    v = jnp.asarray(v, dtype=jnp.float64)
    if dtype == jnp.float32:
        words = []
        r = v
        for _ in range(min(nw, 3)):
            w = r.astype(jnp.float32)
            words.append(w)
            r = r - w.astype(jnp.float64)
        words += [jnp.zeros_like(words[0])] * (nw - len(words))
        return tuple(words)
    return (v,) + (jnp.zeros_like(v),) * (nw - 1)


def dd_take(m, *idx):
    return tuple(c[idx] for c in m)


def _f64sum(x):
    """Multi-word value -> float64 (for host-facing scalars: summing the
    words after an exact cast keeps full precision up to f64, instead of
    rounding through the f32 working dtype)."""
    out = x[0].astype(jnp.float64)
    for c in x[1:]:
        out = out + c.astype(jnp.float64)
    return out


def _dd_scale(x, a):
    """multiply a multi-word array by an exact {0,1}/power-of-two array."""
    return tuple(c * a for c in x)


# batched linalg kernels: one instance per size class, vmapped over the
# leading [L] block axis (the reference's per-(j,l) threaded loops,
# src/threadinginfo.jl:59-102)
_bchol = dl.b_cholesky
_bmm_raw = jax.vmap(dl.dd_matmul)
_bsolve_tril = dl.b_solve_tril
_bsolve_cholesky = dl.b_solve_cholesky


def _bmm(a, b):
    from ..dd.limb_gemm import mac_scale

    with mac_scale(a[0].shape[0]):
        return _bmm_raw(a, b)


def _bmm_pre_r(a, pre):
    """Batched GEMM with a precomputed (constant) RIGHT operand."""
    from ..dd.limb_gemm import fx_matmul, mac_scale

    nw = len(a)
    with mac_scale(a[0].shape[0]):
        return jax.vmap(lambda aa, lb, eb: fx_matmul(
            aa, None, nw=nw, pre_b=(lb, eb)))(a, pre[0], pre[1])


def _bmm_pre_l(b, pre, nw):
    """Batched GEMM with a precomputed (constant) LEFT operand."""
    from ..dd.limb_gemm import fx_matmul, mac_scale

    with mac_scale(b[0].shape[0]):
        return jax.vmap(lambda bb, la, ea: fx_matmul(
            None, bb, nw=nw, pre_a=(la, ea)))(b, pre[0], pre[1])


@dataclasses.dataclass
class _DevClass:
    """A batch of same-size-class PSD blocks of one CLUSTER GROUP.

    The leading block axis has length L = J * Lc: ``Lc`` same-shaped blocks
    from each of the group's ``J`` stacked clusters, flattened
    jslot-major. Per-block kernels never care about the cluster structure;
    the Schur/trace contractions reshape to [J, Lc, ...] and reduce over
    Lc only."""

    kind: str                    # 'lowrank' | 'dense'
    L: int                       # total batch size (= J * Lc)
    n: int                       # padded block size
    Lc: int                      # blocks per cluster in this class
    members: List[Tuple[int, int, int]]  # [(orig cluster j, block l, real n)]
    C: Any                       # dd [L, n, n]
    maskd: Any = None            # dtype [L, n, n]: 1 on the real area
    maskdiag: Any = None         # dtype [L, n]: 1 on real diagonal entries
    # low-rank data (padded to the class [m, T])
    V: Any = None                # dd [L, n, m]
    lam: Any = None              # dd [L, P, T]
    li: Any = None               # int32 [L, P, T]
    ri: Any = None               # int32 [L, P, T]
    tmask: Any = None            # dtype [L, P, T]
    Ul: Any = None               # dd [L, P*T, n]: tmask * V[:, li].T
    Ur: Any = None               # dd [L, P*T, n]: tmask * V[:, ri].T
    Ulw: Any = None              # dd [L, P*T, n]: lam * Ul (Schur pair path)
    Urw: Any = None              # dd [L, P*T, n]: lam * Ur
    use_pairs: bool = False      # gather-free Schur pair path for this class
    # dense data
    A: Any = None                # dd [L, P, n, n]
    # precomputed limb forms of the constant GEMM operands (f32 substrate
    # only; (int8 limbs, int32 exps) per limb_gemm.host_precompute):
    Vpre_r: Any = None           # V as right operand   [L, Ll, n, m]
    Vtpre_l: Any = None          # V^T as left operand  [L, Ll, m, n]
    V2pre_r: Any = None          # doubled (for the [2L] X/Y panel pair)
    V2tpre_l: Any = None
    Urpre_r: Any = None          # Ur as right operand  [L, Ll, P*T, n]
    U2pre_l: Any = None          # [Ulw; Ul] as left operand ([2L] pair GEMM)
    U2tpre_r: Any = None         # [Urw^T; Ur^T] as right operand
    Ulpre_l: Any = None          # Ul as left operand (trace_A Hadamard)


@dataclasses.dataclass
class _DevCluster:
    """A GROUP of J same-signature clusters, stacked on a leading [J] axis.

    The reference parallelizes over clusters with `Threads.@threads for j`
    (solver.jl:1244-1261, threadinginfo.jl:59-102); here same-shaped
    clusters share ONE subgraph batched over [J] (cluster-level arrays)
    and [J*Lc] (block classes) — compile time is flat in cluster count and
    the mesh shards the [J] axis. A group of one (J=1) is the degenerate
    case, so there is a single code path."""

    J: int                       # number of stacked clusters
    nrows: int                   # constraint rows P per cluster
    members_j: List[int]         # original cluster indices, jslot order
    c: Any                       # dd [J, P]
    B: Any                       # dd [J, P, F]
    classes: List[_DevClass]
    sa: Any = None               # dd [J, Bs, P] scalar-pack coefficients
    sC: Any = None               # dd [J, Bs]
    smask: Any = None            # dtype [J, Bs]: 1 real, 0 padding
    jmask: Any = None            # dtype [J]: 1 real cluster, 0 padding
    s_nb: int = 0                # scalar-pack width Bs per cluster
    s_nreal: int = 0             # real 1x1 blocks in the whole group
    row_shard: bool = False      # row-panel sharding over ds.row_mesh
    nw: int = 2                  # word count of the device expansion words
    dtype: Any = None            # working dtype of the expansion words
    # layout[jslot][l] -> (class index, flattened slot) per original block
    layout: List[List[Tuple[int, int]]] = None


def _col(v):
    """nw-word vector -> column matrix."""
    return tuple(c[:, None] for c in v)


def _col0(m):
    """nw-word single-column matrix -> vector."""
    return tuple(c[:, 0] for c in m)


def _group_lowrank(blocks):
    """Greedy size-classing: sort by n descending, open a new class when the
    next block is below 70% of the class's padded size (bounds the padding
    waste at ~3x FLOPs worst case while batching near-equal sizes)."""
    order = sorted(blocks, key=lambda t: -t[1].n)
    classes = []
    for l, bd in order:
        if classes and bd.n >= 0.7 * classes[-1][0][1].n:
            classes[-1].append((l, bd))
        else:
            classes.append([(l, bd)])
    return classes


def _pad2(arr, shape):
    out = np.zeros(shape, dtype=arr.dtype)
    out[tuple(slice(0, s) for s in arr.shape)] = arr
    return out


def _pad_dd(ws, shape):
    return tuple(_pad2(np.asarray(c), shape) for c in ws)


class DeviceSDP:
    """Device-resident constants built from a compiled SDP.

    ``nw``/``dtype`` select the on-device expansion arithmetic:
    f64 x 2 words (~106 bits, the fast default on IEEE backends), f64 x 4
    (~212 bits — the reference's prec=256 regime, ClusteredLowRankSolver.jl
    src/solver.jl:100-128), or f32 x nw (~24*nw bits) — the TPU-sound
    substrate, since this chip's f64 is an unsound emulation while its f32
    is exactly IEEE (NOTES_TPU_NUMERICS.md)."""

    def __init__(self, sdp: ClusteredLowRankSDP, nw: int = 2, dtype=None,
                 mesh_divisor: int = 1):
        self.nw = nw
        self.dtype = dtype = dtype or jnp.float64
        # row-panel sharding of single-cluster groups over a mesh
        # (parallel.api.enable_row_sharding sets these + cl.row_shard)
        self.row_mesh = None
        self.row_axis = None
        _dd = lambda a: _w(a, nw, dtype)  # noqa: E731
        self.maximize = sdp.maximize
        self.sign = 1.0 if sdp.maximize else -1.0
        self.constant = _w((np.float64(sdp.constant.hi),
                            np.float64(sdp.constant.lo)), nw, dtype)
        self.b = _dd(sdp.b)
        self.nfree = sdp.nfree
        self.mesh_divisor = d = max(1, int(mesh_divisor))

        # ---- per-cluster host protos (numpy word tuples) ----------------
        protos = []
        for cl in sdp.clusters:
            P = cl.nrows
            lowrank = [(l, bd) for l, bd in enumerate(cl.blocks)
                       if bd.kind == "lowrank"]
            dense = [(l, bd) for l, bd in enumerate(cl.blocks)
                     if bd.kind != "lowrank"]
            layout = [None] * len(cl.blocks)
            classes = []

            for group in _group_lowrank(lowrank):
                Lb = len(group)
                n = max(bd.n for _, bd in group)
                m = max(bd.V[0].shape[1] for _, bd in group)
                T = max(bd.li.shape[1] for _, bd in group)
                Cs, Vs, lams, lis, ris, tms = [], [], [], [], [], []
                maskd = np.zeros((Lb, n, n))
                maskdiag = np.zeros((Lb, n))
                members = []
                for i, (l, bd) in enumerate(group):
                    layout[l] = (len(classes), i)
                    members.append((l, bd.n))
                    Cs.append(_pad_dd(bd.C, (n, n)))
                    Vs.append(_pad_dd(bd.V, (n, m)))
                    lams.append(_pad_dd(bd.lam, (P, T)))
                    lis.append(_pad2(np.asarray(bd.li), (P, T)))
                    ris.append(_pad2(np.asarray(bd.ri), (P, T)))
                    tms.append(_pad2(np.asarray(bd.tmask), (P, T)))
                    maskd[i, :bd.n, :bd.n] = 1.0
                    maskdiag[i, :bd.n] = 1.0
                stack = lambda ws: tuple(np.stack([w[k] for w in ws])
                                         for k in range(len(ws[0])))
                classes.append(dict(
                    kind="lowrank", Lc=Lb, n=n, m=m, T=T, members=members,
                    C=stack(Cs), V=stack(Vs), lam=stack(lams),
                    li=np.stack(lis).astype(np.int32),
                    ri=np.stack(ris).astype(np.int32),
                    tm=np.stack(tms), maskd=maskd, maskdiag=maskdiag))

            # dense blocks: batch by identical size (no padding)
            bysize = {}
            for l, bd in dense:
                bysize.setdefault(bd.n, []).append((l, bd))
            for n, group in sorted(bysize.items()):
                Lb = len(group)
                members = []
                Cs, As = [], []
                for i, (l, bd) in enumerate(group):
                    layout[l] = (len(classes), i)
                    members.append((l, n))
                    Cs.append(tuple(np.asarray(w) for w in bd.C))
                    As.append(tuple(np.asarray(w) for w in bd.A))
                stack = lambda ws: tuple(np.stack([w[k] for w in ws])
                                         for k in range(len(ws[0])))
                classes.append(dict(
                    kind="dense", Lc=Lb, n=n, members=members,
                    C=stack(Cs), A=stack(As),
                    maskd=np.ones((Lb, n, n)),
                    maskdiag=np.ones((Lb, n))))
            protos.append(dict(
                P=P, layout=layout, classes=classes,
                c=tuple(np.asarray(w) for w in cl.c),
                B=tuple(np.asarray(w) for w in cl.B),
                scalars=cl.scalars))

        # ---- group same-signature clusters ------------------------------
        def _sig(pr):
            cs = tuple((k["kind"], k["Lc"], k["n"],
                        k.get("m", 0), k.get("T", 0))
                       for k in pr["classes"])
            sc = pr["scalars"]
            return (pr["P"], cs, 0 if sc is None else sc.nblocks)

        groups: dict = {}
        for j, pr in enumerate(protos):
            groups.setdefault(_sig(pr), []).append(j)

        def _pad_words(ws, shape):
            return tuple(_pad2(np.asarray(w), shape) for w in ws)

        self.clusters = []
        self.cluster_of = {}
        for sig, js in groups.items():
            J = len(js)
            base = protos[js[0]]
            P = base["P"]
            nwc = len(base["c"])
            # cluster-axis padding: append fake (all-zero, masked) clusters
            # so [J] shards over a mesh of size d; their Schur block is
            # regularized to I so chol(S) succeeds and their dx stays 0.
            Jp = J if (d <= 1 or J < d) else -(-J // d) * d
            # block-axis padding: pad Lc per cluster so J*Lc' % d == 0
            # (only when the cluster axis itself is not shardable)
            def _pad_lc(Lc):
                if d <= 1 or Jp % d == 0:
                    return Lc
                Lcp = Lc
                while (Jp * Lcp) % d:
                    Lcp += 1
                return Lcp
            for jslot, j in enumerate(js):
                self.cluster_of[j] = (len(self.clusters), jslot)
            classes = []
            for ki in range(len(base["classes"])):
                prs = [protos[j]["classes"][ki] for j in js]
                k0 = prs[0]
                Lc, n = k0["Lc"], k0["n"]
                Lcp = _pad_lc(Lc)
                members = []
                for jslot, (j, pk) in enumerate(zip(js, prs)):
                    for (l, rn) in pk["members"]:
                        members.append((j, l, rn))

                def cat(key, pad_shape=None, int_=False, words=True):
                    parts = []
                    for pk in prs:
                        a = pk[key]
                        if words:
                            a = tuple(np.asarray(w) for w in a)
                            if Lcp != Lc:
                                a = tuple(_pad2(w, (Lcp,) + w.shape[1:])
                                          for w in a)
                        else:
                            a = np.asarray(a)
                            if Lcp != Lc:
                                a = _pad2(a, (Lcp,) + a.shape[1:])
                        parts.append(a)
                    # fake clusters: zeros
                    for _ in range(Jp - J):
                        if words:
                            parts.append(tuple(np.zeros_like(w)
                                               for w in parts[0]))
                        else:
                            parts.append(np.zeros_like(parts[0]))
                    if words:
                        return tuple(np.concatenate([p[w] for p in parts])
                                     for w in range(len(parts[0])))
                    return np.concatenate(parts)

                common = dict(
                    kind=k0["kind"], L=Jp * Lcp, Lc=Lcp, n=n,
                    members=members, C=_dd(cat("C")),
                    maskd=jnp.asarray(cat("maskd", words=False)).astype(dtype),
                    maskdiag=jnp.asarray(
                        cat("maskdiag", words=False)).astype(dtype))
                if k0["kind"] == "lowrank":
                    li = cat("li", words=False).astype(np.int32)
                    ri = cat("ri", words=False).astype(np.int32)
                    tm = cat("tm", words=False)
                    Vw = cat("V")
                    T = k0["T"]
                    # gathered term columns Ul[i, p*T+t, :] = tmask * V[:, li]
                    # (precomputed so sum_pt w_pt v_li v_ri^T becomes ONE
                    # GEMM per class instead of onehot-matrix products)
                    Ul, Ur = [], []
                    for wword in Vw:
                        wl = np.zeros((Jp * Lcp, P * T, n))
                        wr = np.zeros((Jp * Lcp, P * T, n))
                        for i in range(Jp * Lcp):
                            wl[i] = wword[i].T[li[i].reshape(-1)] * \
                                tm[i].reshape(-1)[:, None]
                            wr[i] = wword[i].T[ri[i].reshape(-1)] * \
                                tm[i].reshape(-1)[:, None]
                        Ul.append(wl)
                        Ur.append(wr)
                    # lam-weighted term tables for the gather-free Schur
                    # pair path: G = (lam*Ul) M (lam*Ur)^T indexes the
                    # pairing by (p,t) DIRECTLY, so the [L,P,T,P,T] panel
                    # gathers (measured ~1.7 ms EACH on this chip — TPU
                    # gathers serialize) disappear. Host dd product is
                    # exact to the compiler's word count (numpy IEEE f64,
                    # Dekker two_prod).
                    from ..dd import core as _core

                    lamw = cat("lam")
                    lam3 = tuple(w.reshape(w.shape[0], -1, 1) for w in lamw)
                    Ulww = _core.dd_mul(lam3, tuple(Ul))
                    Urww = _core.dd_mul(lam3, tuple(Ur))
                    common.update(
                        V=_dd(Vw), lam=_dd(lamw),
                        li=jnp.asarray(li), ri=jnp.asarray(ri),
                        tmask=jnp.asarray(tm).astype(dtype),
                        Ul=_dd(tuple(Ul)), Ur=_dd(tuple(Ur)),
                        Ulw=_dd(Ulww), Urw=_dd(Urww),
                        use_pairs=(Jp * Lcp) * (P * T) ** 2
                        <= _SCHUR_T1_BATCH_BUDGET)
                else:
                    common.update(A=_dd(cat("A")))
                classes.append(_DevClass(**common))

            def stackj(key):
                parts = [tuple(np.asarray(w) for w in protos[j][key])
                         for j in js]
                for _ in range(Jp - J):
                    parts.append(tuple(np.zeros_like(w) for w in parts[0]))
                return tuple(np.stack([p[w] for p in parts])
                             for w in range(len(parts[0])))

            layout = [protos[j]["layout"] for j in js]
            # offset per-cluster slots into the flattened [J*Lc] class axes
            Lcps = [k.Lc for k in classes]
            layout = [[(ki, jslot * Lcps[ki] + slot)
                       for (ki, slot) in lay]
                      for jslot, lay in enumerate(layout)]
            jmask = np.zeros(Jp)
            jmask[:J] = 1.0
            dc = _DevCluster(
                J=Jp, nrows=P, members_j=list(js), c=_dd(stackj("c")),
                B=_dd(stackj("B")), classes=classes, nw=nw, dtype=dtype,
                layout=layout,
                jmask=jnp.asarray(jmask).astype(dtype))
            scs = [protos[j]["scalars"] for j in js]
            if scs[0] is not None:
                Bs = scs[0].nblocks
                Bsp = Bs if d <= 1 or Jp % d == 0 else -(-Bs // d) * d

                def scat(key, words=True):
                    parts = []
                    for sc in scs:
                        a = getattr(sc, key)
                        if words:
                            a = tuple(_pad2(np.asarray(w),
                                            (Bsp,) + np.asarray(w).shape[1:])
                                      for w in a)
                        else:
                            a = _pad2(np.asarray(a), (Bsp,))
                        parts.append(a)
                    for _ in range(Jp - J):
                        if words:
                            parts.append(tuple(np.zeros_like(w)
                                               for w in parts[0]))
                        else:
                            parts.append(np.zeros_like(parts[0]))
                    if words:
                        return tuple(np.stack([p[w] for p in parts])
                                     for w in range(len(parts[0])))
                    return np.stack(parts)

                dc.sa = _dd(scat("a"))
                dc.sC = _dd(scat("C"))
                dc.smask = jnp.asarray(scat("mask", words=False)).astype(dtype)
                dc.s_nb = Bsp
                dc.s_nreal = sum(sc.nreal for sc in scs)
            self.clusters.append(dc)
        self.total_size = sum(rn for cl in self.clusters for k in cl.classes
                              for _, _, rn in k.members) \
            + sum(cl.s_nreal for cl in self.clusters)
        self.total_rows = sum(len(cl.members_j) * cl.nrows
                              for cl in self.clusters)
        if dtype == jnp.float32:
            self._precompute_limb_forms()

    def _precompute_limb_forms(self):
        """Host-extract limb forms of the constant GEMM operands (V panels
        and the Ur term table): the extraction is ~40% of an fx_matmul's
        elementwise work and these operands never change across iterations
        (limb_gemm.host_precompute; bit-identical to the device path)."""
        from ..dd.limb_gemm import host_precompute

        nw = self.nw

        def _stackpre(mats, axis):
            ls, es = [], []
            for ws in mats:
                lb, eb = host_precompute(ws, nw, axis=axis)
                ls.append(lb)
                es.append(eb)
            return (jnp.asarray(np.stack(ls)), jnp.asarray(np.stack(es)))

        for cl in self.clusters:
            for k in cl.classes:
                if k.kind != "lowrank":
                    continue
                if not k.use_pairs:
                    # dedup'd V panels only feed the non-pairs Schur path
                    Vw = [np.asarray(c) for c in k.V]
                    lr, er, lt, et = [], [], [], []
                    for l in range(k.L):
                        lb, eb = host_precompute([w[l] for w in Vw], nw,
                                                 axis=0)
                        lr.append(lb)
                        er.append(eb)
                        la, ea = host_precompute([w[l].T for w in Vw], nw,
                                                 axis=1)
                        lt.append(la)
                        et.append(ea)
                    lr, er = np.stack(lr), np.stack(er)
                    lt, et = np.stack(lt), np.stack(et)
                    k.Vpre_r = (jnp.asarray(lr), jnp.asarray(er))
                    k.Vtpre_l = (jnp.asarray(lt), jnp.asarray(et))
                    k.V2pre_r = (jnp.asarray(np.concatenate([lr, lr])),
                                 jnp.asarray(np.concatenate([er, er])))
                    k.V2tpre_l = (jnp.asarray(np.concatenate([lt, lt])),
                                  jnp.asarray(np.concatenate([et, et])))
                Uw = [np.asarray(c) for c in k.Ur]
                k.Urpre_r = _stackpre([[w[l] for w in Uw]
                                       for l in range(k.L)], axis=0)
                # pair-path constants: [Ulw; Ul] left, [Urw^T; Ur^T] right
                Ulw_ = [np.asarray(c) for c in k.Ulw]
                Ul_ = [np.asarray(c) for c in k.Ul]
                Urw_ = [np.asarray(c) for c in k.Urw]
                k.U2pre_l = _stackpre(
                    [[w[l] for w in Ulw_] for l in range(k.L)]
                    + [[w[l] for w in Ul_] for l in range(k.L)], axis=1)
                k.U2tpre_r = _stackpre(
                    [[w[l].T for w in Urw_] for l in range(k.L)]
                    + [[w[l].T for w in Uw] for l in range(k.L)], axis=0)
                k.Ulpre_l = (k.U2pre_l[0][k.L:], k.U2pre_l[1][k.L:])


def initial_state(ds: DeviceSDP, omega_p: float, omega_d: float):
    """x=0, X=omega_p*I, y=0, Y=omega_d*I (solver.jl:186-201); padded
    diagonal entries are pinned at 1 (inert, see module docstring)."""
    nw, dt = ds.nw, ds.dtype

    def eyes(k, omega):
        dv = omega * k.maskdiag + (1.0 - k.maskdiag)         # [L, n]
        w0 = jnp.eye(k.n, dtype=dt) * dv[:, None, :]
        return (w0,) + tuple(jnp.zeros_like(w0) for _ in range(nw - 1))

    x = [dl.dd_zeros((cl.J, cl.nrows), nw, dtype=dt) for cl in ds.clusters]
    y = dl.dd_zeros((ds.nfree,), nw, dtype=dt)
    X = [[eyes(k, omega_p) for k in cl.classes] for cl in ds.clusters]
    Y = [[eyes(k, omega_d) for k in cl.classes] for cl in ds.clusters]
    Xs = [_scalar(omega_p * jnp.ones((cl.J, cl.s_nb)), nw, dt)
          for cl in ds.clusters]
    Ys = [_scalar(omega_d * jnp.ones((cl.J, cl.s_nb)), nw, dt)
          for cl in ds.clusters]
    return {"x": x, "y": y, "X": X, "Y": Y, "Xs": Xs, "Ys": Ys}


# ---------------------------------------------------------------------------
# core operators (all batched over the class [L] axis)
# ---------------------------------------------------------------------------

def _panel_b(k: _DevClass, Mb):
    """V^T M V for a class batch (the bilinear pairing panels)."""
    if k.Vpre_r is not None:
        MV = _bmm_pre_r(Mb, k.Vpre_r)
        return _bmm_pre_l(MV, k.Vtpre_l, len(Mb))
    MV = _bmm(Mb, k.V)
    return _bmm(dl.dd_transpose_b(k.V), MV)


def _panels_xy(k: _DevClass, Xb, Yb):
    """V^T X^-1 V and V^T Y V as ONE batched panel pair: the two operands
    are stacked on the class axis so the GEMM elementwise machinery (limb
    extraction, cascade) runs once over [2L] instead of twice over [L].
    These panels are computed once per iteration and shared by the Schur
    assembly and by trace_A for the d-residual (the reference reuses its
    bilinear pairings the same way, solver.jl:1121-1170)."""
    M2 = tuple(jnp.concatenate([a, b], 0) for a, b in zip(Xb, Yb))
    if k.V2pre_r is not None:
        MV = _bmm_pre_r(M2, k.V2pre_r)
        P2 = _bmm_pre_l(MV, k.V2tpre_l, len(M2))
    else:
        V2 = tuple(jnp.concatenate([c, c], 0) for c in k.V)
        MV = _bmm(M2, V2)
        P2 = _bmm(dl.dd_transpose_b(V2), MV)
    PX = tuple(c[:k.L] for c in P2)
    PY = tuple(c[k.L:] for c in P2)
    return PX, PY


def _pairs_xy(k: _DevClass, Xb, Yb):
    """Gather-free pairing pair for the Schur assembly + trace_A:

        GXw = (lam Ul) X^-1 (lam Ur)^T     [L, PT, PT]
        GY  =      Ul  Y        Ur^T       [L, PT, PT]

    indexed by the term rows (p, t) DIRECTLY, so S and <A_*, Y> read them
    with reshapes/diagonals instead of the [L,P,T,P,T] panel gathers
    (TPU gathers serialize: measured ~1.7 ms per 131k-element gather on
    this chip, 10 of them per Schur build — the round-4 hot spot). Both
    pairings run as ONE [2L]-stacked batched GEMM pair, with the constant
    U tables host-precomputed to limb form on the f32 substrate."""
    M2 = tuple(jnp.concatenate([a, b], 0) for a, b in zip(Xb, Yb))
    if k.U2pre_l is not None:
        UM = _bmm_pre_l(M2, k.U2pre_l, len(M2))      # [2L, PT, n]
        G2 = _bmm_pre_r(UM, k.U2tpre_r)              # [2L, PT, PT]
    else:
        U_l = tuple(jnp.concatenate([a, b], 0)
                    for a, b in zip(k.Ulw, k.Ul))
        U_rt = tuple(jnp.concatenate([a, b], 0) for a, b in zip(
            dl.dd_transpose_b(k.Urw), dl.dd_transpose_b(k.Ur)))
        UM = _bmm(U_l, M2)
        G2 = _bmm(UM, U_rt)
    GXw = tuple(c[:k.L] for c in G2)
    GY = tuple(c[k.L:] for c in G2)
    return GXw, GY


def _gather_b(PM, li, ri):
    """PM[l, li[l,p,t], ri[l,p,t]] -> dd [L, P, T]."""
    L = li.shape[0]
    lidx = jnp.arange(L)[:, None, None]
    return tuple(c[lidx, li, ri] for c in PM)


def _trace_A_cluster(cl: _DevCluster, Zs, Zsc, panels=None):
    """[<A_p, Z>]_p -> dd [J, P] for all rows of a cluster group
    (solver.jl:1289-1366). ``panels`` (optional, per class) short-circuits
    the pairing when the caller already holds it: the GY pair matrix for
    ``use_pairs`` classes (its diagonal IS the trace vector), the V^T Z V
    panel otherwise. With no panels, the Hadamard route 1^T(Ul Z o Ur)
    (the reference's own trick, solver.jl:1290-1366) — one GEMM +
    elementwise reduce, no gathers."""
    J, P = cl.J, cl.nrows
    tot = dl.dd_zeros((J, P), cl.nw, dtype=cl.dtype)
    for ki, (k, Z) in enumerate(zip(cl.classes, Zs)):
        if k.kind == "lowrank":
            L, P_, T = k.li.shape
            have_panel = panels is not None and panels[ki] is not None
            if have_panel and k.use_pairs:
                pan = panels[ki]
                if isinstance(pan[0], str):           # ("diag", dgy [L,PT])
                    g = tuple(c.reshape(L, P_, T) for c in pan[1])
                else:                                 # GY [L, PT, PT]
                    g = tuple(jnp.diagonal(c, axis1=1, axis2=2)
                              .reshape(L, P_, T) for c in pan)
                v = dd_mul(k.lam, g)                  # tmask already in U
            elif have_panel:
                PZ = panels[ki]                       # [J*Lc, m, m]
                g = _gather_b(PZ, k.li, k.ri)         # [J*Lc, P, T]
                v = _dd_scale(dd_mul(k.lam, g), k.tmask)
            else:
                # Hadamard: <A_p, Z> = sum_t lam (Ul Z)[pt,:] . Ur[pt,:]
                if k.Ulpre_l is not None:
                    UZ = _bmm_pre_l(Z, k.Ulpre_l, cl.nw)
                else:
                    UZ = _bmm(k.Ul, Z)                # [L, PT, n]
                h = dl.dd_sum(dd_mul(UZ, k.Ur), axis=2)   # [L, PT]
                v = dd_mul(k.lam, tuple(c.reshape(L, P_, T) for c in h))
            # reduce over this cluster's Lc blocks and T terms only
            s = dl.dd_sum(tuple(
                jnp.moveaxis(c, 1, 2).reshape(J, -1, P) for c in v), axis=1)
            tot = dd_add(tot, s)
        else:
            prod = dd_mul(k.A, tuple(c[:, None] for c in Z))  # [J*Lc,P,n,n]
            flat = tuple(
                jnp.moveaxis(c.reshape(J, k.Lc, P, k.n, k.n), 2, 1)
                .reshape(J, P, -1) for c in prod)
            tot = dd_add(tot, dl.dd_sum(flat, axis=2))
    if cl.s_nb:
        r = _bmm(tuple(c[:, None, :] for c in Zsc), cl.sa)  # [J,1,P]
        tot = dd_add(tot, tuple(c[:, 0] for c in r))
    return tot


def _weighted_A_cluster(cl: _DevCluster, a):
    """sum_p a_p A_p per class + scalar pack (solver.jl:1409-1470).
    ``a`` is dd [J, P]; per-block output batches are [J*Lc, n, n]."""
    out = []
    for k in cl.classes:
        if k.kind == "lowrank":
            L, P, T = k.li.shape
            # a[jslot] broadcast to that cluster's Lc blocks (jslot-major)
            ab = tuple(jnp.repeat(c, k.Lc, axis=0)[:, :, None] for c in a)
            w = dd_mul(k.lam, ab)
            w = _dd_scale(w, k.tmask)
            wf = tuple(c.reshape(L, P * T, 1) for c in w)
            # sum_pt w_pt v_li v_ri^T = (Ul o w)^T @ Ur: one GEMM per class
            wUl = dd_mul(wf, k.Ul)                              # [L, P*T, n]
            if k.Urpre_r is not None:
                out.append(_bmm_pre_r(dl.dd_transpose_b(wUl), k.Urpre_r))
            else:
                out.append(_bmm(dl.dd_transpose_b(wUl), k.Ur))  # [L, n, n]
        else:
            ab = tuple(jnp.repeat(c, k.Lc, axis=0)[:, :, None, None]
                       for c in a)
            prod = dd_mul(k.A, ab)
            out.append(dl.dd_sum(prod, axis=1))                 # [J*Lc, n, n]
    if cl.s_nb:
        r = _bmm(cl.sa, tuple(c[:, :, None] for c in a))        # [J, Bs, 1]
        out_s = tuple(c[:, :, 0] for c in r)
    else:
        out_s = dl.dd_zeros((cl.J, 0), cl.nw, dtype=cl.dtype)
    return out, out_s


# element budget for the one-shot [L,P,T,P,T] Schur gather (~128 MB of f32
# words at nw=5 when fully used); above it, the t1 loop caps the peak at
# [L,P,P,T]
_SCHUR_T1_BATCH_BUDGET = 2 ** 22


# ---------------------------------------------------------------------------
# row-sharded big-cluster path (shard_map over ds.row_mesh): the Schur
# assembly, chol(S) and the KKT solves of ONE large cluster distribute by
# row panels — parallel/bigcluster.py, VERDICT r4 item 3
# ---------------------------------------------------------------------------

def _row_cfg(ds, cl):
    mesh, axis = ds.row_mesh, ds.row_axis
    D = mesh.shape[axis]
    nb = min(64, cl.nrows // D)
    return mesh, axis, D, nb


def _dist_schur_region(ds, cl, Xinv_cls, Y_cls, Xinv_s, Y_s):
    """shard_map region: row-sharded Schur + chol(S) + L^-1 B for a
    single-cluster group (cl.J == 1). Returns (cholS ['dist', L_sharded],
    LinvB [1, P, F] replicated, dgys per class [L, PT] replicated, ok)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel import bigcluster as bc

    mesh, axis, D, nb = _row_cfg(ds, cl)
    Pn = cl.nrows
    lks = [ki for ki, k in enumerate(cl.classes) if k.kind == "lowrank"]
    B0 = tuple(c[0] for c in cl.B)                   # [P, F]
    if cl.s_nb:
        w = dd_mul(Xinv_s, Y_s)                      # [1, Bs]
        sa0 = tuple(c[0] for c in cl.sa)
        w0 = tuple(c[0] for c in w)
    else:
        sa0 = w0 = None

    sharded2 = P(None, axis, None)                   # [Lc, PT, n] dim 1
    repl = P()
    args, specs = [], []
    for ki in lks:
        k = cl.classes[ki]
        args += [k.Ulw, k.Ur, k.Urw, k.Ul, Xinv_cls[ki], Y_cls[ki]]
        specs += [sharded2, sharded2, repl, repl, repl, repl]
    if sa0 is not None:
        args += [sa0, w0]
        specs += [repl, repl]
    args.append(B0)
    specs.append(repl)

    def region(*flat):
        it = iter(flat)
        S_loc = None
        dgys = []
        for ki in lks:
            k = cl.classes[ki]
            Ulw_loc, Ur_loc, Urw, Ul, Xi, Yb = (next(it) for _ in range(6))
            k_local = dataclasses.replace(k, Urw=Urw, Ul=Ul)
            S_k, dgy_loc = bc.dist_pairs_schur(k_local, Ulw_loc, Ur_loc,
                                               Xi, Yb, axis)
            S_loc = S_k if S_loc is None else dd_add(S_loc, S_k)
            dgys.append(tuple(jax.lax.all_gather(c, axis, axis=1,
                                                 tiled=True)
                              for c in dgy_loc))     # [L, PT] replicated
        if sa0 is not None:
            sa, wv = next(it), next(it)
            dev = jax.lax.axis_index(axis)
            S_loc = dd_add(S_loc, bc.dist_scalar_schur_rows(
                sa, wv, dev, Pn // D, axis))
        B0_ = next(it)
        L_loc, ok = bc.dist_cholesky(S_loc, Pn, axis, nb)
        LinvB = bc.dist_solve_tril(L_loc, B0_, Pn, axis, nb)
        return L_loc, LinvB, dgys, ok

    f = bc.shard_map(region, mesh=mesh, in_specs=tuple(specs),
                     out_specs=(P(axis, None), repl, repl, repl),
                     check_rep=False)
    L_loc, LinvB, dgys, ok = f(*args)
    LinvB = tuple(c[None] for c in LinvB)            # [1, P, F]
    return ("dist", L_loc), LinvB, dgys, ok


def _dist_solve(ds, cl, cholS, rhs, transpose=False):
    """shard_map region: L X = rhs / L^T X = rhs with the row-sharded
    factor from :func:`_dist_schur_region`. rhs [1, P, m] replicated."""
    from jax.sharding import PartitionSpec as P
    from ..parallel import bigcluster as bc

    mesh, axis, D, nb = _row_cfg(ds, cl)
    Pn = cl.nrows
    L_loc = cholS[1]
    r0 = tuple(c[0] for c in rhs)                    # [P, m]

    def region(L_loc, r0):
        if transpose:
            return bc.dist_solve_tril_t(L_loc, r0, Pn, axis, nb)
        return bc.dist_solve_tril(L_loc, r0, Pn, axis, nb)

    f = bc.shard_map(region, mesh=mesh,
                     in_specs=(P(axis, None), P()),
                     out_specs=P(), check_rep=False)
    out = f(L_loc, r0)
    return tuple(c[None] for c in out)               # [1, P, m]


def _schur_cluster(cl: _DevCluster, Xinvs, Ys, Xinv_s, Y_s, panels=None):
    """S^j (upper triangle mirrored), solver.jl:1062-1226. ``panels``
    (optional, per class) supplies precomputed (V^T X^-1 V, V^T Y V)."""
    J, P = cl.J, cl.nrows
    S = dl.dd_zeros((J, P, P), cl.nw, dtype=cl.dtype)
    for ki, (k, Xinv, Y) in enumerate(zip(cl.classes, Xinvs, Ys)):
        if k.kind == "lowrank":
            L, P_, T = k.li.shape
            if k.use_pairs:
                # gather-free pair path: S_pq = sum_{l,t1,t2}
                #   GXw[l, pt1, qt2] * GY[l, qt2, pt1]
                # with GXw/GY the (lam-weighted) term-table pairings
                # (:func:`_pairs_xy`) — pure GEMMs + reshapes, replacing
                # the serialized [L,P,T,P,T] panel gathers (round-4 hot
                # spot). lam and tmask are folded into the U tables.
                if panels is not None and panels[ki] is not None:
                    GXw, GY = panels[ki]
                else:
                    GXw, GY = _pairs_xy(k, Xinv, Y)
                gx5 = tuple(c.reshape(L, P_, T, P_, T) for c in GXw)
                gy5 = tuple(jnp.swapaxes(c, 1, 2)
                            .reshape(L, P_, T, P_, T)
                            for c in GY)              # GY^T[pt1, qt2]
                v = dd_mul(gx5, gy5)
                vt = tuple(jnp.moveaxis(c, 2, 3).reshape(L, P_, P_, T * T)
                           for c in v)
                contrib = dl.dd_sum(vt, axis=3)
                S = dd_add(S, dl.dd_sum(tuple(
                    c.reshape(J, k.Lc, P, P) for c in contrib), axis=1))
                continue
            if panels is not None and panels[ki] is not None:
                PX, PY = panels[ki]
            else:
                PX, PY = _panel_b(k, Xinv), _panel_b(k, Y)
            PYT = dl.dd_transpose_b(PY)
            # S_pq += sum_{l,t1,t2} lam[l,p,t1] lam[l,q,t2]
            #         * PX[l, li[l,p,t1], ri[l,q,t2]]
            #         * PY[l, li[l,q,t2], ri[l,p,t1]]
            # Contract one term axis at a time (loop over t1, vectorized
            # over t2): peak intermediate is [L,P,P,T] instead of the
            # [L,P,T,P,T] gather tensor — T times smaller, which is what
            # keeps three-point-scale problems (P in the hundreds) on chip.
            # The reference's analogue is the quadruple contraction loop
            # (solver.jl:1176-1212).
            lidx = jnp.arange(L)[:, None, None, None]
            li2 = k.li[:, None, :, :]                 # [L,1,P,T] (q,t2)
            ri2 = k.ri[:, None, :, :]
            lam2 = tuple(c[:, None, :, :] for c in k.lam)
            m2 = k.tmask[:, None, :, :]
            # Contract one term axis at a time (loop over t1, vectorized
            # over t2): peak intermediate [L,P,P,T] instead of
            # [L,P,T,P,T] — T times smaller, which keeps three-point-scale
            # problems (P in the hundreds) on chip
            contrib = None
            for t1 in range(T):
                li1 = k.li[:, :, t1, None, None]      # [L,P,1,1]
                ri1 = k.ri[:, :, t1, None, None]
                gx = tuple(c[lidx, li1, ri2] for c in PX)   # [L,P,P,T]
                gy = tuple(c[lidx, ri1, li2] for c in PYT)  # PY[li2,ri1]
                v = dd_mul(lam2, dd_mul(gx, gy))
                v = _dd_scale(v, m2 * k.tmask[:, :, t1, None, None])
                inner = dl.dd_sum(v, axis=3)          # [L,P,P]
                lam1 = tuple(c[:, :, t1, None] for c in k.lam)
                term = dd_mul(lam1, inner)
                contrib = term if contrib is None \
                    else dd_add(contrib, term)
            # reduce over each cluster's Lc blocks only -> [J, P, P]
            S = dd_add(S, dl.dd_sum(tuple(
                c.reshape(J, k.Lc, P, P) for c in contrib), axis=1))
        else:
            LP = k.L * P
            Af = tuple(c.reshape(LP, k.n, k.n) for c in k.A)
            Xr = tuple(jnp.repeat(c, P, axis=0) for c in Xinv)
            Yr = tuple(jnp.repeat(c, P, axis=0) for c in Y)
            XA = _bmm(Xr, Af)
            XAY = _bmm(XA, Yr)
            XAYb = tuple(c.reshape(k.L, P, k.n, k.n) for c in XAY)
            prod = dd_mul(tuple(c[:, :, None] for c in k.A),
                          tuple(c[:, None] for c in XAYb))      # [L,P,P,n,n]
            flat = tuple(c.reshape(J, k.Lc, P, P, -1) for c in prod)
            S = dd_add(S, dl.dd_sum(dl.dd_sum(flat, axis=4), axis=1))
    if cl.s_nb:
        w = dd_mul(Xinv_s, Y_s)                      # [J, Bs]
        t = dd_mul(cl.sa, tuple(c[:, :, None] for c in w))
        S = dd_add(S, _bmm(dl.dd_transpose_b(cl.sa), t))
    # fake padding clusters carry S = I so chol(S) stays well-posed
    S = (S[0] + (1.0 - cl.jmask)[:, None, None]
         * jnp.eye(P, dtype=S[0].dtype),) + S[1:]
    # keep the upper triangle, mirror it (reference: symmetric!(S), q>=p only)
    iu = jnp.triu(jnp.ones((P, P), dtype=bool))
    return tuple(jnp.where(iu, c, jnp.swapaxes(c, -1, -2)) for c in S)


def _dot_state(ds, A, B, keyX="X", keyXs="Xs", keyY="Y", keyYs="Ys"):
    tot = _scalar(0.0, ds.nw, ds.dtype)
    for j, cl in enumerate(ds.clusters):
        for k, Xb, Yb in zip(cl.classes, A[keyX][j], B[keyY][j]):
            tot = dd_add(tot, dl.dd_dot(_dd_scale(Xb, k.maskd), Yb))
        if cl.s_nb:
            tot = dd_add(tot, dl.dd_dot(
                _dd_scale(A[keyXs][j], cl.smask), B[keyYs][j]))
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


def _residuals(ds: DeviceSDP, state, panelsY=None):
    """P = sum_i x_i A_i - X - sign*C;  d = c - <A_*,Y> - By;
    p = sign*b - B^T x  (solver.jl:882-918). P is masked to the real block
    area (padding must stay inert). ``panelsY`` (optional, [j][ki]) reuses
    the V^T Y V pairings already computed for the Schur assembly."""
    x, y = state["x"], state["y"]
    Pres, Pres_s, dres = [], [], []
    for j, cl in enumerate(ds.clusters):
        wA, wA_s = _weighted_A_cluster(cl, x[j])
        Pc = [_dd_scale(dd_sub(dd_sub(wA[ki], state["X"][j][ki]),
                               _dd_scale(k.C, ds.sign)), k.maskd)
              for ki, k in enumerate(cl.classes)]
        Pres.append(Pc)
        if cl.s_nb:
            Ps = dd_sub(dd_sub(wA_s, state["Xs"][j]), _dd_scale(cl.sC, ds.sign))
            Pres_s.append(_dd_scale(Ps, cl.smask))
        else:
            Pres_s.append(dl.dd_zeros((cl.J, 0), ds.nw, dtype=ds.dtype))
        yb = tuple(jnp.broadcast_to(c[None, :, None],
                                    (cl.J, c.shape[0], 1)) for c in y)
        By = _bmm(cl.B, yb)                                     # [J, P, 1]
        d_j = dd_sub(dd_sub(cl.c, tuple(c[:, :, 0] for c in By)),
                     _trace_A_cluster(cl, state["Y"][j], state["Ys"][j],
                                      panels=None if panelsY is None
                                      else panelsY[j]))
        dres.append(d_j)
    pres = _dd_scale(ds.b, ds.sign)
    for j, cl in enumerate(ds.clusters):
        Bf = tuple(c.reshape(cl.J * cl.nrows, -1) for c in cl.B)
        xf = tuple(c.reshape(cl.J * cl.nrows, 1) for c in x[j])
        Btx = dl.dd_matmul(dl.dd_transpose(Bf), xf)
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
        for k, Yb in zip(cl.classes, state["Y"][j]):
            CY = dd_add(CY, dl.dd_dot(k.C, Yb))       # C is zero on padding
        if cl.s_nb:
            CY = dd_add(CY, dl.dd_dot(cl.sC, state["Ys"][j]))
    by = dl.dd_dot(ds.b, y)
    p_obj = dd_add(dd_add(CY, by), ds.constant)
    diff = dd_sub(d_obj, p_obj)
    gap_num = jnp.abs(_f64sum(diff))
    denom = jnp.maximum(1.0, jnp.abs(_f64sum(d_obj) + _f64sum(p_obj)))
    gap = gap_num / denom
    return d_obj, p_obj, gap


def _errors(Pres, Pres_s, pres, dres):
    """Error maxima (solver.jl:806-847): P_error = max |P| (matrix dual
    residual), p_error = max |p| (free-variable dual residual), d_error =
    max |d| (primal residual). dual_error = max(P, p) and primal_error = d
    drive the feasibility thresholds, as in the reference."""
    P_error = _max_abs_all(Pres, Pres_s)
    p_error = dl.dd_max_abs(pres)
    dual_error = jnp.maximum(P_error, p_error)
    primal_error = jnp.float64(0.0)
    for d_j in dres:
        primal_error = jnp.maximum(primal_error, dl.dd_max_abs(d_j))
    return dual_error, primal_error, P_error, p_error


# step-length eigenvalue backend: None = pick by JAX backend (verified-f32
# on TPU, f64 eigvalsh elsewhere); tests override to exercise the verified
# path on CPU.
_STEPLEN_VERIFIED = None


def _use_verified_eig():
    if _STEPLEN_VERIFIED is not None:
        return _STEPLEN_VERIFIED
    return on_tpu()


def _eig_lo_verified(W2):
    """Verified lower eigenvalue bound from an f32 eigendecomposition.

    On TPU there is no f64 LAPACK, and the round-1/2 design used f32
    eigvalsh with a blanket 1e-5 safety margin — which capped the
    achievable duality gap. Instead: take the f32 eigenpairs (lam, V) as a
    CANDIDATE decomposition and certify it with exact expansion
    arithmetic. With E = A - V diag(lam) V^T and delta = ||V^T V - I||:

        V diag(lam) V^T - lam_min I = V (diag(lam) - lam_min) V^T
                                      + lam_min (V V^T - I)
                                  >=  -|lam_min| * delta * I
        =>  lambda_min(A) >= lam_min - |lam_min| * delta - ||E||_2

    E is evaluated with exact int8-limb GEMMs (V*lam as an exact 2-word
    product) and both norms are bounded by Frobenius norms, so the bound
    holds up to the ~1e-15-relative evaluation of the norm sums — a
    per-matrix certificate replacing the blanket margin. (The reference's
    own step length is UNVERIFIED Float64 Lanczos, solver.jl:1659; this is
    strictly stronger.)"""
    from ..dd.limb_gemm import fx_matmul, mac_scale

    nw = len(W2)
    A32 = W2[0]
    for c in W2[1:]:
        A32 = A32 + c
    A32 = 0.5 * (A32 + jnp.swapaxes(A32, -1, -2))
    lam, V = jnp.linalg.eigh(A32)                    # [B,n] asc, [B,n,n]
    lmin = lam[:, 0].astype(jnp.float64)
    # E = A - (V*lam) V^T ; V*lam as an exact double-f32 product
    p, e = two_prod(V, lam[:, None, :].astype(V.dtype))
    z = jnp.zeros_like(p)
    VD = (p, e) + (z,) * (nw - 2)
    Vt = jnp.swapaxes(V, -1, -2)
    with mac_scale(V.shape[0]):
        M = jax.vmap(lambda a, b: fx_matmul(a, b))(VD, (Vt,))
    E = dd_sub(W2, M)
    Ev = E[0].astype(jnp.float64)
    for c in E[1:]:
        Ev = Ev + c.astype(jnp.float64)
    eta = jnp.sqrt(jnp.sum(Ev * Ev, axis=(-2, -1)))
    with mac_scale(V.shape[0]):
        G = jax.vmap(lambda a, b: fx_matmul(a, b, nw=2))((Vt,), (V,))
    G0 = G[0] - jnp.eye(V.shape[-1], dtype=V.dtype)  # exact near 1
    Gv = G0.astype(jnp.float64) + G[1].astype(jnp.float64)
    delta = jnp.sqrt(jnp.sum(Gv * Gv, axis=(-2, -1)))
    slack = 1.0 + 1e-12                              # norm-evaluation margin
    return lmin - slack * (jnp.abs(lmin) * delta + eta)


def _eig_lo_bound(W2, eig_safety):
    """Lower eigenvalue bounds of symmetrized L^-1 dM L^-T batches:
    certified-f32 on TPU (:func:`_eig_lo_verified`, f32 substrate), float64
    eigh elsewhere (the reference uses Float64 Lanczos, solver.jl:1659)."""
    if _use_verified_eig() and W2[0].dtype == jnp.float32:
        return _eig_lo_verified(W2)
    A64 = W2[0].astype(jnp.float64)
    for c in W2[1:]:
        A64 = A64 + c.astype(jnp.float64)
    A64 = 0.5 * (A64 + jnp.swapaxes(A64, -1, -2))
    if on_tpu():
        # f64 words on TPU = the (warned) unsound-emulation path; no f64
        # LAPACK there, so fall back to f32 eigvalsh + a blanket margin
        eigs = jnp.linalg.eigvalsh(
            A64.astype(jnp.float32)).astype(jnp.float64)
        safety = 1e-5
    else:
        eigs = jnp.linalg.eigvalsh(A64)
        safety = eig_safety
    lo = eigs[:, 0]
    return lo - safety * (1.0 + jnp.abs(lo))


def _step_lengths(ds, state, dX, dXs, dY, dYs, cholX, cholY, gamma,
                  eig_safety):
    """(alpha_d, alpha_p) = max steps keeping X + a dX and Y + a dY PSD,
    via min eig of L^-1 dM L^-T (solver.jl:1618-1693). chol(X) AND chol(Y)
    are REUSED from the factorization phase (one [2L] kernel there), and
    the X/Y triangular solves + eigensolves run as ONE batched kernel over
    [2L] (the two sides are independent until the final minima). Padded
    area: M diagonal is 1 and dM is 0 there, so padding contributes zero
    eigenvalues, which never tighten alpha below its real value."""
    min_d = jnp.float64(jnp.inf)
    min_p = jnp.float64(jnp.inf)
    ok = jnp.bool_(True)

    def scalar_min(cur, Mb, dMb, mask):
        e = (_f64sum(dd_take(dMb, slice(None), 0, 0))
             / _f64sum(dd_take(Mb, slice(None), 0, 0)))
        e = jnp.where(mask > 0, e, jnp.inf)
        return jnp.minimum(cur, jnp.min(e))

    for j, cl in enumerate(ds.clusters):
        for ki, k in enumerate(cl.classes):
            Xb, Yb = state["X"][j][ki], state["Y"][j][ki]
            dXb, dYb = dX[j][ki], dY[j][ki]
            if k.n == 1:
                min_d = scalar_min(min_d, Xb, dXb, k.maskdiag[:, 0])
                min_p = scalar_min(min_p, Yb, dYb, k.maskdiag[:, 0])
                continue
            L2 = tuple(jnp.concatenate([a, b], 0)
                       for a, b in zip(cholX[j][ki], cholY[j][ki]))
            dM2 = tuple(jnp.concatenate([a, b], 0) for a, b in zip(dXb, dYb))
            W = _bsolve_tril(L2, dM2)
            W2 = _bsolve_tril(L2, dl.dd_transpose_b(W))
            lo = _eig_lo_bound(W2, eig_safety)
            min_d = jnp.minimum(min_d, jnp.min(lo[:k.L]))
            min_p = jnp.minimum(min_p, jnp.min(lo[k.L:]))
        if cl.s_nb:
            e = _f64sum(dXs[j]) / _f64sum(state["Xs"][j])
            e = jnp.where(cl.smask > 0, e, jnp.inf)
            min_d = jnp.minimum(min_d, jnp.min(e))
            e = _f64sum(dYs[j]) / _f64sum(state["Ys"][j])
            e = jnp.where(cl.smask > 0, e, jnp.inf)
            min_p = jnp.minimum(min_p, jnp.min(e))
    a_d = jnp.where(min_d > -gamma, jnp.float64(1.0), -gamma / min_d)
    a_p = jnp.where(min_p > -gamma, jnp.float64(1.0), -gamma / min_p)
    return a_d, a_p, ok


_USE_PLMAP = None  # test override: force (True) / disable (False) the fused path


def _use_plmap(dt):
    """Fuse per-class elementwise expansion chains into single Pallas
    kernels on the f32 TPU substrate (dozens of ~0.35us whole-tensor XLA
    ops become one kernel of VPU instructions; dd/pallas_linalg.pl_map).

    `_USE_PLMAP` lets CI force this TPU-gated branch on CPU, where the
    kernels run under the Pallas interpreter (the round-3 bench crash was
    in exactly this branch, which no CPU test could reach)."""
    if _USE_PLMAP is not None:
        return _USE_PLMAP and dt == jnp.float32
    return dt == jnp.float32 and on_tpu()


def _bcast_words(ws, L, nw=None):
    """Scalar expansion -> [L,1,1]-broadcast word tuple for pl_map args."""
    out = tuple(jnp.broadcast_to(jnp.reshape(c, (1, 1, 1)), (L, 1, 1))
                for c in ws)
    return out if nw is None else out[:nw]


def _axpy_state(state, dx, dy, dX, dY, dXs, dYs, alpha_d, alpha_p):
    dt = state["y"][0].dtype
    nw = len(state["y"])
    ad = _scalar_split(alpha_d, nw, dt)
    ap = _scalar_split(alpha_p, nw, dt)
    if _use_plmap(dt):
        from ..dd import expops as E
        from ..dd.pallas_linalg import pl_map

        def fma(Mb, dMb, a3):
            L = Mb[0].shape[0]

            def f(x, d, a):
                z = a[0] * np.float32(0.0)
                return E.exp_add(x, E.exp_mul(d, a + (z,) * (nw - len(a))))

            return pl_map(f, nw, [Mb, dMb, _bcast_words(a3, L, 3)])

        X = [[fma(Xb, dXb, ad) for Xb, dXb in zip(Xc, dXc)]
             for Xc, dXc in zip(state["X"], dX)]
        Y = [[fma(Yb, dYb, ap) for Yb, dYb in zip(Yc, dYc)]
             for Yc, dYc in zip(state["Y"], dY)]
    else:
        X = [[dd_add(Xb, dd_mul(dXb, ad)) for Xb, dXb in zip(Xc, dXc)]
             for Xc, dXc in zip(state["X"], dX)]
        Y = [[dd_add(Yb, dd_mul(dYb, ap)) for Yb, dYb in zip(Yc, dYc)]
             for Yc, dYc in zip(state["Y"], dY)]
    x = [dd_add(xj, dd_mul(dxj, ad)) for xj, dxj in zip(state["x"], dx)]
    y = dd_add(state["y"], dd_mul(dy, ap))
    Xs = [dd_add(a, dd_mul(b, ad)) for a, b in zip(state["Xs"], dXs)]
    Ys = [dd_add(a, dd_mul(b, ap)) for a, b in zip(state["Ys"], dYs)]
    return {"x": x, "y": y, "X": X, "Y": Y, "Xs": Xs, "Ys": Ys}


# ---------------------------------------------------------------------------
# assess + step factories
# ---------------------------------------------------------------------------

def make_assess(ds: DeviceSDP):
    def assess(state):
        Pres, Pres_s, pres, dres = _residuals(ds, state)
        dual_error, primal_error, P_error, p_error = _errors(
            Pres, Pres_s, pres, dres)
        d_obj, p_obj, gap = _objectives(ds, state)
        mu_dd = dd_div(_dot_state(ds, state, state),
                       _scalar(float(ds.total_size), ds.nw, ds.dtype))
        return {
            "dual_error": dual_error,
            "primal_error": primal_error,
            "P_error": P_error,
            "p_error": p_error,
            "d_obj": _f64sum(d_obj),
            "p_obj": _f64sum(p_obj),
            "dual_gap": gap,
            "mu": _f64sum(mu_dd),
        }

    return jax.jit(assess)


def make_step_body(ds: DeviceSDP, *, gamma: float, beta_feasible: float,
                   beta_infeasible: float, dual_error_threshold: float,
                   primal_error_threshold: float, safe_step: bool = True,
                   correctoronly: bool = False, eig_safety: float = 1e-12):
    """Build the (unjitted) one-iteration function."""

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
            bw = _scalar_split(beta_infeasible, nw, dt)
            mu_p = dd_mul(mu, tuple(jnp.where(pd_feas_prev, 0.0, w)
                                    for w in bw))

        # chol(X)+chol(Y) per class as ONE [2L] batched kernel
        # (solver.jl:387-400, 1117-1119 for X; the Y factor is consumed by
        # the step-length phase, solver.jl:1644 — both iterates are
        # available now, so the two factorizations share one dispatch);
        # the factors are kept for the step-length phase (reused there)
        Xinv, Xinv_s, cholX, cholY = [], [], [], []
        for j, cl in enumerate(ds.clusters):
            xi, lc, ly = [], [], []
            for ki, k in enumerate(cl.classes):
                M2 = tuple(jnp.concatenate([a, b], 0)
                           for a, b in zip(X[j][ki], Y[j][ki]))
                L2, okb = _bchol(M2)
                ok = ok & jnp.all(okb)
                ok_X = ok_X & jnp.all(okb[:k.L])
                Lc = tuple(c[:k.L] for c in L2)
                ly.append(tuple(c[k.L:] for c in L2))
                eye = dl.dd_eye(k.n, nw, dtype=dt)
                eye_b = tuple(jnp.broadcast_to(c, (k.L, k.n, k.n))
                              for c in eye)
                inv = _bsolve_cholesky(Lc, eye_b)
                xi.append(dl.dd_symmetrize(inv))
                lc.append(Lc)
            Xinv.append(xi)
            cholX.append(lc)
            cholY.append(ly)
            if cl.s_nb:
                ok = ok & jnp.all(Xs[j][0] > 0)
                Xinv_s.append(dd_div(_scalar(jnp.ones((cl.J, cl.s_nb)),
                                             nw, dt), Xs[j]))
            else:
                Xinv_s.append(dl.dd_zeros((cl.J, 0), nw, dtype=dt))

        # XY products (shared by the predictor and corrector R) and the
        # bilinear pairing panels (shared by Schur and the d-residual)
        XYs, panels = [], []
        for j, cl in enumerate(ds.clusters):
            xyc, pc = [], []
            for ki, k in enumerate(cl.classes):
                xyc.append(_bmm(X[j][ki], Y[j][ki]))
                if k.kind != "lowrank" or cl.row_shard:
                    # row-sharded clusters get their pairings (and the
                    # trace diag) from the distributed Schur region below
                    pc.append(None)
                elif k.use_pairs:
                    pc.append(_pairs_xy(k, Xinv[j][ki], Y[j][ki]))
                else:
                    pc.append(_panels_xy(k, Xinv[j][ki], Y[j][ki]))
            XYs.append(xyc)
            panels.append(pc)
        panelsY = [[None if pc is None else pc[1] for pc in pj]
                   for pj in panels]

        # R = mu I - X Y [- dX dY] (solver.jl:961-983); masked on padding
        use_pl = _use_plmap(dt)

        def _residual_R(mu_val, corr=None):
            Rs, Rs_s = [], []
            for j, cl in enumerate(ds.clusters):
                Rc = []
                for ki, k in enumerate(cl.classes):
                    XY = XYs[j][ki]
                    if corr is not None:
                        dXdY = _bmm(corr[0][j][ki], corr[1][j][ki])
                    if use_pl:
                        from ..dd import expops as E
                        from ..dd.pallas_linalg import pl_map

                        eye1 = (jnp.broadcast_to(
                            jnp.eye(k.n, dtype=dt), (k.L, k.n, k.n)),)
                        mask1 = (k.maskd,)
                        muB = _bcast_words(mu_val, k.L)

                        def f(mu, eye, mask, xy, *dxdy):
                            muI = tuple(mw * eye[0] for mw in mu)  # exact
                            r = E.exp_sub(muI, xy)
                            if dxdy:
                                r = E.exp_sub(r, dxdy[0])
                            return tuple(c * mask[0] for c in r)

                        args = [muB, eye1, mask1, XY]
                        if corr is not None:
                            args.append(dXdY)
                        Rc.append(pl_map(f, nw, args))
                        continue
                    eye = dl.dd_eye(k.n, nw, dtype=dt)
                    eye_b = tuple(jnp.broadcast_to(c, (k.L, k.n, k.n))
                                  for c in eye)
                    Rb = dd_sub(dd_mul(mu_val, eye_b), XY)
                    if corr is not None:
                        Rb = dd_sub(Rb, dXdY)
                    Rc.append(_dd_scale(Rb, k.maskd))
                Rs.append(Rc)
                if cl.s_nb:
                    Rb = dd_sub(dd_mul(mu_val,
                                       _scalar(jnp.ones((cl.J, cl.s_nb)),
                                               nw, dt)),
                                dd_mul(Xs[j], Ys[j]))
                    if corr is not None:
                        Rb = dd_sub(Rb, dd_mul(corr[2][j], corr[3][j]))
                    Rs_s.append(_dd_scale(Rb, cl.smask))
                else:
                    Rs_s.append(dl.dd_zeros((cl.J, 0), nw, dtype=dt))
            return Rs, Rs_s

        R, R_s = _residual_R(mu_p)

        # Schur complement per cluster + KKT decomposition (solver.jl:1229-1287)
        cholSs, LinvBs = [], []
        for j, cl in enumerate(ds.clusters):
            if cl.row_shard:
                # distributed row-panel Schur + chol(S) + L^-1 B
                # (parallel/bigcluster.py; the reference's threaded
                # whole-S^j GEMM/Cholesky, src/tools.jl:175-266)
                L, LinvB, dgys, okb = _dist_schur_region(
                    ds, cl, Xinv[j], Y[j], Xinv_s[j], Ys[j])
                it_d = iter(dgys)
                for ki, k in enumerate(cl.classes):
                    if k.kind == "lowrank":
                        panelsY[j][ki] = ("diag", next(it_d))
                ok = ok & okb
                ok_S = ok_S & okb
                cholSs.append(L)
                LinvBs.append(LinvB)
                continue
            S = _schur_cluster(cl, Xinv[j], Y[j], Xinv_s[j], Ys[j],
                               panels=panels[j])
            L, okb = dl.b_cholesky(S)
            okb = jnp.all(okb)
            ok = ok & okb
            ok_S = ok_S & okb
            LinvB = dl.b_solve_tril(L, cl.B)                    # [J, P, F]
            cholSs.append(L)
            LinvBs.append(LinvB)
        Q = dl.dd_zeros((ds.nfree, ds.nfree), nw, dtype=dt)
        for LinvB in LinvBs:
            # Q = sum_j LinvB_j^T LinvB_j as ONE GEMM over the vcat of all
            # clusters in the group (the reference's vcat+GEMM,
            # solver.jl:1264-1271); across groups it stays an accumulation
            Bf = tuple(c.reshape(c.shape[0] * c.shape[1], c.shape[2])
                       for c in LinvB)
            Q = dd_add(Q, dl.dd_matmul(dl.dd_transpose(Bf), Bf))
        cholQ, okq = dl.s_cholesky(Q)
        ok = ok & okq

        # residuals for the current point (solver.jl:413-417)
        Pres, Pres_s, pres, dres = _residuals(ds, state, panelsY=panelsY)
        dual_error, primal_error, P_error, p_error = _errors(
            Pres, Pres_s, pres, dres)
        pd_feas_now = (dual_error < dual_error_threshold) & \
                      (primal_error < primal_error_threshold)

        # P*Y is invariant across the predictor and corrector directions
        # (P and Y are fixed within an iteration) — compute it once
        PYprod = [[_bmm(Pres[j][ki], Y[j][ki])
                   for ki in range(len(cl.classes))]
                  for j, cl in enumerate(ds.clusters)]

        def search_direction(Rcur, Rcur_s):
            # Z = X^-1 (P Y - R), symmetrized (solver.jl:1499-1515)
            Zs, Zs_s = [], []
            for j, cl in enumerate(ds.clusters):
                Zc = []
                for ki, k in enumerate(cl.classes):
                    PY_ = PYprod[j][ki]
                    Zb = _bmm(Xinv[j][ki], dd_sub(PY_, Rcur[j][ki]))
                    Zc.append(dl.dd_symmetrize(Zb))
                Zs.append(Zc)
                if cl.s_nb:
                    Zs_s.append(dd_mul(Xinv_s[j],
                                       dd_sub(dd_mul(Pres_s[j], Ys[j]), Rcur_s[j])))
                else:
                    Zs_s.append(dl.dd_zeros((cl.J, 0), nw, dtype=dt))
            # rhs_x = -d - <A_*, Z>  (solver.jl:1519-1525)
            rhs_x = []
            for j, cl in enumerate(ds.clusters):
                tA = _trace_A_cluster(cl, Zs[j], Zs_s[j])
                rhs_x.append(dd_sub(dd_neg(dres[j]), tA))
            # 3-stage triangular solve (solver.jl:1527-1582); per-cluster
            # solves batch over the group's [J] axis
            temp_x, temp_y = [], []
            for j, cl in enumerate(ds.clusters):
                rhs3 = tuple(c[:, :, None] for c in rhs_x[j])
                if cl.row_shard:
                    tx = _dist_solve(ds, cl, cholSs[j], rhs3)
                else:
                    tx = dl.b_solve_tril(cholSs[j], rhs3)
                ty = _bmm(dl.dd_transpose_b(LinvBs[j]), tx)     # [J, F, 1]
                temp_x.append(tx)
                temp_y.append(ty)
            dy = _col(pres)
            for ty in temp_y:
                dy = dd_sub(dy, dl.dd_sum(ty, axis=0))
            dy = dl.s_solve_cholesky(cholQ, dy)
            dx = []
            for j, cl in enumerate(ds.clusters):
                dyb = tuple(jnp.broadcast_to(c[None], (cl.J,) + c.shape)
                            for c in dy)
                t = dd_add(temp_x[j], _bmm(LinvBs[j], dyb))
                if cl.row_shard:
                    dxj = _dist_solve(ds, cl, cholSs[j], t, transpose=True)
                else:
                    dxj = dl.b_solve_tril_t(cholSs[j], t)       # [J, P, 1]
                dx.append(tuple(c[:, :, 0] for c in dxj))
            dy = _col0(dy)
            # dX = sum_i dx_i A_i + P (solver.jl:1585-1594)
            dX, dXs = [], []
            for j, cl in enumerate(ds.clusters):
                wA, wA_s = _weighted_A_cluster(cl, dx[j])
                dX.append([dd_add(w, Pb) for w, Pb in zip(wA, Pres[j])])
                dXs.append(dd_add(wA_s, Pres_s[j]) if cl.s_nb
                           else dl.dd_zeros((cl.J, 0), nw, dtype=dt))
            # dY = X^-1 (R - dX Y), symmetrized (solver.jl:1597-1613)
            dY, dYs = [], []
            for j, cl in enumerate(ds.clusters):
                dYc = []
                for ki, k in enumerate(cl.classes):
                    dXY = _bmm(dX[j][ki], Y[j][ki])
                    dYb = _bmm(Xinv[j][ki], dd_sub(Rcur[j][ki], dXY))
                    dYc.append(dl.dd_symmetrize(dYb))
                dY.append(dYc)
                if cl.s_nb:
                    dYs.append(dd_mul(Xinv_s[j],
                                      dd_sub(Rcur_s[j], dd_mul(dXs[j], Ys[j]))))
                else:
                    dYs.append(dl.dd_zeros((cl.J, 0), nw, dtype=dt))
            return dx, dy, dX, dY, dXs, dYs

        # predictor (solver.jl:420-425)
        dx, dy, dX, dY, dXs, dYs = search_direction(R, R_s)

        # corrector mu (solver.jl:429-434): r = <X+dX, Y+dY>/(mu K),
        # ONE trace dot on the summed iterates instead of four (bilinearity)
        if use_pl:
            from ..dd import expops as E
            from ..dd.pallas_linalg import pl_map

            def _padd(a, b):
                return pl_map(lambda x, d: E.exp_add(x, d), nw, [a, b])
        else:
            _padd = dd_add
        sstate = {
            "X": [[_padd(Xb, dXb) for Xb, dXb in zip(Xc, dXc)]
                  for Xc, dXc in zip(state["X"], dX)],
            "Y": [[_padd(Yb, dYb) for Yb, dYb in zip(Yc, dYc)]
                  for Yc, dYc in zip(state["Y"], dY)],
            "Xs": [dd_add(a, b) for a, b in zip(state["Xs"], dXs)],
            "Ys": [dd_add(a, b) for a, b in zip(state["Ys"], dYs)],
        }
        r_num = _dot_state(ds, sstate, sstate)
        r_val = _f64sum(r_num) / (_f64sum(mu) * K)
        beta = jnp.where(r_val < 1.0, r_val ** 2, r_val)
        beta_c = jnp.where(pd_feas_now,
                           jnp.minimum(jnp.maximum(beta_feasible, beta), 1.0),
                           jnp.maximum(beta_infeasible, beta))
        mu_c = dd_mul(mu, _scalar_split(beta_c, nw, dt))

        # corrector direction (solver.jl:438-456)
        Rc, Rc_s = _residual_R(mu_c, corr=(dX, dY, dXs, dYs))
        dx, dy, dX, dY, dXs, dYs = search_direction(Rc, Rc_s)

        # step lengths (solver.jl:460-465)
        alpha_d, alpha_p, ok_a = _step_lengths(
            ds, state, dX, dXs, dY, dYs, cholX, cholY, gamma, eig_safety)
        ok = ok & ok_a
        if safe_step:
            a = jnp.minimum(alpha_p, alpha_d)
            alpha_p = jnp.where(pd_feas_now, a, alpha_p)
            alpha_d = jnp.where(pd_feas_now, a, alpha_d)

        new_state = _axpy_state(state, dx, dy, dX, dY, dXs, dYs, alpha_d, alpha_p)
        d_obj, p_obj, gap = _objectives(ds, new_state)

        info = {
            "mu": _f64sum(mu),
            "dual_error": dual_error,
            "primal_error": primal_error,
            "P_error": P_error,
            "p_error": p_error,
            "pd_feas": pd_feas_now,
            "alpha_d": alpha_d,
            "alpha_p": alpha_p,
            "beta_c": beta_c,
            "d_obj": _f64sum(d_obj),
            "p_obj": _f64sum(p_obj),
            "dual_gap": gap,
            "ok": ok,
            "ok_X": ok_X,
            "ok_S": ok_S,
            "ok_Q": okq,
        }
        return new_state, info

    return step


def make_step(ds: DeviceSDP, **kw):
    """Build the jitted one-iteration function."""
    return jax.jit(make_step_body(ds, **kw))


def make_run_chunk(ds: DeviceSDP, *, duality_gap_threshold: float,
                   need_dual_feasible: bool = False,
                   need_primal_feasible: bool = False,
                   step_length_threshold: float = 1e-7,
                   max_complementary_gap: float = 1e100, **step_kw):
    """Device-side bounded solve loop: up to ``nmax`` IPM iterations in ONE
    dispatch (a `lax.while_loop` around the step body).

    TPU-first replacement for calling the jitted step once per iteration
    from the host: on a tunneled/remote chip each dispatch costs link
    latency comparable to the iteration itself, and the reference's
    per-iteration host control (solver.jl:348-593) would serialize on it.
    Termination, failure handling ("return the current iterate"), and the
    error codes 1/3/4 are evaluated on device with the same semantics as
    the host loop; codes 0/2 remain host-side decisions.

    Returns a jitted ``run(state, pd_feas, info, nmax) ->
    (state, pd_feas, info, it_done, code, done)`` where ``it_done`` counts
    committed iterations, ``code`` is 0/1/3/4, and ``done`` says the device
    loop stopped for a reason other than exhausting ``nmax``.
    """
    body = make_step_body(ds, **step_kw)
    dual_error_threshold = step_kw.get("dual_error_threshold", 1e-30)
    primal_error_threshold = step_kw.get("primal_error_threshold", 1e-30)
    correctoronly = step_kw.get("correctoronly", False)

    def run(state, pd_feas, info, nmax):
        def cond(carry):
            _, _, _, it, _, done = carry
            return (~done) & (it < nmax)

        def loop_body(carry):
            state, pd_feas, info_prev, it, code, _ = carry
            new_state, info = body(state, pd_feas)
            okstep = info["ok"] & jnp.isfinite(info["mu"])
            alpha_ok = jnp.minimum(info["alpha_d"], info["alpha_p"]) \
                >= step_length_threshold
            commit = okstep & alpha_ok
            state2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(commit, a, b), new_state, state)
            info2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(commit, a, b), info, info_prev)
            pd_feas2 = jnp.where(commit, info["pd_feas"], pd_feas)
            it2 = it + commit.astype(jnp.int32)
            # termination with the updated errors (the host checks these at
            # the top of the next iteration; same decision point)
            term = jnp.bool_(False)
            if need_dual_feasible:
                term |= info2["dual_error"] < dual_error_threshold
            if need_primal_feasible:
                term |= info2["primal_error"] < primal_error_threshold
            if not correctoronly:
                term |= ((info2["dual_error"] < dual_error_threshold)
                         & (info2["primal_error"] < primal_error_threshold)
                         & (info2["dual_gap"] < duality_gap_threshold))
            mu_exceeded = info2["mu"] > max_complementary_gap
            code2 = jnp.where(
                code != 0, code,
                jnp.where(~okstep, 1,
                          jnp.where(~alpha_ok, 4,
                                    jnp.where(mu_exceeded, 3, 0))))
            done2 = (~commit) | term | mu_exceeded
            return (state2, pd_feas2, info2, it2, code2, done2)

        carry = (state, pd_feas, info, jnp.int32(0), jnp.int32(0),
                 jnp.bool_(False))
        state, pd_feas, info, it, code, done = lax.while_loop(
            cond, loop_body, carry)
        return state, pd_feas, info, it, code, done

    return jax.jit(run)
