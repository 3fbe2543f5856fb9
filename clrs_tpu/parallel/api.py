"""Multi-chip sharding of the IPM over a jax.sharding.Mesh.

The framework's shard axes (SURVEY.md section 2.10/5; the reference is
single-process threaded, src/threadinginfo.jl — these axes are the TPU-mesh
replacements for its `Threads.@threads for (j,l)` loops):

- the size-class BLOCK axis [L]: the compiler batches same-shaped PSD
  blocks of a cluster into [L, n, n] classes (solver/step.py), which is
  exactly the reference's (j, l) block-parallel axis. Sharding it makes
  every per-block kernel (chol(X), X^-1, bilinear panels, R, updates,
  step-length solves) device-local; XLA inserts a psum where the class
  axis is contracted — the Schur-assembly term reduction and the trace_A
  sums (the reference's serial cross-thread reductions,
  src/solver.jl:907-909, 1264-1271).
- the scalar-pack axis [Bs]: all 1x1 blocks of a cluster (LP cones),
  data-parallel the same way.

Per-cluster Schur/chol(S)/L^-1 B stay cluster-local by construction (the
clusters are a Python-level loop, each a separate subgraph); the only
cross-cluster coupling is the free-variable reduction
Q = sum_j (L^-1 B)_j^T (L^-1 B)_j (src/solver.jl:1264-1271) and the scalar
reductions (mu, error maxima, min step-length eigenvalue,
src/solver.jl:1684-1686), matching the reference's communication structure.

Only axes whose size is a multiple of the mesh size are sharded (GSPMD
device_put requires divisibility); :func:`shard_device_sdp` /
:func:`shard_state` RAISE if that leaves nothing sharded — a dryrun that
silently falls back to full replication reports nothing about sharding.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_device_sdp", "shard_state",
           "enable_row_sharding", "multi_cluster_test_problem",
           "BLOCK_AXIS"]

BLOCK_AXIS = "blk"


def make_mesh(n_devices: int, axis: str = BLOCK_AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (falls back to
    the CPU backend's devices when the default backend has too few — the
    virtual-device dryrun path)."""
    devs = jax.devices()
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))


def _put(words, sharding):
    return tuple(jax.device_put(c, sharding) for c in words)


def _axis_spec(mesh, axis, i, ndim):
    """NamedSharding placing ``axis`` on dim ``i`` of an ndim array."""
    return NamedSharding(mesh, P(*([None] * i + [axis]
                                   + [None] * (ndim - i - 1))))


def _shard_class(k, cl, mesh, axis, n):
    """Class block axis [J*Lc] shardable? jslot-major flattening means a
    J-divisible mesh split keeps whole clusters device-local."""
    return k.L % n == 0 and k.L >= n > 1


def _shard_j(cl, n):
    return cl.J % n == 0 and cl.J >= n > 1


def _shard_bs(cl, n):
    return bool(cl.s_nb) and cl.s_nb % n == 0 and cl.s_nb >= n > 1


def shard_device_sdp(ds, mesh: Mesh, axis: str = BLOCK_AXIS) -> int:
    """Shard the DeviceSDP constants in place.

    Axes, in order of preference per cluster group:
    - the CLUSTER axis [J] (same-signature clusters stacked by DeviceSDP):
      all cluster-level arrays (c, B, scalar packs) shard over it, and the
      flattened class block axis [J*Lc] shards with per-device cluster
      locality (jslot-major). This is the reference's `Threads.@threads
      for j` parallelism (src/solver.jl:1244-1261) as a mesh axis; the Q
      reduction becomes the one cross-device collective.
    - the class BLOCK axis [J*Lc] alone (few-cluster problems): per-block
      kernels device-local, Schur/trace contractions psum.
    - the scalar-pack axis [Bs].

    Build the DeviceSDP with ``mesh_divisor=n`` to make axes divisible
    (inert fake blocks/clusters pad them). Returns the number of sharded
    axes; raises if zero (silent full replication)."""
    n = mesh.shape[axis]

    def spec(i, ndim):
        return _axis_spec(mesh, axis, i, ndim)

    repl = NamedSharding(mesh, P())
    sharded = 0
    for cl in ds.clusters:
        for k in cl.classes:
            if _shard_class(k, cl, mesh, axis, n):
                k.C = _put(k.C, spec(0, 3))
                k.maskd = jax.device_put(k.maskd, spec(0, 3))
                k.maskdiag = jax.device_put(k.maskdiag, spec(0, 2))
                if k.kind == "lowrank":
                    k.V = _put(k.V, spec(0, 3))
                    k.lam = _put(k.lam, spec(0, 3))
                    k.li = jax.device_put(k.li, spec(0, 3))
                    k.ri = jax.device_put(k.ri, spec(0, 3))
                    k.tmask = jax.device_put(k.tmask, spec(0, 3))
                    k.Ul = _put(k.Ul, spec(0, 3))
                    k.Ur = _put(k.Ur, spec(0, 3))
                else:
                    k.A = _put(k.A, spec(0, 4))
                sharded += 1
        if _shard_j(cl, n):
            cl.c = _put(cl.c, spec(0, 2))
            cl.B = _put(cl.B, spec(0, 3))
            cl.jmask = jax.device_put(cl.jmask, spec(0, 1))
            if cl.s_nb:
                cl.sa = _put(cl.sa, spec(0, 3))
                cl.sC = _put(cl.sC, spec(0, 2))
                cl.smask = jax.device_put(cl.smask, spec(0, 2))
            sharded += 1
        else:
            cl.c = _put(cl.c, repl)
            cl.B = _put(cl.B, repl)
            cl.jmask = jax.device_put(cl.jmask, repl)
            if _shard_bs(cl, n):
                cl.sa = _put(cl.sa, spec(1, 3))
                cl.sC = _put(cl.sC, spec(1, 2))
                cl.smask = jax.device_put(cl.smask, spec(1, 2))
                sharded += 1
    if sharded == 0:
        raise ValueError(
            "no cluster, class, or scalar-pack axis was shardable over "
            f"this mesh (mesh size {n}); refusing to dryrun a fully "
            "replicated model")
    return sharded


def shard_state(ds, state, mesh: Mesh, axis: str = BLOCK_AXIS):
    """Shard an IPM state pytree consistently with shard_device_sdp."""
    n = mesh.shape[axis]

    def spec(i, ndim):
        return _axis_spec(mesh, axis, i, ndim)

    repl = NamedSharding(mesh, P())
    out = {
        "y": _put(state["y"], repl),
        "x": [], "X": [], "Y": [], "Xs": [], "Ys": [],
    }
    for j, cl in enumerate(ds.clusters):
        sj = _shard_j(cl, n)
        out["x"].append(_put(state["x"][j], spec(0, 2) if sj else repl))
        Xc, Yc = [], []
        for ki, k in enumerate(cl.classes):
            s = spec(0, 3) if _shard_class(k, cl, mesh, axis, n) else repl
            Xc.append(_put(state["X"][j][ki], s))
            Yc.append(_put(state["Y"][j][ki], s))
        out["X"].append(Xc)
        out["Y"].append(Yc)
        if sj:
            s = spec(0, 2)
        elif _shard_bs(cl, n):
            s = spec(1, 2)
        else:
            s = repl
        out["Xs"].append(_put(state["Xs"][j], s))
        out["Ys"].append(_put(state["Ys"][j], s))
    return out


def enable_row_sharding(ds, mesh: Mesh, axis: str = None) -> int:
    """Row-panel sharding of SINGLE-cluster groups over ``mesh``: the
    [P, P] Schur assembly, chol(S) and the KKT triangular solves of each
    eligible cluster distribute by row panels via shard_map
    (parallel/bigcluster.py) — the mesh form of the reference's threaded
    whole-S^j GEMM/Cholesky (src/solver.jl:1244-1252, src/tools.jl:175-266).
    This is the scaling story for ONE big cluster, which cluster-axis
    sharding cannot touch (VERDICT r4 item 3).

    Eligible: J == 1, P divisible by the mesh with >= 8 rows per device,
    low-rank classes on the pair path, no dense classes. Returns the
    number of clusters enabled; 0 leaves the DeviceSDP untouched."""
    from .bigcluster import row_shard_ok

    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    enabled = 0
    for cl in ds.clusters:
        lowrank = [k for k in cl.classes if k.kind == "lowrank"]
        if (cl.J == 1 and row_shard_ok(cl.nrows, n) and lowrank
                and all(k.use_pairs for k in lowrank)
                and all(k.kind == "lowrank" for k in cl.classes)):
            cl.row_shard = True
            enabled += 1
    if enabled:
        ds.row_mesh = mesh
        ds.row_axis = axis
    return enabled


def multi_cluster_test_problem(n_clusters: int = 4, n_blocks: int = 8):
    """A small SDP with ``n_clusters`` independent clusters, each holding
    ``n_blocks`` same-size 2x2 PSD blocks (one size class of L = n_blocks),
    coupled ONLY through a shared free variable — the communication
    topology of the reference's compiled form in miniature: block-parallel
    work inside clusters, a single cross-cluster reduction through Q.

    Used by the multichip dryrun and the sharding equivalence tests.
    """
    from ..model.problem import Constraint, Maximize, Objective, Problem

    h = Fraction(1, 2)
    obj_mats = {}
    cons = []
    for c in range(n_clusters):
        names = [f"X{c}_{b}" for b in range(n_blocks)]
        for nm in names:
            obj_mats[nm] = [[-1, 0], [0, -1]]
        a1 = {nm: [[1, h], [h, 0]] for nm in names}
        a2 = {nm: [[0, h], [h, 1]] for nm in names}
        cons.append(Constraint(Fraction(3 + c, 2), a1, {"y": 1}))
        cons.append(Constraint(Fraction(4 + c, 3), a2, {"y": -1}))
    obj = Objective(0, obj_mats, {"y": Fraction(1, 10)})
    return Problem(Maximize(obj), cons)
