"""Multi-device sharding: sharded vs single-device IPM step equivalence.

Replaces the reference's (nonexistent) distributed tier per SURVEY.md
section 4: on the virtual 8-device CPU mesh, one sharded step must agree
with the unsharded step to double-word accuracy.
"""

import sys
from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from clrs_tpu.compile.sdp import ClusteredLowRankSDP  # noqa: E402
from clrs_tpu.solver.step import DeviceSDP, initial_state, make_step  # noqa: E402


def _build(scalar_pad=1):
    from delsarte import delsarte_problem

    problem = delsarte_problem(3, 4, Fraction(1, 2))
    sdp = ClusteredLowRankSDP(problem, scalar_pad=scalar_pad)
    ds = DeviceSDP(sdp)
    step = make_step(ds, gamma=0.9, beta_feasible=0.1, beta_infeasible=0.3,
                     dual_error_threshold=1e-12, primal_error_threshold=1e-12)
    return ds, step, initial_state(ds, 100.0, 100.0)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual CPU devices"

    ds0, step0, state0 = _build(scalar_pad=1)
    new0, info0 = step0(state0, False)

    ds, step, state = _build(scalar_pad=8)
    mesh = Mesh(np.array(jax.devices()[:8]), ("b",))
    shard_b = NamedSharding(mesh, P("b"))
    shard_b2 = NamedSharding(mesh, P("b", None))
    for cl in ds.clusters:
        if cl.s_nb:
            cl.sa = tuple(jax.device_put(a, shard_b2) for a in cl.sa)
            cl.sC = tuple(jax.device_put(a, shard_b) for a in cl.sC)
            cl.smask = jax.device_put(cl.smask, shard_b)
    state["Xs"] = [tuple(jax.device_put(a, shard_b) for a in xs)
                   for xs in state["Xs"]]
    state["Ys"] = [tuple(jax.device_put(a, shard_b) for a in ys)
                   for ys in state["Ys"]]
    new1, info1 = step(state, False)

    assert bool(info0["ok"]) and bool(info1["ok"])
    for k in ("mu", "dual_error", "primal_error", "dual_gap", "alpha_d",
              "alpha_p", "d_obj", "p_obj"):
        a, b = float(info0[k]), float(info1[k])
        assert abs(a - b) <= 1e-13 * max(1.0, abs(a)), (k, a, b)
    # x update identical to dd accuracy
    x0 = np.asarray(new0["x"][0][0]) + np.asarray(new0["x"][0][1])
    x1 = np.asarray(new1["x"][0][0]) + np.asarray(new1["x"][0][1])
    np.testing.assert_allclose(x0, x1, rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_multi_cluster_block_axis_sharding_equivalence():
    """Round-3 tier: a 4-cluster problem with n>1 blocks, the size-class
    block axis of EVERY cluster sharded over the 8-device mesh, one full
    step asserted equivalent to the single-device step (VERDICT r2 item 2;
    the communication points are the Schur/trace contractions over the
    sharded block axis + the Q reduction, src/solver.jl:1264-1271)."""
    from clrs_tpu.parallel import (make_mesh, multi_cluster_test_problem,
                                   shard_device_sdp, shard_state)

    problem = multi_cluster_test_problem(n_clusters=4, n_blocks=8)
    sdp = ClusteredLowRankSDP(problem)
    kw = dict(gamma=0.9, beta_feasible=0.1, beta_infeasible=0.3,
              dual_error_threshold=1e-12, primal_error_threshold=1e-12)

    ds0 = DeviceSDP(sdp)
    step0 = make_step(ds0, **kw)
    ref_state, ref_info = step0(initial_state(ds0, 100.0, 100.0), False)

    mesh = make_mesh(8)
    ds = DeviceSDP(sdp)
    assert shard_device_sdp(ds, mesh) >= 4   # every cluster's class axis
    step = make_step(ds, **kw)
    state = shard_state(ds, initial_state(ds, 100.0, 100.0), mesh)
    new_state, info = step(state, False)

    assert bool(ref_info["ok"]) and bool(info["ok"])
    for k in ("mu", "dual_error", "primal_error", "dual_gap", "alpha_d",
              "alpha_p", "d_obj", "p_obj"):
        a, b = float(ref_info[k]), float(info[k])
        assert abs(a - b) <= 1e-12 * max(1.0, abs(a)), (k, a, b)
    for j in range(len(ds.clusters)):
        x0 = sum(np.asarray(c, np.float64) for c in ref_state["x"][j])
        x1 = sum(np.asarray(c, np.float64) for c in new_state["x"][j])
        np.testing.assert_allclose(x0, x1, rtol=1e-12, atol=1e-12)


def test_shard_refuses_full_replication():
    """shard_device_sdp must fail loudly when no axis divides the mesh
    (the r1/r2 dryrun silently fell back to replication)."""
    from clrs_tpu.parallel import (make_mesh, multi_cluster_test_problem,
                                   shard_device_sdp)

    problem = multi_cluster_test_problem(n_clusters=2, n_blocks=3)
    sdp = ClusteredLowRankSDP(problem)
    ds = DeviceSDP(sdp)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="refusing"):
        shard_device_sdp(ds, mesh)
