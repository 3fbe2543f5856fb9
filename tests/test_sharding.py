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
