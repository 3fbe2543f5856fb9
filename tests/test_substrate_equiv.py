"""Device-correctness: the TPU substrate (f32 expansions + int8-limb GEMM)
computes the SAME IPM trajectory as the IEEE f64 double-word substrate.

Runs on CPU, where both substrates are bit-sound: the f32 path exercises
exactly the graph that runs on the chip (f32 EFTs measured exactly IEEE on
TPU, NOTES_TPU_NUMERICS.md), so agreement here transfers to the device.
"""

from fractions import Fraction

import jax.numpy as jnp
import numpy as np
import pytest

from clrs_tpu.compile.sdp import ClusteredLowRankSDP
from clrs_tpu.solver.step import DeviceSDP, initial_state, make_step


def _delsarte():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from delsarte import delsarte_problem

    return delsarte_problem(3, 5, Fraction(1, 2))


@pytest.mark.slow
def test_f32_and_f64_substrates_agree():
    sdp = ClusteredLowRankSDP(_delsarte())
    traj = {}
    for tag, nw, dtype in [("f64", 2, jnp.float64), ("f32", 5, jnp.float32)]:
        ds = DeviceSDP(sdp, nw=nw, dtype=dtype)
        step = make_step(ds, gamma=0.9, beta_feasible=0.1,
                         beta_infeasible=0.3, dual_error_threshold=1e-12,
                         primal_error_threshold=1e-12)
        state = initial_state(ds, 100.0, 100.0)
        feas = False
        rows = []
        for _ in range(8):
            state, info = step(state, feas)
            feas = bool(info["pd_feas"])
            assert bool(info["ok"])
            rows.append((float(info["mu"]), float(info["d_obj"]),
                         float(info["p_obj"]), float(info["alpha_d"]),
                         float(info["alpha_p"])))
        traj[tag] = rows
    for r64, r32 in zip(traj["f64"], traj["f32"]):
        for a, b in zip(r64, r32):
            # both substrates carry >= ~105 bits; trajectories must agree
            # far beyond f64 working precision
            assert a == pytest.approx(b, rel=1e-13, abs=1e-18), (r64, r32)
