"""On-chip per-phase profile of the IPM step (VERDICT r2 item #1).

Runs the solver/timing.py breakdown for the bench problem (delsarte(3,10))
on whatever backend JAX picks — the real TPU chip under the driver — plus a
whole-step timing, and prints the table. This is the tool that drives the
perf work; commit the resulting table with each optimization.
"""

import sys
import time
from fractions import Fraction
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import clrs_tpu  # noqa: F401
from clrs_tpu.compile.sdp import ClusteredLowRankSDP
from clrs_tpu.solver.step import (DeviceSDP, initial_state, make_run_chunk,
                                  zero_info)
from clrs_tpu.solver.timing import print_breakdown

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
from delsarte import delsarte_problem  # noqa: E402


def main():
    problem = delsarte_problem(3, 10, Fraction(1, 2))
    sdp = ClusteredLowRankSDP(problem)
    if jax.default_backend() == "tpu":
        ds = DeviceSDP(sdp, nw=5, dtype=jnp.float32)
    else:
        ds = DeviceSDP(sdp)
    print(f"backend={jax.default_backend()} nw={ds.nw} dtype={ds.dtype}")

    run = make_run_chunk(ds, duality_gap_threshold=0.0,
                         step_length_threshold=0.0,
                         max_complementary_gap=float("inf"),
                         gamma=0.9, beta_feasible=0.1, beta_infeasible=0.3,
                         dual_error_threshold=1e-12,
                         primal_error_threshold=1e-12)
    state = initial_state(ds, 100.0, 100.0)
    feas = jnp.zeros((), dtype=bool)
    info = zero_info()
    state, feas, info, itd, code, done = run(state, feas, info, 5)
    jax.block_until_ready(state["x"][0][0])

    n = 20
    t0 = time.time()
    out = run(state, feas, info, n)
    jax.block_until_ready(out[0]["x"][0][0])
    dt = time.time() - t0
    print(f"whole step (chunk of {n}): {1e3 * dt / n:.2f} ms/iter "
          f"({n / dt:.1f} it/s)")

    print_breakdown(ds, state, reps=5)


if __name__ == "__main__":
    main()
