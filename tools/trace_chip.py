"""Capture an xplane trace of the bench chunk on the chip (for op-level
perf analysis; used with tools/analyze_trace.py)."""
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

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
from delsarte import delsarte_problem  # noqa: E402


def main(outdir="/tmp/trace_chunk"):
    problem = delsarte_problem(3, 10, Fraction(1, 2))
    sdp = ClusteredLowRankSDP(problem)
    if jax.default_backend() == "tpu":
        ds = DeviceSDP(sdp, nw=5, dtype=jnp.float32)
    else:
        ds = DeviceSDP(sdp)
    run = make_run_chunk(ds, duality_gap_threshold=0.0,
                         step_length_threshold=0.0,
                         max_complementary_gap=float("inf"),
                         gamma=0.9, beta_feasible=0.1, beta_infeasible=0.3,
                         dual_error_threshold=1e-12,
                         primal_error_threshold=1e-12)
    state = initial_state(ds, 100.0, 100.0)
    feas = jnp.zeros((), dtype=bool)
    info = zero_info()
    # warm up / compile
    state, feas, info, itd, code, done = run(state, feas, info, 5)
    jax.block_until_ready(state["x"][0][0])
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        state, feas, info, itd, code, done = run(state, feas, info, 20)
        jax.block_until_ready(state["x"][0][0])
    dt = time.perf_counter() - t0
    print(f"20 iters traced in {dt*1e3:.1f} ms ({dt/20*1e3:.2f} ms/iter)")
    print("trace:", outdir)


if __name__ == "__main__":
    main(*sys.argv[1:])
