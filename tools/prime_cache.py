"""Prime the persistent XLA compile cache for the standard solve tiers.

The analogue of the reference's precompile workload
(ClusteredLowRankSolver.jl src/precompile.jl:1-14, PrecompileTools): the
reference's flagship example runs in ~13 s total because precompilation
already paid the JIT cost (docs/src/solving.md:46). Here the expensive
artifact is the XLA compilation of the IPM step/chunk graph (minutes cold
on the tunneled TPU); `clrs_tpu` configures a persistent compile cache
(JAX_COMPILATION_CACHE or ./.jax_cache, clrs_tpu/__init__.py) and this
tool fills it for the shapes a workload will hit.

Usage:
    python tools/prime_cache.py                 # tiny default workload
    python tools/prime_cache.py --tier d10      # delsarte(3,10), bench shape
    python tools/prime_cache.py --tier d127     # Schur-dominated bench shape
    python tools/prime_cache.py --tier hi       # nw=8 high-precision tier
    python tools/prime_cache.py --tier all

Run it once per machine/backend; every later solvesdp with the same
problem shapes starts in seconds.
"""

import argparse
import sys
import time
from fractions import Fraction
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import clrs_tpu  # noqa: F401, E402  (configures the persistent cache)
import jax  # noqa: E402


def _prime(problem, nw=None, n_iters=2):
    import jax.numpy as jnp

    from clrs_tpu.compile.sdp import ClusteredLowRankSDP
    from clrs_tpu.solver.step import (DeviceSDP, initial_state,
                                      make_run_chunk, zero_info)

    sdp = ClusteredLowRankSDP(problem)
    if nw is None:
        ds = DeviceSDP(sdp, nw=5, dtype=jnp.float32) \
            if jax.default_backend() == "tpu" else DeviceSDP(sdp)
    else:
        ds = DeviceSDP(sdp, nw=nw,
                       dtype=jnp.float32 if jax.default_backend() == "tpu"
                       else jnp.float64)
    run = make_run_chunk(ds, duality_gap_threshold=0.0,
                         step_length_threshold=0.0,
                         max_complementary_gap=float("inf"),
                         gamma=0.9, beta_feasible=0.1, beta_infeasible=0.3,
                         dual_error_threshold=1e-12,
                         primal_error_threshold=1e-12)
    state = initial_state(ds, 100.0, 100.0)
    out = run(state, jnp.zeros((), bool), zero_info(), n_iters)
    jax.block_until_ready(out[0]["x"][0][0])


def main():
    from clrs_tpu.parallel import multi_cluster_test_problem
    from delsarte import delsarte_problem

    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="tiny",
                   choices=["tiny", "d10", "d127", "hi", "all"])
    args = p.parse_args()

    tiers = {
        "tiny": [("delsarte(3,4)",
                  lambda: delsarte_problem(3, 4, Fraction(1, 2))),
                 ("multi-cluster",
                  lambda: multi_cluster_test_problem(4, 4))],
        "d10": [("delsarte(3,10)",
                 lambda: delsarte_problem(3, 10, Fraction(1, 2)))],
        "d127": [("delsarte(3,127)",
                  lambda: delsarte_problem(3, 127, Fraction(1, 2)))],
        # the hi tier (~192-bit f32x8 on TPU / ~265-bit f64x5 on CPU):
        # what a reference user at prec=256 is auto-routed to
        "hi": [("delsarte(3,10) nw=8",
                lambda: delsarte_problem(3, 10, Fraction(1, 2)), 8)],
    }
    todo = (tiers["tiny"] + tiers["d10"] + tiers["d127"] + tiers["hi"]
            if args.tier == "all" else tiers[args.tier])
    for entry in todo:
        name, build = entry[0], entry[1]
        nw = entry[2] if len(entry) > 2 else None
        t0 = time.time()
        _prime(build(), nw=nw)
        print(f"primed {name}: {time.time() - t0:.1f}s "
              f"(backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
