"""Schur assembly variants must agree: the one-shot [L,P,T,P,T] batched
gather (small term tables — the compile-time lever) vs the t1-loop
(bounded-memory path for large problems). Both implement the quadruple
contraction of src/solver.jl:1176-1212."""

import sys
from fractions import Fraction
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from clrs_tpu.compile.sdp import ClusteredLowRankSDP  # noqa: E402
from clrs_tpu.solver import step as st  # noqa: E402
from clrs_tpu.solver.step import DeviceSDP, initial_state, make_step  # noqa: E402


@pytest.mark.slow
def test_schur_batched_t1_matches_loop():
    from delsarte import delsarte_problem

    sdp = ClusteredLowRankSDP(delsarte_problem(3, 5, Fraction(1, 2)))
    kw = dict(gamma=0.9, beta_feasible=0.1, beta_infeasible=0.3,
              dual_error_threshold=1e-12, primal_error_threshold=1e-12)
    outs = {}
    old = st._SCHUR_T1_BATCH_BUDGET
    try:
        for tag, budget in [("batched", 2 ** 22), ("loop", 0)]:
            st._SCHUR_T1_BATCH_BUDGET = budget
            ds = DeviceSDP(sdp)
            f = make_step(ds, **kw)
            state, info = f(initial_state(ds, 100.0, 100.0), False)
            assert bool(info["ok"])
            outs[tag] = {k: float(v) for k, v in info.items()
                         if k not in ("ok", "ok_X", "ok_S", "ok_Q",
                                      "pd_feas")}
    finally:
        st._SCHUR_T1_BATCH_BUDGET = old
    for k in outs["batched"]:
        a, b = outs["batched"][k], outs["loop"][k]
        assert abs(a - b) <= 1e-13 * max(1.0, abs(a)), (k, a, b)
