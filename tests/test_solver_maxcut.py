"""End-to-end oracle: GW MAX-CUT on the 3-cycle gives 9/4 (reference README.md:72,103)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from maxcut import goemans_williamson  # noqa: E402

from clrs_tpu.solver.status import Optimal, objvalue, optimal  # noqa: E402


@pytest.mark.slow
def test_maxcut_three_cycle():
    L = [[2, -1, -1], [-1, 2, -1], [-1, -1, 2]]
    problem, status, dualsol, primalsol, code = goemans_williamson(
        L, omega_p=100.0, omega_d=100.0, verbose=False,
        dual_error_threshold=1e-12, primal_error_threshold=1e-12)
    assert code == 0
    assert optimal(status)
    assert abs(float(objvalue(problem, primalsol)) - 2.25) < 1e-10
    # dual solution sanity: X diagonal entries are the constraint duals
    assert len(dualsol.x) == 3
