"""Goemans-Williamson MAX-CUT relaxation.

Port of the reference README example (`ClusteredLowRankSolver.jl/README.md`,
"Example 1"): maximize <L/4, X> s.t. <E_ii, X> = 1, X PSD.
Oracle: 3-cycle Laplacian gives 9/4.
"""

from fractions import Fraction

from clrs_tpu import Constraint, Maximize, Objective, Problem, solvesdp
from clrs_tpu.solver.status import matrixvar, objvalue


def goemans_williamson(L, eps=1e-15, **kwargs):
    n = len(L)
    obj = Objective(0, {"X": [[Fraction(L[i][j], 4) for j in range(n)]
                              for i in range(n)]}, {})
    constraints = []
    for i in range(n):
        M = [[Fraction(1) if (a == i and b == i) else Fraction(0)
              for b in range(n)] for a in range(n)]
        constraints.append(Constraint(1, {"X": M}, {}))
    problem = Problem(Maximize(obj), constraints)
    status, dualsol, primalsol, t, errorcode = solvesdp(
        problem, duality_gap_threshold=eps, **kwargs)
    return problem, status, dualsol, primalsol, errorcode


if __name__ == "__main__":
    L = [[2, -1, -1], [-1, 2, -1], [-1, -1, 2]]
    problem, status, dualsol, primalsol, code = goemans_williamson(
        L, omega_p=100.0, omega_d=100.0,
        dual_error_threshold=1e-25, primal_error_threshold=1e-25)
    print("status:", status, "error code:", code)
    print("objective:", float(objvalue(problem, primalsol)))
