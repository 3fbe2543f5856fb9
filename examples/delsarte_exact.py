"""Exact Delsarte LP bounds via rounding.

Port of `ClusteredLowRankSolver.jl/examples/DelsarteExact.jl`:
rational sample points, exact problem data, solve numerically, round to an
exact optimal solution over Q (or a number field).
Oracles: delsarte_round(8, 3, 1/2) == 240 (E8 kissing number bound,
test/runtests_solver.jl:85-88); delsarte_exact(4, 9, 1/(z-1)) over Q(sqrt5)
== 120 (runtests_solver.jl:98-111).
"""

from fractions import Fraction

from clrs_tpu import (Constraint, LowRankMatPol, Minimize, Objective, Problem,
                      basis_chebyshev, basis_gegenbauer, polynomial_ring,
                      sample_points_chebyshev, solvesdp)
from clrs_tpu.exact.field import QQ, generic_embedding
from clrs_tpu.round.rounding import RoundingSettings, exact_solution
from clrs_tpu.solver.status import objvalue


def delsarte_exact_problem(n, d, costheta, FF=QQ):
    R, x = polynomial_ring("x")
    gbasis = basis_gegenbauer(2 * d, n, x)
    sosbasis = basis_chebyshev(2 * d, x)
    # rational samples (DelsarteExact.jl:17-18)
    samples = [Fraction(round(float(s) * 10 ** 4), 10 ** 4)
               for s in sample_points_chebyshev(2 * d)]
    c = {}
    for k in range(2 * d + 1):
        c[k] = [[gbasis[k]]]
    c["A"] = LowRankMatPol([1], [sosbasis[: d + 1]])
    c["B"] = LowRankMatPol([(x + 1) * (costheta - x)], [sosbasis[:d]])
    constraints = [Constraint(-1, c, {}, samples)]
    objective = Objective(1, {k: [[1]] for k in range(2 * d + 1)}, {})
    return Problem(Minimize(objective), constraints)


def delsarte_exact(n, d, costheta, FF=QQ, g=1, eps=1e-18, **kwargs):
    problem = delsarte_exact_problem(n, d, costheta, FF)
    if FF is not QQ:
        problem_num = problem.map(lambda v: generic_embedding(v, g))
    else:
        problem_num = problem
    status, dualsol, primalsol, t, code = solvesdp(
        problem_num, duality_gap_threshold=eps, **kwargs)
    return objvalue(problem_num, primalsol), problem, dualsol, primalsol, code


def delsarte_round(n, d, costheta, FF=QQ, g=1, eps=1e-18,
                   settings=None, verbose=True, **kwargs):
    obj, problem, dualsol, primalsol, code = delsarte_exact(
        n, d, costheta, FF=FF, g=g, eps=eps, verbose=verbose, **kwargs)
    R, x = polynomial_ring("x")
    monomial_basis = [x ** k for k in range(2 * d + 1)]
    success, exactsol = exact_solution(
        problem, dualsol, primalsol, FF=FF, g=g,
        settings=settings or RoundingSettings(),
        monomial_bases=[monomial_basis], verbose=verbose)
    return success, problem, exactsol


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    success, problem, esol = delsarte_round(
        8, 3, Fraction(1, 2), omega_p=100.0, omega_d=100.0,
        dual_error_threshold=1e-15, primal_error_threshold=1e-15)
    print("success:", success)
    print("exact objective:", objvalue(problem, esol))
