"""Delsarte LP bound for spherical codes.

Port of `ClusteredLowRankSolver.jl/examples/Delsarte.jl:7-49`.
Oracle: delsarte(3, 10, 1/2) ~= 13.158314 (test/runtests_solver.jl:15).
"""

from fractions import Fraction

from clrs_tpu import (Constraint, LowRankMatPol, Minimize, Objective, Problem,
                      approximatefekete, basis_chebyshev, basis_gegenbauer,
                      polynomial_ring, sample_points_chebyshev, solvesdp)
from clrs_tpu.solver.status import objvalue


def delsarte_problem(n, d, costheta):
    obj = Objective(0, {}, {"M": 1})
    R, x = polynomial_ring("x")

    samples = sample_points_chebyshev(2 * d, -1, costheta)
    basis = basis_chebyshev(2 * d, x)
    sosbasis, samples = approximatefekete(basis, samples)

    gp = basis_gegenbauer(2 * d, n, x)
    psd1 = {}
    for k in range(1, 2 * d + 1):
        psd1[("a", k)] = [[gp[k]]]
    psd1[("SOS", 1)] = LowRankMatPol([1], [sosbasis[: d + 1]])
    psd1[("SOS", 2)] = LowRankMatPol([(1 + x) * (costheta - x)], [sosbasis[:d]])
    constr1 = Constraint(-1, psd1, {}, samples)

    psd2 = {("a", k): [[1]] for k in range(1, 2 * d + 1)}
    psd2["slack"] = [[1]]
    constr2 = Constraint(-1, psd2, {"M": -1})

    return Problem(Minimize(obj), [constr1, constr2])


def delsarte(n, d, costheta, **kwargs):
    problem = delsarte_problem(n, d, costheta)
    status, dualsol, primalsol, t, errorcode = solvesdp(problem, **kwargs)
    return problem, status, dualsol, primalsol, errorcode


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    problem, status, dualsol, primalsol, code = delsarte(
        3, 10, Fraction(1, 2), omega_p=100.0, omega_d=100.0, verbose=True,
        dual_error_threshold=1e-12, primal_error_threshold=1e-12)
    print("status:", status, "code:", code)
    print("bound:", float(objvalue(problem, primalsol)))
