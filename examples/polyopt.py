"""Univariate SOS polynomial optimization.

Port of the reference README "Example 2" and `examples/PolyOpt.jl:7-31`:
minimize f over R by maximizing lambda s.t. f - lambda is SOS.
Oracle: min of x^2 + 1 is 1.
"""

from fractions import Fraction

from clrs_tpu import (Constraint, LowRankMatPol, Maximize, Objective, Problem,
                      basis_chebyshev, polynomial_ring,
                      sample_points_chebyshev, solvesdp)
from clrs_tpu.solver.status import freevar, objvalue


def polyopt(f, d, **kwargs):
    ring = f.ring
    (u,) = ring.gens()
    sosbasis = basis_chebyshev(d, u)
    samples = sample_points_chebyshev(2 * d, -1, 1)
    c = {("sos", 1): LowRankMatPol([1], [sosbasis[: d + 1]])}
    constraint = Constraint(f, c, {"lambda": 1}, samples)
    objective = Objective(0, {}, {"lambda": 1})
    problem = Problem(Maximize(objective), [constraint])
    status, dualsol, primalsol, t, errorcode = solvesdp(problem, **kwargs)
    return problem, status, dualsol, primalsol, errorcode


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    R, x = polynomial_ring("x")
    f = x ** 2 + 1
    problem, status, dualsol, primalsol, code = polyopt(
        f, 1, omega_p=100.0, omega_d=100.0, verbose=True,
        dual_error_threshold=1e-12, primal_error_threshold=1e-12)
    print("status:", status, "code:", code)
    print("minimum:", float(objvalue(problem, primalsol)))
    print("lambda:", float(freevar(primalsol, "lambda")))
