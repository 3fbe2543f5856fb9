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


def invariant_basis(x, y, z, d):
    """S3-invariant basis up to degree d (reference examples/PolyOpt.jl:34-38)."""
    out = []
    for deg in range(d + 1):
        for j in range(deg // 3 + 1):
            for i in range((deg - 3 * j) // 2 + 1):
                out.append((x + y + z) ** (deg - 2 * i - 3 * j)
                           * (x * y + y * z + z * x) ** i
                           * (x * y * z) ** j)
    return out


def min_f_problem(d):
    """S3-invariant trivariate polyopt (reference examples/PolyOpt.jl:40-87):
    maximize M s.t. f - M is an S3-invariant SOS; f = x^4+y^4+z^4-4xyz+x+y+z."""
    from fractions import Fraction

    from clrs_tpu import approximatefekete

    obj = Objective(0, {}, {"M": 1})
    R, x, y, z = polynomial_ring("x", "y", "z")
    f = x ** 4 + y ** 4 + z ** 4 - 4 * x * y * z + x + y + z

    basis = invariant_basis(x, y, z, 2 * d)
    degrees = [p.total_degree() for p in basis]

    cheb = [sample_points_chebyshev(2 * d + k) for k in range(3)]
    grid = [[cheb[0][i], cheb[1][j], cheb[2][k]]
            for i in range(2 * d + 1)
            for j in range(2 * d + 2)
            for k in range(2 * d + 3)]
    sbasis, samples = approximatefekete(basis, grid)

    equivariants = [
        [[R(1)]],
        [[(x - y) * (y - z) * (z - x)]],
        [[(2 * x - y - z), (2 * y * z - x * z - x * y)],
         [(y - z), (x * z - x * y)]],
    ]
    factors = [[1], [1], [Fraction(1, 2), Fraction(3, 2)]]
    psd = {}
    for eqi, eqs in enumerate(equivariants):
        vecs = []
        for row in eqs:
            vec = []
            for eq in row:
                for q, qdeg in zip(sbasis, degrees):
                    if 2 * eq.total_degree() + 2 * qdeg <= 2 * d:
                        vec.append(eq * q)
            if vec:
                vecs.append(vec)
        if vecs:
            psd[("trivariatesos", eqi + 1)] = LowRankMatPol(
                factors[eqi][: len(vecs)], vecs)

    constr = Constraint(f, psd, {"M": 1}, samples)
    return Problem(Maximize(obj), [constr])


def min_f(d, **kwargs):
    problem = min_f_problem(d)
    status, dualsol, primalsol, t, code = solvesdp(problem, **kwargs)
    return problem, status, dualsol, primalsol, code
