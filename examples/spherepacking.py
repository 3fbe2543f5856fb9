"""Cohn-Elkies sphere packing bounds.

Ports of `ClusteredLowRankSolver.jl/examples/SpherePacking.jl`:
- cohnelkies(n, d): single radius (SpherePacking.jl:117-185)
- Nsphere_packing(n, d, r, N): multiple radii with Block subblock structure
  (SpherePacking.jl:13-115)
Oracle: cohnelkies(8, 15) ~ pi^4/384 (reference test/runtests_solver.jl:19-22).
"""

import math
from decimal import Decimal
from fractions import Fraction

from clrs_tpu import (Block, Constraint, LowRankMatPol, Minimize, Objective,
                      Problem, approximatefekete, basis_laguerre,
                      polynomial_ring, sample_points_rescaled_laguerre,
                      solvesdp)
from clrs_tpu.utils.hp import _as_decimal, gamma_half, pi, sqrt_dec


def spherevolume(n, r):
    """vol of the n-ball of radius r, in Decimal (SpherePacking.jl:8-10)."""
    return (pi().sqrt() ** n / gamma_half(Fraction(n, 2) + 1)
            * _as_decimal(r) ** n)


def _scaled_laguerre_basis(n, d, x, scale):
    """Laguerre basis in `scale*x`, each normalized by its max coefficient
    (SpherePacking.jl:51-54)."""
    q = basis_laguerre(2 * d + 1, Fraction(n, 2) - 1, x * scale)
    out = []
    for p in q:
        mx = max(_as_decimal(c) for c in p.terms.values())
        out.append(p * (1 / mx))
    return out


def cohnelkies_problem(n, d, r=1):
    """Cohn-Elkies bound, reformulated for double-word arithmetic.

    The reference (SpherePacking.jl:117-185) uses the monomial coefficients
    a_k of F(f) as free variables, which makes B a Vandermonde-type matrix
    with condition ~1e40+ at d=15 -- that is why it runs at 512-bit
    precision. We instead use coefficients b_k of F(f) in the
    Fekete-orthogonalized Laguerre basis (B well-conditioned) and normalize
    F(f)(0) >= 1 via a 1x1 slack block; the optimum is unchanged (f scales
    linearly).
    """
    import numpy as np

    from clrs_tpu.poly.fekete import approximate_fekete
    from clrs_tpu.poly.sampled import SampledPoly, SampledPolyRing

    R, x = polynomial_ring("x")
    two_pi = 2 * pi()
    alpha = Fraction(n, 2) - 1

    basis_polys = _scaled_laguerre_basis(n, d, x, two_pi)
    samples0 = sample_points_rescaled_laguerre(2 * d + 1)
    V1, P1, samples1 = approximate_fekete(samples0, basis_polys)
    ring1 = SampledPolyRing(samples1)
    basis1 = [SampledPoly(ring1, list(V1[:, k])) for k in range(len(basis_polys))]
    nb = len(basis_polys)  # 2d+2 basis elements / free variables

    # q_k as explicit polynomials: q_k = sum_i P1[i,k] * basis_polys[i]
    q_polys = []
    for k in range(nb):
        acc = R(0)
        for i in range(nb):
            acc = acc + basis_polys[i] * P1[i, k]
        q_polys.append(acc)

    # constraint 1: sum_k b_k q_k(x) = <SOS21, bb^T> + x <SOS22, bb^T> on x>=0
    free1 = {k: -basis1[k] for k in range(nb)}
    psd1 = {"SOS21": LowRankMatPol([1], [basis1[: d + 1]]),
            "SOS22": LowRankMatPol([x], [basis1[: d + 1]])}
    con1 = Constraint(0, psd1, free1, samples1)

    # normalization: sum_k b_k q_k(0) - slack = 1  (slack >= 0)
    con0 = Constraint(1, {"slack0": [[-1]]},
                      {k: q_polys[k](Fraction(0)) for k in range(nb)})

    # constraint 2: SOS + (x - r^2) SOS + sum_k b_k g_k(pi x) = 0 for x >= r^2
    # where g_k = sum_m c_{k,m} m!/pi^m L_m(pi x) and c_{k,m} are the
    # monomial coefficients of q_k.
    lag = basis_laguerre(2 * d + 1, alpha, x * pi())
    g = []
    for k in range(nb):
        acc = R(0)
        for m in range(nb):
            c_km = q_polys[k].terms.get((m,), 0)
            if c_km != 0:
                acc = acc + lag[m] * (_as_decimal(c_km)
                                      * Decimal(math.factorial(m)) / pi() ** m)
        g.append(acc)

    basis2_polys = _scaled_laguerre_basis(n, d, x, two_pi)
    r2 = _as_decimal(r) ** 2
    samples2 = [s + r2 for s in sample_points_rescaled_laguerre(2 * d + 1)]
    basis2, samples2 = approximatefekete(basis2_polys, samples2)

    free2 = {k: g[k] for k in range(nb)}
    psd2 = {"SOS31": [[basis2[0] * basis2[0]]],
            "SOS32": LowRankMatPol([x - Fraction(r) ** 2], [basis2[: d + 1]])}
    # per-sample row scaling (exact powers of two): the g_k values span many
    # orders of magnitude across samples; this is what the Constraint
    # `scalings` mechanism is for (interface.jl:493).
    scalings2 = []
    for s_pt in samples2:
        mx = max(abs(float(_as_decimal(gk(s_pt)))) for gk in g)
        scalings2.append(Fraction(2) ** (-int(math.log2(mx))) if mx > 0 else 1)
    con2 = Constraint(0, psd2, free2, samples2, scalings2)

    # objective: vol(B(r/2)) * f(0) = vol * sum_k b_k g_k(0)
    vol = spherevolume(n, Fraction(r, 2))
    freedict = {k: vol * _as_decimal(g[k](Fraction(0))) for k in range(nb)}
    obj = Objective(0, {}, freedict)
    return Problem(Minimize(obj), [con0, con1, con2])


def cohnelkies(n, d, r=1, **kwargs):
    problem = cohnelkies_problem(n, d, r)
    status, dualsol, primalsol, t, code = solvesdp(problem, **kwargs)
    return problem, status, dualsol, primalsol, code


def Nsphere_packing_problem(n, d, r, N=None):
    """Multi-radius sphere packing (SpherePacking.jl:13-115)."""
    N = len(r) if N is None else N
    R, x = polynomial_ring("x")
    two_pi = 2 * pi()
    alpha = Fraction(n, 2) - 1
    constraints = []

    # constraint 1: PSD1_{ij} - a_{ij,0} = -sqrt(vol_i vol_j)
    for i in range(1, N + 1):
        for j in range(1, i + 1):
            const = -sqrt_dec(spherevolume(n, r[i - 1]) * spherevolume(n, r[j - 1]))
            if i != j:
                psd = {Block("PSD1", i, j): LowRankMatPol([Fraction(1, 2)], [[1]]),
                       Block("PSD1", j, i): LowRankMatPol([Fraction(1, 2)], [[1]])}
            else:
                psd = {Block("PSD1", i, j): LowRankMatPol([1], [[1]])}
            constraints.append(Constraint(const, psd, {(0, i, j): -1}))

    basis = _scaled_laguerre_basis(n, d, x, two_pi)
    samples = sample_points_rescaled_laguerre(2 * d + 1)
    basis, samples = approximatefekete(basis, samples)

    # constraint 2: sum_k a_{ij,k} x^k is an SOS matrix entrywise
    for i in range(1, N + 1):
        for j in range(1, i + 1):
            psd = {}
            free = {}
            if i != j:
                for k in range(0, 2 * d + 2):
                    free[(k, i, j)] = -2 * x ** k
                psd[Block("SOS21", i, j)] = LowRankMatPol([1], [basis[: d + 1]])
                psd[Block("SOS22", i, j)] = LowRankMatPol([x], [basis[: d + 1]])
                psd[Block("SOS21", j, i)] = LowRankMatPol([1], [basis[: d + 1]])
                psd[Block("SOS22", j, i)] = LowRankMatPol([x], [basis[: d + 1]])
            else:
                for k in range(0, 2 * d + 2):
                    free[(k, i, j)] = -(x ** k)
                psd[Block("SOS21", i, j)] = LowRankMatPol([1], [basis[: d + 1]])
                psd[Block("SOS22", i, j)] = LowRankMatPol([x], [basis[: d + 1]])
            constraints.append(Constraint(0, psd, free, samples))

    # constraint 3: -f_{ij} >= 0 beyond (r_i + r_j)^2
    lag = basis_laguerre(2 * d + 1, alpha, x * pi())
    for i in range(1, N + 1):
        for j in range(1, i + 1):
            free = {}
            for k in range(0, 2 * d + 2):
                free[(k, i, j)] = lag[k] * (Decimal(math.factorial(k)) / pi() ** k)
            rij2 = (Fraction(r[i - 1]) + Fraction(r[j - 1])) ** 2
            psd = {("SOS31", i, j): LowRankMatPol([1], [basis[:1]]),
                   ("SOS32", i, j): LowRankMatPol([x - rij2], [basis[: d + 1]])}
            constraints.append(Constraint(0, psd, free, samples))

    # constraint 4: M - f_ii(0) >= 0
    lag0 = basis_laguerre(2 * d + 1, alpha, x)
    for i in range(1, N + 1):
        free = {}
        for k in range(0, 2 * d + 2):
            free[(k, i, i)] = (Decimal(math.factorial(k)) / pi() ** k) \
                * _as_decimal(lag0[k](Fraction(0)))
        free["M"] = -1
        psd = {("slack4", i): [[1]]}
        constraints.append(Constraint(0, psd, free))

    obj = Objective(0, {}, {"M": 1})
    return Problem(Minimize(obj), constraints)


def Nsphere_packing(n, d, r, N=None, **kwargs):
    problem = Nsphere_packing_problem(n, d, r, N)
    status, dualsol, primalsol, t, code = solvesdp(problem, **kwargs)
    return problem, status, dualsol, primalsol, code


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clrs_tpu.solver.status import objvalue

    problem, status, ds, ps, code = cohnelkies(
        8, 15, verbose=True, omega_p=100.0, omega_d=100.0,
        dual_error_threshold=1e-10, primal_error_threshold=1e-10)
    print("status:", status, "code:", code)
    val = float(objvalue(problem, ps))
    print("bound:", val, "pi^4/384:", math.pi ** 4 / 384)
