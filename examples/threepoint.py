"""Three-point bound for spherical codes.

Port of `ClusteredLowRankSolver.jl/examples/ThreePointBound.jl`: the largest
clustered SDP in the benchmark set (S3-symmetric trivariate SOS + univariate
constraint sharing the F_k blocks, so both constraints form one cluster).
Oracle: three_point_spherical_codes(4, 1/6, -1, 4) ~= 10, exact 10 after
rounding (reference test/runtests_solver.jl:26-27, 89-93).

Design difference: the reference picks the trivariate sample subset by a
seeded random shuffle (ThreePointBound.jl:104); we select an (approximately)
unisolvent subset with pivoted QR over the invariant Vandermonde, which is
deterministic and better conditioned.
"""

from fractions import Fraction

import numpy as np
import scipy.linalg

from clrs_tpu import (Constraint, LowRankMatPol, Minimize, Objective, Problem,
                      basis_chebyshev, basis_gegenbauer, polynomial_ring,
                      sample_points_chebyshev, solvesdp)
from clrs_tpu.poly.sampled import SampledPoly, SampledPolyRing


def _coeff(p, i):
    return p.terms.get((i,), 0)


def Q_poly(n, k, u, v, t):
    R, x = polynomial_ring("x")
    p = basis_gegenbauer(k, n, x)[-1]
    tot = 0
    for i in range(k + 1):
        c = _coeff(p, i)
        if c == 0:
            continue
        term = c * ((1 - u ** 2) * (1 - v ** 2)) ** ((k - i) // 2) \
            * (t - u * v) ** i
        tot = term if tot == 0 else tot + term
    return tot


def _mvec(w, d):
    return [w ** k for k in range(d + 1)]


def Smat(n, k, d, u, v, t):
    """S3-symmetrized matrix (ThreePointBound.jl:13-18)."""
    mu = _mvec(u, d - k)
    mv = _mvec(v, d - k)
    mt = _mvec(t, d - k)
    sz = d - k + 1
    out = np.empty((sz, sz), dtype=object)
    quv = Q_poly(n - 1, k, u, v, t)
    qtu = Q_poly(n - 1, k, t, u, v)
    qtv = Q_poly(n - 1, k, t, v, u)
    for i in range(sz):
        for j in range(sz):
            val = quv * (mv[i] * mu[j] + mu[i] * mv[j]) \
                + qtu * (mt[i] * mu[j] + mu[i] * mt[j]) \
                + qtv * (mt[i] * mv[j] + mv[i] * mt[j])
            out[i, j] = Fraction(1, 6) * val
    return out


def _p(u, a, b):
    return (u - a) * (b - u)


def three_point_problem(n, costheta, d2, d3, N2=None, N3=None):
    costheta = Fraction(costheta)
    N2 = max(d2, d3) if N2 is None else N2
    N3 = d3 if N3 is None else N3
    constraints = []

    # --- univariate constraint (ThreePointBound.jl:60-85) ------------------
    W, w = polynomial_ring("w")
    f = {}
    for k in range(d3 + 1):
        T = Smat(n, k, d3, w, w, W(1))
        M = np.empty(T.shape, dtype=object)
        for i in range(T.shape[0]):
            for j in range(T.shape[1]):
                M[i, j] = 3 * T[i, j]
        f[("F", k)] = M
    if d2 >= 0:
        gb = basis_gegenbauer(2 * d2, n, w)
        for k in range(2 * d2 + 1):
            f[("a", k)] = LowRankMatPol([gb[k]], [[1]])
    basis1d = basis_chebyshev(2 * N2, w)
    samples1d = [Fraction(int(np.floor(float(x) * 10 ** 4)), 10 ** 4)
                 for x in sample_points_chebyshev(2 * N2, -1, 1)]
    if N2 >= 0:
        f[("univariatesos", 1)] = LowRankMatPol([1], [basis1d[: N2 + 1]])
    if N2 >= 1:
        f[("univariatesos", 2)] = LowRankMatPol([_p(w, -1, costheta)],
                                                [basis1d[:N2]])
    constraints.append(Constraint(-1, f, {}, samples1d))

    # --- trivariate constraint (ThreePointBound.jl:87-155) -----------------
    R3, u0, v0, t0 = polynomial_ring("u", "v", "t")
    equivariants = [
        [[R3(1)]],
        [[(u0 - v0) * (v0 - t0) * (t0 - u0)]],
        [[2 * u0 - v0 - t0, 2 * v0 * t0 - u0 * t0 - u0 * v0],
         [v0 - t0, u0 * t0 - u0 * v0]],
    ]
    factors = [[1], [1], [Fraction(1, 2), Fraction(3, 2)]]
    weights = [
        R3(1),
        _p(u0, -1, costheta) + _p(v0, -1, costheta) + _p(t0, -1, costheta),
        _p(u0, -1, costheta) * _p(v0, -1, costheta)
        + _p(v0, -1, costheta) * _p(t0, -1, costheta)
        + _p(t0, -1, costheta) * _p(u0, -1, costheta),
        _p(u0, -1, costheta) * _p(v0, -1, costheta) * _p(t0, -1, costheta),
        2 * u0 * v0 * t0 + 1 - u0 ** 2 - v0 ** 2 - t0 ** 2,
    ]

    # invariant monomial count up to degree 2*N3
    inv_degs = [(deg, kk, jj) for deg in range(2 * N3 + 1)
                for kk in range(deg // 3 + 1)
                for jj in range((deg - 3 * kk) // 2 + 1)]
    tmp = len(inv_degs)
    cheb = [sample_points_chebyshev(2 * N3 + k, -1, 1) for k in range(3)]
    grid = [[cheb[0][i], cheb[1][j], cheb[2][k]]
            for i in range(2 * N3 + 1)
            for j in range(2 * N3 + 2)
            for k in range(2 * N3 + 3)]
    # unisolvent subset via pivoted QR over the invariant Vandermonde
    V = np.empty((len(grid), tmp))
    for gi, pt in enumerate(grid):
        su = float(pt[0]) + float(pt[1]) + float(pt[2])
        sp = (float(pt[0]) * float(pt[1]) + float(pt[1]) * float(pt[2])
              + float(pt[0]) * float(pt[2]))
        st = float(pt[0]) * float(pt[1]) * float(pt[2])
        for ci, (deg, kk, jj) in enumerate(inv_degs):
            V[gi, ci] = su ** (deg - 3 * kk - 2 * jj) * sp ** jj * st ** kk
    _, _, piv = scipy.linalg.qr(V.T, pivoting=True)
    chosen = sorted(piv[:tmp])
    samples = sorted(
        tuple(Fraction(int(np.floor(float(x) * 10 ** 4)), 10 ** 4) for x in grid[gi])
        for gi in chosen)
    samples = [list(s) for s in dict.fromkeys(samples)]

    ring = SampledPolyRing(samples)
    u = ring(u0)
    v = ring(v0)
    t = ring(t0)

    F = {}
    for k in range(d3 + 1):
        F[("F", k)] = Smat(n, k, d3, u, v, t)

    _, x = polynomial_ring("x")
    tempbasis = _mvec(x, N3)
    basis3d = []
    degrees3d = []
    e1 = u + v + t
    e2 = u * v + v * t + u * t
    e3 = u * v * t
    for deg, kk, jj in [(d, k2, j2) for d in range(N3 + 1)
                        for k2 in range(d // 3 + 1)
                        for j2 in range((d - 3 * k2) // 2 + 1)]:
        q = tempbasis[deg - 3 * kk - 2 * jj](e1) * tempbasis[jj](e2) \
            * tempbasis[kk](e3)
        basis3d.append(q)
        degrees3d.append(deg)

    for wi, weight in enumerate(weights):
        if weight.total_degree() > 2 * N3:
            continue
        for eqi, eqs in enumerate(equivariants):
            vecs = []
            for row in eqs:
                vec = []
                for eq in row:
                    for q, qdeg in zip(basis3d, degrees3d):
                        if (weight.total_degree() + 2 * eq.total_degree()
                                + 2 * qdeg <= 2 * N3):
                            vec.append(eq * q)
                if vec:
                    vecs.append(vec)
            if vecs:
                F[("trivariatesos", wi + 1, eqi + 1)] = LowRankMatPol(
                    [weight * fac for fac in factors[eqi][: len(vecs)]], vecs)
    constraints.append(Constraint(0, F, {}, samples))

    objdict = {("F", 0): np.ones((d3 + 1, d3 + 1), dtype=object)}
    for k in range(0, 2 * d2 + 1):
        objdict[("a", k)] = [[1]]
    obj = Objective(1, objdict, {})
    return Problem(Minimize(obj), constraints)


def three_point_spherical_codes(n, costheta, d2, d3, **kwargs):
    problem = three_point_problem(n, costheta, d2, d3)
    status, dualsol, primalsol, t, code = solvesdp(problem, **kwargs)
    return problem, status, dualsol, primalsol, code


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clrs_tpu.solver.status import objvalue

    problem, status, ds, ps, code = three_point_spherical_codes(
        4, Fraction(1, 6), -1, 4, verbose=True, omega_p=1000.0, omega_d=1000.0,
        duality_gap_threshold=1e-18,
        dual_error_threshold=1e-15, primal_error_threshold=1e-15)
    print("status:", status, "code:", code)
    print("bound:", float(objvalue(problem, ps)))
