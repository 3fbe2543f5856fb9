"""Polynomial toolkit tests (bases, samples, sampled rings, Fekete)."""

from decimal import Decimal
from fractions import Fraction

import pytest

from clrs_tpu import (SampledPolyRing, approximatefekete, basis_chebyshev,
                      basis_gegenbauer, basis_jacobi, basis_laguerre,
                      basis_monomial, polynomial_ring,
                      sample_points_chebyshev, sample_points_padua,
                      sample_points_simplex)
from clrs_tpu.poly.sampled import SampledPoly


def test_mpoly_arithmetic():
    R, x, y = polynomial_ring("x", "y")
    p = (x + y) ** 2
    assert p(2, 3) == 25
    assert p(Fraction(1, 2), Fraction(1, 2)) == 1
    q = x ** 3 - y
    assert q.total_degree() == 3
    assert (p - p).is_zero()
    assert (2 * x)(Fraction(3), 0) == 6


def test_basis_chebyshev_values():
    R, x = polynomial_ring("x")
    v = basis_chebyshev(5, x)
    # T_n(cos t) values at x=1: all 1; at x=-1: (-1)^n
    for n, p in enumerate(v):
        assert p(1) == 1
        assert p(-1) == (-1) ** n
    # T_2 = 2x^2 - 1
    assert v[2](Fraction(1, 2)) == Fraction(-1, 2)


def test_basis_gegenbauer_normalized():
    R, x = polynomial_ring("x")
    v = basis_gegenbauer(6, 4, x)
    for p in v:
        assert p(1) == 1


def test_basis_laguerre_jacobi():
    R, x = polynomial_ring("x")
    # L_2^{(0)}(x) = (x^2 - 4x + 2)/2
    l2 = basis_laguerre(2, 0, x)[2]
    assert l2(Fraction(1)) == Fraction(-1, 2)
    # Jacobi P_1^{(a,b)}(x) = (a+1) + (a+b+2)(x-1)/2
    j1 = basis_jacobi(1, 1, 1, x)[1]
    assert j1(1) == 2
    assert j1(-1) == -2


def test_basis_monomial_count():
    R, x, y = polynomial_ring("x", "y")
    b = basis_monomial(3, x, y)
    assert len(b) == 10  # C(2+3,3)


def test_sample_points():
    pts = sample_points_chebyshev(4, -1, 1)
    assert len(pts) == 5
    assert all(Decimal(-1) < p < Decimal(1) for p in pts)
    simplex = sample_points_simplex(2, 3)
    assert len(simplex) == 10
    assert all(sum(p) <= 1 for p in simplex)
    padua = sample_points_padua(3)
    assert len(padua) == 10


def test_sampled_ring():
    samples = [Fraction(i) for i in range(5)]
    ring = SampledPolyRing(samples)
    R, x = polynomial_ring("x")
    p = ring(x ** 2 + 1)
    q = ring(x)
    assert (p * q)(Fraction(2)) == 10
    assert (p + q).evaluations[3] == 13
    assert (p - p).is_zero()
    assert (q ** 3)(Fraction(2)) == 8
    # composition: evaluate an MPoly at sampled polys
    R2, u = polynomial_ring("u")
    comp = (u ** 2)(q)
    assert isinstance(comp, SampledPoly)
    assert comp(Fraction(3)) == 9


def test_approximatefekete_selects_unisolvent_subset():
    R, x = polynomial_ring("x")
    basis = basis_chebyshev(4, x)
    pts = sample_points_chebyshev(8, -1, 1)
    sbasis, samples = approximatefekete(basis, pts)
    assert len(samples) == 5
    assert len(sbasis) == 5
    # the new basis is orthonormal-ish on the samples: V is well-conditioned
    import numpy as np

    V = np.array([[float(sb.evaluations[i]) for sb in sbasis]
                  for i in range(5)])
    c = np.linalg.cond(V)
    assert c < 10.0
