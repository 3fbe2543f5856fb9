"""Exact rounding pipeline oracles (reference test/runtests_solver.jl:82-164)."""

import sys
from fractions import Fraction
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from clrs_tpu.round.rounding import RoundingSettings, exact_solution
from clrs_tpu.solver.status import matrixvar, objvalue


def test_maxcut_exact_rounding():
    """GW 3-cycle rounds to exactly 9/4 over Q (reference README.md:103)."""
    from maxcut import goemans_williamson

    L = [[2, -1, -1], [-1, 2, -1], [-1, -1, 2]]
    problem, status, dualsol, primalsol, code = goemans_williamson(
        L, omega_p=100.0, omega_d=100.0, verbose=False, eps=1e-18,
        dual_error_threshold=1e-15, primal_error_threshold=1e-15)
    success, esol = exact_solution(problem, dualsol, primalsol, verbose=False)
    assert success
    assert objvalue(problem, esol) == Fraction(9, 4)
    X = matrixvar(esol, "X")
    assert X[0, 1] == Fraction(-1, 2)


def test_delsarte_round_240():
    """delsarte(8,3,1/2) rounds to exactly 240 over Q (the E8 kissing bound,
    reference test/runtests_solver.jl:85-88)."""
    from delsarte_exact import delsarte_round

    success, problem, esol = delsarte_round(
        8, 3, Fraction(1, 2), omega_p=100.0, omega_d=100.0, verbose=False,
        dual_error_threshold=1e-15, primal_error_threshold=1e-15)
    assert success
    assert objvalue(problem, esol) == 240


def test_exact_stack_primitives():
    from clrs_tpu.exact.dixon import solve_dixon
    from clrs_tpu.exact.hnf import hnf_with_transform
    from clrs_tpu.exact.lll import lindep
    from clrs_tpu.exact.rational import mat_mul, rref
    from decimal import Decimal, getcontext

    getcontext().prec = 50
    # lindep recovers the minimal polynomial of sqrt(2)
    x = Decimal(2).sqrt()
    rel = lindep([Fraction(1), Fraction(x), Fraction(x * x)], 40)
    assert rel in ([-2, 0, 1], [2, 0, -1])
    # dixon solves exactly
    A = [[Fraction(2), Fraction(1)], [Fraction(1), Fraction(3)]]
    b = [Fraction(5), Fraction(10)]
    xs = solve_dixon(A, b)
    assert xs == [Fraction(1), Fraction(3)]


@pytest.mark.slow
def test_delsarte_field_rounding_12():
    """delsarte(3,2,1/sqrt5) rounds to exactly 12 over Q(sqrt5)
    (reference runtests_solver.jl:124 uses the same oracle)."""
    from decimal import Decimal

    from clrs_tpu.exact.field import NumberField
    from delsarte_exact import delsarte_round

    FF = NumberField([-5, 0, 1], "z", approx_root=Decimal(5).sqrt())
    costheta = FF.gen().inverse()
    success, problem, esol = delsarte_round(
        3, 2, costheta, FF=FF, g=Decimal(5).sqrt(), eps=1e-20,
        omega_p=100.0, omega_d=100.0, verbose=False,
        dual_error_threshold=1e-16, primal_error_threshold=1e-16,
        settings=RoundingSettings(kernel_errbound=1e-8))
    assert success
    assert objvalue(problem, esol) == 12


@pytest.mark.slow
def test_delsarte_field_rounding_120():
    """delsarte(4,9,1/(z-1)) rounds to exactly 120 over Q(sqrt5) — the
    reference's hardest field-rounding oracle (runtests_solver.jl:98-111)."""
    from decimal import Decimal

    from clrs_tpu.exact.field import NumberField
    from delsarte_exact import delsarte_round

    FF = NumberField([-5, 0, 1], "z", approx_root=Decimal(5).sqrt())
    costheta = (FF.gen() - FF(1)).inverse()
    success, problem, esol = delsarte_round(
        4, 9, costheta, FF=FF, g=Decimal(5).sqrt(), eps=1e-20,
        omega_p=100.0, omega_d=100.0, verbose=False,
        dual_error_threshold=1e-16, primal_error_threshold=1e-16,
        settings=RoundingSettings(kernel_errbound=1e-8))
    assert success
    assert objvalue(problem, esol) == 120


@pytest.mark.slow
def test_find_field_recovers_sqrt5():
    """find_field recovers a field containing sqrt5 from the numerical
    solution (reference runtests_solver.jl:98-105)."""
    from decimal import Decimal

    from clrs_tpu.exact.field import NumberField
    from clrs_tpu.round.find_field import find_field, to_field
    from delsarte_exact import delsarte_exact

    FF = NumberField([-5, 0, 1], "z", approx_root=Decimal(5).sqrt())
    costheta = FF.gen().inverse()
    obj, problem, dualsol, primalsol, code = delsarte_exact(
        3, 2, costheta, FF=FF, g=Decimal(5).sqrt(), eps=1e-20,
        omega_p=100.0, omega_d=100.0, verbose=False,
        dual_error_threshold=1e-16, primal_error_threshold=1e-16)
    N2, g2 = find_field(dualsol, primalsol, 4, valbound=1e-10, errbound=1e-12)
    assert hasattr(N2, "degree") and N2.degree == 2
    gapprox = Decimal(5).sqrt()
    ginfield = to_field(gapprox, N2, g2, errbound=1e-12)
    assert abs(float(ginfield.embed(g2)) - float(gapprox)) < 1e-10


def test_rounding_settings_sweep():
    """Reduced version of the reference's 7-boolean cartesian sweep
    (runtests_solver.jl:112-161): key setting combinations all succeed."""
    from fractions import Fraction as F

    from delsarte_exact import delsarte_exact
    from clrs_tpu import polynomial_ring

    obj, problem, dualsol, primalsol, code = delsarte_exact(
        8, 3, F(1, 2), omega_p=100.0, omega_d=100.0, verbose=False,
        dual_error_threshold=1e-15, primal_error_threshold=1e-15)
    R, x = polynomial_ring("x")
    mb = [x ** k for k in range(7)]
    for reduce_kv in (True, False):
        for unimod in (True, False):
            for pseudo in (True, False):
                settings = RoundingSettings(
                    reduce_kernelvectors=reduce_kv,
                    unimodular_transform=unimod, pseudo=pseudo)
                for bases in (None, [mb]):
                    success, esol = exact_solution(
                        problem, dualsol, primalsol, settings=settings,
                        monomial_bases=bases, verbose=False)
                    assert success, (reduce_kv, unimod, pseudo, bases)
                    assert objvalue(problem, esol) == 240


def test_rounding_new_settings_paths():
    """The previously inert settings are live: kernel_lll (LLL kernel
    detection, rounding.jl:645-740), the windowed kernel reduction
    (reduce_kernelvectors_cutoff/_stepsize, rounding.jl:897-947), and
    extracolumns_linindep (rounding.jl:216-227)."""
    from fractions import Fraction as F

    from delsarte_exact import delsarte_exact

    obj, problem, dualsol, primalsol, code = delsarte_exact(
        8, 3, F(1, 2), omega_p=100.0, omega_d=100.0, verbose=False,
        dual_error_threshold=1e-15, primal_error_threshold=1e-15)
    for settings in (
            # LLL-based kernel detection route
            RoundingSettings(kernel_lll=True, kernel_bits=200),
            # force the windowed big-matrix reduction on this small problem
            RoundingSettings(reduce_kernelvectors_cutoff=2,
                             reduce_kernelvectors_stepsize=2),
            # linearly independent extra columns in the pseudoinverse solve
            RoundingSettings(extracolumns_linindep=True),
    ):
        success, esol = exact_solution(problem, dualsol, primalsol,
                                       settings=settings, verbose=False)
        assert success
        assert objvalue(problem, esol) == 240


@pytest.mark.slow
def test_three_point_bound_exact_10():
    """three_point_spherical_codes(4,1/6,-1,4) rounds to exactly 10
    (reference test/runtests_solver.jl:26-27, 89-93)."""
    from fractions import Fraction as F

    from threepoint import three_point_spherical_codes

    problem, status, ds, ps, code = three_point_spherical_codes(
        4, F(1, 6), -1, 4, verbose=False, omega_p=1000.0, omega_d=1000.0,
        duality_gap_threshold=1e-18,
        dual_error_threshold=1e-15, primal_error_threshold=1e-15)
    assert code == 0
    assert abs(float(objvalue(problem, ps)) - 10.0) < 1e-8
    success, esol = exact_solution(problem, ds, ps, verbose=False,
                                   settings=RoundingSettings(kernel_errbound=1e-8))
    assert success
    assert objvalue(problem, esol) == 10


def test_psd_float_certificate_screen():
    """The float-Cholesky certificate (rounding.jl:367-472's ball-screen
    role) certifies a 32x32 PD rational block with large denominators
    without exact LDL^T entry growth, and never certifies a non-PSD block."""
    import time

    import numpy as np

    from clrs_tpu.exact.field import QQ
    from clrs_tpu.round.rounding import (_is_psd_exact,
                                         _psd_float_certificate)

    rng = np.random.default_rng(7)
    n = 32
    B = rng.integers(-40, 40, (n, n))
    A = B @ B.T + np.eye(n, dtype=np.int64)
    a = [[Fraction(int(A[i, j]), int(rng.integers(1, 10 ** 9)))
          for j in range(n)] for i in range(n)]
    for i in range(n):
        a[i][i] = Fraction(int(A[i, i]) * 10 ** 6)
        for j in range(i):
            a[j][i] = a[i][j]
    t0 = time.time()
    assert _psd_float_certificate(a, n, 1, strict=True)
    assert time.time() - t0 < 5.0   # the whole point: no blowup

    m = np.empty((n, n), dtype=object)
    for i in range(n):
        for j in range(n):
            m[i, j] = a[i][j]
    assert _is_psd_exact(m, QQ, 1, strict=True)

    m2 = m.copy()
    m2[0, 0] = Fraction(-1)
    assert not _psd_float_certificate(
        [[m2[i, j] for j in range(n)] for i in range(n)], n, 1, strict=True)
    assert not _is_psd_exact(m2, QQ, 1, strict=True)
