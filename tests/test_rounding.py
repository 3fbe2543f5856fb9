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
