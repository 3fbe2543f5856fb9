"""Front-end (MOI/JuMP-equivalent) oracles.

Reference: `test/moi_tests.jl:6-11` asserts theta(C5) = sqrt5 and the POVM
value = 1/2 + sqrt2/4, both exact after rounding over the detected field.
"""

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from theta_povm import exact_solution, find_field, lovasz_theta_c5, povm  # noqa: E402


def test_lovasz_theta_c5_exact():
    m = lovasz_theta_c5(maxiterations=250)
    v = float(m.objective_value())
    assert abs(v - math.sqrt(5)) < 1e-12
    FF, g = find_field(m)
    assert FF.degree == 2
    ok, prob, esol = exact_solution(m, FF=FF, g=g, verbose=False)
    assert ok
    from clrs_tpu.solver.status import objvalue

    ev = objvalue(prob, esol)
    assert ev * ev == 5  # exact: theta(C5) = sqrt(5)


def test_povm_exact():
    m = povm(maxiterations=250)
    v = float(m.objective_value())
    assert abs(v - (0.5 + math.sqrt(2) / 4)) < 1e-12
    FF, g = find_field(m)
    assert FF.degree == 2
    ok, prob, esol = exact_solution(m, FF=FF, g=g, verbose=False)
    assert ok
    from clrs_tpu.solver.status import objvalue
    from fractions import Fraction

    ev = objvalue(prob, esol)
    d = ev - Fraction(1, 2)
    assert d * d == Fraction(1, 8)  # exact: 1/2 + sqrt(2)/4


def test_model_value_and_free_vars():
    """free variables + value(): min t s.t. t - x11 = 0, x11 >= 1 (1x1 PSD
    with constraint), optimum t = 1."""
    from clrs_tpu.frontend import Model

    m = Model()
    t = m.free_variable("t")
    x = m.nonneg_variable("s")  # slack: x = t - 1 >= 0
    m.add_constraint(t - x == 1)
    m.minimize(t)
    m.solve(verbose=False, omega_p=100.0, omega_d=100.0,
            duality_gap_threshold=1e-20, maxiterations=150)
    assert abs(float(m.objective_value()) - 1.0) < 1e-10
    assert abs(m.value(t).real - 1.0) < 1e-10


def test_duplicate_names_rejected():
    from clrs_tpu.frontend import Model

    m = Model()
    m.psd_variable("X", 2)
    with pytest.raises(ValueError):
        m.psd_variable("X", 3)
