"""Frontend conformance tier: edge models through clrs_tpu.frontend.Model.

The analogue of the reference's `MOI.Test.runtests` pass
(test/moi_tests.jl:14-35): small pathological models — infeasible,
unbounded, empty/trivial cones, duplicate coefficients — must produce the
documented statuses/error codes (docs: error codes 0-4,
reference docs/src/solving.md:64-70), never crash."""

import warnings
from fractions import Fraction

import numpy as np
import pytest

from clrs_tpu.frontend import Model
from clrs_tpu.solver.status import optimal

KW = dict(verbose=False, omega_p=100.0, omega_d=100.0, maxiterations=150,
          dual_error_threshold=1e-12, primal_error_threshold=1e-12)


def test_simple_psd_model_optimal():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 0] + X[1, 1] == 2)
    m.maximize(X[0, 1] + X[1, 0])
    st = m.solve(**KW)
    assert optimal(st) and m.errorcode == 0
    # max X01+X10 s.t. trace=2, X psd -> X = [[1,1],[1,1]], objective 2
    assert abs(float(m.objective_value()) - 2.0) < 1e-9


def test_infeasible_model_short_step():
    """x11 >= 0 (PSD) with x11 = -1 is infeasible: the solver must stop
    with a short-step/failure code (3 or 4, solver.jl error codes), not
    'optimal' and not an exception."""
    m = Model()
    X = m.psd_variable("X", 1)
    m.add_constraint(X[0, 0] == -1)
    m.maximize(0 * X[0, 0])
    st = m.solve(**KW)
    assert m.errorcode in (1, 2, 3, 4)
    assert not optimal(st)


def test_unbounded_model_detected():
    """max x11 with only a free-variable tie: unbounded primal; the dual
    becomes infeasible so mu blows up or steps shrink — again a nonzero
    error code, no crash."""
    m = Model()
    X = m.psd_variable("X", 1)
    y = m.free_variable("y")
    m.add_constraint(X[0, 0] - y == 0)
    m.maximize(X[0, 0])
    st = m.solve(max_complementary_gap=1e30, **KW)
    assert m.errorcode in (1, 2, 3, 4)
    assert not optimal(st)


def test_duplicate_coefficients_accumulate():
    """Adding the same entry twice in one expression must sum, as MOI's
    duplicate-term handling requires."""
    m = Model()
    X = m.psd_variable("X", 2)
    expr = X[0, 0] + X[0, 0] + X[1, 1]   # 2*x00 + x11
    m.add_constraint(expr == 3)
    m.maximize(X[0, 0])
    st = m.solve(**KW)
    assert optimal(st)
    assert abs(float(m.objective_value()) - 1.5) < 1e-9


def test_trivial_empty_objective():
    """Feasibility-only model (zero objective)."""
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(X[1, 1] == 1)
    m.maximize(0 * X[0, 0])
    st = m.solve(**KW)
    assert m.errorcode == 0 and optimal(st)
    assert abs(float(m.objective_value())) < 1e-9


def test_nonneg_scalar_cone():
    m = Model()
    t = m.nonneg_variable("t")
    u = m.nonneg_variable("u")
    m.add_constraint(t + u == 1)
    m.maximize(t - u)
    st = m.solve(**KW)
    assert optimal(st)
    assert abs(float(m.objective_value()) - 1.0) < 1e-9


def test_free_variable_only_objective_warns():
    """A free variable used only in the objective is flagged by
    check_problem (the reference @warns, interface.jl:1026) and the solve
    fails gracefully rather than crashing."""
    from clrs_tpu.model.checks import check_problem

    m = Model()
    X = m.psd_variable("X", 1)
    y = m.free_variable("y")
    m.add_constraint(X[0, 0] == 1)
    m.maximize(y)
    problem = m.build_problem()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ok = check_problem(problem)
    assert not ok and any("objective" in str(w.message) for w in rec)


def test_value_accessors_roundtrip():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 0] + X[1, 1] == 2)
    m.maximize(X[0, 1] + X[1, 0])
    m.solve(**KW)
    v00 = m.value(X[0, 0])
    v01 = m.value(X[0, 1])
    assert abs(v00.real - 1.0) < 1e-8 and abs(v01.real - 1.0) < 1e-8
