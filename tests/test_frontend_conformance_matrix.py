"""Frontend conformance matrix — the breadth tier of the reference's
`MOI.Test.runtests` pass (test/moi_tests.jl:14-35).

~40 analytic models over the full cone surface (PSD, Hermitian PSD,
nonnegative, free), in the model families the MOI suite covers: linear
equality programs per cone, duplicate/redundant/empty constraints,
objective constants and scaling, multi-block + free-variable coupling,
min/max sign handling, infeasible and unbounded variants, accessor
round-trips. Every optimal case pins the objective to a hand-computed
value; every pathological case pins the documented status/error-code
behavior (reference docs/src/solving.md:64-70) — never a crash.
"""

import math
import warnings
from fractions import Fraction

import pytest

from clrs_tpu.frontend import Model, trace
from clrs_tpu.solver.status import optimal

KW = dict(verbose=False, omega_p=100.0, omega_d=100.0, maxiterations=200,
          dual_error_threshold=1e-12, primal_error_threshold=1e-12)

H = Fraction(1, 2)


# ---------------------------------------------------------------------------
# optimal-value cases: (name, builder) where builder returns
# (model, expected objective value)
# ---------------------------------------------------------------------------

def _lin_max():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 1)
    m.maximize(t)
    return m, 1.0


def _lin_min():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 1)
    m.minimize(t)
    return m, 0.0


def _lin_weighted():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 1)
    m.maximize(2 * t + 3 * u)
    return m, 3.0


def _lin_single_eq():
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(t == H)
    m.maximize(t)
    return m, 0.5


def _lin_boundary_zero():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 0)
    m.maximize(t)
    return m, 0.0


def _lin_duplicate_terms():
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(t + t == 1)    # 2t = 1
    m.maximize(t)
    return m, 0.5


def _lin_objective_constant():
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(t == 1)
    m.maximize(t + 5)
    return m, 6.0


def _lin_scaled_constraint():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t / 2 + u / 2 == H)
    m.maximize(t)
    return m, 1.0


def _lin_rsub():
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(1 - t == 0)
    m.maximize(t)
    return m, 1.0


def _lin_division():
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(t / 3 == 1)
    m.minimize(t)
    return m, 3.0


def _lin_negation():
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(-t == -H)
    m.maximize(t)
    return m, 0.5


def _lin_fraction_coeffs():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(Fraction(1, 3) * t + Fraction(2, 3) * u == Fraction(1, 3))
    m.maximize(t)
    return m, 1.0


def _lin_redundant_duplicate_constraint():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 1)
    m.add_constraint(t + u == 1)   # exact duplicate -> preprocessor removes
    m.maximize(t)
    return m, 1.0


def _psd_trace_offdiag():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 0] + X[1, 1] == 2)
    m.maximize(X[0, 1] + X[1, 0])
    return m, 2.0     # X = ones(2,2)


def _psd_fixed_diag():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(X[1, 1] == 1)
    m.maximize(X[0, 1] + X[1, 0])
    return m, 2.0


def _psd_min_trace():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 1] + X[1, 0] == 2)
    m.minimize(X[0, 0] + X[1, 1])
    return m, 2.0     # det >= 0 forces x00*x11 >= 1; AM-GM min at ones


def _psd_3x3():
    m = Model()
    X = m.psd_variable("X", 3)
    m.add_constraint(trace(X) == 3)
    m.maximize(X[0, 1] + X[1, 0] + X[0, 2] + X[2, 0] + X[1, 2] + X[2, 1])
    return m, 6.0     # X = ones(3,3)


def _psd_1x1_as_nonneg():
    m = Model()
    X = m.psd_variable("X", 1)
    m.add_constraint(X[0, 0] == 3)
    m.minimize(X[0, 0])
    return m, 3.0


def _psd_two_blocks_coupled():
    m = Model()
    X = m.psd_variable("X", 2)
    Y = m.psd_variable("Y", 2)
    m.add_constraint(trace(X) == 2)
    m.add_constraint(trace(X) + 2 * trace(Y) == 4)
    m.maximize(trace(X) + trace(Y))
    return m, 3.0


def _psd_free_coupling():
    m = Model()
    X = m.psd_variable("X", 2)
    y = m.free_variable("y")
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(y - X[0, 0] == 0)
    m.maximize(y)
    return m, 1.0


def _psd_free_negative():
    m = Model()
    X = m.psd_variable("X", 1)
    y = m.free_variable("y")
    m.add_constraint(X[0, 0] == 2)
    m.add_constraint(X[0, 0] + y == 0)   # y = -2
    m.minimize(X[0, 0] + 2 * y)          # 2 - 4 = -2
    return m, -2.0


def _psd_trace_helper():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(trace(X) == 2)
    m.maximize(trace(X))
    return m, 2.0


def _psd_constrain_equal():
    m = Model()
    X = m.psd_variable("X", 2)
    m.constrain_equal(X, [[1, H], [H, 1]])
    m.maximize(X[0, 1] + X[1, 0])
    return m, 1.0


def _psd_nonneg_mix():
    m = Model()
    X = m.psd_variable("X", 2)
    t = m.nonneg_variable("t")
    m.add_constraint(trace(X) + t == 3)
    m.add_constraint(t == 1)
    m.maximize(X[0, 1] + X[1, 0] + t)
    return m, 3.0     # trace(X) = 2 -> offdiag max 2; + t = 1


def _herm_real_offdiag():
    m = Model()
    X = m.hermitian_psd_variable("X", 2)
    m.add_constraint((X[0, 0] + X[1, 1]).real_part() == 2)
    m.maximize((X[0, 1] + X[1, 0]).real_part())
    return m, 2.0


def _herm_imag_constrained():
    # X = [[1, a+i/2],[a-i/2, 1]] PSD  <=>  a^2 + 1/4 <= 1
    # max 2a = sqrt(3)  — an irrational oracle through the Hermitian
    # embedding (ext/MOIExt.jl HermitianPSDCone analogue)
    m = Model()
    X = m.hermitian_psd_variable("X", 2)
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(X[1, 1] == 1)
    m.add_constraint((X[0, 1] - X[1, 0]).imag_part() == 1)
    m.maximize((X[0, 1] + X[1, 0]).real_part())
    return m, math.sqrt(3.0)


def _all_cones_together():
    m = Model()
    X = m.psd_variable("X", 2)
    Hm = m.hermitian_psd_variable("Hm", 2)
    t = m.nonneg_variable("t")
    y = m.free_variable("y")
    m.add_constraint(trace(X) == 2)
    m.add_constraint((Hm[0, 0] + Hm[1, 1]).real_part() == 2)
    m.add_constraint(t == H)
    m.add_constraint(y - t == 0)
    m.maximize(X[0, 1] + X[1, 0]
               + (Hm[0, 1] + Hm[1, 0]).real_part() + t + y)
    return m, 5.0     # 2 + 2 + 1/2 + 1/2


def _min_negative_coeffs():
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 1)
    m.minimize(-t - 2 * u)
    return m, -2.0


def _zero_size_cone_is_inert():
    m = Model()
    Z = m.psd_variable("Z", 0)     # zero cone: no entries, must be inert
    assert len(Z) == 0
    t = m.nonneg_variable("t")
    m.add_constraint(t == 1)
    m.maximize(t)
    return m, 1.0


def _objective_only_maximized_var():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[1, 1] == 1)
    m.add_constraint(X[0, 0] + X[0, 1] + X[1, 0] == 1)
    m.maximize(X[0, 0])
    # max x00 s.t. x00 + 2x01 = 1, x11 = 1, x01^2 <= x00:
    # x01 = (1-x00)/2; PSD needs ((1-x00)/2)^2 <= x00 -> x00 max at
    # boundary x00 = 3 - 2*sqrt(2)... maximizing x00: constraint allows
    # x00 up to where x01 = (1-x00)/2 negative is fine; bound is
    # ((1-x00)/2)^2 <= x00  <=>  x00^2 - 6 x00 + 1 <= 0
    # -> x00 <= 3 + 2 sqrt(2)
    return m, 3.0 + 2.0 * math.sqrt(2.0)


def _empty_objective_feasibility():
    # pure feasibility problem: maximize 0 over a pinned PSD block
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(X[1, 1] == 1)
    m.maximize(0 * X[0, 0])
    return m, 0.0


def _objective_repeated_variable():
    # t + t must accumulate to 2t (MOI duplicate-term canonicalization)
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(t == 3)
    m.maximize(t + t)
    return m, 6.0


def _constraint_constant_both_sides():
    # 2 == t + 1  ->  t = 1
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(2 == t + 1)
    m.maximize(t)
    return m, 1.0


def _constraint_expr_minus_expr():
    # (t + u) - (u - t) == 4  ->  2t = 4
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint((t + u) - (u - t) == 4)
    m.add_constraint(u == 1)
    m.minimize(t + u)
    return m, 3.0


def _nonneg_partition():
    # max t with t + u = 3, both nonneg -> 3 at u = 0 (cone boundary)
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 3)
    m.maximize(t)
    return m, 3.0


def _free_negative_objective():
    # free variable pinned to a negative value through the objective
    m = Model()
    X = m.psd_variable("X", 1)
    w = m.free_variable("w")
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(w + X[0, 0] == -4)
    m.minimize(w + 2 * X[0, 0])
    return m, -3.0


def _psd_scaled_diag():
    # max X01+X10 s.t. 4*X00 == 1, X11 == 4: |x01| <= sqrt(x00 x11) = 1
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(4 * X[0, 0] == 1)
    m.add_constraint(X[1, 1] == 4)
    m.maximize(X[0, 1] + X[1, 0])
    return m, 2.0


def _psd_4x4_corner():
    # max X[0,3]+X[3,0] with unit diagonal -> 2 (rank-1 corner matrix)
    m = Model()
    X = m.psd_variable("X", 4)
    for i in range(4):
        m.add_constraint(X[i, i] == 1)
    m.maximize(X[0, 3] + X[3, 0])
    return m, 2.0


def _minimize_with_constant_offset():
    # min (t + 7/2) s.t. t == 1/2 -> 4
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(t == H)
    m.minimize(t + Fraction(7, 2))
    return m, 4.0


def _psd_1x1_repeated_in_constraint():
    # same 1x1 block referenced twice in one constraint: 3*X00 == 6
    m = Model()
    X = m.psd_variable("X", 1)
    m.add_constraint(X[0, 0] + 2 * X[0, 0] == 6)
    m.maximize(X[0, 0])
    return m, 2.0


def _herm_two_blocks():
    # two independent Hermitian blocks, objective sums their real corners
    m = Model()
    A = m.hermitian_psd_variable("A", 2)
    B = m.hermitian_psd_variable("B", 2)
    for M in (A, B):
        m.add_constraint(M[0, 0] + M[1, 1] == 2)
    m.maximize(A[0, 1] + A[1, 0] + B[0, 1] + B[1, 0])
    # per block: max 2*Re(a01) with a00+a11=2, |a01| <= sqrt(a00 a11) <= 1
    return m, 4.0


def _chain_coupling_all_cones():
    # psd -> free -> nonneg equality chain; optimum pinned through chain
    m = Model()
    X = m.psd_variable("X", 2)
    w = m.free_variable("w")
    t = m.nonneg_variable("t")
    m.add_constraint(X[0, 0] == 2)
    m.add_constraint(w - X[0, 0] == 1)
    m.add_constraint(t + w == 5)
    m.add_constraint(X[1, 1] == 1)
    m.maximize(t + X[0, 1] + X[1, 0])
    # w = 3, t = 2, max x01+x10 = 2*sqrt(2)
    return m, 2.0 + 2.0 * math.sqrt(2.0)


OPTIMAL_CASES = [
    ("empty_objective_feasibility", _empty_objective_feasibility),
    ("objective_repeated_variable", _objective_repeated_variable),
    ("constraint_constant_both_sides", _constraint_constant_both_sides),
    ("constraint_expr_minus_expr", _constraint_expr_minus_expr),
    ("nonneg_partition", _nonneg_partition),
    ("free_negative_objective", _free_negative_objective),
    ("psd_scaled_diag", _psd_scaled_diag),
    ("psd_4x4_corner", _psd_4x4_corner),
    ("minimize_with_constant_offset", _minimize_with_constant_offset),
    ("psd_1x1_repeated_in_constraint", _psd_1x1_repeated_in_constraint),
    ("herm_two_blocks", _herm_two_blocks),
    ("chain_coupling_all_cones", _chain_coupling_all_cones),
    ("lin_max", _lin_max),
    ("lin_min", _lin_min),
    ("lin_weighted", _lin_weighted),
    ("lin_single_eq", _lin_single_eq),
    ("lin_boundary_zero", _lin_boundary_zero),
    ("lin_duplicate_terms", _lin_duplicate_terms),
    ("lin_objective_constant", _lin_objective_constant),
    ("lin_scaled_constraint", _lin_scaled_constraint),
    ("lin_rsub", _lin_rsub),
    ("lin_division", _lin_division),
    ("lin_negation", _lin_negation),
    ("lin_fraction_coeffs", _lin_fraction_coeffs),
    ("lin_redundant_duplicate_constraint",
     _lin_redundant_duplicate_constraint),
    ("psd_trace_offdiag", _psd_trace_offdiag),
    ("psd_fixed_diag", _psd_fixed_diag),
    ("psd_min_trace", _psd_min_trace),
    ("psd_3x3", _psd_3x3),
    ("psd_1x1_as_nonneg", _psd_1x1_as_nonneg),
    ("psd_two_blocks_coupled", _psd_two_blocks_coupled),
    ("psd_free_coupling", _psd_free_coupling),
    ("psd_free_negative", _psd_free_negative),
    ("psd_trace_helper", _psd_trace_helper),
    ("psd_constrain_equal", _psd_constrain_equal),
    ("psd_nonneg_mix", _psd_nonneg_mix),
    ("herm_real_offdiag", _herm_real_offdiag),
    ("herm_imag_constrained", _herm_imag_constrained),
    ("all_cones_together", _all_cones_together),
    ("min_negative_coeffs", _min_negative_coeffs),
    ("zero_size_cone_is_inert", _zero_size_cone_is_inert),
    ("objective_only_maximized_var", _objective_only_maximized_var),
]


@pytest.mark.parametrize("name,builder", OPTIMAL_CASES,
                         ids=[n for n, _ in OPTIMAL_CASES])
def test_optimal_case(name, builder):
    m, expected = builder()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        st = m.solve(**KW)
    assert m.errorcode == 0, (name, st, m.errorcode)
    assert optimal(st), (name, st)
    v = float(m.objective_value())
    assert v == pytest.approx(expected, abs=2e-8), (name, v, expected)


# ---------------------------------------------------------------------------
# pathological cases: documented failure behavior, never a crash
# ---------------------------------------------------------------------------

def _infeas_psd_1x1():
    m = Model()
    X = m.psd_variable("X", 1)
    m.add_constraint(X[0, 0] == -1)
    m.maximize(0 * X[0, 0])
    return m


def _infeas_nonneg():
    m = Model()
    t = m.nonneg_variable("t")
    X = m.psd_variable("X", 1)
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(t == -2)
    m.maximize(t)
    return m


def _infeas_psd_offdiag():
    # x00 = 0 forces x01 = 0 for PSD, but x01 + x10 = 2 demanded
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 0] == 0)
    m.add_constraint(X[1, 1] == 1)
    m.add_constraint(X[0, 1] + X[1, 0] == 2)
    m.maximize(0 * X[0, 0])
    return m


def _unbounded_psd():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(X[0, 1] + X[1, 0] == 0)
    m.maximize(X[0, 0])
    return m


def _unbounded_free():
    m = Model()
    X = m.psd_variable("X", 1)
    y = m.free_variable("y")
    m.add_constraint(X[0, 0] - y == 0)
    m.maximize(X[0, 0])
    return m


FAILURE_CASES = [
    ("infeas_psd_1x1", _infeas_psd_1x1),
    ("infeas_nonneg", _infeas_nonneg),
    ("infeas_psd_offdiag", _infeas_psd_offdiag),
    ("unbounded_psd", _unbounded_psd),
    ("unbounded_free", _unbounded_free),
]


@pytest.mark.parametrize("name,builder", FAILURE_CASES,
                         ids=[n for n, _ in FAILURE_CASES])
def test_failure_case(name, builder):
    m = builder()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        st = m.solve(max_complementary_gap=1e30, **KW)
    assert m.errorcode in (1, 2, 3, 4), (name, st, m.errorcode)
    assert not optimal(st), (name, st)


def test_contradictory_equalities_raise_preprocess_error():
    """0 = b with b != 0 after elimination raises, as the reference's
    lindep tier expects a throw (test/runtests_solver.jl:249-314)."""
    from clrs_tpu.compile.preprocess import PreprocessError

    m = Model()
    X = m.psd_variable("X", 1)
    w = m.free_variable("w")
    m.add_constraint(X[0, 0] == 1)
    m.add_constraint(w == 1)
    m.add_constraint(w == 2)
    m.maximize(X[0, 0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(PreprocessError):
            m.solve(**KW)


def test_value_accessor_matches_objective():
    m = Model()
    X = m.psd_variable("X", 2)
    m.add_constraint(trace(X) == 2)
    obj = X[0, 1] + X[1, 0]
    m.maximize(obj)
    m.solve(**KW)
    assert abs(m.value(obj).real - float(m.objective_value())) < 1e-9


def test_status_reports_pdopt_string():
    m = Model()
    t = m.nonneg_variable("t")
    m.add_constraint(t == 1)
    m.maximize(t)
    st = m.solve(**KW)
    assert "pdOpt" in str(st)


def test_resolve_after_modification():
    """Adding a constraint and re-solving uses the new model (MOI
    incremental-modification analogue)."""
    m = Model()
    t, u = m.nonneg_variable("t"), m.nonneg_variable("u")
    m.add_constraint(t + u == 1)
    m.maximize(t)
    st = m.solve(**KW)
    assert float(m.objective_value()) == pytest.approx(1.0, abs=1e-8)
    m.add_constraint(t == H)
    st = m.solve(**KW)
    assert float(m.objective_value()) == pytest.approx(0.5, abs=1e-8)
