"""Double-word arithmetic substrate tests (vs Fraction ground truth)."""

from fractions import Fraction

import numpy as np
import pytest

import jax.numpy as jnp

from clrs_tpu.dd import core, linalg


def dd_to_frac(x):
    return Fraction(float(x[0])) + Fraction(float(x[1]))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_scalar_ops_exactness():
    a = (np.float64(1 / 3), np.float64(1.1e-17))
    b = (np.float64(np.pi), np.float64(1.2246467991473532e-16))
    fa, fb = dd_to_frac(a), dd_to_frac(b)
    assert dd_to_frac(core.dd_add(a, b)) == fa + fb  # accurate add is exact here
    assert abs(dd_to_frac(core.dd_mul(a, b)) - fa * fb) < Fraction(1, 10 ** 31)
    assert abs(dd_to_frac(core.dd_div(a, b)) - fa / fb) < Fraction(1, 10 ** 31)
    r = dd_to_frac(core.dd_sqrt((np.float64(2.0), np.float64(0.0))))
    assert abs(r * r - 2) < Fraction(1, 10 ** 31)


def test_matmul_dd_accuracy(rng):
    m, k, n = 7, 33, 5
    ah = rng.standard_normal((m, k))
    al = ah * 1e-17 * rng.standard_normal((m, k))
    bh = rng.standard_normal((k, n))
    bl = bh * 1e-17 * rng.standard_normal((k, n))
    c = linalg.dd_matmul((jnp.array(ah), jnp.array(al)), (jnp.array(bh), jnp.array(bl)))
    fa = [[Fraction(ah[i, t]) + Fraction(al[i, t]) for t in range(k)] for i in range(m)]
    fb = [[Fraction(bh[t, j]) + Fraction(bl[t, j]) for j in range(n)] for t in range(k)]
    for i in range(m):
        for j in range(n):
            truth = sum(fa[i][t] * fb[t][j] for t in range(k))
            got = Fraction(float(c[0][i, j])) + Fraction(float(c[1][i, j]))
            assert abs(got - truth) < Fraction(1, 10 ** 29)


def test_cholesky_and_solves(rng):
    n = 16
    g = rng.standard_normal((n, n))
    a = g @ g.T + n * np.eye(n)
    add = (jnp.array(a), jnp.zeros((n, n)))
    l, ok = linalg.dd_cholesky(add)
    assert bool(ok)
    rec = linalg.dd_matmul(l, linalg.dd_transpose(l))
    # residual must be far below f64 roundoff of a plain cholesky
    assert float(np.max(np.abs(np.asarray(rec[0]) - a + np.asarray(rec[1])))) < 1e-12
    resid_lo = np.abs((np.asarray(rec[0]) - a) + np.asarray(rec[1])).max()
    assert resid_lo < 1e-25

    b = rng.standard_normal((n, 3))
    xs = linalg.dd_solve_cholesky(l, (jnp.array(b), jnp.zeros((n, 3))))
    resid = a @ (np.asarray(xs[0]) + np.asarray(xs[1])) - b
    assert np.max(np.abs(resid)) < 1e-11


def test_cholesky_failure_flag():
    bad = (jnp.array(np.diag([1.0, -1.0, 2.0])), jnp.zeros((3, 3)))
    _, ok = linalg.dd_cholesky(bad)
    assert not bool(ok)


def test_pairwise_sum_compensation():
    x = (jnp.array([1e16, 1.0, -1e16, 1e-17]), jnp.zeros(4))
    s = linalg.dd_sum(x, axis=0)
    assert float(s[0]) == 1.0
    assert abs(float(s[1]) - 1e-17) < 1e-30


def test_triangular_solves(rng):
    n = 10
    l = np.tril(rng.standard_normal((n, n))) + 5 * np.eye(n)
    b = rng.standard_normal((n, 2))
    x = linalg.dd_solve_tril((jnp.array(l), jnp.zeros_like(jnp.array(l))),
                             (jnp.array(b), jnp.zeros((n, 2))))
    assert np.max(np.abs(l @ (np.asarray(x[0]) + np.asarray(x[1])) - b)) < 1e-13
    u = l.T
    x = linalg.dd_solve_triu((jnp.array(u), jnp.zeros((n, n))),
                             (jnp.array(b), jnp.zeros((n, 2))))
    assert np.max(np.abs(u @ (np.asarray(x[0]) + np.asarray(x[1])) - b)) < 1e-13


def test_limb_gemm_dd_accuracy():
    """The f32-expansion int8-MXU GEMM reaches double-word accuracy on
    dd-style inputs with a wide row dynamic range (the mixed-scale regime
    the superseded mxu_gemm prototype used to cover)."""
    from fractions import Fraction

    import jax

    from clrs_tpu.dd.limb_gemm import fx_matmul

    rng = np.random.default_rng(3)
    m, k, n = 8, 32, 6
    ah = rng.standard_normal((m, k)) * 10.0 ** rng.integers(-6, 6, (m, 1))
    al = ah * 1e-17 * rng.standard_normal((m, k))
    bh = rng.standard_normal((k, n))
    bl = bh * 1e-17 * rng.standard_normal((k, n))

    def split_words(h, l, nw=5):
        from clrs_tpu.dd.core import dd_add_f64

        h = np.asarray(h, np.float64)
        l = np.asarray(l, np.float64)
        ws = []
        for _ in range(nw):
            w = (h + l).astype(np.float32)
            ws.append(jnp.asarray(w))
            h, l = dd_add_f64((h, l), -w.astype(np.float64))
        return tuple(ws)

    out = jax.jit(fx_matmul)(split_words(ah, al), split_words(bh, bl))
    for i in range(m):
        sc = max(abs(Fraction(ah[i, t])) for t in range(k))
        for j in range(n):
            truth = sum((Fraction(ah[i, t]) + Fraction(al[i, t]))
                        * (Fraction(bh[t, j]) + Fraction(bl[t, j]))
                        for t in range(k))
            got = sum(Fraction(float(out[w][i, j])) for w in range(len(out)))
            assert abs(got - truth) / sc < Fraction(1, 10 ** 29)


# ---------------------------------------------------------------------------
# blocked factorizations (large-n route: diagonal blocks via the sequential
# kernels, trailing updates via expansion GEMMs — VERDICT r4 item 1)
# ---------------------------------------------------------------------------

def _spd_batch(rng, L, n):
    M = rng.standard_normal((L, n, n))
    return np.einsum("lij,lkj->lik", M, M) + n * np.eye(n)


def _words_of(A, nw, dt):
    a = (jnp.asarray(A, dtype=dt),)
    return a + tuple(jnp.zeros_like(a[0]) for _ in range(nw - 1))


@pytest.mark.parametrize("dt,nw,tol", [(jnp.float64, 2, 1e-26),
                                       (jnp.float32, 5, 1e-30)])
def test_blocked_cholesky_matches_unblocked(rng, dt, nw, tol):
    """Blocked right-looking chol == row-sequential chol up to the per-GEMM
    nw-word rounding, on both substrates (n=130 exercises a ragged final
    diagonal block)."""
    from clrs_tpu.dd.core import dd_sub

    n = 130
    a = _words_of(_spd_batch(rng, 2, n), nw, dt)
    Lb, okb = linalg.b_cholesky(a)          # blocked (n >= _BLK_MIN)
    assert bool(jnp.all(okb))
    linalg._USE_BLOCKED = False
    try:
        Lr, okr = linalg.b_cholesky(a)
    finally:
        linalg._USE_BLOCKED = None
    assert bool(jnp.all(okr))
    scale = float(linalg.dd_max_abs(Lr))
    assert float(linalg.dd_max_abs(dd_sub(Lb, Lr))) < tol * scale


@pytest.mark.parametrize("dt,nw,tol", [(jnp.float64, 2, 1e-24),
                                       (jnp.float32, 5, 1e-28)])
def test_blocked_trisolves_match_unblocked(rng, dt, nw, tol):
    from clrs_tpu.dd.core import dd_sub

    n = 130
    a = _words_of(_spd_batch(rng, 2, n), nw, dt)
    L, ok = linalg.b_cholesky(a)
    assert bool(jnp.all(ok))
    b = _words_of(rng.standard_normal((2, n, 3)), nw, dt)
    xb = linalg.b_solve_tril(L, b)
    xtb = linalg.b_solve_tril_t(L, b)
    linalg._USE_BLOCKED = False
    try:
        xr = linalg.b_solve_tril(L, b)
        xtr = linalg.b_solve_tril_t(L, b)
    finally:
        linalg._USE_BLOCKED = None
    s1 = max(1.0, float(linalg.dd_max_abs(xr)))
    s2 = max(1.0, float(linalg.dd_max_abs(xtr)))
    assert float(linalg.dd_max_abs(dd_sub(xb, xr))) < tol * s1
    assert float(linalg.dd_max_abs(dd_sub(xtb, xtr))) < tol * s2


def test_blocked_cholesky_failure_flag(rng):
    """A non-PSD pivot in a LATE diagonal block must flip ok (per batch
    element) through the blocked route."""
    n = 130
    A = _spd_batch(rng, 2, n)
    A[1, n - 3, n - 3] = -50.0 * n  # indefinite trailing block, element 1
    a = _words_of(A, 2, jnp.float64)
    _, ok = linalg.b_cholesky(a)
    ok = np.asarray(ok)
    assert bool(ok[0]) and not bool(ok[1])
