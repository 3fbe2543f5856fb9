"""Direct tests for the GEMM backends and the f32-expansion substrate.

Covers VERDICT round-1 items: slice_matmul was untested and unwired;
the TPU-sound f32-expansion substrate (exact IEEE f32 words + int8-limb
MXU GEMM) is new in round 2. Accuracy is checked against exact Fraction
arithmetic, including large-dynamic-range operands (the regression class
that broke the round-1 quad-word Cholesky).

Reference kernels being replaced: ClusteredLowRankSolver.jl
src/tools.jl:59-107 (approx_cholesky!), :175-266 (matmul_threaded!).
"""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clrs_tpu.dd import linalg as dl
from clrs_tpu.dd.core import dd_add, dd_div, dd_mul, dd_sqrt
from clrs_tpu.dd.slice_gemm import slice_matmul
from clrs_tpu.dd.limb_gemm import fx_matmul


def _f64_words(a, nw):
    """Host float64 matrix -> nw-word f64 tuple (exact embed)."""
    a = np.asarray(a, dtype=np.float64)
    return (jnp.asarray(a),) + tuple(jnp.zeros_like(jnp.asarray(a))
                                     for _ in range(nw - 1))


def _f32_words(a, nw):
    """Host float64 matrix -> nw-word f32 expansion (exact for nw >= 3)."""
    r = np.asarray(a, dtype=np.float64).copy()
    words = []
    for _ in range(nw):
        w = r.astype(np.float32)
        words.append(jnp.asarray(w))
        r = r - w.astype(np.float64)
    return tuple(words)


def _to_frac(x):
    """Exact value of a multi-word matrix as nested Fractions."""
    arrs = [np.asarray(c, dtype=np.float64) for c in x]
    m, n = arrs[0].shape
    return [[sum(Fraction(float(c[i, j])) for c in arrs) for j in range(n)]
            for i in range(m)]


def _gemm_err(C, FA, FB):
    """Max error of C vs exact FA @ FB, relative to rowmax*colmax scale."""
    m, k = len(FA), len(FA[0])
    n = len(FB[0])
    FC = _to_frac(C)
    worst = 0.0
    for i in range(m):
        for j in range(n):
            t = sum(FA[i][kk] * FB[kk][j] for kk in range(k))
            scale = (max(abs(float(v)) for v in FA[i])
                     * max(abs(float(FB[kk][j])) for kk in range(k))) or 1.0
            worst = max(worst, abs(float(FC[i][j] - t)) / scale)
    return worst


@pytest.mark.parametrize("nw,tol", [(2, 1e-31), (4, 1e-63)])
@pytest.mark.parametrize("expo", [3, 12])
def test_slice_matmul_accuracy(nw, tol, expo):
    """slice GEMM: exact up to the nw-word rounding, incl. dynamic range."""
    rng = np.random.default_rng(42 + nw + expo)
    m, k, n = 7, 13, 9
    A = rng.uniform(-1, 1, (m, k)) * 10.0 ** rng.integers(-expo, expo, (m, k))
    B = rng.uniform(-1, 1, (k, n)) * 10.0 ** rng.integers(-expo, expo, (k, n))
    Aw, Bw = _f64_words(A, nw), _f64_words(B, nw)
    C = jax.jit(slice_matmul)(Aw, Bw)
    err = _gemm_err(C, _to_frac(Aw), _to_frac(Bw))
    assert err < tol, err


@pytest.mark.parametrize("nw,expo,tol", [
    (5, 6, 1e-33),
    # high tier: the f32 exponent floor (subnormals ~1e-45 absolute) caps
    # the achievable relative precision for small-magnitude entries, so the
    # 8-word tier is only fully realized for well-scaled data (expo=0)
    (8, 0, 1e-48),
])
def test_fx_matmul_accuracy(nw, expo, tol):
    """int8-limb GEMM for f32 expansions (the TPU-sound backend)."""
    rng = np.random.default_rng(7 + nw)
    m, k, n = 6, 11, 8
    A = rng.uniform(-1, 1, (m, k)) * 10.0 ** rng.integers(-expo, expo + 1, (m, k))
    B = rng.uniform(-1, 1, (k, n)) * 10.0 ** rng.integers(-expo, expo + 1, (k, n))
    Aw, Bw = _f32_words(A, nw), _f32_words(B, nw)
    C = jax.jit(fx_matmul)(Aw, Bw)
    err = _gemm_err(C, _to_frac(Aw), _to_frac(Bw))
    assert err < tol, err


def test_dd_matmul_dispatches_by_dtype():
    """dd_matmul routes f32 words through the limb GEMM, f64 through slice."""
    rng = np.random.default_rng(3)
    A = rng.standard_normal((4, 5))
    B = rng.standard_normal((5, 3))
    C32 = dl.dd_matmul(_f32_words(A, 5), _f32_words(B, 5))
    C64 = dl.dd_matmul(_f64_words(A, 2), _f64_words(B, 2))
    assert C32[0].dtype == jnp.float32
    assert C64[0].dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(C32[0], dtype=np.float64)
                               + np.asarray(C32[1], dtype=np.float64),
                               np.asarray(C64[0]), rtol=1e-6)


@pytest.mark.parametrize("make_words,nw,tol", [
    (_f64_words, 2, 1e-28), (_f64_words, 4, 1e-55), (_f32_words, 5, 1e-27),
])
def test_cholesky_dynamic_range(make_words, nw, tol):
    """Cholesky accuracy under large dynamic range (round-1 regression class:
    quad-word collapsed from 2^-200 to 2^-76 on diag 1e0..1e10)."""
    rng = np.random.default_rng(11)
    n = 8
    G = rng.standard_normal((n, n))
    D = np.diag(10.0 ** np.linspace(0, 10, n))
    S = D @ (G @ G.T + n * np.eye(n)) @ D
    S = 0.5 * (S + S.T)
    Sw = make_words(S, nw)
    L, ok = jax.jit(dl.dd_cholesky)(Sw)
    assert bool(ok)
    R = jax.jit(dl.dd_matmul)(L, dl.dd_transpose(L))
    FS, FR = _to_frac(Sw), _to_frac(R)
    # per-entry relative to the diagonal scale sqrt(S_ii * S_jj)
    worst = 0.0
    for i in range(n):
        for j in range(n):
            sc = float(FS[i][i] * FS[j][j]) ** 0.5
            worst = max(worst, abs(float(FR[i][j] - FS[i][j])) / sc)
    assert worst < tol, worst


@pytest.mark.parametrize("make_words,nw,tol", [
    (_f64_words, 2, 1e-28), (_f32_words, 5, 1e-26),
])
def test_trisolve_dynamic_range(make_words, nw, tol):
    """Forward substitution: componentwise backward error (exact residual
    via Fractions, normalized per entry by (|L| |X|)_ij) stays at the
    substrate's precision even when cond(L) ~ 1e23."""
    rng = np.random.default_rng(13)
    n = 8
    L = np.tril(rng.standard_normal((n, n)))
    np.fill_diagonal(L, 10.0 ** np.linspace(0, -6, n))
    B = rng.standard_normal((n, 3))
    Lw, Bw = make_words(L, nw), make_words(B, nw)
    X = jax.jit(dl.dd_solve_tril)(Lw, Bw)
    FL, FX, FB = _to_frac(Lw), _to_frac(X), _to_frac(Bw)
    worst = 0.0
    for i in range(n):
        for j in range(3):
            r = sum(FL[i][k] * FX[k][j] for k in range(n)) - FB[i][j]
            scale = sum(abs(float(FL[i][k] * FX[k][j])) for k in range(n))
            worst = max(worst, abs(float(r)) / max(scale, 1e-300))
    assert worst < tol, worst


def test_f32_expansion_elementwise():
    """Generic n-word f32 ops against Fraction (CPU f32 is IEEE, matching
    the TPU's measured-exact f32 — NOTES_TPU_NUMERICS.md).

    Precision model: full ~2^-113 relative accuracy while the expansion's
    tail words stay normal; below that, accuracy is bounded by the f32
    subnormal floor ~2^-149 ABSOLUTE (the chip's emulated f64 has the same
    exponent range). Both regimes asserted."""
    rng = np.random.default_rng(5)
    a = rng.uniform(0.5, 2.0, 32) * 10.0 ** rng.integers(-8, 8, 32)
    b = rng.uniform(0.5, 2.0, 32) * 10.0 ** rng.integers(-8, 8, 32)
    A = _f32_words(a[None, :], 5)
    B = _f32_words(b[None, :], 5)
    FA, FB = _to_frac(A)[0], _to_frac(B)[0]
    # subnormal floor: tail words / Newton intermediates below ~2^-149
    # absolute lose bits; intermediates sit up to ~2^24 above the result's
    # last word, so the observable error floor is ~2^-149 * 2^29
    floor = Fraction(2) ** -120
    for op, ref in [(dd_add, lambda x, y: x + y),
                    (dd_mul, lambda x, y: x * y),
                    (dd_div, lambda x, y: x / y)]:
        R = jax.jit(op)(A, B)
        FR = _to_frac(R)[0]
        for r, x, y in zip(FR, FA, FB):
            t = ref(x, y)
            # guarantee: ~105-bit relative (div's scaled-space refinement
            # costs a few bits off the 113-bit ideal) + subnormal floor
            assert abs(r - t) < abs(t) * Fraction(10) ** -31 + floor
    R = jax.jit(lambda x: dd_sqrt(x, xp=jnp))(A)
    FR = _to_frac(R)[0]
    for r, x in zip(FR, FA):
        assert abs(r * r - x) < x * Fraction(10) ** -33 + floor


def test_fx_matmul_precomputed_operands():
    """host_precompute limb forms give the same GEMM values as the runtime
    extraction (the solver precomputes the constant operands: V panels, Ur
    tables). Representation may differ in sub-1e-37 word splits (XLA
    flushes f32 subnormals; numpy does not), so compare values."""
    import numpy as np

    from clrs_tpu.dd import limb_gemm as lg

    rng = np.random.default_rng(5)
    nw = 5

    def mk(shape):
        h = rng.standard_normal(shape) * 10.0 ** rng.integers(-4, 4, shape)
        ws = []
        for _ in range(nw):
            w = h.astype(np.float32)
            ws.append(w)
            h = h - w.astype(np.float64)
        return tuple(ws)

    A, B = mk((7, 9)), mk((9, 6))
    Ad = tuple(jnp.asarray(c) for c in A)
    Bd = tuple(jnp.asarray(c) for c in B)
    ref = jax.jit(lg.fx_matmul)(Ad, Bd)
    pa = lg.host_precompute(A, nw, axis=1)
    pb = lg.host_precompute(B, nw, axis=0)
    o1 = jax.jit(lambda b: lg.fx_matmul(
        None, b, nw=nw, pre_a=(jnp.asarray(pa[0]), jnp.asarray(pa[1]))))(Bd)
    o2 = jax.jit(lambda a: lg.fx_matmul(
        a, None, nw=nw, pre_b=(jnp.asarray(pb[0]), jnp.asarray(pb[1]))))(Ad)
    val = lambda ws: sum(np.asarray(c, np.float64) for c in ws)  # noqa: E731
    scale = np.abs(val(ref)).max()
    assert np.max(np.abs(val(o1) - val(ref))) < 1e-30 * scale
    assert np.max(np.abs(val(o2) - val(ref))) < 1e-30 * scale
