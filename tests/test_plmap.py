"""The fused Pallas elementwise path (dd.pallas_linalg.pl_map) — the
TPU-gated branch that crashed the round-3 bench untested.

Round-3 lesson encoded here: every TPU-gated branch must be forcible on
CPU (where Pallas runs in interpret mode) and exercised by CI. The
`step._USE_PLMAP` override mirrors `step._STEPLEN_VERIFIED`.
"""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clrs_tpu.dd import expops as E
from clrs_tpu.dd import pallas_linalg as P
from clrs_tpu.solver import step as st


def _mk(vals, nw=5):
    h = np.asarray(vals, np.float64)
    ws = []
    for _ in range(nw):
        w = h.astype(np.float32)
        ws.append(jnp.asarray(w))
        h = h - w.astype(np.float64)
    return tuple(ws)


def _val(ws):
    return sum(np.asarray(c, np.float64) for c in ws)


def test_pl_map_broadcast_scalar_first():
    """Exact round-3 crash shape: a [L,1,1]-broadcast scalar as args[0],
    full [L,n,n] tensor second; output must take the broadcast shape
    (pallas_linalg.py round-3 bug: dims were read from args[0] alone)."""
    rng = np.random.default_rng(0)
    L, n, nw = 3, 6, 5
    mu = _mk(rng.standard_normal((L, 1, 1)), nw)
    xy = _mk(rng.standard_normal((L, n, n)), nw)
    eye = (jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (L, n, n)),)

    def f(m, e, x):
        muI = tuple(mw * e[0] for mw in m)
        return E.exp_sub(muI, x)

    out = P.pl_map(f, nw, [mu, eye, xy])
    assert out[0].shape == (L, n, n)
    ref = _val(mu) * np.eye(n) - _val(xy)
    assert np.max(np.abs(_val(out) - ref)) < 1e-12


def test_pl_map_matches_unfused_chain():
    """pl_map(fn) == fn applied via plain XLA ops, for a mixed-rank chain."""
    rng = np.random.default_rng(1)
    L, n, nw = 2, 5, 4
    a = _mk(rng.standard_normal((L, n, n)), nw)
    b = _mk(rng.standard_normal((L, n, n)), nw)
    s = _mk(rng.standard_normal((L, 1, 1)), nw)

    def f(x, y, c):
        return E.exp_add(E.exp_mul(x, c), y)

    fused = P.pl_map(f, nw, [a, b, s])
    plain = f(a, b, s)
    for fw, pw in zip(fused, plain):
        assert np.array_equal(np.asarray(fw), np.asarray(pw))


def _delsarte_problem():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from delsarte import delsarte_problem

    return delsarte_problem(3, 4, Fraction(1, 2))


@pytest.mark.slow
def test_full_step_fused_vs_unfused():
    """Drive full f32-substrate IPM steps through the fused pl_map path
    (forced on CPU, Pallas interpreter) and assert the trajectory equals
    the unfused path — the test that would have caught the round-3 crash
    at trace time AND any numeric regression."""
    from clrs_tpu.compile.sdp import ClusteredLowRankSDP
    from clrs_tpu.solver.step import DeviceSDP, initial_state, make_step

    sdp = ClusteredLowRankSDP(_delsarte_problem())
    traj = {}
    for tag, force in [("unfused", False), ("fused", True)]:
        old = st._USE_PLMAP
        st._USE_PLMAP = force
        try:
            ds = DeviceSDP(sdp, nw=5, dtype=jnp.float32)
            step = make_step(ds, gamma=0.9, beta_feasible=0.1,
                             beta_infeasible=0.3,
                             dual_error_threshold=1e-12,
                             primal_error_threshold=1e-12)
            state = initial_state(ds, 100.0, 100.0)
            feas = False
            rows = []
            for _ in range(4):
                state, info = step(state, feas)
                feas = bool(info["pd_feas"])
                assert bool(info["ok"])
                rows.append((float(info["mu"]), float(info["d_obj"]),
                             float(info["p_obj"]), float(info["alpha_d"]),
                             float(info["alpha_p"])))
            traj[tag] = rows
        finally:
            st._USE_PLMAP = old
    for ru, rf in zip(traj["unfused"], traj["fused"]):
        for a, b in zip(ru, rf):
            assert a == pytest.approx(b, rel=1e-13, abs=1e-18), (ru, rf)


def test_pl_cascade_bit_identical_to_xla_cascade():
    """The Pallas GEMM-cascade kernel (limb_gemm._USE_PLCASCADE, the TPU
    default) must be bit-identical to the XLA cascade — forced on CPU
    through the Pallas interpreter (round-4 rule: every TPU-gated branch
    CPU-testable). Unbatched only: vmap-of-interpreted-pallas compiles
    pathologically slowly on CPU; the batched path is exercised on-chip by
    the bench."""
    from clrs_tpu.dd import limb_gemm as lg

    rng = np.random.default_rng(0)

    def mkw(vals, nw=5):
        h = np.asarray(vals, np.float64)
        ws = []
        for _ in range(nw):
            w = h.astype(np.float32)
            ws.append(jnp.asarray(w))
            h = h - w.astype(np.float64)
        return tuple(ws)

    A = mkw(rng.standard_normal((7, 9)) * 10.0 ** rng.integers(-6, 6, (7, 9)))
    B = mkw(rng.standard_normal((9, 5)))
    old = lg._USE_PLCASCADE
    try:
        lg._USE_PLCASCADE = False
        r0 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        lg._USE_PLCASCADE = True
        r1 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
    finally:
        lg._USE_PLCASCADE = old
    for c0, c1 in zip(r0, r1):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))


def test_pl_extract_bit_identical_to_xla_extraction():
    """The Pallas limb-extraction kernel (limb_gemm._USE_PLEXTRACT, the TPU
    default) must be bit-identical to the XLA scaling+extraction chain —
    forced on CPU through the Pallas interpreter. Covers both operand
    sides, extreme magnitudes (exponent scaling > 126), zero rows, and
    the pre_a/pre_b mixed case."""
    from clrs_tpu.dd import limb_gemm as lg

    rng = np.random.default_rng(2)

    def mkw(vals, nw=5):
        h = np.asarray(vals, np.float64)
        ws = []
        for _ in range(nw):
            w = h.astype(np.float32)
            ws.append(jnp.asarray(w))
            h = h - w.astype(np.float64)
        return tuple(ws)

    Av = rng.standard_normal((6, 8)) * 10.0 ** rng.integers(-30, 30, (6, 8))
    Av[2, :] = 0.0                          # zero row -> mag fallback
    A = mkw(Av)
    B = mkw(rng.standard_normal((8, 4)))
    pre_b = lg.host_precompute(tuple(np.asarray(c) for c in B), 5, axis=0)
    pre_b = (jnp.asarray(pre_b[0]), jnp.asarray(pre_b[1]))
    oldx, oldc = lg._USE_PLEXTRACT, lg._USE_PLCASCADE
    try:
        lg._USE_PLCASCADE = False           # isolate the extraction branch
        lg._USE_PLEXTRACT = False
        r0 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        p0 = jax.jit(lambda a: lg.fx_matmul(a, None, nw=5, pre_b=pre_b))(A)
        lg._USE_PLEXTRACT = True
        r1 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        p1 = jax.jit(lambda a: lg.fx_matmul(a, None, nw=5, pre_b=pre_b))(A)
    finally:
        lg._USE_PLEXTRACT, lg._USE_PLCASCADE = oldx, oldc
    for c0, c1 in zip(r0, r1):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))
    for c0, c1 in zip(p0, p1):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))


def test_pl_cascade_grid_bit_identical_to_xla_cascade():
    """The GRID-TILED cascade kernel (the route for GEMMs whose int8-GEMM
    output exceeds the whole-C VMEM budget — every Schur-scale panel GEMM)
    must be bit-identical to the XLA segment_sum + cascade form. Forced on
    CPU through the Pallas interpreter by shrinking the budget to 0, which
    routes EVERY shape through pl_cascade_tiles_grid; non-tile-multiple
    (m, n) exercises the padding path."""
    from clrs_tpu.dd import limb_gemm as lg

    rng = np.random.default_rng(5)

    def mkw(vals, nw=5):
        h = np.asarray(vals, np.float64)
        ws = []
        for _ in range(nw):
            w = h.astype(np.float32)
            ws.append(jnp.asarray(w))
            h = h - w.astype(np.float64)
        return tuple(ws)

    A = mkw(rng.standard_normal((7, 9)) * 10.0 ** rng.integers(-6, 6, (7, 9)))
    B = mkw(rng.standard_normal((9, 5)))
    old, oldb = lg._USE_PLCASCADE, lg._PLCASCADE_C_BUDGET
    try:
        lg._USE_PLCASCADE = False
        r0 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        lg._USE_PLCASCADE = True
        lg._PLCASCADE_C_BUDGET = 0          # force the grid-tiled route
        r1 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
    finally:
        lg._USE_PLCASCADE, lg._PLCASCADE_C_BUDGET = old, oldb
    for c0, c1 in zip(r0, r1):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))


def test_pl_limb_gemm_fused_bit_identical_to_xla():
    """The FUSED limb-GEMM kernel (MXU dots + diagonal cascade in ONE
    kernel — the route for GEMMs whose int8 output exceeds the whole-C
    VMEM budget) must be bit-identical to the XLA segment_sum + cascade
    form: int32 diagonal sums are associative-exact and the EFT fold
    sequence is shared. Forced on CPU through the Pallas interpreter with
    budget 0; covers runtime-extracted and host-precomputed operands and
    non-tile-multiple shapes (padding)."""
    from clrs_tpu.dd import limb_gemm as lg

    rng = np.random.default_rng(9)

    def mkw(vals, nw=5):
        h = np.asarray(vals, np.float64)
        ws = []
        for _ in range(nw):
            w = h.astype(np.float32)
            ws.append(jnp.asarray(w))
            h = h - w.astype(np.float64)
        return tuple(ws)

    A = mkw(rng.standard_normal((7, 9)) * 10.0 ** rng.integers(-6, 6, (7, 9)))
    B = mkw(rng.standard_normal((9, 5)))
    pre_b = lg.host_precompute(tuple(np.asarray(c) for c in B), 5, axis=0)
    pre_b = (jnp.asarray(pre_b[0]), jnp.asarray(pre_b[1]))
    olds = (lg._USE_PLCASCADE, lg._USE_PLEXTRACT, lg._USE_PLFUSED,
            lg._PLCASCADE_C_BUDGET)
    try:
        lg._USE_PLCASCADE = lg._USE_PLEXTRACT = lg._USE_PLFUSED = False
        r0 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        p0 = jax.jit(lambda a: lg.fx_matmul(a, None, nw=5, pre_b=pre_b))(A)
        lg._USE_PLFUSED = True
        lg._USE_PLEXTRACT = True
        lg._PLCASCADE_C_BUDGET = 0          # force the fused route
        r1 = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        p1 = jax.jit(lambda a: lg.fx_matmul(a, None, nw=5, pre_b=pre_b))(A)
    finally:
        (lg._USE_PLCASCADE, lg._USE_PLEXTRACT, lg._USE_PLFUSED,
         lg._PLCASCADE_C_BUDGET) = olds
    for c0, c1 in zip(r0, r1):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))
    for c0, c1 in zip(p0, p1):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="validates the Mosaic HARDWARE lowering")
def test_fx_matmul_on_chip_matches_xla_path():
    """ON-TPU bit-identity of the full Pallas route (extract + fused /
    cascade kernels, REAL Mosaic lowering — lax.round TO_NEAREST_EVEN and
    the bitcast pow2 construction on hardware) against the forced-XLA
    path on the same chip (ADVICE r4 #3: the interpreter tests validate
    the kernel algebra, not the lowering)."""
    from clrs_tpu.dd import limb_gemm as lg

    rng = np.random.default_rng(21)

    def mkw(vals, nw=5):
        h = np.asarray(vals, np.float64)
        ws = []
        for _ in range(nw):
            w = h.astype(np.float32)
            ws.append(jnp.asarray(w))
            h = h - w.astype(np.float64)
        return tuple(ws)

    A = mkw(rng.standard_normal((24, 16))
            * 10.0 ** rng.integers(-6, 6, (24, 16)))
    B = mkw(rng.standard_normal((16, 24)))
    olds = (lg._USE_PLCASCADE, lg._USE_PLEXTRACT, lg._USE_PLFUSED,
            lg._PLCASCADE_C_BUDGET)
    try:
        lg._USE_PLCASCADE = lg._USE_PLEXTRACT = lg._USE_PLFUSED = False
        r_xla = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        lg._USE_PLCASCADE = lg._USE_PLEXTRACT = lg._USE_PLFUSED = True
        r_pl = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
        lg._PLCASCADE_C_BUDGET = 0          # now force the fused kernel
        r_fu = jax.jit(lambda a, b: lg.fx_matmul(a, b))(A, B)
    finally:
        (lg._USE_PLCASCADE, lg._USE_PLEXTRACT, lg._USE_PLFUSED,
         lg._PLCASCADE_C_BUDGET) = olds
    for c0, c1 in zip(r_xla, r_pl):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))
    for c0, c1 in zip(r_xla, r_fu):
        assert np.array_equal(np.asarray(c0), np.asarray(c1))
