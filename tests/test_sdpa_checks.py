"""SDPA reader + checks tests (reference runtests_solver.jl:228-247)."""

import shutil
import warnings
from pathlib import Path

import pytest

from clrs_tpu.model.checks import check_problem, check_sdp
from clrs_tpu.model.sdpa import sdpa_sparse_to_problem
from clrs_tpu.compile.sdp import ClusteredLowRankSDP
from clrs_tpu.solver.ipm import solvesdp
from clrs_tpu.solver.status import objvalue

FIXTURE = Path(__file__).parent / "fixtures" / "example.dat-s"


def test_sdpa_parse():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p = sdpa_sparse_to_problem(str(FIXTURE))
    # 3 constraints in the file, 1 empty (removed)
    assert len(p.constraints) == 2
    assert p.maximize
    assert check_problem(p)
    sdp = ClusteredLowRankSDP(p)
    assert check_sdp(sdp)


def test_sdpa_solve():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p = sdpa_sparse_to_problem(str(FIXTURE))
    st, ds, ps, t, code = solvesdp(p, verbose=False, omega_p=100., omega_d=100.,
                                   dual_error_threshold=1e-12,
                                   primal_error_threshold=1e-12)
    assert code == 0


def test_remove_empty_blocks():
    """All-zero coefficient blocks (dense and low-rank) are removed before
    the solve, and the solve still reaches the oracle objective
    (checks.jl:64-102 remove_empty_mats!)."""
    from fractions import Fraction

    from clrs_tpu import Constraint, Maximize, Objective, Problem
    from clrs_tpu.model.checks import remove_empty_blocks
    from clrs_tpu.model.problem import LowRankMatPol

    L = [[2, -1, -1], [-1, 2, -1], [-1, -1, 2]]
    n = 3
    obj = Objective(0, {"X": [[Fraction(L[i][j], 4) for j in range(n)]
                              for i in range(n)]}, {})
    zero_dense = [[Fraction(0)] * 2 for _ in range(2)]
    zero_lr = LowRankMatPol([Fraction(0)], [[Fraction(1), Fraction(0)]])
    constraints = []
    for i in range(n):
        M = [[Fraction(1) if (a == i and b == i) else Fraction(0)
              for b in range(n)] for a in range(n)]
        constraints.append(Constraint(1, {"X": M, "Zd": zero_dense,
                                          "Zl": zero_lr}, {}))
    problem = Problem(Maximize(obj), constraints)
    sdp = ClusteredLowRankSDP(problem)
    nblocks0 = sum(len(cl.blocks) for cl in sdp.clusters)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        removed = remove_empty_blocks(sdp, verbose=True)
    assert removed == 2
    assert sum(len(cl.blocks) for cl in sdp.clusters) == nblocks0 - 2
    st, dsol, psol, t, code = solvesdp(
        sdp, verbose=False, omega_p=100.0, omega_d=100.0,
        dual_error_threshold=1e-25, primal_error_threshold=1e-25)
    assert code == 0
    assert float(objvalue(problem, psol)) == pytest.approx(2.25, abs=1e-8)
