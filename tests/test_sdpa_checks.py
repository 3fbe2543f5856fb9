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
