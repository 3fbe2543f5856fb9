"""Solver feature tests mirroring the reference testsets
(runtests_solver.jl: Modelling, Options, Saving, Warmstart, Linear dependencies)."""

import os
import sys
import warnings
from fractions import Fraction
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from clrs_tpu import (Constraint, LowRankMatPol, Maximize, Minimize, Objective,
                      Problem, SaveSettings, solvesdp,
                      model_psd_variables_as_free_variables)
from clrs_tpu.compile.preprocess import PreprocessError
from clrs_tpu.solver.status import (DualFeasible, PrimalFeasible, objvalue,
                                    optimal)

KW = dict(verbose=False, omega_p=100.0, omega_d=100.0,
          dual_error_threshold=1e-12, primal_error_threshold=1e-12)


def _tiny_problem():
    # max <I/2, X> s.t. X_11 = 1, X_22 = 2 -> 3/2
    obj = Objective(0, {"X": [[Fraction(1, 2), 0], [0, Fraction(1, 2)]]}, {})
    cons = [Constraint(1, {"X": [[1, 0], [0, 0]]}),
            Constraint(2, {"X": [[0, 0], [0, 1]]})]
    return Problem(Maximize(obj), cons)


@pytest.mark.slow
def test_model_psd_variables_as_free_variables():
    """Reformulation preserves the optimum (runtests_solver.jl:30-38)."""
    p = _tiny_problem()
    st, ds, ps, t, code = solvesdp(p, **KW)
    v1 = float(objvalue(p, ps))
    p2 = model_psd_variables_as_free_variables(p, ["X"])
    st2, ds2, ps2, t2, code2 = solvesdp(p2, **KW)
    v2 = float(objvalue(p2, ps2))
    assert abs(v1 - 1.5) < 1e-10
    assert abs(v2 - 1.5) < 1e-8


def test_need_feasible_early_exit():
    """need_dual/primal_feasible terminate early (runtests_solver.jl:40-51)."""
    p = _tiny_problem()
    st, ds, ps, t, code = solvesdp(p, need_primal_feasible=True, **KW)
    assert code == 0
    st, ds, ps, t, code = solvesdp(p, need_dual_feasible=True, **KW)
    assert code == 0


def test_preprocess_on_off_equivalence():
    p = _tiny_problem()
    _, _, ps1, _, c1 = solvesdp(p, preprocess=True, **KW)
    _, _, ps2, _, c2 = solvesdp(p, preprocess=False, **KW)
    assert c1 == c2 == 0
    assert abs(float(objvalue(p, ps1)) - float(objvalue(p, ps2))) < 1e-9


@pytest.mark.slow
def test_saving_and_warmstart(tmp_path):
    """SaveSettings writes checkpoints; warm start resumes
    (runtests_solver.jl:53-69, 166-173)."""
    import pickle

    p = _tiny_problem()
    name = str(tmp_path / "test")
    ss = SaveSettings(iter_interval=2, save_name=name)
    st, ds, ps, t, code = solvesdp(p, save_settings=ss, **KW)
    assert os.path.exists(name + ".jls")
    with open(name + ".jls", "rb") as f:
        dsol, psol = pickle.load(f)
    assert abs(float(objvalue(p, psol)) - 1.5) < 1e-6

    # low-accuracy solve, then resume to optimality
    st, ds1, ps1, t, code = solvesdp(p, duality_gap_threshold=1e-4, **KW)
    st2, ds2, ps2, t, code2 = solvesdp(p, dualsol=ds1, primalsol=ps1, **KW)
    assert code2 == 0
    assert optimal(st2)
    assert abs(float(objvalue(p, ps2)) - 1.5) < 1e-10


def test_lindep_constraints_removed():
    """Duplicate constraints are removed by preprocessing
    (runtests_solver.jl:249-314)."""
    obj = Objective(0, {"X": [[Fraction(1, 2), 0], [0, Fraction(1, 2)]]}, {})
    cons = [Constraint(1, {"X": [[1, 0], [0, 0]]}),
            Constraint(2, {"X": [[2, 0], [0, 0]]}),  # 2x the first
            Constraint(2, {"X": [[0, 0], [0, 1]]})]
    p = Problem(Maximize(obj), cons)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        st, ds, ps, t, code = solvesdp(p, **KW)
    assert code == 0
    assert abs(float(objvalue(p, ps)) - 1.5) < 1e-9
    # dual solution has a zero re-inserted for the removed constraint
    assert len(ds.x) == 3


def test_lindep_infeasible_raises():
    """0 = b with b nonzero raises (runtests_solver.jl:269-276)."""
    obj = Objective(0, {"X": [[1]]}, {})
    cons = [Constraint(1, {"X": [[1]]}),
            Constraint(3, {"X": [[2]]})]  # 2*c1 => 0 = 1
    p = Problem(Maximize(obj), cons)
    with pytest.raises(PreprocessError):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            solvesdp(p, **KW)


def test_lindep_free_vars():
    """Dependent free variables are substituted away and re-inserted."""
    # X_11 + y1 + y2 = 2 ; X_11 + 2 y1 + 2 y2 = 3  => y1 + y2 = 1
    obj = Objective(0, {"X": [[1]]}, {"y1": 0, "y2": 0})
    cons = [Constraint(2, {"X": [[1]]}, {"y1": 1, "y2": 1}),
            Constraint(3, {"X": [[1]]}, {"y1": 2, "y2": 2})]
    p = Problem(Maximize(obj), cons)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        st, ds, ps, t, code = solvesdp(p, **KW)
    assert code == 0
    y1 = float(ps.freevars["y1"])
    y2 = float(ps.freevars["y2"])
    x11 = float(ps.matrixvars["X"][0, 0])
    assert abs(x11 + y1 + y2 - 2) < 1e-8
    assert abs(float(objvalue(p, ps)) - 1.0) < 1e-8
