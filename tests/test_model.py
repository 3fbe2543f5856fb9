"""Modeling layer tests (Block, LowRankMatPol, Constraint, compile)."""

from fractions import Fraction

import numpy as np
import pytest

from clrs_tpu import (Block, Constraint, LowRankMatPol, Maximize, Objective,
                      Problem)
from clrs_tpu.compile.sdp import ClusteredLowRankSDP
from clrs_tpu.model.problem import blocksizes


def test_block_ordering():
    assert Block("a", 1, 1) < Block("a", 1, 2) < Block("a", 2, 1)
    assert Block("a") == Block("a", 1, 1)


def test_lowrankmatpol():
    m = LowRankMatPol([2], [[1, 0]], [[0, 1]])
    assert m.shape == (2, 2)
    assert m[0, 1] == 2
    assert m[0, 0] == 0
    t = m.T
    assert t[1, 0] == 2
    d = m.to_dense()
    assert d[0, 1] == 2 and d[1, 0] == 0


def test_constraint_symmetrizes_dense():
    c = Constraint(1, {"X": [[0, 2], [0, 0]]})
    m = c.matrixcoeff["X"]
    assert m[0, 1] == m[1, 0] == Fraction(1)


def test_clustering_and_order():
    # two independent blocks -> two clusters; shared block merges
    cons = [
        Constraint(1, {"A": [[1]]}),
        Constraint(1, {"B": [[1]]}),
        Constraint(1, {"A": [[1]], "C": [[1]]}),
    ]
    p = Problem(Maximize(Objective(0, {}, {})), cons)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sdp = ClusteredLowRankSDP(p)
    assert len(sdp.clusters) == 2
    # order_c covers every (constraint, sample)
    assert set(sdp.order_c.keys()) == {(0, 0), (1, 0), (2, 0)}


def test_scalar_pack_detection():
    cons = [Constraint(1, {"A": [[1]], "B": [[2]],
                           "M": [[1, 0], [0, 1]]})]
    p = Problem(Maximize(Objective(0, {}, {})), cons)
    sdp = ClusteredLowRankSDP(p)
    cl = sdp.clusters[0]
    assert cl.scalars is not None and cl.scalars.nreal == 2
    assert len(cl.blocks) == 1 and cl.blocks[0].n == 2


def test_scalar_pad():
    cons = [Constraint(1, {"A": [[1]], "B": [[2]], "C": [[3]]})]
    p = Problem(Maximize(Objective(0, {}, {})), cons)
    sdp = ClusteredLowRankSDP(p, scalar_pad=4)
    cl = sdp.clusters[0]
    assert cl.scalars.nblocks == 4 and cl.scalars.nreal == 3
    assert cl.scalars.mask.tolist() == [1, 1, 1, 0]


def test_blocksizes():
    cons = [Constraint(1, {"A": [[1, 0], [0, 1]]})]
    p = Problem(Maximize(Objective(0, {}, {})), cons)
    assert blocksizes(p) == {"A": 2}


def test_lowrank_term_tables():
    # one low-rank block: A_p = lambda * v v^T, check the compiled table
    R = LowRankMatPol([Fraction(3)], [[1, 2]])
    cons = [Constraint(1, {"X": R})]
    p = Problem(Maximize(Objective(0, {"X": [[1, 0], [0, 1]]}, {})), cons)
    sdp = ClusteredLowRankSDP(p)
    bd = sdp.clusters[0].blocks[0]
    assert bd.kind == "lowrank"
    assert bd.V[0].shape == (2, 1)          # one dedup'd column
    assert bd.lam[0][0, 0] == 3.0
    assert bd.tmask[0, 0] == 1.0
