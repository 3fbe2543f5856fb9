"""Lovász theta of C5 and the qubit POVM discrimination SDP.

Ports of the reference's JuMP examples (`ClusteredLowRankSolver.jl/
examples/jump.jl`), built on the Python front end instead of JuMP/MOI.
Oracles (reference test/moi_tests.jl:6-11):
- theta(C5) = sqrt(5), exact over Q(sqrt5)
- POVM optimum = 1/2 + sqrt(2)/4, exact over Q(sqrt2)
"""

from fractions import Fraction

import numpy as np

from clrs_tpu.frontend import Model, exact_solution, find_field, real_inner


def lovasz_theta_c5(verbose=False, **kwargs):
    """theta(C5): max <J, X> s.t. tr X = 1, X_ij = 0 on non-edges, X PSD
    (examples/jump.jl:4-35)."""
    model = Model()
    edges = {(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)}
    X = model.psd_variable("X", 5)
    for i in range(1, 6):
        for j in range(i + 1, 6):
            if (i, j) not in edges and (j, i) not in edges:
                model.add_constraint(X[i - 1, j - 1] == 0)
    tr = sum(X[i, i] for i in range(5))
    model.add_constraint(tr == 1)
    model.maximize(sum(X[i, j] for i in range(5) for j in range(5)))
    kwargs.setdefault("duality_gap_threshold", 1e-25)  # ~106-bit arithmetic; reference uses 1e-30 at 256-bit
    kwargs.setdefault("omega_p", 100.0)
    kwargs.setdefault("omega_d", 100.0)
    model.solve(verbose=verbose, **kwargs)
    return model


def povm(verbose=False, **kwargs):
    """Optimal discrimination of |+-> := (|0>-|1>)/sqrt2 and
    (|0>-i|1>)/sqrt2 by a 2-outcome POVM (examples/jump.jl:37-54)."""
    model = Model()
    states = [np.array([[Fraction(1, 2), Fraction(-1, 2)],
                        [Fraction(-1, 2), Fraction(1, 2)]], dtype=object),
              0.5 * np.array([[1, 1j], [-1j, 1]])]
    E = [model.hermitian_psd_variable(f"E{i}", 2) for i in range(2)]
    # (matrix equality: numpy coerces elementwise `==` on object arrays to
    # bool, so array constraints go through constrain_equal)
    model.constrain_equal(E[0] + E[1], np.eye(2, dtype=object))
    model.maximize((real_inner(states[0], E[0])
                    + real_inner(states[1], E[1])) / 2)
    kwargs.setdefault("duality_gap_threshold", 1e-25)  # ~106-bit arithmetic; reference uses 1e-30 at 256-bit
    kwargs.setdefault("omega_p", 100.0)
    kwargs.setdefault("omega_d", 100.0)
    model.solve(verbose=verbose, **kwargs)
    return model


if __name__ == "__main__":
    import math

    m = lovasz_theta_c5()
    print("theta(C5) =", float(m.objective_value().hi),
          "(sqrt5 =", math.sqrt(5), ")")
    FF, g = find_field(m)
    print("field generator ~", g)
    ok, prob, esol = exact_solution(m, FF=FF, g=g, verbose=False)
    from clrs_tpu.solver.status import objvalue
    print("exact objective:", objvalue(prob, esol), "success:", ok)

    m2 = povm()
    print("POVM value =", float(m2.objective_value().hi),
          "(1/2+sqrt2/4 =", 0.5 + math.sqrt(2) / 4, ")")
    FF2, g2 = find_field(m2)
    ok2, prob2, esol2 = exact_solution(m2, FF=FF2, g=g2, verbose=False)
    print("exact objective:", objvalue(prob2, esol2), "success:", ok2)
