"""clrs_tpu — a TPU-native clustered low-rank SDP framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
`nanleij/ClusteredLowRankSolver.jl`: a primal-dual interior point solver for
clustered low-rank SDPs with polynomial equality constraints (enforced by
sampling), a sampled-polynomial toolkit, preprocessing, and a rounding
pipeline producing exact optimal solutions over Q or number fields.

The device numeric substrate is double-word float64 (~106 bits), replacing
the reference's Arb arbitrary-precision arithmetic on the hot path.
"""

import os as _os

# Double-word arithmetic requires that XLA:CPU never FMA-contracts mul+add
# patterns: LLVM-level contraction is immune to HLO optimization barriers and
# silently destroys the error-free transforms (measured: dd_matmul degrades
# from 1e-31 to 1e-16; see NOTES_TPU_NUMERICS.md). Capping the ISA at AVX
# (no FMA instructions) restores exactness. Must be set before the first JAX
# backend initialization.
if "xla_cpu_max_isa" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "")
                                + " --xla_cpu_max_isa=AVX")

import jax as _jax  # noqa: E402

# double-word arithmetic requires real IEEE float64 everywhere
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the expansion-arithmetic step graphs are
# large (minutes of XLA compile time on TPU for the nw>=4 tiers); caching
# them on disk makes every process after the first start in seconds.
try:
    _cache_dir = _os.environ.get(
        "CLRS_TPU_CACHE", _os.path.join(_os.path.dirname(__file__), "..",
                                        ".jax_cache"))
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax without the knobs
    pass

from .model.problem import (  # noqa: E402
    Block,
    Constraint,
    LowRankMatPol,
    Maximize,
    Minimize,
    Objective,
    Problem,
)
from .model.reform import model_psd_variables_as_free_variables  # noqa: E402
from .compile.sdp import ClusteredLowRankSDP  # noqa: E402
from .solver.ipm import solvesdp, SolverFailure, SaveSettings  # noqa: E402
from .solver.status import (  # noqa: E402
    DualSolution,
    Feasible,
    NearOptimal,
    NotConverged,
    Optimal,
    PrimalFeasible,
    DualFeasible,
    PrimalSolution,
    objvalue,
    matrixvar,
    matrixvars,
    freevar,
    freevars,
    vectorize,
    as_primal_solution,
    slacks,
    optimal,
)
from .poly.mpoly import PolyRing, polynomial_ring  # noqa: E402
from .poly.bases import (  # noqa: E402
    basis_chebyshev,
    basis_gegenbauer,
    basis_jacobi,
    basis_laguerre,
    basis_monomial,
)
from .poly.samples import (  # noqa: E402
    sample_points_chebyshev,
    sample_points_chebyshev_mod,
    sample_points_padua,
    sample_points_rescaled_laguerre,
    sample_points_simplex,
)
from .poly.sampled import SampledPolyRing, SampledPoly, sampled_polynomial_ring  # noqa: E402
from .poly.fekete import approximatefekete, approximatefeketeexact  # noqa: E402

__version__ = "0.1.0"

# rounding / exact solutions (imported late: they depend on the above)
from .round.rounding import RoundingSettings, exact_solution  # noqa: E402
from .round.find_field import find_field, to_field, min_poly  # noqa: E402
from .exact.field import NumberField, QQ, generic_embedding  # noqa: E402
from .model.sdpa import sdpa_sparse_to_problem  # noqa: E402
from .model.checks import check_problem, check_sdp  # noqa: E402
from .model.linearsystem import (  # noqa: E402
    linearsystem,
    linearsystem_coefficientmatching,
    partial_linearsystem,
)
