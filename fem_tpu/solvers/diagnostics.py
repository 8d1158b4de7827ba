# coding=utf-8
"""Solver-system diagnostics: symmetry and diagonal-dominance checks.

Functional equivalents of the reference's in-kernel property checks, which
exist but are commented out at their call sites (``check_symmetry``
solver/implicit.py:19-30 called at :239-244; ``check_diagonally_dominant``
:46-61 called at :246-250 — the Jacobi convergence precondition).  Here they
are real, testable functions:

* matrix-free symmetry probe — works at any mesh size via random vectors;
* dense checks — exact, for systems small enough to materialize.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from fem_tpu.models.state import FemObject, SimState
from fem_tpu.ops.element import hessian_blocks
from fem_tpu.solvers.dense import assemble_dense_system
from fem_tpu.solvers.implicit import make_system_apply


class SystemDiagnostics(NamedTuple):
    symmetry_error: float  # max asymmetry measure
    diagonally_dominant: bool  # Jacobi convergence precondition
    diag_dominance_margin: float  # min over rows of |a_ii| − Σ|a_ij|


def symmetry_probe(
    apply_a: Callable[[jnp.ndarray], jnp.ndarray],
    shape,
    num_probes: int = 8,
    seed: int = 0,
) -> float:
    """Matrix-free symmetry test: max |⟨x, A y⟩ − ⟨A x, y⟩| over random
    probe pairs, normalized by |⟨x, A y⟩| (0 for a symmetric operator)."""
    rng = np.random.default_rng(seed)
    worst = 0.0
    for _ in range(num_probes):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        y = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        xay = float(jnp.sum(x * apply_a(y)))
        axy = float(jnp.sum(apply_a(x) * y))
        denom = max(abs(xay), abs(axy), 1e-12)
        worst = max(worst, abs(xay - axy) / denom)
    return worst


def dense_diagnostics(a: np.ndarray) -> SystemDiagnostics:
    """Exact checks on a materialized system matrix (reference semantics:
    symmetry implicit.py:19-30, per-scalar-row dominance :46-61)."""
    sym = float(np.abs(a - a.T).max() / max(np.abs(a).max(), 1e-12))
    diag = np.abs(np.diag(a))
    off = np.abs(a).sum(axis=1) - diag
    margin = float((diag - off).min())
    return SystemDiagnostics(
        symmetry_error=sym,
        diagonally_dominant=bool(margin >= 0.0),
        diag_dominance_margin=margin,
    )


def leading_principal_minors(a: np.ndarray, max_k: int = 64) -> np.ndarray:
    """Leading principal minors det(A[:k,:k]) — the reference's commented-out
    positive-definiteness probe (main.py:15-29).  All positive ⇒ positive
    definite (Sylvester's criterion); capped at ``max_k`` for cost."""
    k_max = min(a.shape[0], max_k)
    return np.array(
        [np.linalg.det(a[:k, :k]) for k in range(1, k_max + 1)]
    )


def system_diagnostics(
    obj: FemObject, state: SimState, dt: float, dense_max_dof: int = 8192
) -> SystemDiagnostics:
    """Diagnose the current implicit system A = I − dt²M⁻¹G(K)."""
    K = hessian_blocks(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda,
    )
    if obj.particle_cnt * obj.dim <= dense_max_dof:
        a = np.asarray(assemble_dense_system(obj, K, dt))
        return dense_diagnostics(a)
    apply_a = make_system_apply(obj, K, dt)
    sym = symmetry_probe(apply_a, (obj.particle_cnt, obj.dim))
    return SystemDiagnostics(
        symmetry_error=sym,
        diagonally_dominant=False,  # unknown without rows; report margin NaN
        diag_dominance_margin=float("nan"),
    )
