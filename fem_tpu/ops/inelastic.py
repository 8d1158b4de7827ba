# coding=utf-8
"""Inelastic material extensions: multiplicative plasticity + viscoelasticity.

Framework extensions (the reference is purely hyperelastic — its entire
material surface is the Neo-Hookean energy/force pair,
solver/explicit.py:23-28).  Both models use per-element internal variables
carried on the state pytree and updated ONCE per substep from the
end-of-substep positions (explicit treatment of internal variables —
standard operator splitting; the elastic solve within a substep sees them
frozen):

* **Von-Mises multiplicative plasticity** (``ObjectConfig.plastic_yield``):
  F = F_e·F_p with the BASE material evaluated on F_e = F·F_p⁻¹ — realized
  by running the unchanged element chain on the *effective* rest-edge
  inverse ``ref_inv·F_p⁻¹`` (F = X·R⁻¹ ⇒ F_e = X·(R⁻¹F_p⁻¹), and the
  force chain's trailing ·R⁻ᵀ becomes ·(R⁻¹F_p⁻¹)ᵀ by the same chain
  rule).  The return map acts on principal Hencky strains: SVD
  F_e = U·Σ·Vᵀ, ε = log Σ; if ‖dev ε‖ > ε_y, scale the deviator back onto
  the yield surface (radial return, perfect plasticity).  The volumetric
  part never flows → det F_p = 1 exactly (isochoric flow), so rest volumes
  and lumped masses stay valid.

* **Generalized-Maxwell viscoelasticity** (``viscous_mu``/``viscous_tau``):
  one Maxwell branch adds a stable-Neo-Hookean stress (λ = 0) with shear
  modulus μ_v evaluated on the branch strain F·F_v⁻¹; each substep the
  branch's principal log strain decays by exp(−dt/τ) (the exact solution
  of the linearized Maxwell ODE per step).  dt ≪ τ gives rubber-like
  transient stiffness μ + μ_v; t ≫ τ relaxes to the base material —
  stress relaxation and creep fall out.

Execution: the internal-variable chains ride the graph (XLA) operator —
the blocked/fused VMEM tables bake the static ``ref_inv`` and carry no
per-element dynamic state, so configs with inelasticity fall back to the
op-composed path (a documented gate, not a silent wrong answer).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fem_tpu.models.state import FemObject, SimState
from fem_tpu.ops import smallmat as sm
from fem_tpu.ops.assembly import assemble_for, element_contrib_full
from fem_tpu.ops.element import (
    deformation_gradients,
    energy_density,
    explicit_grad_columns,
    hessian_blocks,
)

# The Maxwell branch's functional form: polynomial (inversion-finite),
# rest-stable, with DP(I) matching linear elasticity — the robust choice
# for a strain that is continually reset toward I by relaxation.
_BRANCH_MATERIAL = "stable_neo_hookean"


def is_inelastic(obj: FemObject) -> bool:
    return obj.plastic_yield > 0.0 or obj.viscous_mu > 0.0


def effective_ref_inv(
    ref_inv: jnp.ndarray, fi_inv: jnp.ndarray | None
) -> jnp.ndarray:
    """R⁻¹·F_i⁻¹ — the effective rest-edge inverse that makes the unchanged
    element chain compute forces of φ(F·F_i⁻¹)."""
    if fi_inv is None:
        return ref_inv
    return sm.matmul(ref_inv, fi_inv)


def _log_strain(F: jnp.ndarray):
    """SVD principal log strains of a batch of (E, d, d) matrices.
    Returns (U, ε, Vᵀ) with singular values clamped away from zero so an
    (inverted/collapsed) element yields finite strains instead of NaNs."""
    u, s, vt = jnp.linalg.svd(F, full_matrices=False)
    s = jnp.maximum(s, 1e-6)
    return u, jnp.log(s), vt


def _recompose(u, eps, vt):
    return sm.matmul(u * jnp.exp(eps)[..., None, :], vt)


def plastic_return_map(
    fe_trial: jnp.ndarray, yield_eps: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radial return in principal Hencky-strain space (perfect plasticity,
    isochoric flow).  Returns (F_e projected onto the yield surface,
    yielded mask (E,))."""
    u, eps, vt = _log_strain(fe_trial)
    mean = jnp.mean(eps, axis=-1, keepdims=True)
    dev = eps - mean
    nrm = jnp.sqrt(jnp.sum(dev * dev, axis=-1, keepdims=True))
    yielded = nrm[..., 0] > yield_eps
    scale = jnp.where(
        nrm > yield_eps, yield_eps / jnp.maximum(nrm, 1e-30), 1.0
    )
    fe_new = _recompose(u, mean + dev * scale, vt)
    return fe_new, yielded


def viscous_relax(fbe_trial: jnp.ndarray, dt: float, tau: float) -> jnp.ndarray:
    """Branch strain after one substep of Maxwell relaxation: principal log
    strains decay by exp(−dt/τ)."""
    u, eps, vt = _log_strain(fbe_trial)
    return _recompose(u, eps * jnp.exp(-dt / tau), vt)


def advance_internal(
    obj: FemObject, state: SimState, dt: float
) -> SimState:
    """Update the per-element internal variables from the (end-of-substep)
    positions in ``state``.  Elements with non-positive det F freeze their
    internal state for the step (an inverted element has no meaningful
    polar sector; the elastic layer owns recovery)."""
    if not is_inelastic(obj):
        return state
    F = deformation_gradients(state.pos, obj.element_indices, obj.ref_inv)
    ok = (sm.det(F) > 1e-9)[..., None, None]
    # A guarded inverse so frozen (inverted) elements never see NaNs.
    f_safe = jnp.where(ok, F, jnp.broadcast_to(jnp.eye(obj.dim), F.shape))
    f_inv = sm.inv(f_safe)
    new = {}
    if state.plastic_inv is not None:
        fe_trial = sm.matmul(F, state.plastic_inv)
        fe_new, yielded = plastic_return_map(fe_trial, obj.plastic_yield)
        fp_inv_new = sm.matmul(f_inv, fe_new)
        upd = ok & yielded[..., None, None]
        new["plastic_inv"] = jnp.where(upd, fp_inv_new, state.plastic_inv)
    if state.viscous_inv is not None:
        fbe_trial = sm.matmul(F, state.viscous_inv)
        fbe_new = viscous_relax(fbe_trial, dt, obj.viscous_tau)
        fv_inv_new = sm.matmul(f_inv, fbe_new)
        new["viscous_inv"] = jnp.where(ok, fv_inv_new, state.viscous_inv)
    return state.replace(**new)


def inelastic_grad_columns(
    obj: FemObject, state: SimState, pos: jnp.ndarray
) -> jnp.ndarray:
    """Energy-gradient columns (E, d, d) of the full inelastic stress: base
    material on F_e = F·F_p⁻¹ plus the Maxwell branch on F·F_v⁻¹ (reference
    gradient sign convention — added to ``particles.force``)."""
    r_base = effective_ref_inv(obj.ref_inv, state.plastic_inv)
    cols = explicit_grad_columns(
        pos, obj.element_indices, r_base, obj.volume,
        obj.mu, obj.s_lambda, obj.material,
    )
    if state.viscous_inv is not None:
        r_branch = effective_ref_inv(obj.ref_inv, state.viscous_inv)
        cols = cols + explicit_grad_columns(
            pos, obj.element_indices, r_branch, obj.volume,
            obj.viscous_mu, 0.0, _BRANCH_MATERIAL,
        )
    return cols


def inelastic_energy_gradient(
    obj: FemObject, state: SimState, pos: jnp.ndarray,
    axis_name: str | None = None,
) -> jnp.ndarray:
    cols = inelastic_grad_columns(obj, state, pos)
    return assemble_for(obj, element_contrib_full(cols), axis_name)


def inelastic_element_energies(
    obj: FemObject, state: SimState, pos: jnp.ndarray
) -> jnp.ndarray:
    """Per-element V·φ including the branch energy (render coloring)."""
    r_base = effective_ref_inv(obj.ref_inv, state.plastic_inv)
    f_e = deformation_gradients(pos, obj.element_indices, r_base)
    phi = energy_density(f_e, obj.mu, obj.s_lambda, obj.material)
    if state.viscous_inv is not None:
        r_branch = effective_ref_inv(obj.ref_inv, state.viscous_inv)
        fbe = deformation_gradients(pos, obj.element_indices, r_branch)
        phi = phi + energy_density(fbe, obj.viscous_mu, 0.0, _BRANCH_MATERIAL)
    return obj.volume * phi


def inelastic_k_and_cols(
    obj: FemObject, state: SimState, pos: jnp.ndarray, robust: bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(decoupled system blocks K_e, implicit rhs force columns) of the
    inelastic stress — the same one-block-per-element structure as the
    reference (ops/element.hessian_blocks docstring), with the base
    material's DP taken at F_e over the effective rest-edge inverse and the
    branch's added on top."""
    r_base = effective_ref_inv(obj.ref_inv, state.plastic_inv)
    K = hessian_blocks(
        pos, obj.element_indices, r_base, obj.volume,
        obj.mu, obj.s_lambda, robust, obj.material,
    )
    cols = -explicit_grad_columns(
        pos, obj.element_indices, r_base, obj.volume,
        obj.mu, obj.s_lambda, obj.material,
    )
    if state.viscous_inv is not None:
        r_branch = effective_ref_inv(obj.ref_inv, state.viscous_inv)
        K = K + hessian_blocks(
            pos, obj.element_indices, r_branch, obj.volume,
            obj.viscous_mu, 0.0, robust, _BRANCH_MATERIAL,
        )
        cols = cols - explicit_grad_columns(
            pos, obj.element_indices, r_branch, obj.volume,
            obj.viscous_mu, 0.0, _BRANCH_MATERIAL,
        )
    return K, cols


def inelastic_velocity_solve(
    obj: FemObject,
    state: SimState,
    dt: float,
    preconditioned: int,
    cg_precond: str,
    robust: bool,
    axis_name: str | None = None,
):
    """Semi-implicit velocity solve on the inelastic operator — the same
    system/solve semantics as solvers/implicit.implicit_velocity_solve's
    graph branch (A = I − dt·(dt+β)·M⁻¹·G(K), CG per ``cg_precond``), with
    K/rhs from :func:`inelastic_k_and_cols`.  CG only (the Jacobi sweeps
    keep pure reference semantics)."""
    from fem_tpu.solvers.implicit import (
        ImplicitAux,
        _cg_solve_dispatch,
        diagonal_blocks,
        make_system_apply,
        make_system_apply_t,
    )

    beta = obj.damping_beta
    K, cols = inelastic_k_and_cols(obj, state, state.pos, robust)
    f = assemble_for(obj, element_contrib_full(cols), axis_name)
    b = state.vel + dt * f / obj.mass[:, None]
    apply_a = make_system_apply(obj, K, dt, axis_name, beta)
    res = _cg_solve_dispatch(
        apply_a,
        lambda: make_system_apply_t(obj, K, dt, axis_name, beta),
        b, preconditioned, cg_precond,
        lambda: diagonal_blocks(obj, K, dt, axis_name, beta),
        obj.mass,
        free=obj.free_mask,
        pin_vel=obj.pin_vel,
    )
    return state.replace(vel=res.x), ImplicitAux(res.iterations, res.residual)
