# coding=utf-8
"""Differentiable simulation: end-to-end gradients through trajectories.

Framework extension (no reference counterpart).  The reference's only use of
autodiff is Taichi's per-substep force tape (``ti.ad.Tape`` at main.py:107),
which differentiates the elastic energy w.r.t. *positions within one substep*
— it cannot differentiate THROUGH time, so inverse problems (fit material
parameters, damping, or initial conditions to an observed trajectory) are out
of its reach.  Here a whole rollout is one pure JAX function, so ``jax.grad``
composes over it:

  * material parameters (μ, λ — or E, ν through the same closed form the
    config uses, reference object.py:48), damping, and the initial state are
    all *traced arguments* of the rollout;
  * explicit-analytic and energy/autodiff substeps differentiate by plain
    reverse-mode AD (the element math in ops/element.py is closed-form jnp);
  * the implicit substep's linear solve runs under
    ``lax.custom_linear_solve`` on the normal equations AᵀA x = Aᵀb
    (symmetric PSD), so the backward pass is ONE adjoint CG solve via the
    implicit function theorem instead of unrolling solver iterations —
    O(1) adjoint memory in the iteration count;
  * each substep is ``jax.checkpoint``-wrapped (opt-out) so long rollouts
    rematerialize the element chain instead of storing it per substep.

Forward parity vs the non-diff paths:
  * the explicit / autodiff diff substeps compute exactly the XLA op-composed
    path (solvers/explicit.py + solvers/advect.py) with μ/λ/damping as
    tracers — same arithmetic, same results;
  * the implicit diff substep solves the same system (same K blocks, same
    rhs, same advection quirks) but with a FIXED-iteration CG
    (``n_cg_iters``) instead of the reference's absolute-tolerance
    ``while_loop`` (not reverse-differentiable), and always in the
    normal-equations form (symmetric operator — required by the IFT
    adjoint).  Positions therefore match the parity path to solver
    tolerance, not bitwise.  Recorded as a deviation in PARITY.md; the
    parity paths are untouched.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fem_tpu.models.state import FemObject, Obstacles, SimState
from fem_tpu.ops.assembly import assemble_for, element_contrib_full
from fem_tpu.ops.element import (
    explicit_grad_columns,
    hessian_blocks,
    implicit_force_columns,
    total_energy,
)
from fem_tpu.solvers.advect import advect_implicit_step, kinematic_step
from fem_tpu.solvers.implicit import graph_block_apply
from fem_tpu.ops import smallmat as sm
from fem_tpu.utils.config import CONJUGATE_GRADIENT_METHOD, SimConfig


class DiffParams(NamedTuple):
    """Traced physical parameters of a differentiable rollout.  All leaves
    are scalars (jnp arrays), so the pytree is a valid ``jax.grad`` argument
    and an ``optax`` parameter tree."""

    mu: jnp.ndarray
    s_lambda: jnp.ndarray
    damping: jnp.ndarray
    # Traced von-Mises yield strain (inelastic extension) — None for
    # elastic objects.  Lets inverse problems identify the yield surface
    # from observed permanent deformation (the radial return map is
    # piecewise smooth in it: scale = ε_y/‖dev ε‖ on yielded elements).
    plastic_yield: jnp.ndarray | None = None


def params_from_object(obj: FemObject) -> DiffParams:
    """Lift the object's static material scalars into traced parameters."""
    return DiffParams(
        mu=jnp.float32(obj.mu),
        s_lambda=jnp.float32(obj.s_lambda),
        damping=jnp.float32(obj.damping),
        plastic_yield=(
            jnp.float32(obj.plastic_yield)
            if obj.plastic_yield > 0.0
            else None
        ),
    )


def lame_from_young(E, nu) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(μ, λ) from Young's modulus / Poisson ratio — the exact closed form
    the config applies (reference object.py:48), differentiable, so inverse
    problems can optimize in (E, ν) space directly."""
    mu = E / 2.0 / (1.0 + nu)
    lam = E * nu / (1.0 + nu) / (1.0 - 2.0 * nu)
    return mu, lam


def _cg_fixed(matvec, b: jnp.ndarray, n_iters: int) -> jnp.ndarray:
    """Fixed-iteration CG with the reference's x₀ = b initialization
    (implicit.py:314) under ``lax.scan`` — shape-static, usable as the
    ``solve`` callback of ``lax.custom_linear_solve`` (the adjoint solve is
    the same function because the operator is symmetric).  Iterations where
    the search direction has died (dᵀq = 0 exactly, i.e. converged) become
    no-ops instead of NaNs."""
    x0 = b
    r0 = b - matvec(x0)

    def body(carry, _):
        x, r, d, delta = carry
        q = matvec(d)
        dq = jnp.sum(d * q)
        live = dq > 0.0
        alpha = jnp.where(live, delta / jnp.where(live, dq, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * q
        delta_new = jnp.sum(r * r)
        beta = jnp.where(delta > 0.0, delta_new / jnp.where(delta > 0.0, delta, 1.0), 0.0)
        d = r + beta * d
        return (x, r, d, delta_new), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, r0, jnp.sum(r0 * r0)), None, length=n_iters
    )
    return x


def make_diff_substep_fn(obj: FemObject, cfg: SimConfig, n_cg_iters: int = 32):
    """Build ``substep(params, state, obstacles) -> state`` — one simulation
    substep with (μ, λ, damping) as traced arguments, differentiable in
    both directions.  Method dispatch mirrors fem_tpu.sim.substep
    (reference main.py:101-112): ``auto_diff`` wins, then explicit vs
    implicit.  Implicit requires the CG method (``implicit_method=1``)."""
    dt = cfg.delta_time
    g_dir = tuple(cfg.g_dir)
    robust = cfg.robust_inversion
    material = obj.material
    beta = obj.damping_beta  # Rayleigh damping extension (static scalar)
    # Inelastic extensions (round 5): differentiable since the return map
    # became componentwise Jacobi plane math (no SVD) — piecewise smooth,
    # with subgradients only on the measure-zero yield surface itself.
    # The internal-variable update runs on the mesh-order row form (diff
    # rollouts are small-mesh territory); ``params.plastic_yield`` traces
    # the yield strain for inverse identification.
    inelastic = obj.plastic_yield > 0.0 or obj.viscous_mu > 0.0
    visc_mu_s = obj.viscous_mu
    visc_tau = obj.viscous_tau

    def _layer_cols(params: DiffParams, state: SimState) -> jnp.ndarray:
        """Explicit-convention gradient columns summed over material
        layers on the traced parameters (ops/inelastic semantics)."""
        from fem_tpu.ops.inelastic import _BRANCH_MATERIAL, effective_ref_inv

        r_base = effective_ref_inv(obj.ref_inv, state.plastic_inv)
        cols = explicit_grad_columns(
            state.pos, obj.element_indices, r_base, obj.volume,
            params.mu, params.s_lambda, material,
        )
        if state.viscous_inv is not None:
            r_br = effective_ref_inv(obj.ref_inv, state.viscous_inv)
            cols = cols + explicit_grad_columns(
                state.pos, obj.element_indices, r_br, obj.volume,
                visc_mu_s, 0.0, _BRANCH_MATERIAL,
            )
        return cols

    def _advance(params: DiffParams, state: SimState) -> SimState:
        """Post-advect internal-variable update with the TRACED yield
        strain (mirror of ops/inelastic.advance_internal's row form)."""
        from fem_tpu.ops.assembly import gather_edge_diffs
        from fem_tpu.ops.inelastic import plastic_return_map, viscous_relax

        if not inelastic:
            return state
        F = sm.matmul_ew(
            gather_edge_diffs(state.pos, obj.element_indices), obj.ref_inv
        )
        ok = (sm.det(F) > 1e-9)[..., None, None]
        f_safe = jnp.where(
            ok, F, jnp.broadcast_to(jnp.eye(obj.dim), F.shape)
        )
        f_inv = sm.inv(f_safe)
        new = {}
        if state.plastic_inv is not None:
            y = (
                params.plastic_yield
                if params.plastic_yield is not None
                else jnp.float32(obj.plastic_yield)
            )
            fe = sm.matmul_ew(F, state.plastic_inv)
            fe_new, yld = plastic_return_map(fe, y)
            fp = sm.matmul_ew(f_inv, fe_new)
            new["plastic_inv"] = jnp.where(
                ok & yld[..., None, None], fp, state.plastic_inv
            )
        if state.viscous_inv is not None:
            fbe = sm.matmul_ew(F, state.viscous_inv)
            fv = sm.matmul_ew(f_inv, viscous_relax(fbe, dt, visc_tau))
            new["viscous_inv"] = jnp.where(ok, fv, state.viscous_inv)
        return state.replace(**new)

    def _rayleigh_grad(params: DiffParams, state: SimState) -> jnp.ndarray:
        """−β·G(K)·v with K on the traced material parameters — the same
        decoupled damping operator as the non-diff paths
        (solvers/implicit.rayleigh_damping_grad), differentiable in μ/λ."""
        K = hessian_blocks(
            state.pos, obj.element_indices, obj.ref_inv, obj.volume,
            params.mu, params.s_lambda, False, material,
        )
        return -beta * graph_block_apply(obj, K, state.vel)

    if cfg.auto_diff:

        def substep(params: DiffParams, state: SimState, obstacles: Obstacles):
            if inelastic:
                # Analytic layered chain — identical to autodiff at frozen
                # internal variables (ops/inelastic docstring).
                grad = assemble_for(obj, element_contrib_full(
                    _layer_cols(params, state)
                ))
            else:
                grad = jax.grad(total_energy)(
                    state.pos, obj.element_indices, obj.ref_inv, obj.volume,
                    params.mu, params.s_lambda, material,
                )
            if beta != 0.0:
                grad = grad + _rayleigh_grad(params, state)
            if obj.static_load is not None:
                grad = grad - obj.static_load
            state = kinematic_step(
                state, grad, obj.mass, obstacles, dt, params.damping, g_dir,
                free_mask=obj.free_mask, pin_vel=obj.pin_vel,
                wall_friction=cfg.wall_friction,
            )
            return _advance(params, state)

        return substep

    if cfg.use_explicit_method:

        def substep(params: DiffParams, state: SimState, obstacles: Obstacles):
            cols = (
                _layer_cols(params, state)
                if inelastic
                else explicit_grad_columns(
                    state.pos, obj.element_indices, obj.ref_inv, obj.volume,
                    params.mu, params.s_lambda, material,
                )
            )
            grad = assemble_for(obj, element_contrib_full(cols))
            if beta != 0.0:
                grad = grad + _rayleigh_grad(params, state)
            if obj.static_load is not None:
                grad = grad - obj.static_load
            state = kinematic_step(
                state, grad, obj.mass, obstacles, dt, params.damping, g_dir,
                free_mask=obj.free_mask, pin_vel=obj.pin_vel,
                wall_friction=cfg.wall_friction,
            )
            return _advance(params, state)

        return substep

    if cfg.implicit_method != CONJUGATE_GRADIENT_METHOD:
        raise ValueError(
            "differentiable implicit stepping supports only the CG method "
            "(implicit_method=1); the Jacobi rollback loop is not "
            "reverse-differentiable"
        )
    if cfg.integrator != "semi_implicit":
        raise ValueError(
            "differentiable implicit stepping supports only "
            "integrator='semi_implicit' (the Newton loop's data-dependent "
            "line search is not reverse-differentiable); use the "
            "semi-implicit path for gradient rollouts"
        )

    mass_col = obj.mass[:, None]

    def substep(params: DiffParams, state: SimState, obstacles: Obstacles):
        from fem_tpu.ops.inelastic import _BRANCH_MATERIAL, effective_ref_inv

        r_base = (
            effective_ref_inv(obj.ref_inv, state.plastic_inv)
            if inelastic
            else obj.ref_inv
        )
        K = hessian_blocks(
            state.pos, obj.element_indices, r_base, obj.volume,
            params.mu, params.s_lambda, robust, material,
        )
        if material == "neo_hookean":
            cols = implicit_force_columns(
                state.pos, obj.element_indices, r_base, obj.volume,
                params.mu, params.s_lambda, robust,
            )
        else:
            # Material extensions: the implicit rhs force is −∂U/∂x via the
            # material's analytic Piola columns (same routing as the
            # non-diff path, solvers/implicit._material_force_columns).
            cols = -explicit_grad_columns(
                state.pos, obj.element_indices, r_base, obj.volume,
                params.mu, params.s_lambda, material,
            )
        if inelastic and state.viscous_inv is not None:
            r_br = effective_ref_inv(obj.ref_inv, state.viscous_inv)
            K = K + hessian_blocks(
                state.pos, obj.element_indices, r_br, obj.volume,
                visc_mu_s, 0.0, robust, _BRANCH_MATERIAL,
            )
            cols = cols - explicit_grad_columns(
                state.pos, obj.element_indices, r_br, obj.volume,
                visc_mu_s, 0.0, _BRANCH_MATERIAL,
            )
        f = assemble_for(obj, element_contrib_full(cols))
        if obj.static_load is not None:
            f = f + obj.static_load
        b = state.vel + dt * f / mass_col

        c = dt * (dt + beta)  # solvers/implicit.system_coeff (β extension)

        def apply_a(x):
            return x - c * graph_block_apply(obj, K, x) / mass_col

        def apply_at(y):
            gz = graph_block_apply(obj, sm.mT(K), y / mass_col)
            return y - c * gz

        free = obj.free_mask
        if free is not None:
            # Dirichlet projection (pin_boxes): Â = P·A·P + (I−P), b̂ = P·b —
            # same construction as the non-diff solve (implicit.py), linear
            # and therefore transparently differentiable.  Moving pins use
            # the inhomogeneous form with particular solution x_h.
            held = 1.0 - free
            base_a, base_at = apply_a, apply_at
            apply_a = lambda x: free * base_a(free * x) + held * x
            apply_at = lambda y: free * base_at(free * y) + held * y
            if obj.pin_vel is not None:
                x_h = held * obj.pin_vel
                b = free * (b - base_a(x_h)) + x_h
            else:
                b = free * b

        def normal_op(v):
            return apply_at(apply_a(v))

        x = jax.lax.custom_linear_solve(
            normal_op,
            apply_at(b),
            solve=lambda mv, rhs: _cg_fixed(mv, rhs, n_cg_iters),
            symmetric=True,
        )
        state = state.replace(vel=x)
        state = advect_implicit_step(
            state, obstacles, dt, params.damping, g_dir,
            free_mask=obj.free_mask, pin_vel=obj.pin_vel,
            wall_friction=cfg.wall_friction,
        )
        return _advance(params, state)

    return substep


def make_diff_rollout_fn(
    obj: FemObject,
    cfg: SimConfig,
    n_substeps: int,
    n_cg_iters: int = 32,
    remat: bool = True,
):
    """Build ``rollout(params, state, obstacles) -> (final_state, traj_pos)``
    — ``n_substeps`` differentiable substeps under one ``lax.scan``, with the
    per-substep positions stacked as ``(n_substeps, N, d)`` for trajectory
    losses.  ``remat=True`` wraps the substep in ``jax.checkpoint`` so the
    backward pass recomputes the element chain instead of storing it."""
    sub = make_diff_substep_fn(obj, cfg, n_cg_iters)
    if remat:
        sub = jax.checkpoint(sub)

    def rollout(params: DiffParams, state: SimState, obstacles: Obstacles):
        def body(s, _):
            s2 = sub(params, s, obstacles)
            return s2, s2.pos

        final, traj = jax.lax.scan(body, state, None, length=n_substeps)
        return final, traj

    return rollout


def trajectory_loss_fn(
    obj: FemObject,
    cfg: SimConfig,
    target_traj: jnp.ndarray,
    n_cg_iters: int = 32,
):
    """Mean-squared trajectory mismatch ``loss(params, state, obstacles)``
    against a target ``(n_substeps, N, d)`` position history — the standard
    inverse-problem objective (see examples/inverse_material.py)."""
    n_substeps = int(target_traj.shape[0])
    rollout = make_diff_rollout_fn(obj, cfg, n_substeps, n_cg_iters)

    def loss(params: DiffParams, state: SimState, obstacles: Obstacles):
        _, traj = rollout(params, state, obstacles)
        return jnp.mean((traj - target_traj) ** 2)

    return loss
