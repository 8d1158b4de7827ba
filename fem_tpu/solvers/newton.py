# coding=utf-8
"""Fully implicit (true Newton) backward-Euler velocity solve.

Framework extension (``SimConfig.integrator = "newton"``).  The reference's
implicit method performs ONE linearized solve per substep — backward Euler
linearized at the beginning-of-step positions (semi-implicit;
/root/reference/solver/implicit.py:201-223) — which is why it blows up when
κ = dt²·‖K‖/m approaches 1: the linearization error of the single solve, not
the linear algebra, is what diverges (measured: 68k tets NaN at the
config-default dt=5e-4, the reference's own spot.obj at t≈5 s, 212k at
dt=1.5e-4 — BASELINE.md; neither robust inversion nor an exact single-solve
Hessian rescues it, both probed).  This solver closes the nonlinear residual
instead:

    r(v) = (v − v_n) − dt·M⁻¹·f_el(x_n + dt·v)  =  0

(the true backward-Euler condition on the elastic term; equivalently the
stationarity of the incremental potential
I(v) = ½‖v − v_n‖²_M + U(x_n + dt·v)).  Gravity, damping and collisions stay
in the advection step exactly as the reference structures them
(solver/implicit.py:407-438), so ``integrator="newton"`` changes only how
far the elastic force is trusted — the surrounding substep anatomy is
unchanged and external forces / Neumann loads / contact fold in through the
same rhs velocity substitution as the semi-implicit path.

TPU-native design: one jitted ``lax.while_loop`` over damped Newton steps —
each step is a matrix-free CG solve on the exact Hessian operator
J(v) = I + dt²·M⁻¹·K(x_n + dt·v) (the same ``jax.jvp`` HVP as
``hessian="exact_jvp"``, material-generic incl. corotated through the
tie-robust polar), followed by a vectorized backtracking line search on the
residual norm.  NaN residuals (an inversion attempt under plain
neo-Hookean's log) read as +inf and are rejected, so the line search is what
makes the method robust where the reference NaNs.  Everything is
fixed-shape; element assemblies psum over ``axis_name`` under shard_map, and
the particle-space Newton/CG iterations run replicated — the same sharding
contract as the semi-implicit exact-JVP path.

Cost model: each Newton step ≈ one semi-implicit solve on the same
conditioning (identical operator structure).  At reference-stable dt the
first Newton step already satisfies the tolerance most substeps, so the
overhead is ~one extra force evaluation; the win is that dt is no longer
capped by the mesh size (dt ~ h removed — BASELINE.md round-4 rows).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fem_tpu.models.state import FemObject, SimState
from fem_tpu.ops.assembly import assemble_for, element_contrib_full
from fem_tpu.solvers.implicit import (
    ImplicitAux,
    _material_force_columns,
    conjugate_gradient,
)


def newton_velocity_solve(
    obj: FemObject,
    state: SimState,
    dt: float,
    axis_name: str | None = None,
    max_newton: int = 10,
    cg_iters: int = 120,
    tol: float = 1e-5,
    n_backtrack: int = 10,
) -> Tuple[SimState, ImplicitAux]:
    """Solve r(v) = 0 for the end-of-substep velocity; vel ← v.

    Convergence: max |P·r| ≤ ``tol`` (velocity units — matches the scale of
    the reference CG's absolute tolerance on the same unknown), or
    ``max_newton`` steps, or 3 consecutive line-search failures (the f32
    progress floor, as in solvers/static.py).  The inner CG runs to a
    relative 1e-8 on rᵀr — a Newton step needs a direction, not a tight
    solve.  Reported aux: total inner CG iterations (comparable with the
    semi-implicit paths' iteration counter) and the final ‖P·r‖².
    """
    inv_m = 1.0 / obj.mass[:, None]
    free = obj.free_mask  # (N, 1) or None
    held = None if free is None else 1.0 - free
    v_n = state.vel
    x_n = state.pos

    def residual(v: jnp.ndarray) -> jnp.ndarray:
        cols = _material_force_columns(obj, x_n + dt * v, False)
        f = assemble_for(obj, element_contrib_full(cols), axis_name)
        r = (v - v_n) - dt * inv_m * f
        return r if free is None else free * r

    def res_norm(r: jnp.ndarray) -> jnp.ndarray:
        m = jnp.max(jnp.abs(r))
        return jnp.where(jnp.isnan(m), jnp.inf, m)

    # Initial iterate: v_n on free DOFs, the prescribed velocity on pins
    # (inhomogeneous Dirichlet — same contract as the projected CG solve,
    # solvers/implicit._cg_solve_dispatch).
    if free is None:
        v0 = v_n
    elif obj.pin_vel is not None:
        v0 = free * v_n + held * obj.pin_vel
    else:
        v0 = free * v_n

    def body(carry):
        v, _, it, cg_total, fails = carry
        r = residual(v)

        def hvp(w: jnp.ndarray) -> jnp.ndarray:
            def force(p):
                cols = _material_force_columns(obj, p, False)
                return assemble_for(obj, element_contrib_full(cols), axis_name)

            _, df = jax.jvp(force, (x_n + dt * v,), (w,))
            return w - (dt * dt) * inv_m * df

        if free is None:
            op = hvp
        else:

            def op(w):
                return free * hvp(free * w) + held * w

        rr = jnp.sum(r * r)
        sol = conjugate_gradient(
            op, -r, jnp.zeros_like(r), max_iter=cg_iters, tol=1e-8 * rr
        )
        delta = sol.x if free is None else free * sol.x
        r0n = res_norm(r)
        # Sequential backtracking: the full step is accepted on the first
        # trial away from the stability boundary, so the common-case cost is
        # ONE extra force evaluation (a vmapped all-candidates search would
        # pay n_backtrack assemblies every step).
        rn1 = res_norm(residual(v + delta))

        def ls_cond(c):
            _, rn, k = c
            return (rn >= r0n) & (k < n_backtrack)

        def ls_body(c):
            t, _, k = c
            t2 = 0.5 * t
            return (t2, res_norm(residual(v + t2 * delta)), k + 1)

        t, rn, _ = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.float32(1.0), rn1, jnp.int32(1))
        )
        any_ok = rn < r0n
        v_new = jnp.where(any_ok, v + t * delta, v)
        gn = jnp.where(any_ok, rn, r0n)
        fails_new = jnp.where(any_ok, jnp.int32(0), fails + 1)
        return (v_new, gn, it + 1, cg_total + sol.iterations, fails_new)

    def cond(carry):
        _, gn, it, _, fails = carry
        return (it < max_newton) & (gn > tol) & (fails < 3)

    gn0 = res_norm(residual(v0))
    v, gn, _, cg_total, _ = jax.lax.while_loop(
        cond, body, (v0, gn0, jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )
    return state.replace(vel=v), ImplicitAux(cg_total, gn * gn)
