# coding=utf-8
"""Simulation driver: jitted substeps under ``lax.scan``.

The reference's hot loop (main.py:101-113) dispatches one of three methods per
substep and advects.  Here the method is a trace-time constant, the substep is
one pure function ``state -> state`` and a rendered frame's ``sim_count``
substeps run as a single compiled ``lax.scan`` — one device dispatch per frame
instead of the reference's 2 kernel launches per substep.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fem_tpu.models.state import FemObject, Obstacles, SimState
from fem_tpu.ops.element import element_energies
from fem_tpu.solvers.advect import advect_implicit_step, kinematic_step
from fem_tpu.solvers.explicit import (
    analytic_energy_gradient,
    autodiff_energy_gradient,
)
from fem_tpu.solvers.implicit import implicit_velocity_solve
from fem_tpu.utils.config import SimConfig


class StepAux(NamedTuple):
    """Per-substep observability (SURVEY §5: structured metrics in place of
    the reference's commented-out profiler prints)."""

    solver_iterations: jnp.ndarray
    solver_residual: jnp.ndarray


def substep(
    obj: FemObject,
    state: SimState,
    obstacles: Obstacles,
    *,
    dt: float,
    g_dir: Tuple[float, ...],
    use_explicit_method: bool,
    auto_diff: bool,
    implicit_method: int,
    preconditioned: int,
    axis_name: str | None = None,
    solver_backend: str = "auto",
    element_backend: str = "xla",
    robust_inversion: bool = False,
    hessian: str = "reference",
    operator_mode: str = "graph",
    jacobi_sweep: str = "serial",
    cg_precond: str = "reference",
    integrator: str = "semi_implicit",
    newton_iters: int = 10,
    newton_cg_iters: int = 120,
    newton_tol: float = 1e-5,
    newton_hessian: str = "exact",
    newton_theta: float = 1.0,
    external_force: jnp.ndarray | None = None,
    wall_friction: float = 0.0,
) -> Tuple[SimState, StepAux]:
    """One simulation substep.  Method dispatch mirrors main.py:101-112:
    ``auto_diff`` wins over everything (even over use_explicit_method=False),
    otherwise explicit-analytic or implicit.  ``axis_name`` enables
    element-sharded execution under shard_map (fem_tpu.parallel).

    ``external_force`` (extension — used by the body-body penalty contact,
    fem_tpu/contact.py) is an additional per-particle force: subtracted from
    the energy gradient on the explicit/autodiff paths, and folded into the
    implicit rhs exactly as b = v + dt·(f_elastic + f_ext)/m via the velocity
    substitution v' = v + dt·f_ext/m (b is linear in v; the solve then reads
    the correct rhs on every operator/kernel branch unchanged)."""
    zero_aux = StepAux(jnp.int32(0), jnp.float32(0.0))
    if obj.static_load is not None:
        # Neumann loads (ObjectConfig.load_boxes) compose with any caller-
        # supplied force (e.g. body-body contact).
        external_force = (
            obj.static_load
            if external_force is None
            else external_force + obj.static_load
        )
    # Advection stays on the XLA path: the fused Pallas advection kernels
    # (ops/pallas_advect.py) are parity-exact but measured 4x SLOWER here —
    # their (N, d) layout has d lanes, forcing Mosaic relayouts that cost
    # more than the ~8 fused XLA ops they replace.  (The element-column
    # kernels use the component-planar layout and do win.)
    advect_backend = "xla"
    # Inelastic material extensions (plastic_yield / viscous_mu,
    # fem_tpu/ops/inelastic.py): the stress decomposes into MATERIAL LAYERS
    # (base material on ref_inv·F_p⁻¹ + optional Maxwell branch) that every
    # execution path sums natively — graph/mxu/blocked/fused-solve operators,
    # explicit blocked prep, Newton decoupled/exact — and
    # ``advance_internal`` updates the internal state after advection.
    inelastic = obj.plastic_yield > 0.0 or obj.viscous_mu > 0.0
    layers = None
    if inelastic:
        from fem_tpu.ops.inelastic import advance_internal, material_layers

        layers = material_layers(obj, state)
    if obj.damping_beta != 0.0 and (auto_diff or use_explicit_method):
        # Rayleigh damping on the explicit paths (extension): an extra
        # gradient term −β·G(K)·v on the decoupled block-Hessian operator
        # (solvers/implicit.rayleigh_damping_grad).
        from fem_tpu.solvers.implicit import rayleigh_damping_grad

        damp = rayleigh_damping_grad(
            obj, state.pos, state.vel, axis_name, layers
        )
        external_force = (
            -damp if external_force is None else external_force - damp
        )
    if auto_diff or use_explicit_method:
        if inelastic:
            # The analytic inelastic gradient IS the gradient of the total
            # (base + branch) energy at frozen internal variables, so the
            # autodiff and analytic dispatches coincide here — both run the
            # layered analytic chain (blocked MXU prep where attached).
            grad = analytic_energy_gradient(
                obj, state.pos, axis_name, element_backend, layers
            )
        elif auto_diff:
            grad = autodiff_energy_gradient(obj, state.pos, axis_name)
        else:
            grad = analytic_energy_gradient(
                obj, state.pos, axis_name, element_backend
            )
        if external_force is not None:
            grad = grad - external_force
        state = kinematic_step(
            state, grad, obj.mass, obstacles, dt, obj.damping, g_dir,
            advect_backend, obj.free_mask, obj.pin_vel, wall_friction,
        )
        if inelastic:
            state = advance_internal(obj, state, dt, axis_name)
        return state, zero_aux
    # θ-scheme position weighting (newton_theta < 1) needs the PHYSICAL
    # start-of-substep combined velocity — captured before the external-
    # force rhs substitution below (which is an algebraic trick, not a
    # velocity the body ever had).
    vel_pos_old = (
        state.vel + state.vel_g
        if integrator == "newton" and newton_theta != 1.0
        else None
    )
    # Pre-fold velocity for the Newton θ-scheme's force-evaluation position
    # (ADVICE r4 #1: the rhs fold below is algebra, not physics — it must
    # not enter the (1−θ)·v_n position weighting).
    vel_unfolded = state.vel if vel_pos_old is not None else None
    if external_force is not None:
        # Fold the external force into the implicit rhs: b = v + dt·M⁻¹f_el
        # is linear in v, so solving with v' = v + dt·M⁻¹f_ext yields exactly
        # b = v + dt·M⁻¹(f_el + f_ext) on every operator/kernel branch.
        state = state.replace(
            vel=state.vel + dt * external_force / obj.mass[:, None]
        )
    if integrator == "newton":
        # Fully implicit backward Euler (extension, solvers/newton.py):
        # damped Newton closes the nonlinear elastic residual each substep —
        # removes the dt ~ h stability cap of the reference's single
        # linearized solve.  Advection (gravity/damping/collisions) below is
        # shared with the semi-implicit path, reference structure.
        from fem_tpu.solvers.newton import newton_velocity_solve

        state, solve_aux = newton_velocity_solve(
            obj, state, dt, axis_name,
            max_newton=newton_iters, cg_iters=newton_cg_iters,
            tol=newton_tol, hessian_mode=newton_hessian,
            element_backend=element_backend,
            # "reference"/"none" both mean plain CG inside Newton (there is
            # no normal-equations variant here); "block_jacobi" turns on
            # the mass-symmetrized PCG inner solves and "two_level" the
            # coarse-space V-cycle PCG (both decoupled mode).
            cg_precond=(
                cg_precond
                if cg_precond == "block_jacobi"
                or cg_precond.startswith("two_level")
                else "none"
            ),
            robust=robust_inversion,
            beta=obj.damping_beta,
            theta=newton_theta,
            layers=layers,
            v_n_pos=vel_unfolded,
        )
        state = advect_implicit_step(
            state, obstacles, dt, obj.damping, g_dir, advect_backend,
            obj.free_mask, obj.pin_vel, wall_friction,
            theta=newton_theta, vel_pos_old=vel_pos_old,
        )
        if inelastic:
            state = advance_internal(obj, state, dt, axis_name)
        return state, StepAux(solve_aux.iterations, solve_aux.residual)
    # Measured on TPU v5e (tools/profile_parts.py): with the reference's
    # absolute CG tolerance the solver converges in a handful of iterations,
    # and the O(E) matrix-free operator beats dense materialization at every
    # mesh size tried — so "auto" resolves to matrix-free and dense stays an
    # explicit opt-in for high-iteration-count regimes.
    # The dense backend materializes the reference block Hessian; the
    # exact-JVP operator is matrix-free only.
    use_dense = (
        solver_backend == "dense"
        and axis_name is None
        and hessian == "reference"
        and cg_precond == "reference"
        and not inelastic  # layered operators are matrix-free-only
        and obj.free_mask is None  # Dirichlet projection is matrix-free-only
    )
    if use_dense:
        from fem_tpu.solvers.dense import implicit_velocity_solve_dense

        state, solve_aux = implicit_velocity_solve_dense(
            obj, state, dt, implicit_method, preconditioned, robust_inversion,
            jacobi_sweep,
        )
    else:
        state, solve_aux = implicit_velocity_solve(
            obj, state, dt, implicit_method, preconditioned, axis_name,
            robust_inversion, element_backend, hessian, operator_mode,
            jacobi_sweep, cg_precond, layers,
        )
    state = advect_implicit_step(
        state, obstacles, dt, obj.damping, g_dir, advect_backend,
        obj.free_mask, obj.pin_vel, wall_friction,
    )
    if inelastic:
        state = advance_internal(obj, state, dt, axis_name)
    return state, StepAux(solve_aux.iterations, solve_aux.residual)


def _cfg_kwargs(cfg: SimConfig) -> dict:
    return dict(
        dt=cfg.delta_time,
        g_dir=cfg.g_dir,
        use_explicit_method=cfg.use_explicit_method,
        auto_diff=cfg.auto_diff,
        implicit_method=cfg.implicit_method,
        preconditioned=cfg.preconditioned,
        solver_backend=cfg.solver_backend,
        element_backend=cfg.element_backend,
        robust_inversion=cfg.robust_inversion,
        hessian=cfg.hessian,
        operator_mode=cfg.operator_mode,
        jacobi_sweep=cfg.jacobi_sweep,
        cg_precond=cfg.cg_precond,
        integrator=cfg.integrator,
        newton_iters=cfg.newton_iters,
        newton_cg_iters=cfg.newton_cg_iters,
        newton_tol=cfg.newton_tol,
        newton_hessian=cfg.newton_hessian,
        newton_theta=cfg.newton_theta,
        wall_friction=cfg.wall_friction,
    )


# NOTE on jit structure: the mesh arrays (element indices, ref_inv, volumes,
# masses, incidence plans) MUST be jit *arguments*, not closure captures.
# Captured arrays become XLA constants; measured on this TPU backend that
# made a 131k-element kernel compile ~15x slower AND run ~250x slower
# (10.5 ms vs 41 us) than the same kernel with the arrays passed as inputs.


def _circles_only(cfg: SimConfig) -> bool:
    """The fused whole-frame kernels implement the reference advection
    semantics only: circle obstacles (frictionless spheres fold into the
    circle arrays) and frictionless walls.  SDF obstacle extensions,
    frictional spheres and wall friction run the op-composed path."""
    return cfg.wall_friction == 0.0 and all(
        o.type == "sphere" and o.friction == 0.0 for o in cfg.obstacles
    )


def supports_blocked_frame(obj: FemObject, cfg: SimConfig) -> bool:
    """Eligibility for the whole-frame blocked kernel
    (ops/pallas_blocked_frame.py): the 3D implicit-CG reference path with
    the fused VMEM tables built, and no backend override that asks for a
    different execution strategy."""
    from fem_tpu.utils.config import CONJUGATE_GRADIENT_METHOD

    return (
        obj.dim in (2, 3)
        and not cfg.adaptive_dt
        and _circles_only(cfg)
        and cfg.integrator == "semi_implicit"
        and not cfg.use_explicit_method
        and not cfg.auto_diff
        and cfg.implicit_method == CONJUGATE_GRADIENT_METHOD
        and cfg.hessian == "reference"
        and cfg.operator_mode in ("auto", "fused")
        and cfg.element_backend in ("auto", "pallas")
        and cfg.solver_backend == "auto"
        and cfg.cg_precond in ("reference", "none")
        and obj.free_mask is None
        and obj.static_load is None
        and obj.damping_beta == 0.0
        and obj.blocking is not None
        and obj.blocking.s_dense is not None
        # Inelasticity runs IN-KERNEL since round 5: the von-Mises return
        # map / Maxwell relaxation are plane arithmetic, and the Maxwell
        # branch adds a second material layer to the in-kernel prep
        # (ops/pallas_blocked_frame.py).
        and (
            (obj.plastic_yield == 0.0 and obj.viscous_mu == 0.0)
            or obj.blocking.element_slot is not None
        )
    )


def supports_explicit_blocked_frame(obj: FemObject, cfg: SimConfig) -> bool:
    """Eligibility for the explicit/autodiff whole-frame kernel
    (ops/pallas_blocked_frame.fused_explicit_frame): the neo-Hookean
    gradient chain with the fused VMEM tables built."""
    return (
        obj.dim in (2, 3)
        and not cfg.adaptive_dt
        and _circles_only(cfg)
        and (cfg.use_explicit_method or cfg.auto_diff)
        and cfg.element_backend in ("auto", "pallas")
        and obj.free_mask is None
        and obj.static_load is None
        and obj.damping_beta == 0.0
        and obj.blocking is not None
        and obj.blocking.s_dense is not None
        # Inelasticity runs IN-KERNEL (round 5, same scheme as the
        # implicit whole-frame kernel).
        and (
            (obj.plastic_yield == 0.0 and obj.viscous_mu == 0.0)
            or obj.blocking.element_slot is not None
        )
    )


def make_explicit_blocked_frame_fn(obj: FemObject, cfg: SimConfig):
    """Explicit/autodiff frame as ONE device op (analytic gradient chain —
    mathematically identical to the autodiff path; ulp-level association
    differences only)."""
    from fem_tpu.ops.pallas_blocked_frame import fused_explicit_frame

    plastic = float(obj.plastic_yield)
    visc_mu = float(obj.viscous_mu)

    @jax.jit
    def frame_impl(o: FemObject, state: SimState, obstacles: Obstacles):
        out = fused_explicit_frame(
            o.blocking, state.pos, state.vel, o.mass,
            obstacles.centers, obstacles.radii,
            dim=o.dim, dt=cfg.delta_time, damping=o.damping,
            g_dir=tuple(cfg.g_dir), mu=o.mu, s_lambda=o.s_lambda,
            sim_count=cfg.sim_count, material=o.material,
            plastic_inv=state.plastic_inv if plastic > 0.0 else None,
            plastic_yield=plastic,
            viscous_inv=state.viscous_inv if visc_mu > 0.0 else None,
            viscous_mu=visc_mu,
            viscous_tau=float(obj.viscous_tau),
        )
        pos, vel = out[:2]
        new_state = state.replace(
            pos=pos, vel=vel, force=jnp.zeros_like(pos)
        )
        i = 2
        if plastic > 0.0:
            new_state = new_state.replace(plastic_inv=out[i])
            i += 1
        if visc_mu > 0.0:
            new_state = new_state.replace(viscous_inv=out[i])
        aux = StepAux(
            jnp.zeros((cfg.sim_count,), jnp.int32),
            jnp.zeros((cfg.sim_count,), jnp.float32),
        )
        return new_state, aux

    def frame(state: SimState, obstacles: Obstacles):
        return frame_impl(obj, state, obstacles)

    return frame


def make_blocked_frame_fn(obj: FemObject, cfg: SimConfig):
    """Frame function backed by the whole-frame fused kernel — ONE device op
    per rendered frame (ops/pallas_blocked_frame.py)."""
    from fem_tpu.ops.pallas_blocked_frame import fused_blocked_frame

    plastic = float(obj.plastic_yield)
    visc_mu = float(obj.viscous_mu)

    @jax.jit
    def frame_impl(o: FemObject, state: SimState, obstacles: Obstacles):
        out = fused_blocked_frame(
            o.blocking, state.pos, state.vel, state.vel_g, o.mass,
            obstacles.centers, obstacles.radii,
            dim=o.dim, dt=cfg.delta_time, damping=o.damping,
            g_dir=tuple(cfg.g_dir), mu=o.mu, s_lambda=o.s_lambda,
            preconditioned=(
                cfg.preconditioned == 1 and cfg.cg_precond == "reference"
            ),
            sim_count=cfg.sim_count,
            robust=cfg.robust_inversion,
            fast_math=cfg.cg_fast_math,
            material=o.material,
            plastic_inv=state.plastic_inv if plastic > 0.0 else None,
            plastic_yield=plastic,
            viscous_inv=state.viscous_inv if visc_mu > 0.0 else None,
            viscous_mu=visc_mu,
            viscous_tau=float(obj.viscous_tau),
        )
        pos, vel, velg, iters, res = out[:5]
        new_state = state.replace(pos=pos, vel=vel, vel_g=velg)
        i = 5
        if plastic > 0.0:
            new_state = new_state.replace(plastic_inv=out[i])
            i += 1
        if visc_mu > 0.0:
            new_state = new_state.replace(viscous_inv=out[i])
        return new_state, StepAux(iters, res)

    def frame(state: SimState, obstacles: Obstacles):
        return frame_impl(obj, state, obstacles)

    return frame


def make_frame_fn(obj: FemObject, cfg: SimConfig):
    """Compiled function advancing one rendered frame (= ``sim_count``
    substeps).  Returns (state, StepAux stacked over substeps).

    Backend resolution (``frame_backend``):
      * ``"auto"`` on TPU — the whole-frame BLOCKED kernels when eligible
        (ops/pallas_blocked_frame.py: implicit-CG or explicit/autodiff as
        ONE device op per frame over VMEM-resident block tables; the
        fastest measured paths); otherwise the op-composed ``lax.scan``
        frame.
      * ``"blocked"`` / ``"blocked_explicit"`` — force those kernels
        (ValueError if ineligible); used by CPU interpret-mode tests.
      * ``"fused"`` — the earlier UNblocked whole-frame kernel
        (experiments/pallas_frame.py): parity-exact but 4.8× slower (O(E·N)
        one-hot gathers); kept as a documented alternative.
    """
    if cfg.frame_backend == "fused":
        from fem_tpu.experiments.pallas_frame import (
            make_fused_frame_fn, supports_fused_frame,
        )

        if not supports_fused_frame(obj, cfg):
            raise ValueError(
                "frame_backend='fused' requested but this config/mesh "
                "is not eligible (see experiments/pallas_frame.py)"
            )
        return make_fused_frame_fn(obj, cfg)
    if not cfg.adaptive_dt and (
        cfg.frame_backend == "blocked"
        or (
            cfg.frame_backend == "auto"
            and jax.default_backend() == "tpu"
            and supports_blocked_frame(obj, cfg)
        )
    ):
        # Whole-frame kernel — fastest measured flagship path (3,763 vs
        # 3,599 steps/s for op-composed + whole-solve kernel, 2,069 for
        # op-composed + grid kernels) once the one-hot dots run as exact
        # bf16 split-dots (ops/pallas_blocked_cg._dot).  adaptive_dt
        # configs fall through to the guarded branch below, which itself
        # composes with this kernel when eligible.
        if cfg.frame_backend == "blocked" and not supports_blocked_frame(
            obj, cfg
        ):
            raise ValueError(
                "frame_backend='blocked' requested but this config/mesh "
                "is not eligible (see ops/pallas_blocked_frame.py)"
            )
        return make_blocked_frame_fn(obj, cfg)
    if cfg.frame_backend == "blocked_explicit" or (
        cfg.frame_backend == "auto"
        and jax.default_backend() == "tpu"
        and supports_explicit_blocked_frame(obj, cfg)
    ):
        if (
            cfg.frame_backend == "blocked_explicit"
            and not supports_explicit_blocked_frame(obj, cfg)
        ):
            raise ValueError(
                "frame_backend='blocked_explicit' requested but this "
                "config/mesh is not eligible (see "
                "ops/pallas_blocked_frame.py)"
            )
        return make_explicit_blocked_frame_fn(obj, cfg)
    kwargs = _cfg_kwargs(cfg)
    if cfg.adaptive_dt:
        # FRAME-LEVEL guard (round 5): measure κ once per frame and run all
        # sim_count substeps at the chosen split level.  The per-substep
        # variant measured 8.3× overhead on demo_spot_real (4,500 → 541
        # steps/s — the κ estimate's hessian_blocks chain costs more than
        # the whole guarded substep), while κ itself evolves on the
        # deformation timescale: the documented blow-ups build over
        # hundreds of substeps (BASELINE.md), so one check per frame
        # (≤ 10 substeps ≈ 5 ms of virtual time) loses no responsiveness.
        # make_substep_fn keeps the per-substep guard for fine-grained use.
        from fem_tpu.solvers.adaptive import (
            _LEVELS, kappa_estimate, split_level,
        )

        base = dict(kwargs)
        dt = base.pop("dt")
        # The guard composes with the whole-frame FUSED kernel (round 5):
        # each switch branch is the fused kernel compiled at the static
        # inner dt/n for sim_count·n substeps — the shipped demo_spot_real
        # config (fused tables fit; only `adaptive_dt` kept it off this
        # kernel) runs at fused speed under the guard.
        import dataclasses as _dc

        cfg_nodynamic = _dc.replace(cfg, adaptive_dt=False)
        use_fused = supports_blocked_frame(obj, cfg_nodynamic) and (
            cfg.frame_backend == "blocked"
            or (
                cfg.frame_backend == "auto"
                and jax.default_backend() == "tpu"
            )
        )
        if use_fused:
            fused_frames = {}
            for n in (1, 2, 4, 8):
                cfg_n = _dc.replace(
                    cfg_nodynamic,
                    delta_time=cfg.delta_time / n,
                    sim_count=cfg.sim_count * n,
                )
                fused_frames[n] = make_blocked_frame_fn(obj, cfg_n)

        @jax.jit
        def frame_impl(o: FemObject, state: SimState, obstacles: Obstacles):
            kappa = kappa_estimate(
                o, state.pos, dt, cfg.robust_inversion
            )
            idx = split_level(kappa, cfg.adaptive_dt_threshold)

            def make_branch(n):
                if use_fused:
                    def branch(s0):
                        s, aux = fused_frames[n](s0, obstacles)
                        # (S·n,) per-substep aux → (S,) frame rows: total
                        # iterations per outer substep, last inner residual.
                        it = aux.solver_iterations.reshape(
                            cfg.sim_count, n
                        ).sum(axis=1)
                        res = aux.solver_residual.reshape(
                            cfg.sim_count, n
                        )[:, -1]
                        return s, StepAux(it, res)

                    return branch

                def branch(s0):
                    def body(s, _):
                        def inner(st, _):
                            st, aux = substep(
                                o, st, obstacles, dt=dt / n, **base
                            )
                            return st, aux

                        s, auxes = jax.lax.scan(
                            inner, s, None, length=n
                        )
                        return s, StepAux(
                            jnp.sum(auxes.solver_iterations),
                            auxes.solver_residual[-1],
                        )

                    return jax.lax.scan(
                        body, s0, None, length=cfg.sim_count
                    )

                return branch

            return jax.lax.switch(
                idx, [make_branch(n) for n in _LEVELS], state
            )

    else:

        @jax.jit
        def frame_impl(o: FemObject, state: SimState, obstacles: Obstacles):
            def body(s, _):
                s, aux = substep(o, s, obstacles, **kwargs)
                return s, aux

            return jax.lax.scan(body, state, None, length=cfg.sim_count)

    def frame(state: SimState, obstacles: Obstacles):
        return frame_impl(obj, state, obstacles)

    return frame


def _make_adaptive_body(cfg: SimConfig, kwargs: dict):
    """Guarded substep body for ``adaptive_dt=true`` (solvers/adaptive.py):
    measures κ and splits the substep into 2/4/8 inner steps at dt/n when
    it crosses the threshold.  Total solver iterations are summed over the
    inner steps; the residual reported is the last inner step's."""
    from fem_tpu.solvers.adaptive import adaptive_substep

    base = dict(kwargs)
    dt = base.pop("dt")

    def body_fn(o: FemObject, s: SimState, obstacles: Obstacles):
        def sub_at(dt_eff, st):
            return substep(o, st, obstacles, dt=dt_eff, **base)

        s2, iters, res = adaptive_substep(
            sub_at, o, s, dt=dt,
            threshold=cfg.adaptive_dt_threshold,
            robust=cfg.robust_inversion,
        )
        return s2, StepAux(iters, res)

    return body_fn


def make_substep_fn(obj: FemObject, cfg: SimConfig):
    """Compiled single-substep function (for tests / fine-grained stepping)."""
    kwargs = _cfg_kwargs(cfg)
    if cfg.adaptive_dt:
        body_fn = _make_adaptive_body(cfg, kwargs)

        @jax.jit
        def adaptive_impl(o: FemObject, state: SimState, obstacles: Obstacles):
            return body_fn(o, state, obstacles)

        def adaptive_step(state: SimState, obstacles: Obstacles):
            return adaptive_impl(obj, state, obstacles)

        return adaptive_step

    @jax.jit
    def step_impl(o: FemObject, state: SimState, obstacles: Obstacles):
        return substep(o, state, obstacles, **kwargs)

    def step(state: SimState, obstacles: Obstacles):
        return step_impl(obj, state, obstacles)

    return step


def element_phi(obj: FemObject, state: SimState) -> jnp.ndarray:
    """Per-element energy V·φ for render coloring (reference ``obj.phi``,
    explicit_auto_diff.py:29 — sized (E,), fixing the reference's
    surface-count sizing bug at object.py:68)."""
    if obj.plastic_yield > 0.0 or obj.viscous_mu > 0.0:
        from fem_tpu.ops.inelastic import inelastic_element_energies

        return inelastic_element_energies(obj, state, state.pos)
    return element_energies(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda, obj.material,
    )


def element_von_mises(obj: FemObject, state: SimState) -> jnp.ndarray:
    """Per-element von Mises equivalent stress (E,) — post-processing
    extension (the reference exposes no stress field; ops/element.py
    ``cauchy_stress``)."""
    from fem_tpu.ops.element import element_stresses, von_mises

    return von_mises(
        element_stresses(
            state.pos, obj.element_indices, obj.ref_inv,
            obj.mu, obj.s_lambda, obj.material,
        )
    )
