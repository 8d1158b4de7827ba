# coding=utf-8
"""θ-scheme on the Newton integrator (``SimConfig.newton_theta`` extension).

θ = 1 is the existing backward-Euler Newton path (unchanged code); θ = 1/2
is the implicit midpoint rule — the force is evaluated at
x(v) = xₙ + dt·((1−θ)vₙ + θv) and positions advance by the same θ-weighted
velocity (solvers/newton.py + solvers/advect.advect_implicit_step).  These
tests pin the two properties that justify the scheme:

  * SECOND-ORDER accuracy: halving dt cuts the trajectory error ~4× for
    θ = 1/2 but only ~2× for θ = 1 (backward Euler is first order);
  * ENERGY CONSERVATION in free elastic vibration (no gravity / damping /
    collisions): midpoint holds kinetic+elastic energy to the f32 solve
    floor while backward Euler visibly bleeds it.

The reference integrator has no θ-scheme (its single linearized solve is
semi-implicit backward Euler, /root/reference/solver/implicit.py:201-223);
config validation rejects newton_theta != 1 outside integrator="newton".
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.models.state import Obstacles
from fem_tpu.ops.element import total_energy
from fem_tpu.sim import make_substep_fn
from fem_tpu.utils.config import SimConfig
from tests.utils import make_2d_object

G0 = (0.0, 0.0)


def no_obstacles(dim=2):
    return Obstacles(
        centers=jnp.zeros((1, dim), jnp.float32),
        radii=jnp.zeros((1,), jnp.float32),
    )


def _cfg(dt, theta, **kw):
    base = dict(
        dim=2, delta_time=dt, sim_count=10, use_explicit_method=False,
        auto_diff=False, implicit_method=1, preconditioned=1, g_dir=G0,
        integrator="newton", newton_theta=theta, newton_tol=1e-7,
        newton_iters=15, newton_cg_iters=200,
    )
    base.update(kw)
    return SimConfig(**base)


def _free_vibration_object():
    """Centered 2D block, zero damping, stretched 8% — free elastic
    oscillation that never touches the walls."""
    _, obj, state = make_2d_object(
        subdivisions=4, center=(0.5, 0.5), damping=0.0
    )
    center = jnp.mean(state.pos, axis=0, keepdims=True)
    state = state.replace(pos=center + 1.08 * (state.pos - center))
    return obj, state


def _energy(obj, state):
    elastic = total_energy(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda,
    )
    v = state.vel + state.vel_g
    kinetic = 0.5 * jnp.sum(obj.mass[:, None] * v * v)
    return float(elastic + kinetic)


def _run(obj, state, cfg, n):
    fn = make_substep_fn(obj, cfg)
    obs = no_obstacles()
    for _ in range(n):
        state, _ = fn(state, obs)
    return state


def test_theta_validated():
    with pytest.raises(ValueError):
        _cfg(1e-4, 0.3)  # below midpoint: conditionally stable, rejected
    with pytest.raises(ValueError):
        _cfg(1e-4, 1.2)
    with pytest.raises(ValueError):
        SimConfig(
            dim=2, g_dir=G0, newton_theta=0.5  # semi-implicit integrator
        )
    _cfg(1e-4, 0.5)  # midpoint OK
    _cfg(1e-4, 1.0)  # backward Euler OK


def test_midpoint_conserves_energy_backward_euler_bleeds():
    """Free vibration over ~1.5 periods: midpoint holds E to the solve
    floor; backward Euler loses a measurable fraction."""
    obj, state0 = _free_vibration_object()
    e0 = _energy(obj, state0)
    n, dt = 150, 2e-4
    s_mid = _run(obj, state0, _cfg(dt, 0.5), n)
    s_be = _run(obj, state0, _cfg(dt, 1.0), n)
    drift_mid = abs(_energy(obj, s_mid) - e0) / e0
    loss_be = (e0 - _energy(obj, s_be)) / e0
    assert drift_mid < 3e-3, drift_mid
    assert loss_be > 0.01, loss_be
    assert loss_be > 5.0 * drift_mid, (loss_be, drift_mid)


def test_midpoint_second_order_backward_euler_first_order():
    """Richardson order check against an 8×-finer midpoint reference: the
    dt → dt/2 error ratio is ~4 (second order) for θ = 1/2 and ~2 (first
    order) for θ = 1."""
    obj, state0 = _free_vibration_object()
    t_end, dt = 1.2e-2, 1e-3

    def traj(theta, dt_run):
        n = int(round(t_end / dt_run))
        s = _run(obj, state0, _cfg(dt_run, theta), n)
        return np.asarray(s.pos)

    ref = traj(0.5, dt / 8.0)

    def err(theta, dt_run):
        return float(np.abs(traj(theta, dt_run) - ref).max())

    r_mid = err(0.5, dt) / err(0.5, dt / 2.0)
    r_be = err(1.0, dt) / err(1.0, dt / 2.0)
    assert r_mid > 3.0, r_mid  # ~4 expected
    assert 1.4 < r_be < 2.9, r_be  # ~2 expected


def test_theta_one_matches_plain_newton_exactly():
    """The θ = 1 code path is the historical Newton path bit-for-bit (the
    θ branch is static Python, not traced)."""
    obj, state0 = _free_vibration_object()
    cfg_a = _cfg(2e-4, 1.0)
    s_a = _run(obj, state0, cfg_a, 10)
    # Same config built without naming newton_theta at all.
    cfg_b = SimConfig(
        dim=2, delta_time=2e-4, sim_count=10, use_explicit_method=False,
        auto_diff=False, implicit_method=1, preconditioned=1, g_dir=G0,
        integrator="newton", newton_tol=1e-7, newton_iters=15,
        newton_cg_iters=200,
    )
    s_b = _run(obj, state0, cfg_b, 10)
    assert np.array_equal(np.asarray(s_a.pos), np.asarray(s_b.pos))
    assert np.array_equal(np.asarray(s_a.vel), np.asarray(s_b.vel))


def test_midpoint_under_gravity_and_decoupled_hessian():
    """Composition: θ = 1/2 with gravity + walls + the decoupled (modified
    Newton) Jacobian stays finite and lands near the backward-Euler result
    over a short horizon (both approximate the same dynamics)."""
    _, obj, state0 = make_2d_object(subdivisions=4, center=(0.5, 0.6))
    kw = dict(
        g_dir=(0.0, -1.0), newton_hessian="decoupled", newton_tol=1e-6,
    )
    s_mid = _run(obj, state0, _cfg(2e-4, 0.5, **kw), 50)
    s_be = _run(obj, state0, _cfg(2e-4, 1.0, **kw), 50)
    assert np.isfinite(np.asarray(s_mid.pos)).all()
    diff = np.abs(np.asarray(s_mid.pos) - np.asarray(s_be.pos)).max()
    assert diff < 5e-4, diff


def test_midpoint_external_force_consistent_position_weighting():
    """ADVICE r4 #1: with θ < 1 and an external force (static load), the
    rhs velocity fold must not enter the (1−θ)·v_n force-evaluation
    position.  Pin the combination by comparing against a tiny-dt
    backward-Euler reference trajectory: a constant body load on a
    midpoint run must track it to second order (the pre-fix splitting
    error θ(1−θ)·dt²·f_ext/m biases positions every substep)."""
    from fem_tpu.utils.config import ObjectConfig
    from fem_tpu.models.mesh import construct_2d_mesh
    from fem_tpu.models.state import build_object

    ocfg = ObjectConfig(
        center=(0.5, 0.5), side_length=0.2, subdivisions=4, damping=0.0,
        load_boxes=(((0.0, 0.0), (1.0, 1.0), (0.0, 0.4)),),
    )
    v, f, e = construct_2d_mesh(ocfg)
    obj, state0 = build_object(ocfg, v, f, e)
    obs = no_obstacles()

    def run(dt, theta, t_total=0.02):
        cfg = _cfg(dt, theta)
        fn = make_substep_fn(obj, cfg)
        s = state0
        for _ in range(int(round(t_total / dt))):
            s, _ = fn(s, obs)
        return np.asarray(s.pos)

    ref = run(2.5e-5, 1.0)  # tiny-dt ground truth
    mid = run(4e-4, 0.5)
    be = run(4e-4, 1.0)
    err_mid = np.abs(mid - ref).max()
    err_be = np.abs(be - ref).max()
    assert np.isfinite(err_mid)
    # Midpoint at 16x the dt must at least match backward Euler's accuracy
    # on the loaded trajectory (second order vs first).
    assert err_mid <= err_be * 1.2, (err_mid, err_be)


def test_theta_no_deeper_wall_penetration_than_backward_euler():
    """ADVICE r4 #2: a vertex whose velocity is zeroed by a wall collision
    must not advance into the wall by its pre-collision velocity's (1−θ)
    share — collision-touched components use pure θ=1 weighting."""
    cfg = _cfg(4e-4, 0.5, g_dir=(0.0, -1.0))
    _, obj, state = make_2d_object(
        subdivisions=4, center=(0.5, 0.12), damping=2.0
    )
    state = state.replace(
        vel=jnp.zeros_like(state.vel).at[:, 1].set(-1.2)
    )
    fn = make_substep_fn(obj, cfg)
    obs = no_obstacles()
    min_y = []
    for _ in range(60):
        state, _ = fn(state, obs)
        min_y.append(float(np.asarray(state.pos)[:, 1].min()))
    assert np.isfinite(min_y).all()
    # θ=1 semantics: a vertex at y<0 with downward v has v zeroed, so pos
    # never decreases below its entry point by more than one substep of
    # residual motion.  Bound: no deeper than one dt of the impact speed.
    assert min(min_y) > -1.2 * 4e-4 * 10 - 1e-4, min(min_y)
