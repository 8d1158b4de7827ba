# coding=utf-8
"""Exact-JVP Newton operator (framework extension, SURVEY §2 row 9)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.ops.assembly import element_contrib_full, segment_assemble
from fem_tpu.ops.element import implicit_force_columns
from fem_tpu.solvers.implicit import (
    implicit_velocity_solve,
    make_exact_hvp_apply,
)
from tests.utils import default_obstacles, default_sim_config, make_2d_object

DT = 5e-4


def _perturbed(state, scale=0.003, seed=13):
    rng = np.random.default_rng(seed)
    noise = rng.normal(scale=scale, size=state.pos.shape).astype(np.float32)
    vel = rng.normal(scale=0.05, size=state.pos.shape).astype(np.float32)
    return state.replace(
        pos=state.pos + jnp.asarray(noise), vel=jnp.asarray(vel)
    )


def test_exact_hvp_matches_finite_differences():
    cfg, obj, state = make_2d_object(subdivisions=3)
    state = _perturbed(state)

    def force_np(p):
        cols = implicit_force_columns(
            jnp.asarray(p, jnp.float32), obj.element_indices, obj.ref_inv,
            obj.volume, obj.mu, obj.s_lambda,
        )
        return np.asarray(
            segment_assemble(
                element_contrib_full(cols), obj.element_indices,
                obj.particle_cnt,
            )
        )

    apply_a = make_exact_hvp_apply(obj, state.pos, DT)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(obj.particle_cnt, obj.dim)).astype(np.float32)
    got = np.asarray(apply_a(jnp.asarray(x)))

    pos = np.asarray(state.pos, np.float64)
    eps = 1e-3
    jfd = (force_np(pos + eps * x) - force_np(pos - eps * x)) / (2 * eps)
    expect = x - DT * DT * jfd / np.asarray(obj.mass)[:, None]
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-4)


def test_exact_hvp_is_symmetric_up_to_mass_scaling():
    """J = ∂f/∂x of the conservative force is symmetric: ⟨x, J y⟩ = ⟨J x, y⟩
    (checked through M·(A−I) which isolates J)."""
    cfg, obj, state = make_2d_object(subdivisions=3)
    state = _perturbed(state)
    apply_a = make_exact_hvp_apply(obj, state.pos, DT)
    m = np.asarray(obj.mass)[:, None]

    def j_apply(v):
        av = np.asarray(apply_a(jnp.asarray(v)))
        return (v - av) * m / (DT * DT)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(obj.particle_cnt, obj.dim)).astype(np.float32)
    y = rng.normal(size=(obj.particle_cnt, obj.dim)).astype(np.float32)
    a = float((x * j_apply(y)).sum())
    b = float((j_apply(x) * y).sum())
    assert abs(a - b) / max(abs(a), 1e-6) < 1e-3


@pytest.mark.parametrize("precond", [0, 1])
def test_exact_hessian_solve_runs_and_is_close_to_reference(precond):
    cfg, obj, state = make_2d_object(subdivisions=4)
    state = _perturbed(state)
    s_ref, _ = implicit_velocity_solve(obj, state, DT, 1, precond)
    s_ex, aux = implicit_velocity_solve(
        obj, state, DT, 1, precond, hessian="exact_jvp"
    )
    # Different linearizations of the same dynamics: both are small dt²
    # corrections to b, so the solutions agree at the velocity scale but the
    # corrections themselves differ (the reference Hessian drops all
    # cross-vertex coupling, implicit.py:141-144).
    v_ref = np.asarray(s_ref.vel)
    v_ex = np.asarray(s_ex.vel)
    assert np.isfinite(v_ex).all()
    assert np.abs(v_ex - v_ref).max() < 0.25 * max(np.abs(v_ref).max(), 1e-6)


def test_exact_hessian_rejects_jacobi():
    cfg, obj, state = make_2d_object(subdivisions=3)
    with pytest.raises(ValueError):
        implicit_velocity_solve(obj, state, DT, 0, 0, hessian="exact_jvp")


def test_exact_hessian_full_simulation():
    from fem_tpu.sim import make_frame_fn

    cfg = default_sim_config(
        auto_diff=False, use_explicit_method=False, implicit_method=1,
        preconditioned=1, hessian="exact_jvp",
    )
    _, obj, state = make_2d_object(subdivisions=5)
    obstacles = default_obstacles()
    frame = make_frame_fn(obj, cfg)
    for _ in range(20):
        state, _ = frame(state, obstacles)
    assert np.isfinite(np.asarray(state.pos)).all()
