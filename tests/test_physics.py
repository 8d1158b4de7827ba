# coding=utf-8
"""Physics-level behavioral tests: the reference's headline demo behavior
(square squeezes through the passage between two circles) and closed-form
free-fall checks."""

import numpy as np

from fem_tpu.models.state import Obstacles
from fem_tpu.sim import make_frame_fn
from tests.utils import default_obstacles, default_sim_config, make_2d_object


def test_square_passes_through_passage():
    """The reference's 2D demo (README gifs): the soft square at (0.5, 0.8)
    falls into the gap between circles at (0.2, 0.5) and (0.8, 0.5)
    (r=0.21), deforms through, and lands below.  4 virtual seconds,
    explicit-autodiff (default.json semantics)."""
    cfg = default_sim_config(auto_diff=True, use_explicit_method=True)
    _, obj, state = make_2d_object(subdivisions=10, side_length=0.2,
                                   center=(0.5, 0.8))
    obstacles = default_obstacles()
    frame = make_frame_fn(obj, cfg)
    for _ in range(800):  # 800 frames x 10 substeps x 5e-4 s = 4 s
        state, _ = frame(state, obstacles)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    # The body made it through: its center of mass is below the passage.
    assert pos[:, 1].mean() < 0.5
    # And settled inside the box.
    assert pos.min() > -0.05 and pos.max() < 1.05


def test_free_fall_matches_closed_form():
    """No walls in reach, no obstacles, zero stiffness interactions at rest:
    velocity follows v_{k+1} = (v_k + g dt) e^{-dt damping} exactly
    (kinematic.py:19-23)."""
    damping = 5.0
    dt = 5e-4
    cfg = default_sim_config(
        auto_diff=False, use_explicit_method=True, sim_count=10, blocks=()
    )
    _, obj, state = make_2d_object(subdivisions=2, center=(0.4, 0.9),
                                   damping=damping)
    obstacles = Obstacles.from_configs((), 2)
    frame = make_frame_fn(obj, cfg)
    state, _ = frame(state, obstacles)

    v = 0.0
    for _ in range(10):
        v = (v - 9.8 * dt) * np.exp(-dt * damping)
    # Rest-pose elastic forces are ~f32-epsilon, not exactly zero, so allow
    # a few 1e-4 relative.
    vel = np.asarray(state.vel)
    np.testing.assert_allclose(vel[:, 1], v, rtol=5e-4)
    np.testing.assert_allclose(vel[:, 0], 0.0, atol=1e-4)


def test_implicit_body_settles_on_floor():
    """Implicit CG: a body dropped near the floor comes to rest on it (sticky
    walls + damping drain energy)."""
    cfg = default_sim_config(
        auto_diff=False, use_explicit_method=False, implicit_method=1,
        preconditioned=1, blocks=(),
    )
    _, obj, state = make_2d_object(subdivisions=4, center=(0.4, 0.2))
    obstacles = Obstacles.from_configs((), 2)
    frame = make_frame_fn(obj, cfg)
    for _ in range(400):  # 2 virtual seconds
        state, _ = frame(state, obstacles)
    pos = np.asarray(state.pos)
    v = np.asarray(state.vel) + np.asarray(state.vel_g)
    assert np.isfinite(pos).all()
    assert pos[:, 1].min() > -0.02  # resting on, not through, the floor
    assert np.abs(v).max() < 0.05  # settled
