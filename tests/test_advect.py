# coding=utf-8
"""Advection + collision semantics (kinematic.py:8-45, implicit.py:407-438)."""

import jax.numpy as jnp
import numpy as np

from fem_tpu.models.state import Obstacles, SimState
from fem_tpu.solvers.advect import advect_implicit_step, kinematic_step
from fem_tpu.utils.config import BlockConfig

DT = 5e-4
G = (0.0, -1.0)


def _state(pos, vel, vel_g=None):
    pos = jnp.asarray(np.array(pos, np.float32))
    vel = jnp.asarray(np.array(vel, np.float32))
    z = jnp.zeros_like(pos)
    return SimState(
        pos=pos,
        vel=vel,
        vel_g=z if vel_g is None else jnp.asarray(np.array(vel_g, np.float32)),
        force=z,
        jacobi_past_x=z,
    )


def _no_blocks():
    return Obstacles.from_configs((), 2)


def test_gravity_and_damping():
    s = _state([[0.5, 0.5]], [[0.0, 0.0]])
    mass = jnp.ones(1)
    grad = jnp.zeros((1, 2))
    damping = 14.5
    out = kinematic_step(s, grad, mass, _no_blocks(), DT, damping, G)
    v_expect = np.array([0.0, -9.8 * DT]) * np.exp(-DT * damping)
    np.testing.assert_allclose(np.asarray(out.vel)[0], v_expect, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.pos)[0], np.array([0.5, 0.5]) + v_expect * DT, rtol=1e-5
    )
    # Force is reset (kinematic.py:45).
    np.testing.assert_allclose(np.asarray(out.force), 0.0)


def test_force_term_subtracted_per_mass():
    s = _state([[0.5, 0.5]], [[0.0, 0.0]])
    mass = jnp.asarray(np.array([2.0], np.float32))
    grad = jnp.asarray(np.array([[4.0, 0.0]], np.float32))
    out = kinematic_step(s, grad, mass, _no_blocks(), DT, 0.0, G)
    np.testing.assert_allclose(
        np.asarray(out.vel)[0],
        np.array([-4.0 / 2.0 * DT, -9.8 * DT]),
        rtol=1e-5,
    )


def test_sticky_walls():
    # Below the floor moving down -> that component zeroed; moving up -> kept.
    s = _state([[-0.1, 0.5], [1.2, 0.5]], [[-1.0, 0.0], [1.0, 0.0]])
    mass = jnp.ones(2)
    grad = jnp.zeros((2, 2))
    out = kinematic_step(s, grad, mass, _no_blocks(), DT, 0.0, (0.0, 0.0))
    assert np.asarray(out.vel)[0, 0] == 0.0  # lower wall sticky
    assert np.asarray(out.vel)[1, 0] == 0.0  # upper wall sticky


def test_circle_slide_collision():
    """Inside the circle moving toward center -> radial component removed."""
    blocks = Obstacles.from_configs(
        (BlockConfig(block_center=(0.5, 0.5), block_radius=0.2),), 2
    )
    # Particle left of center, moving right-and-up (toward center).
    s = _state([[0.4, 0.5]], [[1.0, 0.5]])
    out = kinematic_step(s, jnp.zeros((1, 2)), jnp.ones(1), blocks, DT, 0.0,
                         (0.0, 0.0))
    v = np.asarray(out.vel)[0]
    disp = np.array([0.4, 0.5]) - np.array([0.5, 0.5])
    # Radial component removed -> v ⟂ disp.
    assert abs(np.dot(v, disp)) < 1e-6
    # Moving away from center: untouched.
    s2 = _state([[0.4, 0.5]], [[-1.0, 0.0]])
    out2 = kinematic_step(s2, jnp.zeros((1, 2)), jnp.ones(1), blocks, DT, 0.0,
                          (0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out2.vel)[0], [-1.0, 0.0], rtol=1e-6)


def test_zero_radius_block_ignored():
    blocks = Obstacles.from_configs(
        (BlockConfig(block_center=(0.5, 0.5), block_radius=0.0),), 2
    )
    s = _state([[0.5, 0.5]], [[1.0, 1.0]])
    out = kinematic_step(s, jnp.zeros((1, 2)), jnp.ones(1), blocks, DT, 0.0,
                         (0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out.vel)[0], [1.0, 1.0], rtol=1e-6)


def test_advect_implicit_gravity_channel():
    """Gravity integrates into vel_g, not vel (implicit.py:409-412)."""
    s = _state([[0.5, 0.5]], [[0.1, 0.0]])
    out = advect_implicit_step(s, _no_blocks(), DT, 10.0, G)
    decay = np.exp(-DT * 10.0)
    np.testing.assert_allclose(
        np.asarray(out.vel)[0], [0.1 * decay, 0.0], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.vel_g)[0], [0.0, -9.8 * DT * decay], rtol=1e-5
    )
    v = np.array([0.1 * decay, -9.8 * DT * decay])
    np.testing.assert_allclose(
        np.asarray(out.pos)[0], np.array([0.5, 0.5]) + v * DT, rtol=1e-5
    )


def test_advect_implicit_upper_wall_keeps_vel_g():
    """Quirk parity: upper wall zeroes vel but NOT vel_g (implicit.py:420-423)."""
    s = _state([[0.5, 1.2]], [[0.0, 0.3]], vel_g=[[0.0, 0.4]])
    out = advect_implicit_step(s, _no_blocks(), DT, 0.0, (0.0, 0.0))
    assert np.asarray(out.vel)[0, 1] == 0.0
    assert np.asarray(out.vel_g)[0, 1] > 0.0  # preserved
    # But the combined v used for position was zeroed.
    np.testing.assert_allclose(np.asarray(out.pos)[0], [0.5, 1.2], rtol=1e-6)


def test_advect_implicit_lower_wall_zeroes_both():
    s = _state([[0.5, -0.2]], [[0.0, -0.3]], vel_g=[[0.0, -0.4]])
    out = advect_implicit_step(s, _no_blocks(), DT, 0.0, (0.0, 0.0))
    assert np.asarray(out.vel)[0, 1] == 0.0
    assert np.asarray(out.vel_g)[0, 1] == 0.0
