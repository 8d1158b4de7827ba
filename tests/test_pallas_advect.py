# coding=utf-8
"""Fused Pallas advection kernels vs the XLA path (parity; see the module
docstring for why they are not auto-selected — measured slower due to
(N, d)-layout relayouts)."""

import jax.numpy as jnp
import numpy as np

from fem_tpu.models.state import Obstacles
from fem_tpu.ops.pallas_advect import advect_implicit_pallas, kinematic_pallas
from fem_tpu.solvers.advect import advect_implicit_step, kinematic_step
from tests.utils import default_obstacles, make_2d_object

DT, DAMP, G = 5e-4, 10.0, (0.0, -1.0)


def _setup():
    cfg, obj, state = make_2d_object(subdivisions=4)
    rng = np.random.default_rng(0)
    state = state.replace(
        vel=jnp.asarray(
            rng.normal(scale=0.1, size=state.pos.shape).astype(np.float32)
        ),
        vel_g=jnp.asarray(
            rng.normal(scale=0.1, size=state.pos.shape).astype(np.float32)
        ),
    )
    grad = jnp.asarray(
        rng.normal(scale=10.0, size=state.pos.shape).astype(np.float32)
    )
    return obj, state, grad, default_obstacles()


def test_pallas_kinematic_matches_xla():
    obj, state, grad, obstacles = _setup()
    ref = kinematic_step(state, grad, obj.mass, obstacles, DT, DAMP, G)
    pos, vel = kinematic_pallas(
        state.pos, state.vel, grad, (1.0 / obj.mass)[:, None],
        obstacles.centers, obstacles.radii[None, :],
        dt=DT, damping=DAMP, g_dir=G,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pos), np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(ref.vel), atol=1e-5)


def test_pallas_advect_implicit_matches_xla():
    obj, state, grad, obstacles = _setup()
    ref = advect_implicit_step(state, obstacles, DT, DAMP, G)
    pos, vel, vel_g = advect_implicit_pallas(
        state.pos, state.vel, state.vel_g,
        obstacles.centers, obstacles.radii[None, :],
        dt=DT, damping=DAMP, g_dir=G,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pos), np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(ref.vel), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vel_g), np.asarray(ref.vel_g), atol=1e-5
    )
