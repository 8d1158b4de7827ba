# coding=utf-8
"""Batched (vmapped) simulation: B independent sims in one dispatch."""

import jax.numpy as jnp
import numpy as np

from fem_tpu.batch import (
    broadcast_state,
    make_batched_frame_fn,
    perturb_states,
)
from fem_tpu.sim import make_frame_fn
from tests.utils import default_obstacles, default_sim_config, make_2d_object


def test_batched_matches_single_when_identical():
    cfg = default_sim_config(auto_diff=False, use_explicit_method=True,
                             sim_count=3)
    _, obj, state = make_2d_object(subdivisions=4)
    obstacles = default_obstacles()
    batched = make_batched_frame_fn(obj, cfg)
    states = broadcast_state(state, 4)
    out, _ = batched(states, obstacles)
    single, _ = make_frame_fn(obj, cfg)(state, obstacles)
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(out.pos[b]), np.asarray(single.pos), rtol=1e-5,
            atol=1e-6,
        )


def test_perturbed_ensemble_diverges_but_stays_finite():
    cfg = default_sim_config(auto_diff=True, use_explicit_method=True,
                             sim_count=3)
    _, obj, state = make_2d_object(subdivisions=4)
    obstacles = default_obstacles()
    batched = make_batched_frame_fn(obj, cfg)
    states = perturb_states(state, 8, scale=1e-4)
    out, _ = batched(states, obstacles)
    pos = np.asarray(out.pos)
    assert np.isfinite(pos).all()
    # Samples differ from each other (the noise propagated).
    assert np.abs(pos[0] - pos[1]).max() > 0


def test_sharded_batch_matches_unsharded():
    """Batch axis sharded over the 8-device CPU mesh (pjit auto-partition):
    identical results to the single-device batched path."""
    from fem_tpu.batch import make_sharded_batched_frame_fn
    from fem_tpu.parallel.sharding import make_element_mesh

    cfg = default_sim_config(auto_diff=False, use_explicit_method=True,
                             sim_count=3)
    _, obj, state = make_2d_object(subdivisions=4)
    obstacles = default_obstacles()
    states = perturb_states(state, 8, scale=1e-4)

    mesh = make_element_mesh(8)
    sharded = make_sharded_batched_frame_fn(obj, cfg, mesh)
    plain = make_batched_frame_fn(obj, cfg)

    s1, _ = sharded(states, obstacles)
    s2, _ = plain(states, obstacles)
    np.testing.assert_allclose(
        np.asarray(s1.pos), np.asarray(s2.pos), rtol=1e-6, atol=1e-7
    )


def test_batched_implicit_cg():
    cfg = default_sim_config(
        auto_diff=False, use_explicit_method=False, implicit_method=1,
        preconditioned=1, sim_count=2,
    )
    _, obj, state = make_2d_object(subdivisions=3)
    obstacles = default_obstacles()
    batched = make_batched_frame_fn(obj, cfg)
    out, aux = batched(broadcast_state(state, 3), obstacles)
    assert np.isfinite(np.asarray(out.pos)).all()
    assert aux.solver_iterations.shape == (3, 2)
