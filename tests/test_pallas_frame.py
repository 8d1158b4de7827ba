# coding=utf-8
"""Parity of the fused whole-frame Pallas kernel (experiments/pallas_frame.py)
against the op-composed lax.scan path — same reference semantics, one device
op per frame.  Runs in interpret mode on CPU."""

import dataclasses

import numpy as np
import pytest

from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.sim import make_frame_fn
from fem_tpu.utils.config import BlockConfig, ObjectConfig, SimConfig
from tests.utils import make_2d_object, two_tet_object


def _run(cfg, obj, state, obstacles, n_frames, backend):
    cfg = dataclasses.replace(cfg, frame_backend=backend)
    frame = make_frame_fn(obj, cfg)
    iters = []
    for _ in range(n_frames):
        state, aux = frame(state, obstacles)
        iters.append(np.asarray(aux.solver_iterations))
    return state, np.concatenate(iters)


@pytest.mark.parametrize("precond", [1, 0], ids=["precond", "plain"])
def test_fused_frame_matches_scan_3d(precond):
    ocfg = ObjectConfig(
        center=(0.45, 0.25, 0.45), rho=800.0, E=4e4, nu=0.3, damping=10.0
    )
    _, obj, state = two_tet_object(
        rho=800.0, E=4e4, nu=0.3, damping=10.0
    )
    # Drop it near the floor so contact + real CG work happen.
    state = state.replace(pos=state.pos + np.float32(0.05))
    cfg = SimConfig(
        dim=3, delta_time=5e-4, sim_count=4, auto_diff=False,
        use_explicit_method=False, implicit_method=1, preconditioned=precond,
        g_dir=(0.0, -1.0, 0.0), objects=(ocfg,), blocks=(),
    )
    obstacles = Obstacles.from_configs((), 3)
    s_ops, it_ops = _run(cfg, obj, state, obstacles, 5, "ops")
    s_fused, it_fused = _run(cfg, obj, state, obstacles, 5, "fused")
    np.testing.assert_allclose(
        np.asarray(s_fused.pos), np.asarray(s_ops.pos), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_fused.vel), np.asarray(s_ops.vel), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_fused.vel_g), np.asarray(s_ops.vel_g),
        rtol=1e-5, atol=1e-7,
    )
    # CG paths agree (f32 reorderings may shift an iteration occasionally).
    assert np.abs(it_fused.astype(int) - it_ops.astype(int)).max() <= 1


def test_fused_frame_matches_scan_2d_with_obstacles():
    ocfg, obj, state = make_2d_object(subdivisions=3, center=(0.45, 0.55))
    blocks = (BlockConfig(block_center=(0.5, 0.35), block_radius=0.15),)
    cfg = SimConfig(
        dim=2, delta_time=5e-4, sim_count=5, auto_diff=False,
        use_explicit_method=False, implicit_method=1, preconditioned=1,
        objects=(ocfg,), blocks=blocks,
    )
    obstacles = Obstacles.from_configs(blocks, 2)
    s_ops, it_ops = _run(cfg, obj, state, obstacles, 8, "ops")
    s_fused, it_fused = _run(cfg, obj, state, obstacles, 8, "fused")
    np.testing.assert_allclose(
        np.asarray(s_fused.pos), np.asarray(s_ops.pos), rtol=2e-5, atol=2e-6
    )
    assert np.abs(it_fused.astype(int) - it_ops.astype(int)).max() <= 1


def test_fused_frame_eligibility_gates():
    from fem_tpu.experiments.pallas_frame import supports_fused_frame

    _, obj, _ = two_tet_object()
    base = dict(
        dim=3, auto_diff=False, use_explicit_method=False, implicit_method=1,
        g_dir=(0.0, -1.0, 0.0),
        objects=(ObjectConfig(center=(0.0, 0.0, 0.0)),),
    )
    assert supports_fused_frame(obj, SimConfig(**base))
    assert not supports_fused_frame(
        obj, SimConfig(**{**base, "implicit_method": 0})
    )
    assert not supports_fused_frame(
        obj, SimConfig(**{**base, "use_explicit_method": True})
    )
    assert not supports_fused_frame(
        obj, SimConfig(**{**base, "robust_inversion": True})
    )
    assert not supports_fused_frame(
        obj, SimConfig(**{**base, "hessian": "exact_jvp"})
    )
