# coding=utf-8
"""Integration tests: multi-step trajectories per BASELINE.json configs.

1. 2D explicit analytic vs autodiff must agree (same math, two formulations).
2. Implicit CG preconditioned vs plain must track each other.
3. Implicit Jacobi vs CG must track each other.
4. 3D cube autodiff vs analytic.
5. Physical sanity: body falls under gravity, stays in the unit box,
   obstacle keeps particles out, energy stays finite.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.models.mesh import delaunay_tetrahedralize, load_stl_file
from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.sim import make_frame_fn
from fem_tpu.utils.config import ObjectConfig
from tests.utils import default_obstacles, default_sim_config, make_2d_object


def _run_frames(obj, state, cfg, obstacles, n_frames):
    frame_fn = make_frame_fn(obj, cfg)
    for _ in range(n_frames):
        state, aux = frame_fn(state, obstacles)
    return state, aux


def test_2d_explicit_analytic_vs_autodiff_trajectory():
    _, obj, state0 = make_2d_object(subdivisions=6)
    obstacles = default_obstacles()
    cfg_an = default_sim_config(auto_diff=False, use_explicit_method=True)
    cfg_ad = default_sim_config(auto_diff=True, use_explicit_method=True)
    s_an, _ = _run_frames(obj, state0, cfg_an, obstacles, 5)
    s_ad, _ = _run_frames(obj, state0, cfg_ad, obstacles, 5)
    np.testing.assert_allclose(
        np.asarray(s_an.pos), np.asarray(s_ad.pos), atol=1e-4
    )


def test_2d_implicit_cg_precond_vs_plain_trajectory():
    _, obj, state0 = make_2d_object(subdivisions=5)
    obstacles = default_obstacles()
    base = dict(auto_diff=False, use_explicit_method=False, implicit_method=1)
    s_p, _ = _run_frames(
        obj, state0, default_sim_config(preconditioned=1, **base), obstacles, 5
    )
    s_n, _ = _run_frames(
        obj, state0, default_sim_config(preconditioned=0, **base), obstacles, 5
    )
    np.testing.assert_allclose(
        np.asarray(s_p.pos), np.asarray(s_n.pos), atol=5e-4
    )


def test_2d_implicit_jacobi_vs_cg_trajectory():
    _, obj, state0 = make_2d_object(subdivisions=5)
    obstacles = default_obstacles()
    base = dict(auto_diff=False, use_explicit_method=False)
    s_j, aux_j = _run_frames(
        obj, state0, default_sim_config(implicit_method=0, **base), obstacles, 5
    )
    s_c, _ = _run_frames(
        obj, state0,
        default_sim_config(implicit_method=1, preconditioned=1, **base),
        obstacles, 5,
    )
    np.testing.assert_allclose(
        np.asarray(s_j.pos), np.asarray(s_c.pos), atol=1e-3
    )


def _cube_object():
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stl = os.path.join(here, "assets", "cube.stl")
    if not os.path.exists(stl):
        import subprocess
        import sys

        subprocess.run(
            [sys.executable, os.path.join(here, "assets", "make_assets.py")],
            check=True,
        )
    v, f = load_stl_file(stl)
    nodes, tets = delaunay_tetrahedralize(v, f)
    # Scale into the unit box and lift off the floor.
    cfg = ObjectConfig(
        center=(0.25, 0.4, 0.25), rho=1000.0, E=4e4, nu=0.3, damping=10.0
    )
    from fem_tpu.models.mesh import extract_surface

    surface, _ = extract_surface(nodes, tets)
    obj, state = build_object(
        cfg,
        (nodes * 0.4).astype(np.float32),
        surface.astype(np.int32),
        tets.astype(np.int32),
    )
    return obj, state


def test_3d_cube_autodiff_vs_analytic_trajectory():
    obj, state0 = _cube_object()
    obstacles = Obstacles.from_configs((), 3)
    cfg_an = default_sim_config(
        dim=3, g_dir=(0.0, -1.0, 0.0), auto_diff=False,
        use_explicit_method=True, blocks=(),
    )
    cfg_ad = default_sim_config(
        dim=3, g_dir=(0.0, -1.0, 0.0), auto_diff=True,
        use_explicit_method=True, blocks=(),
    )
    s_an, _ = _run_frames(obj, state0, cfg_an, obstacles, 5)
    s_ad, _ = _run_frames(obj, state0, cfg_ad, obstacles, 5)
    np.testing.assert_allclose(
        np.asarray(s_an.pos), np.asarray(s_ad.pos), atol=1e-4
    )
    # It actually fell.
    assert float(s_an.pos[:, 1].mean()) < float(state0.pos[:, 1].mean())


@pytest.mark.parametrize(
    "overrides",
    [
        dict(auto_diff=True, use_explicit_method=True),
        dict(auto_diff=False, use_explicit_method=False, implicit_method=1,
             preconditioned=1),
    ],
    ids=["explicit-autodiff", "implicit-cg"],
)
def test_long_run_stays_in_box_and_finite(overrides):
    """60 frames (600 substeps, 0.3 virtual seconds): the square falls toward
    the passage between the two circle obstacles (the reference's headline 2D
    demo) and must remain finite and inside the unit box."""
    _, obj, state0 = make_2d_object(subdivisions=6)
    obstacles = default_obstacles()
    cfg = default_sim_config(**overrides)
    state, _ = _run_frames(obj, state0, cfg, obstacles, 60)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all()
    assert pos.min() > -0.05 and pos.max() < 1.05
    # Fell: mean height decreased.
    assert pos[:, 1].mean() < float(np.asarray(state0.pos)[:, 1].mean())
    # Obstacle exclusion: no particle deep inside either circle.
    for c, r in (((0.8, 0.5), 0.21), ((0.2, 0.5), 0.21)):
        d = np.linalg.norm(pos - np.array(c), axis=1)
        assert (d > r * 0.7).all()
