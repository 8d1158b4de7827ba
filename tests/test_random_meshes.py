# coding=utf-8
"""Property tests on random (non-grid) triangulations: the solvers must be
correct for arbitrary valid meshes, not just the structured grids of the
other tests."""

import numpy as np
import pytest

from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.sim import make_substep_fn
from fem_tpu.utils.config import ObjectConfig, SimConfig
from tests.oracle import Oracle

DT = 5e-4


def _random_triangulation(seed, n_pts=24):
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.3, 0.7, size=(n_pts, 2))
    tri = Delaunay(pts)
    tris = tri.simplices.astype(np.int32)
    # Drop near-degenerate triangles (tiny area relative to median).
    p = pts[tris]
    area = 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1])
    )
    tris = tris[area > 0.05 * np.median(area)]
    used = np.unique(tris.reshape(-1))
    remap = -np.ones(n_pts, np.int64)
    remap[used] = np.arange(used.shape[0])
    return pts[used].astype(np.float32), remap[tris].astype(np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "method",
    ["explicit", "implicit_cg"],
)
def test_random_mesh_tracks_oracle(seed, method):
    verts, tris = _random_triangulation(seed)
    ocfg = ObjectConfig(
        center=(0.0, 0.3), E=4e4, nu=0.25, damping=12.0, rho=600.0
    )
    obj, state = build_object(ocfg, verts, tris, tris)
    oracle = Oracle(
        np.asarray(state.pos, np.float64), tris, ocfg.rho, ocfg.mu,
        ocfg.s_lambda, ocfg.damping,
    )
    explicit = method == "explicit"
    cfg = SimConfig(
        dim=2, sim_count=1, auto_diff=False, use_explicit_method=explicit,
        implicit_method=1, preconditioned=1, objects=(ocfg,), blocks=(),
    )
    obstacles = Obstacles.from_configs((), 2)
    step = make_substep_fn(obj, cfg)
    for _ in range(100):
        state, _ = step(state, obstacles)
        if explicit:
            oracle.step_explicit(DT, (0.0, -1.0), [])
        else:
            oracle.step_implicit_cg(DT, (0.0, -1.0), [], 1)
    np.testing.assert_allclose(
        np.asarray(state.pos), oracle.pos, atol=5e-4,
        err_msg=f"random mesh seed={seed} method={method}",
    )
    assert np.isfinite(np.asarray(state.pos)).all()
