# coding=utf-8
"""Golden-trajectory regression canaries.

One virtual second (2,000 substeps) of the 2D through-passage scene per
method, checked against values recorded on the CPU backend.  After contact
the four methods legitimately differ (explicit vs implicit advection;
analytic vs autodiff agree to f32 accumulation; CG vs Jacobi to solver
tolerance), so each method gets its own golden.  Tolerances are loose enough
for cross-version numeric drift but catch semantic regressions (a changed
collision order or solver constant moves these by >1e-2).
"""

import numpy as np
import pytest

from fem_tpu.sim import make_frame_fn
from tests.utils import default_obstacles, default_sim_config, make_2d_object

GOLDEN = {
    "explicit_analytic": dict(
        mean=0.52577740, std=0.07123064,
        p0=(0.5946439, 0.4561227),
        p24=(0.4982445, 0.5551394),
        p48=(0.3927549, 0.6483386),
    ),
    "autodiff": dict(
        mean=0.52570546, std=0.07118951,
        p0=(0.5946961, 0.4559107),
        p24=(0.4983058, 0.5549618),
        p48=(0.3928466, 0.6482556),
    ),
    "implicit_cg": dict(
        mean=0.55748934, std=0.09069931,
        p0=(0.4851717, 0.4765905),
        p24=(0.4952799, 0.6177244),
        p48=(0.5053155, 0.7599441),
    ),
    # Recorded under the parity-default serial (Gauss–Seidel-style) sweep.
    "implicit_jacobi": dict(
        mean=0.55737782, std=0.09082112,
        p0=(0.4845500, 0.4766834),
        p24=(0.4949913, 0.6178035),
        p48=(0.5053604, 0.7599947),
    ),
}

OVERRIDES = {
    "explicit_analytic": dict(auto_diff=False, use_explicit_method=True),
    "autodiff": dict(auto_diff=True, use_explicit_method=True),
    "implicit_cg": dict(
        auto_diff=False, use_explicit_method=False, implicit_method=1,
        preconditioned=1,
    ),
    "implicit_jacobi": dict(
        auto_diff=False, use_explicit_method=False, implicit_method=0
    ),
}


def test_golden_trajectory_3d_implicit_cg():
    """3D canary: cube.stl → conforming mesher → implicit-PCG drop onto the
    floor, 0.5 virtual seconds.  Pins mesher + 3D solver + advection
    together; regenerate the numbers when the mesher algorithm version
    changes (they are mesh-dependent by design)."""
    import numpy as np

    from fem_tpu.models.mesh import (
        delaunay_tetrahedralize, extract_surface, load_surface_mesh,
    )
    from fem_tpu.models.state import Obstacles, build_object
    from fem_tpu.utils.config import ObjectConfig, SimConfig
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    v, f = load_surface_mesh(os.path.join(here, "assets", "cube.stl"))
    nodes, tets = delaunay_tetrahedralize(v, f, 0.5)
    surface, _ = extract_surface(nodes, tets)
    ocfg = ObjectConfig(
        center=(0.2, 0.05, 0.2), rho=1000.0, E=4e4, nu=0.3, damping=10.0
    )
    obj, state = build_object(
        ocfg, (0.3 * nodes).astype(np.float32),
        surface.astype(np.int32), tets.astype(np.int32),
    )
    cfg = SimConfig(
        dim=3, delta_time=5e-4, sim_count=10, auto_diff=False,
        use_explicit_method=False, implicit_method=1, preconditioned=1,
        g_dir=(0.0, -1.0, 0.0), objects=(ocfg,), blocks=(),
    )
    obstacles = Obstacles.from_configs((), 3)
    frame = make_frame_fn(obj, cfg)
    for _ in range(100):
        state, _ = frame(state, obstacles)
    p = np.asarray(state.pos)
    assert np.isfinite(p).all()
    # Recorded on the v4 mesher (tetgen quality bounds), spacing 0.5.
    assert abs(p.mean() - 0.27050927) < 5e-3
    assert abs(p.std() - 0.16186684) < 5e-3
    np.testing.assert_allclose(
        p[0], (0.2029982, -0.0001941, 0.1924001), atol=1e-2
    )
    np.testing.assert_allclose(
        p[5], (0.4930525, -0.0001596, 0.5102745), atol=1e-2
    )


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_trajectory(name):
    cfg = default_sim_config(**OVERRIDES[name])
    _, obj, state = make_2d_object(subdivisions=6)
    obstacles = default_obstacles()
    frame = make_frame_fn(obj, cfg)
    for _ in range(200):  # 1.0 virtual second
        state, _ = frame(state, obstacles)
    p = np.asarray(state.pos)
    g = GOLDEN[name]
    assert abs(p.mean() - g["mean"]) < 5e-3
    assert abs(p.std() - g["std"]) < 5e-3
    for key, idx in (("p0", 0), ("p24", 24), ("p48", 48)):
        np.testing.assert_allclose(p[idx], g[key], atol=1e-2)
