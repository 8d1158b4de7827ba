# coding=utf-8
"""Long-horizon regression suite (``pytest -m slow`` — VERDICT r3 weak #3 /
next #5).

Every interesting failure found in rounds 2-3 (κ integrator blow-ups,
deep-squash stiffening) happened 2-5+ virtual seconds in, while the golden
tests stop at 1 s.  These pin the full drop → impact → settle arc with
energy / min-det-F envelope assertions so the soak evidence lives in CI,
not only in hand-run tools/soak.py sessions."""

import numpy as np
import pytest

from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.sim import make_frame_fn
from fem_tpu.utils.config import ObjectConfig, SimConfig
from fem_tpu.utils.profiling import frame_metrics
from tests.test_blocked import _cube_mesh
from tests.utils import default_obstacles, default_sim_config, make_2d_object


@pytest.mark.slow
def test_3d_implicit_5s_arc_envelope():
    """A ~1-2k-tet cube dropped onto the floor, 5 virtual seconds of
    implicit-CG at the reference-default dt: finite throughout, kinetic
    energy decays to the damped rest jitter, min det F bottoms at impact
    and stabilizes (no slow drift toward inversion), elastic energy settles
    to a flat envelope."""
    nodes, f, tets = _cube_mesh(spacing=0.3)
    nodes = nodes * 0.3
    ocfg = ObjectConfig(
        obj="cube", center=(0.5, 0.55, 0.5), rho=1000.0, E=4e4, nu=0.3,
        damping=10.0,
    )
    obj, state = build_object(ocfg, nodes.astype(np.float32), f, tets)
    cfg = SimConfig(
        dim=3, delta_time=5e-4, sim_count=10, use_explicit_method=False,
        auto_diff=False, implicit_method=1, preconditioned=1,
        g_dir=(0.0, -1.0, 0.0),
    )
    obs = Obstacles.from_configs((), 3)
    frame = make_frame_fn(obj, cfg)

    n_frames = 1000  # 5 virtual seconds
    min_detf_arc = []
    ke_arc = []
    u_arc = []
    for i in range(n_frames):
        state, _ = frame(state, obs)
        if i % 50 == 49:
            m = frame_metrics(obj, state)
            assert not m.any_nan, f"NaN at frame {i}"
            min_detf_arc.append(m.min_det_f)
            ke_arc.append(m.kinetic_energy)
            u_arc.append(m.elastic_energy)

    # Impact happened (compression visible) and recovered — never near
    # inversion, and the LAST reading is no worse than the arc minimum by
    # more than recovery (no monotone drift toward det F = 0).
    assert min(min_detf_arc) < 0.999  # deformation actually occurred
    assert min(min_detf_arc) > 0.30
    assert min_detf_arc[-1] >= min(min_detf_arc) - 1e-6
    # Kinetic energy decayed to the damped rest jitter.
    assert ke_arc[-1] < 1e-2 * (max(ke_arc) + 1e-12)
    # Elastic energy envelope is flat at the end (settled): the last two
    # 0.25-virtual-s readings agree within 5%.
    assert abs(u_arc[-1] - u_arc[-2]) <= 0.05 * (abs(u_arc[-2]) + 1e-9)
    # And it rests ON the floor, not through it.
    assert float(np.asarray(state.pos)[:, 1].min()) > -1e-3


@pytest.mark.slow
def test_2d_default_scene_5s_arc():
    """The reference's own default 2D scene (square through the two-circle
    passage) run 5 virtual seconds with the explicit method — the longest
    parity-semantics trajectory pinned in CI."""
    cfg = default_sim_config(auto_diff=False, use_explicit_method=True)
    _, obj, state = make_2d_object(subdivisions=10)
    obs = default_obstacles()
    frame = make_frame_fn(obj, cfg)
    ke_arc = []
    for i in range(500):
        state, _ = frame(state, obs)
        if i % 50 == 49:
            m = frame_metrics(obj, state)
            assert not m.any_nan, f"NaN at frame {i}"
            ke_arc.append(m.kinetic_energy)
    pos = np.asarray(state.pos)
    # Settled inside the unit box on the floor.
    assert pos[:, 1].min() > -1e-3 and pos.max() < 1.2
    assert ke_arc[-1] < 1e-2 * (max(ke_arc) + 1e-12)


@pytest.mark.slow
def test_newton_long_arc_at_blowup_dt():
    """Round-4 integrator="newton" long-horizon pin: the κ ≈ 60 stiff-fine
    2D reproducer (the mesh/dt class where the reference integrator NaNs
    within ~3 frames) runs 1.5 virtual seconds of fully implicit backward
    Euler — finite throughout, kinetic energy decayed to the damped rest
    jitter, elements recovered from the impact.  Material is the
    inversion-robust stable Neo-Hookean: at this dt the impact transiently
    INVERTS elements (measured min det F −0.18 at frame ~14), which plain
    NH cannot represent (NaN energy) — the newton+stable-NH composition is
    the production large-dt configuration."""
    _, obj, s0 = make_2d_object(
        subdivisions=7, E=4e5, material="stable_neo_hookean"
    )
    obs = default_obstacles()
    cfg = SimConfig(
        dim=2, delta_time=2e-3, sim_count=10, use_explicit_method=False,
        auto_diff=False, implicit_method=1, preconditioned=0,
        g_dir=(0.0, -1.0), integrator="newton", newton_hessian="decoupled",
    )
    frame = make_frame_fn(obj, cfg)
    s = s0
    min_det_arc = []
    for i in range(75):  # 75 frames x 10 substeps x 2e-3 = 1.5 virtual s
        s, _ = frame(s, obs)
        if i % 5 == 4:
            m = frame_metrics(obj, s)
            assert not m.any_nan, f"diverged at frame {i}"
            min_det_arc.append(m.min_det_f)
    m = frame_metrics(obj, s)
    assert m.kinetic_energy < 1e-3, m.kinetic_energy
    assert m.min_det_f > 0.3, m.min_det_f
    # No slow drift toward inversion after settling.
    assert min(min_det_arc[-5:]) > 0.9 * max(min_det_arc[-5:])
