# coding=utf-8
"""Body-body penalty contact (fem_tpu/contact.py — extension; the
reference's bodies pass through each other, main.py:59-61)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from fem_tpu.contact import (
    auto_contact_radius,
    make_contact_frame_fn,
    pair_contact_forces,
)
from fem_tpu.models.mesh import construct_2d_mesh
from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.sim import make_frame_fn
from fem_tpu.utils.config import ObjectConfig, SimConfig


def _two_squares(gap=0.3, damping=10.0, cy0=0.35, cx1=0.5):
    """Two 2D squares, one above the other, upper one falling."""
    objs, states = [], []
    for i, (cx, cy, rho, e_mod) in enumerate(
        ((0.5, cy0, 800.0, 8e4), (cx1, cy0 + gap, 500.0, 4e4))
    ):
        ocfg = ObjectConfig(
            id=i, center=(cx, cy), side_length=0.18, subdivisions=5,
            rho=rho, E=e_mod, nu=0.25, damping=damping,
        )
        v, f, e = construct_2d_mesh(ocfg)
        obj, state = build_object(ocfg, v, f, e)
        objs.append(obj)
        states.append(state)
    return objs, states


def _cfg(**kw):
    base = dict(
        dim=2, delta_time=5e-4, sim_count=10, auto_diff=False,
        use_explicit_method=True, g_dir=(0.0, -1.0),
        contact="penalty",
    )
    base.update(kw)
    return SimConfig(**base)


def _min_interbody_dist(pa, pb):
    pa, pb = np.asarray(pa), np.asarray(pb)
    d2 = (
        (pa ** 2).sum(1)[:, None]
        + (pb ** 2).sum(1)[None, :]
        - 2.0 * pa @ pb.T
    )
    return float(np.sqrt(np.maximum(d2, 0.0)).min())


def test_pair_forces_zero_outside_radius_and_momentum_free():
    rng = np.random.default_rng(0)
    pa = jnp.asarray(rng.uniform(0, 1, (40, 2)), jnp.float32)
    pb = pa + jnp.asarray([[5.0, 0.0]], jnp.float32)  # far away
    f_a, f_b = pair_contact_forces(pa, pb, radius=0.1, stiffness=1e6)
    assert float(jnp.abs(f_a).max()) == 0.0
    assert float(jnp.abs(f_b).max()) == 0.0

    pb = pa + jnp.asarray([[0.05, 0.0]], jnp.float32)  # overlapping
    f_a, f_b = pair_contact_forces(pa, pb, radius=0.1, stiffness=1e6)
    assert float(jnp.abs(f_a).max()) > 0.0
    # Newton's third law: total momentum flux is zero (float reassociation).
    total = np.asarray(f_a).sum(0) + np.asarray(f_b).sum(0)
    scale = float(np.abs(np.asarray(f_a)).sum())
    assert np.abs(total).max() < 1e-5 * scale
    # Repulsive: A sits left of B, so f_a points −x on average.
    assert float(np.asarray(f_a)[:, 0].mean()) < 0.0


def test_auto_radius_is_edge_scale():
    objs, _ = _two_squares()
    r = auto_contact_radius(objs)
    # Squares: side 0.18, 5 subdivisions → edges ~0.036-0.05.
    assert 0.02 < r < 0.08


def test_bodies_interpenetrate_without_contact_and_not_with():
    """The demo_two_bodies failure mode: upper body falls onto the lower.
    Uncoupled (reference semantics) the bodies overlap; with
    contact='penalty' they stay separated at ~contact-radius scale."""
    objs, states = _two_squares(gap=0.25)
    obs = Obstacles.from_configs((), 2)
    cfg_off = _cfg(contact="none")
    frames = [make_frame_fn(o, cfg_off) for o in objs]
    s_off = list(states)
    for _ in range(160):  # 0.8 virtual s: lower rests, upper lands on it
        for i, fr in enumerate(frames):
            s_off[i], _ = fr(s_off[i], obs)
    def vertical_overlap(lower, upper):
        """Depth the upper body's bottom sank below the lower body's top."""
        return float(
            np.asarray(lower.pos)[:, 1].max()
            - np.asarray(upper.pos)[:, 1].min()
        )

    overlap_off = vertical_overlap(s_off[0], s_off[1])

    cfg_on = _cfg()
    cframe = make_contact_frame_fn(objs, cfg_on)
    s_on = tuple(states)
    for _ in range(160):
        s_on, _ = cframe(s_on, obs)
        for s in s_on:
            assert np.isfinite(np.asarray(s.pos)).all()
    overlap_on = vertical_overlap(s_on[0], s_on[1])

    r = auto_contact_radius(objs)
    # Uncoupled: the upper square sinks deep into the lower (several contact
    # radii); coupled: it rests ON it, interpenetrating at most ~r.
    assert overlap_off > 2.0 * r, (overlap_off, r)
    assert overlap_on < 1.0 * r, (overlap_on, r)
    assert overlap_on < 0.25 * overlap_off


def test_contact_conserves_momentum():
    """Momentum sanity: two initially-overlapping bodies at rest, zero
    gravity, zero damping, away from all walls.  The penalty pair forces
    push them apart (kinetic energy appears) while total linear momentum
    Σ mᵢvᵢ stays at zero — Newton's third law through the full coupled
    stepping, not just the force function."""
    objs, states = _two_squares(gap=0.12, damping=0.0, cy0=0.45)
    obs = Obstacles.from_configs((), 2)
    cframe = make_contact_frame_fn(objs, _cfg(g_dir=(0.0, 0.0)))
    s = tuple(states)
    for _ in range(10):
        s, _ = cframe(s, obs)
    masses = [np.asarray(o.mass) for o in objs]
    total_p = sum(
        (m[:, None] * np.asarray(st.vel)).sum(0)
        for m, st in zip(masses, s)
    )
    speeds = [float(np.abs(np.asarray(st.vel)).max()) for st in s]
    assert max(speeds) > 1e-3  # contact actually pushed them apart
    p_scale = sum(
        (m[:, None] * np.abs(np.asarray(st.vel))).sum()
        for m, st in zip(masses, s)
    )
    assert np.abs(total_p).max() < 1e-4 * (p_scale + 1e-12), (
        total_p, p_scale,
    )


def test_contact_frame_matches_uncoupled_when_far_apart():
    """Bodies far outside contact radius: forces are exactly zero, so the
    coupled frame is bit-identical to independent per-body frames (explicit
    path; the implicit rhs substitution is likewise exact at f_ext = 0)."""
    objs, states = _two_squares(gap=3.0)
    obs = Obstacles.from_configs((), 2)
    cfg = _cfg()
    cframe = make_contact_frame_fn(objs, cfg)
    frames = [make_frame_fn(o, dataclasses.replace(cfg, contact="none"))
              for o in objs]
    s_c = tuple(states)
    s_u = list(states)
    for _ in range(5):
        s_c, _ = cframe(s_c, obs)
        for i, fr in enumerate(frames):
            s_u[i], _ = fr(s_u[i], obs)
    for a, b in zip(s_c, s_u):
        assert (np.asarray(a.pos) == np.asarray(b.pos)).all()


def test_implicit_substep_honors_external_force():
    """Regression: the implicit branch must fold external_force into the rhs
    (v' = v + dt·M⁻¹f_ext).  A silent drop makes contact='penalty' a no-op
    under implicit integration — caught 2026-08-18: the fold documented in
    substep's docstring was never applied."""
    from fem_tpu.sim import _cfg_kwargs, substep
    from tests.utils import make_2d_object

    _, obj, state = make_2d_object(subdivisions=3)
    cfg = _cfg(
        use_explicit_method=False, implicit_method=1, preconditioned=0,
        g_dir=(0.0, 0.0), contact="none", sim_count=1,
    )
    obs = Obstacles.from_configs((), 2)
    f = jnp.ones_like(state.pos) * 10.0
    s0, _ = substep(obj, state, obs, **_cfg_kwargs(cfg))
    s1, _ = substep(obj, state, obs, external_force=f, **_cfg_kwargs(cfg))
    dv = np.asarray(s1.vel - s0.vel)
    assert np.abs(dv).max() > 1e-3  # the force must act at all
    dp = (np.asarray(obj.mass)[:, None] * dv).sum(0)
    expected = cfg.delta_time * 10.0 * state.pos.shape[0]
    np.testing.assert_allclose(dp, [expected, expected], rtol=0.02)


def test_bodies_do_not_interpenetrate_implicit():
    """The interpenetration A/B of the explicit test, on the implicit-CG
    path (whose rhs fold is the regression above): uncoupled the upper body
    sinks into the lower; with contact='penalty' it rests on it."""
    objs, states = _two_squares(gap=0.25)
    obs = Obstacles.from_configs((), 2)
    kw = dict(
        use_explicit_method=False, implicit_method=1, preconditioned=0,
        operator_mode="graph",
    )
    frames = [make_frame_fn(o, _cfg(contact="none", **kw)) for o in objs]
    s_off = list(states)
    for _ in range(160):
        for i, fr in enumerate(frames):
            s_off[i], _ = fr(s_off[i], obs)

    def vertical_overlap(lower, upper):
        return float(
            np.asarray(lower.pos)[:, 1].max()
            - np.asarray(upper.pos)[:, 1].min()
        )

    overlap_off = vertical_overlap(s_off[0], s_off[1])
    cframe = make_contact_frame_fn(objs, _cfg(**kw))
    s_on = tuple(states)
    for _ in range(160):
        s_on, _ = cframe(s_on, obs)
        for s in s_on:
            assert np.isfinite(np.asarray(s.pos)).all()
    overlap_on = vertical_overlap(s_on[0], s_on[1])
    r = auto_contact_radius(objs)
    assert overlap_off > 2.0 * r, (overlap_off, r)
    assert overlap_on < 1.0 * r, (overlap_on, r)


def test_contact_implicit_cg_runs_and_separates():
    objs, states = _two_squares(gap=0.25)
    obs = Obstacles.from_configs((), 2)
    cfg = _cfg(
        use_explicit_method=False, implicit_method=1, preconditioned=1,
        operator_mode="graph",
    )
    cframe = make_contact_frame_fn(objs, cfg)
    s = tuple(states)
    for _ in range(60):
        s, _ = cframe(s, obs)
        for st in s:
            assert np.isfinite(np.asarray(st.pos)).all()
    r = auto_contact_radius(objs)
    assert _min_interbody_dist(s[0].pos, s[1].pos) > 0.5 * r


def test_simulation_api_contact():
    """Simulation(contact='penalty') steps bodies jointly and renders."""
    from fem_tpu.api import Simulation

    sim = Simulation.from_dict(
        {
            "dim": 2,
            "delta_time": 5e-4,
            "sim_count": 5,
            "auto_diff": False,
            "use_explicit_method": True,
            "g_dir": [0, -1],
            "contact": "penalty",
            "objects": [
                {"id": 0, "center": [0.5, 0.3], "side_length": 0.15,
                 "subdivisions": 4},
                {"id": 1, "center": [0.5, 0.55], "side_length": 0.15,
                 "subdivisions": 4},
            ],
        }
    )
    sim.run(frames=10)
    for i in range(2):
        assert np.isfinite(sim.positions(i)).all()
    img = sim.render()
    assert img.shape == (640, 640, 3)


# ---------------------------------------------------------------------------
# Round-4 day-2 extensions: surface culling, self-contact, viscous friction.


def test_surface_culling_matches_all_pairs_3d():
    """Shallow 3D body-body contact (radius below the first interior vertex
    layer's depth): surface-vertex contact gives the same forces as
    all-pairs, and the all-pairs run assigns interior vertices exactly zero
    force."""
    from tests.utils import make_3d_object
    from fem_tpu.contact import build_contact_plan, contact_forces_all

    # Grid spacing 0.2/3 ≈ 0.067; facing surfaces 0.02 apart.
    _, obj_a, st_a = make_3d_object(subdivisions=3, center=(0.4, 0.4, 0.4))
    _, obj_b, st_b = make_3d_object(subdivisions=3, center=(0.4, 0.62, 0.4))
    objs = [obj_a, obj_b]
    radius = 0.027  # > 0.02 face gap (active), < 0.067 interior depth
    pos = [st_a.pos, st_b.pos]

    f_full = contact_forces_all(pos, radius, 1e4)
    cfg = _cfg(dim=3, g_dir=(0.0, -1.0, 0.0))
    plan = build_contact_plan(objs, cfg, radius)
    f_cull = contact_forces_all(pos, radius, 1e4, plan=plan)

    scale = max(float(jnp.abs(f).max()) for f in f_full)
    assert scale > 0.0  # the configuration actually touches
    for ff, fc, obj in zip(f_full, f_cull, objs):
        assert float(jnp.abs(ff - fc).max()) < 1e-5 * scale
        # All-pairs gives interior vertices exactly zero force.
        interior = np.setdiff1d(
            np.arange(obj.particle_cnt),
            np.unique(np.asarray(obj.faces).reshape(-1)),
        )
        assert interior.size > 0
        assert float(jnp.abs(ff[interior]).max()) == 0.0


def test_self_contact_rest_zero_folded_repels():
    """The rest shape exerts exactly zero self-force (every enabled pair is
    beyond 2.5·radius at rest > radius); folding distant surface regions
    within the radius produces a repulsive, momentum-free force."""
    from fem_tpu.contact import build_contact_plan, self_contact_forces

    objs, states = _two_squares()
    obj, st = objs[0], states[0]
    cfg = _cfg(self_contact=True)
    radius = auto_contact_radius([obj])
    plan = build_contact_plan([obj], cfg, radius)
    sv = plan.surf[0]
    mask = plan.self_mask[0]
    assert mask is not None and float(mask.min()) == 0.0

    f_rest = self_contact_forces(obj.rest_pos[sv], mask, radius, 1e4)
    assert float(jnp.abs(f_rest).max()) == 0.0

    # Fold: squash the square to 15% of its height — top and bottom surface
    # rows (rest distance ≈ side ≫ 2.5·radius) come within the radius.
    pos = np.asarray(st.pos).copy()
    cy = pos[:, 1].mean()
    pos[:, 1] = cy + 0.15 * (pos[:, 1] - cy)
    f = self_contact_forces(jnp.asarray(pos)[sv], mask, radius, 1e4)
    mags = np.abs(np.asarray(f))
    assert mags.max() > 0.0
    assert np.abs(np.asarray(f).sum(0)).max() < 1e-4 * mags.sum()


def test_contact_friction_damps_relative_velocity():
    """Two overlapping clouds sliding past each other: the viscous pair term
    opposes the relative velocity, stays antisymmetric, and friction_c=0
    reproduces the frictionless forces bit-identically."""
    rng = np.random.default_rng(3)
    pa = jnp.asarray(rng.uniform(0, 0.1, (30, 2)), jnp.float32)
    pb = pa + jnp.asarray([[0.03, 0.0]], jnp.float32)
    va = jnp.ones_like(pa) * jnp.asarray([[1.0, 0.0]])
    vb = -va

    f_a0, f_b0 = pair_contact_forces(pa, pb, 0.05, 1e4)
    f_a1, f_b1 = pair_contact_forces(pa, pb, 0.05, 1e4, va, vb, 0.0)
    assert (np.asarray(f_a0) == np.asarray(f_a1)).all()
    assert (np.asarray(f_b0) == np.asarray(f_b1)).all()

    f_a2, f_b2 = pair_contact_forces(pa, pb, 0.05, 1e4, va, vb, 50.0)
    fric_a = np.asarray(f_a2 - f_a0)
    # A moves +x relative to B: friction on A points −x.
    assert fric_a[:, 0].mean() < 0.0
    total = np.asarray(f_a2).sum(0) + np.asarray(f_b2).sum(0)
    scale = np.abs(np.asarray(f_a2)).sum()
    assert np.abs(total).max() < 1e-5 * scale


def test_contact_friction_end_to_end_momentum():
    """Coupled frame with contact_friction > 0: gravity-free overlapping
    bodies separate, total momentum stays zero, and the separation kinetic
    energy is below the frictionless run's (the dashpot dissipates)."""
    objs, states = _two_squares(gap=0.12, damping=0.0, cy0=0.45)
    obs = Obstacles.from_configs((), 2)

    def run(fric):
        cframe = make_contact_frame_fn(
            objs, _cfg(g_dir=(0.0, 0.0), contact_friction=fric)
        )
        s = tuple(states)
        for _ in range(10):
            s, _ = cframe(s, obs)
        return s

    masses = [np.asarray(o.mass) for o in objs]

    def ke(s):
        return sum(
            0.5 * (m[:, None] * np.asarray(st.vel) ** 2).sum()
            for m, st in zip(masses, s)
        )

    s_fric = run(1.0)
    total_p = sum(
        (m[:, None] * np.asarray(st.vel)).sum(0)
        for m, st in zip(masses, s_fric)
    )
    p_scale = sum(
        (m[:, None] * np.abs(np.asarray(st.vel))).sum()
        for m, st in zip(masses, s_fric)
    )
    assert max(
        float(np.abs(np.asarray(st.vel)).max()) for st in s_fric
    ) > 1e-4
    assert np.abs(total_p).max() < 1e-4 * (p_scale + 1e-12)
    assert ke(s_fric) < ke(run(0.0))


def test_simulation_api_self_contact_single_body():
    """Simulation(self_contact=True) routes a SINGLE body through the
    coupled contact frame and stays finite."""
    from fem_tpu.api import Simulation

    sim = Simulation.from_dict(
        {
            "dim": 2,
            "delta_time": 5e-4,
            "sim_count": 5,
            "auto_diff": False,
            "use_explicit_method": True,
            "g_dir": [0, -1],
            "contact": "penalty",
            "self_contact": True,
            "objects": [
                {"id": 0, "center": [0.5, 0.4], "side_length": 0.15,
                 "subdivisions": 4},
            ],
        }
    )
    sim.run(frames=10)
    assert np.isfinite(sim.positions(0)).all()
