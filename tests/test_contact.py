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
