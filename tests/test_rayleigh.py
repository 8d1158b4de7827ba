# coding=utf-8
"""Stiffness-proportional Rayleigh damping (``damping_beta`` extension).

The reference's only dissipation is the exponential velocity decay
(/root/reference solver/kinematic.py:23), which damps rigid translation as
hard as deformation.  ``damping_beta`` adds the classical stiffness-
proportional term f_d = β·G(K)·v on the decoupled block-Hessian operator:
deformation rates damp at ~β·ω² while rigid translation is untouched.
β = 0 must reproduce the reference bit-exactly (default)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.models.state import Obstacles
from fem_tpu.sim import make_substep_fn, substep
from fem_tpu.solvers.implicit import (
    make_system_apply,
    rayleigh_damping_grad,
    system_coeff,
)
from fem_tpu.utils.config import SimConfig, parse_config
from tests.utils import make_2d_object, two_tet_object


def _free_space_cfg(**overrides):
    """No gravity, no reference damping, no obstacles — all energy change
    comes from the elastic force and (if enabled) Rayleigh damping."""
    base = dict(
        dim=2,
        delta_time=1e-4,
        sim_count=10,
        auto_diff=False,
        use_explicit_method=True,
        implicit_method=1,
        preconditioned=0,
        g_dir=(0.0, 0.0),
        blocks=(),
    )
    base.update(overrides)
    return SimConfig(**base)


def _total_energy(obj, state):
    from fem_tpu.ops.element import total_energy

    u = total_energy(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda, obj.material,
    )
    ke = 0.5 * jnp.sum(obj.mass[:, None] * state.vel * state.vel)
    return float(u + ke)


def _perturbed(state, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    vel = scale * rng.standard_normal(state.pos.shape).astype(np.float32)
    return state.replace(vel=jnp.asarray(vel))


def _run(obj, state, cfg, n_frames=5):
    fn = make_substep_fn(obj, cfg)
    obstacles = Obstacles.from_configs((), obj.dim)
    for _ in range(n_frames * cfg.sim_count):
        state, _ = fn(state, obstacles)
    return state


def test_config_parse_and_default():
    cfg = parse_config({"objects": [{"damping_beta": 0.002}]})
    assert cfg.objects[0].damping_beta == 0.002
    assert parse_config({}).objects[0].damping_beta == 0.0


def test_rigid_translation_is_undamped():
    """G(K)·v vanishes identically on a uniform velocity field (edge diffs
    of a constant are zero) — rigid translation loses no energy to β."""
    _, obj, state = make_2d_object(damping=0.0, damping_beta=0.01)
    v_uniform = jnp.broadcast_to(
        jnp.array([0.3, -0.2], jnp.float32), state.pos.shape
    )
    g = rayleigh_damping_grad(obj, state.pos, v_uniform)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_damping_force_is_dissipative_at_rest_pose():
    """At the rest pose −G(K) is PSD (stable config), so the instantaneous
    power of the damping force, vᵀ·(β·G(K)·v), is ≤ 0 for any v."""
    _, obj, state = make_2d_object(damping=0.0, damping_beta=0.01)
    rng = np.random.default_rng(3)
    for seed in range(5):
        v = jnp.asarray(
            rng.standard_normal(state.pos.shape).astype(np.float32)
        )
        # rayleigh_damping_grad returns the GRADIENT term −β·G(K)·v;
        # the force is its negation.
        force = -rayleigh_damping_grad(obj, state.pos, v)
        power = float(jnp.sum(v * force))
        assert power <= 1e-6 * float(jnp.sum(v * v))


@pytest.mark.parametrize("method", ["explicit", "auto_diff", "implicit"])
def test_energy_decays_faster_with_beta(method):
    cfg = _free_space_cfg(
        auto_diff=(method == "auto_diff"),
        use_explicit_method=(method == "explicit"),
    )
    energies = {}
    for beta in (0.0, 2e-3):
        _, obj, state = make_2d_object(damping=0.0, damping_beta=beta)
        state = _perturbed(state)
        e0 = _total_energy(obj, state)
        state = _run(obj, state, cfg)
        energies[beta] = _total_energy(obj, state)
    assert np.isfinite(energies[2e-3])
    # β > 0 dissipates strictly more of the initial energy.
    assert energies[2e-3] < energies[0.0] - 1e-9 * max(e0, 1.0)


def test_beta_zero_is_bit_identical():
    """damping_beta=0.0 takes the untouched reference code paths."""
    cfg = _free_space_cfg(use_explicit_method=False)
    _, obj_a, state_a = make_2d_object(damping=0.0)
    _, obj_b, state_b = make_2d_object(damping=0.0, damping_beta=0.0)
    state_a = _perturbed(state_a)
    state_b = _perturbed(state_b)
    out_a = _run(obj_a, state_a, cfg, n_frames=2)
    out_b = _run(obj_b, state_b, cfg, n_frames=2)
    np.testing.assert_array_equal(
        np.asarray(out_a.pos), np.asarray(out_b.pos)
    )


def test_dense_and_matrix_free_damped_operator_agree():
    from fem_tpu.ops.element import hessian_blocks
    from fem_tpu.solvers.dense import assemble_dense_system

    _, obj, state = make_2d_object(damping_beta=3e-3)
    rng = np.random.default_rng(1)
    pos = state.pos + 0.01 * jnp.asarray(
        rng.standard_normal(state.pos.shape), jnp.float32
    )
    K = hessian_blocks(
        pos, obj.element_indices, obj.ref_inv, obj.volume, obj.mu,
        obj.s_lambda,
    )
    dt, beta = 5e-4, 3e-3
    a_dense = np.asarray(assemble_dense_system(obj, K, dt, beta=beta))
    apply_a = make_system_apply(obj, K, dt, beta=beta)
    x = jnp.asarray(rng.standard_normal(pos.shape), jnp.float32)
    ax_mf = np.asarray(apply_a(x)).reshape(-1)
    ax_dense = a_dense @ np.asarray(x).reshape(-1)
    np.testing.assert_allclose(ax_mf, ax_dense, rtol=2e-5, atol=2e-6)
    # β enters exactly as dt² → dt·(dt+β).
    assert system_coeff(dt, beta) == dt * (dt + beta)


def test_implicit_semi_and_newton_agree_with_beta():
    """At a comfortable dt the Newton integrator's first step IS the
    semi-implicit solve; with β the two must still track closely."""
    base = dict(delta_time=1e-4, use_explicit_method=False)
    cfg_semi = _free_space_cfg(**base)
    cfg_newton = _free_space_cfg(
        integrator="newton", newton_hessian="decoupled", **base
    )
    outs = {}
    for name, cfg in (("semi", cfg_semi), ("newton", cfg_newton)):
        _, obj, state = make_2d_object(damping=0.0, damping_beta=5e-3)
        state = _perturbed(state)
        outs[name] = _run(obj, state, cfg, n_frames=2)
    np.testing.assert_allclose(
        np.asarray(outs["semi"].pos), np.asarray(outs["newton"].pos),
        atol=5e-5,
    )


def test_newton_exact_mode_dissipates_with_beta():
    cfg = _free_space_cfg(
        use_explicit_method=False, integrator="newton",
        newton_hessian="exact",
    )
    energies = {}
    for beta in (0.0, 5e-3):
        _, obj, state = make_2d_object(damping=0.0, damping_beta=beta)
        state = _perturbed(state)
        state = _run(obj, state, cfg, n_frames=3)
        energies[beta] = _total_energy(obj, state)
    assert np.isfinite(energies[5e-3])
    assert energies[5e-3] < energies[0.0]


def test_3d_and_jacobi_paths_run_with_beta():
    cfg3 = SimConfig(
        dim=3, delta_time=1e-4, sim_count=5, use_explicit_method=False,
        auto_diff=False, implicit_method=1, preconditioned=0,
        g_dir=(0.0, -1.0, 0.0), blocks=(),
    )
    _, obj, state = two_tet_object(damping_beta=2e-3, damping=0.0)
    state = _perturbed(state, scale=0.02)
    out = _run(obj, state, cfg3, n_frames=2)
    assert np.all(np.isfinite(np.asarray(out.pos)))
    # Jacobi (serial parity sweep) with the damped rows.
    cfg_j = dataclasses.replace(cfg3, implicit_method=0)
    _, obj_j, state_j = two_tet_object(damping_beta=2e-3, damping=0.0)
    state_j = _perturbed(state_j, scale=0.02)
    out_j = _run(obj_j, state_j, cfg_j, n_frames=1)
    assert np.all(np.isfinite(np.asarray(out_j.pos)))


def test_diff_substep_matches_nondiff_with_beta():
    """Forward parity of the differentiable explicit substep with β — and a
    finite gradient through a β-damped rollout."""
    from fem_tpu.diff import make_diff_substep_fn, params_from_object

    cfg = _free_space_cfg()
    _, obj, state = make_2d_object(damping=0.0, damping_beta=4e-3)
    state = _perturbed(state)
    obstacles = Obstacles.from_configs((), 2)
    diff_sub = make_diff_substep_fn(obj, cfg)
    params = params_from_object(obj)
    s_diff = diff_sub(params, state, obstacles)
    s_ref, _ = substep(
        obj, state, obstacles, dt=cfg.delta_time, g_dir=cfg.g_dir,
        use_explicit_method=True, auto_diff=False, implicit_method=1,
        preconditioned=0,
    )
    np.testing.assert_allclose(
        np.asarray(s_diff.pos), np.asarray(s_ref.pos), atol=1e-7
    )

    def loss(p):
        s = diff_sub(p, state, obstacles)
        return jnp.sum(s.pos * s.pos)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(g.mu))
