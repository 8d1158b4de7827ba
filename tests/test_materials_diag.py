# coding=utf-8
"""StVK material, solver diagnostics, barycentric/UV utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from fem_tpu.models.mesh import barycentric_coordinates, recover_uv
from fem_tpu.ops.element import energy_density, total_energy
from fem_tpu.solvers.diagnostics import system_diagnostics, symmetry_probe
from tests.utils import make_2d_object, single_tet_object


def test_stvk_rest_zero_and_positive_energy():
    f_id = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    phi = energy_density(f_id, 1e4, 1e4, material="stvk")
    np.testing.assert_allclose(np.asarray(phi), 0.0, atol=1e-5)
    rng = np.random.default_rng(0)
    f = jnp.asarray(
        (np.eye(3) + 0.1 * rng.normal(size=(4, 3, 3))).astype(np.float32)
    )
    phi = energy_density(f, 1e4, 1e4, material="stvk")
    assert (np.asarray(phi) > 0).all()


def test_stvk_handles_inversion_finite():
    """StVK is polynomial in F — finite even for inverted elements (unlike
    Neo-Hookean's log)."""
    f = -jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    phi = energy_density(f, 1e4, 1e4, material="stvk")
    assert np.isfinite(np.asarray(phi)).all()


def test_stvk_autodiff_simulation_runs():
    from fem_tpu.sim import make_frame_fn
    from tests.utils import default_obstacles, default_sim_config

    cfg = default_sim_config(auto_diff=True, use_explicit_method=True)
    _, obj, state = make_2d_object(subdivisions=4)
    obj = obj.replace(material="stvk")
    s, _ = make_frame_fn(obj, cfg)(state, default_obstacles())
    assert np.isfinite(np.asarray(s.pos)).all()


def test_system_diagnostics_rest_pose():
    """The reference operator is *nearly but not exactly* symmetric — its K
    block contains μ(R⁻ᵀ)² and the M⁻¹ row scaling, neither symmetric (which
    is why its CG defaults to normal equations, and presumably why the
    symmetry check was left commented out).  For small dt, A ≈ I is strongly
    diagonally dominant — the Jacobi convergence precondition holds."""
    cfg, obj, state = make_2d_object(subdivisions=3)
    d = system_diagnostics(obj, state, dt=5e-4)
    assert 0.0 < d.symmetry_error < 0.2
    assert d.diagonally_dominant
    assert d.diag_dominance_margin > 0.5  # A ≈ I


def test_symmetry_probe_detects_asymmetry():
    a = jnp.asarray(np.array([[1.0, 2.0], [0.0, 1.0]], np.float32))
    err = symmetry_probe(lambda v: a @ v, (2,))
    assert err > 0.1


def test_barycentric_coordinates():
    p0 = np.array([[0.0, 0, 0]])
    p1 = np.array([[1.0, 0, 0]])
    p2 = np.array([[0.0, 1, 0]])
    p = np.array([[1 / 3, 1 / 3, 0]])
    l1, l2, l3 = barycentric_coordinates(p0, p1, p2, p)
    np.testing.assert_allclose([l1[0], l2[0], l3[0]], [1 / 3] * 3, rtol=1e-6)
    np.testing.assert_allclose(l1 + l2 + l3, 1.0, rtol=1e-6)


def test_recover_uv_exact_and_interpolated():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64
    )
    faces = np.array([[0, 1, 2]])
    uv = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    # Exact vertex match + interior point.
    pts = np.array([[1, 0, 0], [0.25, 0.25, 0.0]])
    out = recover_uv(pts, verts, faces, uv)
    np.testing.assert_allclose(out[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.25, 0.25], atol=1e-6)


def test_analytic_first_piola_matches_autodiff():
    """Analytic P(F) columns equal jax.grad of the same energy for every
    material — the extension of the reference's NH analytic-vs-tape pairing
    (solver/explicit.py vs explicit_auto_diff.py) to stvk/linear."""
    import jax

    from fem_tpu.solvers.explicit import (
        analytic_energy_gradient,
        autodiff_energy_gradient,
    )

    rng = np.random.default_rng(3)
    _, obj, state = make_2d_object(subdivisions=4)
    pos = state.pos + jnp.asarray(
        rng.uniform(-0.02, 0.02, state.pos.shape).astype(np.float32)
    )
    for material in (
        "neo_hookean", "stvk", "linear", "corotated", "stable_neo_hookean",
    ):
        o = obj.replace(material=material)
        got = np.asarray(analytic_energy_gradient(o, pos))
        ref = np.asarray(autodiff_energy_gradient(o, pos))
        scale = max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(
            got, ref, rtol=2e-5, atol=2e-5 * scale,
            err_msg=f"material={material}",
        )


def test_stvk_analytic_explicit_simulation_runs():
    """material='stvk' with the ANALYTIC explicit path (auto_diff=false) —
    previously this silently computed Neo-Hookean forces."""
    from fem_tpu.sim import make_frame_fn
    from tests.utils import default_obstacles, default_sim_config

    cfg = default_sim_config(auto_diff=False, use_explicit_method=True)
    _, obj, state = make_2d_object(subdivisions=4)
    obj = obj.replace(material="stvk")
    s, _ = make_frame_fn(obj, cfg)(state, default_obstacles())
    assert np.isfinite(np.asarray(s.pos)).all()


def test_implicit_stvk_exact_jvp_runs():
    """Implicit + StVK under the exact-Newton extension (since round 4 the
    decoupled hessian='reference' route ALSO supports materials — see
    tests/test_materials_implicit.py); the HVP matches a finite difference
    of the material force."""
    from fem_tpu.sim import make_frame_fn
    from fem_tpu.solvers.implicit import make_exact_hvp_apply
    from tests.utils import default_obstacles, default_sim_config

    _, obj, state = make_2d_object(subdivisions=4)
    obj = obj.replace(material="stvk")
    rng = np.random.default_rng(5)
    pos = state.pos + jnp.asarray(
        rng.uniform(-0.02, 0.02, state.pos.shape).astype(np.float32)
    )
    state = state.replace(pos=pos)

    # HVP vs central finite difference of the assembled force.
    from fem_tpu.ops.assembly import assemble_for, element_contrib_full
    from fem_tpu.solvers.implicit import _material_force_columns

    dt = 5e-4
    apply_a = make_exact_hvp_apply(obj, pos, dt)
    v = jnp.asarray(
        rng.uniform(-1.0, 1.0, pos.shape).astype(np.float32)
    )
    eps = 1e-3

    def f(p):
        return assemble_for(obj, element_contrib_full(
            _material_force_columns(obj, p, False)
        ))

    df_fd = (np.asarray(f(pos + eps * v)) - np.asarray(f(pos - eps * v))) / (
        2 * eps
    )
    got = np.asarray(apply_a(v))
    expect = np.asarray(v) - dt * dt * df_fd / np.asarray(obj.mass)[:, None]
    scale = max(1.0, float(np.abs(expect).max()))
    np.testing.assert_allclose(got, expect, rtol=5e-3, atol=5e-3 * scale)

    # End-to-end frame under the extension.
    cfg = default_sim_config(
        auto_diff=False, use_explicit_method=False, implicit_method=1,
        preconditioned=1, hessian="exact_jvp",
    )
    s, _ = make_frame_fn(obj, cfg)(state, default_obstacles())
    assert np.isfinite(np.asarray(s.pos)).all()


def test_corotated_rest_pose_and_rotation_invariance():
    """Corotated sanity: zero energy/stress at rest AND under pure rotation
    (the property linear elasticity lacks — ghost forces under rotation)."""
    import math

    from fem_tpu.ops.element import first_piola

    f_id = jnp.eye(3)[None]
    assert float(energy_density(f_id, 1e4, 1e4, material="corotated")[0]) < 1e-8
    assert float(np.abs(np.asarray(
        first_piola(f_id, 1e4, 1e4, material="corotated")
    )).max()) < 1e-2  # 1e4-scale moduli: ~f32 eps
    th = 0.7
    rot = jnp.asarray([
        [math.cos(th), -math.sin(th), 0.0],
        [math.sin(th), math.cos(th), 0.0],
        [0.0, 0.0, 1.0],
    ])[None]
    assert float(energy_density(rot, 1e4, 1e4, material="corotated")[0]) < 1e-3
    # linear elasticity fails this (ghost stress under rotation):
    assert float(energy_density(rot, 1e4, 1e4, material="linear")[0]) > 1.0


def test_corotated_simulations_run():
    """Corotated end-to-end: explicit analytic and implicit exact-Newton."""
    from fem_tpu.sim import make_frame_fn
    from tests.utils import default_obstacles, default_sim_config

    _, obj, state = make_2d_object(subdivisions=4)
    obj = obj.replace(material="corotated")
    for cfg in (
        default_sim_config(auto_diff=False, use_explicit_method=True),
        default_sim_config(
            auto_diff=False, use_explicit_method=False, implicit_method=1,
            preconditioned=1, hessian="exact_jvp",
        ),
    ):
        s, _ = make_frame_fn(obj, cfg)(state, default_obstacles())
        assert np.isfinite(np.asarray(s.pos)).all()
