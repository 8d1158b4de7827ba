# coding=utf-8
"""Quasi-static equilibrium solver (solvers/static.py extension).

Validation strategy:
  * the classic **affine patch test** — pin every surface vertex of a tet
    grid at F̄·X and solve for the interior: linear tetrahedra reproduce
    homogeneous deformation exactly, so the interior must land on F̄·X to
    solver tolerance, for every material;
  * consistency with damped **dynamics**: the static hanging-bar solution
    matches where the implicit integrator settles;
  * invariance: a pinned rest state with no load stays put.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.solvers.static import gravity_force, make_static_solve_fn, solve_static
from fem_tpu.utils.config import ObjectConfig, SimConfig
from tests.utils import make_2d_object, make_3d_object

MATERIALS = [
    "neo_hookean", "stvk", "linear", "corotated", "stable_neo_hookean",
    "mooney_rivlin:0.3",
]


def surface_pinned_grid(sub=3, material="neo_hookean"):
    """3D tet grid with ALL boundary vertices pinned (free interior)."""
    from fem_tpu.models.mesh import construct_3d_grid_mesh

    cfg = ObjectConfig(
        center=(0.0, 0.0, 0.0), side_length=1.0, subdivisions=sub,
        material=material, E=4e4, nu=0.3,
    )
    vertices, faces, elements = construct_3d_grid_mesh(cfg)
    obj, state = build_object(cfg, vertices, faces, elements)
    pos = np.asarray(state.pos)
    eps = 1e-6
    on_boundary = np.any(
        (pos <= pos.min(0) + eps) | (pos >= pos.max(0) - eps), axis=1
    )
    assert on_boundary.sum() < pos.shape[0], "needs free interior vertices"
    free = (~on_boundary).astype(np.float32)[:, None]
    obj = obj.replace(free_mask=jnp.asarray(free))
    return obj, state, on_boundary


@pytest.mark.parametrize("material", MATERIALS)
def test_affine_patch_test(material):
    obj, state, boundary = surface_pinned_grid(material=material)
    x_rest = np.asarray(state.pos, np.float64)
    f_bar = np.array(
        [[1.05, 0.03, 0.0], [0.0, 0.97, 0.02], [0.01, 0.0, 1.02]]
    )
    target = x_rest @ f_bar.T
    # Pinned vertices moved to F̄·X; interior starts at rest (a nontrivial
    # initial guess — the solver must find the affine interior).
    pos0 = np.where(boundary[:, None], target, x_rest).astype(np.float32)
    res = solve_static(obj, jnp.asarray(pos0), tol=1e-4)
    assert bool(res.converged), f"grad_norm={float(res.grad_norm)}"
    np.testing.assert_allclose(
        np.asarray(res.pos), target.astype(np.float32), atol=2e-5
    )


def test_patch_test_2d():
    cfg = ObjectConfig(
        center=(0.0, 0.0), side_length=1.0, subdivisions=6, E=4e4, nu=0.3,
    )
    from fem_tpu.models.mesh import construct_2d_mesh

    vertices, faces, elements = construct_2d_mesh(cfg)
    obj, state = build_object(cfg, vertices, faces, elements)
    pos = np.asarray(state.pos)
    eps = 1e-6
    boundary = np.any(
        (pos <= pos.min(0) + eps) | (pos >= pos.max(0) - eps), axis=1
    )
    obj = obj.replace(
        free_mask=jnp.asarray((~boundary).astype(np.float32)[:, None])
    )
    f_bar = np.array([[1.06, 0.04], [0.02, 0.95]])
    target = pos.astype(np.float64) @ f_bar.T
    pos0 = np.where(boundary[:, None], target, pos).astype(np.float32)
    res = solve_static(obj, jnp.asarray(pos0), tol=1e-4)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.pos), target.astype(np.float32), atol=2e-5
    )


def test_rest_state_is_equilibrium():
    _, obj, state = make_2d_object(
        subdivisions=4, center=(0.4, 0.5),
        pin_boxes=(((0.35, 0.695), (0.65, 0.705)),),
    )
    res = solve_static(obj, state.pos, tol=1e-6)
    assert bool(res.converged)
    assert int(res.iterations) == 0  # already at equilibrium
    np.testing.assert_array_equal(np.asarray(res.pos), np.asarray(state.pos))


def test_static_matches_dynamic_settle():
    """The static hanging-bar equilibrium equals where damped implicit
    dynamics settles (ties the new statics path to the parity-tested
    integrator)."""
    _, obj, state = make_2d_object(
        subdivisions=4, center=(0.4, 0.5), E=2e4, damping=40.0,
        pin_boxes=(((0.35, 0.695), (0.65, 0.705)),),
    )
    g_dir = (0.0, -1.0)
    res = solve_static(obj, state.pos, g_dir=g_dir, tol=1e-5)
    # tol or the f32 floor — either way the residual must be tiny relative
    # to the ~12 N gravity loads flowing through the mesh.
    assert bool(res.converged) or (
        bool(res.stalled) and float(res.grad_norm) < 1e-2
    )
    cfg = SimConfig(
        dim=2, g_dir=g_dir, use_explicit_method=False, implicit_method=1,
        cg_precond="none", sim_count=10,
    )
    from fem_tpu.sim import make_frame_fn

    frame = make_frame_fn(obj, cfg)
    obs = Obstacles(
        centers=jnp.zeros((1, 2), jnp.float32), radii=jnp.zeros((1,)),
    )
    s = state
    for _ in range(120):
        s, _ = frame(s, obs)
    # the integrator's rest point is offset by the damping term acting on
    # the steady vel/vel_g split — compare loosely but meaningfully (the
    # sag itself is ~1e-2).
    np.testing.assert_allclose(
        np.asarray(res.pos), np.asarray(s.pos), atol=2e-3
    )
    sag = np.asarray(res.pos)[:, 1] - np.asarray(state.pos)[:, 1]
    assert sag.min() < -2e-3  # a real sag, not noise


def test_gravity_force_units():
    _, obj, _ = make_2d_object()
    f = np.asarray(gravity_force(obj, (0.0, -1.0)))
    np.testing.assert_allclose(f[:, 1], -9.8 * np.asarray(obj.mass), rtol=1e-6)
    np.testing.assert_array_equal(f[:, 0], 0.0)


def test_prescribed_displacement_stretch_poisson():
    """Uniaxial prescribed stretch of a linear-elastic 2D slab: pin left and
    right edges (right edge displaced +10%), free top/bottom — the lateral
    contraction at the center must show the Poisson effect (nonzero, with
    the analytic plane-strain magnitude as a sanity band)."""
    cfg = ObjectConfig(
        center=(0.0, 0.0), side_length=1.0, subdivisions=8,
        material="linear", E=4e4, nu=0.3,
    )
    from fem_tpu.models.mesh import construct_2d_mesh

    vertices, faces, elements = construct_2d_mesh(cfg)
    obj, state = build_object(cfg, vertices, faces, elements)
    pos = np.asarray(state.pos)
    left = pos[:, 0] <= 1e-6
    right = pos[:, 0] >= 1.0 - 1e-6
    pinned = left | right
    obj = obj.replace(
        free_mask=jnp.asarray((~pinned).astype(np.float32)[:, None])
    )
    pos0 = pos.copy()
    pos0[right, 0] += 0.1
    res = solve_static(obj, jnp.asarray(pos0), tol=1e-4, max_newton=100)
    assert bool(res.converged)
    out = np.asarray(res.pos)
    # center column contracts laterally toward the mid-line (Poisson)
    mid = np.abs(pos[:, 0] - 0.5) < 0.08
    top = mid & (pos[:, 1] >= 1.0 - 1e-6)
    bot = mid & (pos[:, 1] <= 1e-6)
    width_before = pos[top, 1].mean() - pos[bot, 1].mean()
    width_after = out[top, 1].mean() - out[bot, 1].mean()
    contraction = width_before - width_after
    # plane-strain lateral strain ≈ −ν/(1−ν)·ε_x = −0.3/0.7·0.1 ≈ −4.3e-2;
    # edge pinning stiffens it — accept a generous physical band.
    assert 0.01 < contraction < 0.06


def test_jitted_closure_and_f_ext():
    _, obj, state = make_2d_object(
        subdivisions=4, center=(0.4, 0.5),
        pin_boxes=(((0.35, 0.695), (0.65, 0.705)),),
    )
    solve = make_static_solve_fn(obj, tol=1e-5)
    f = np.zeros(np.asarray(state.pos).shape, np.float32)
    f[:, 1] = -1.0  # downward point loads
    res = solve(state.pos, jnp.asarray(f))
    assert bool(res.converged) or (
        bool(res.stalled) and float(res.grad_norm) < 1e-2
    )
    assert np.asarray(res.pos)[:, 1].mean() < np.asarray(state.pos)[:, 1].mean()


def test_unpinned_raises():
    _, obj, state = make_2d_object()
    with pytest.raises(ValueError, match="pin_boxes"):
        solve_static(obj, state.pos)
