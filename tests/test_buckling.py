# coding=utf-8
"""Linearized buckling analysis (solvers/buckling.py) — framework extension,
no reference counterpart (the reference is a dynamics-only simulator).

Pinned against a dense float64 generalized-eigenvalue oracle on the pencil
K_g φ = μ K₀ φ assembled column-by-column from the same HVPs, the Euler
column formula P_cr = π²·E₂D·I/(4L²) with its 1/L² slenderness scaling,
and the tension sanity (no nearby critical factor under a stabilizing
load)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg as sla

from fem_tpu.models.state import build_object
from fem_tpu.solvers.buckling import linear_buckling
from fem_tpu.solvers.modal import make_stiffness_hvp
from fem_tpu.utils.config import ObjectConfig


def _strip_object(nx, ny, width, height, **mat):
    """Rectangular 2D strip: (nx+1)×(ny+1) vertex grid, bottom edge pinned
    (clamped support), same 2-triangles-per-quad pattern as
    construct_2d_mesh."""
    xs = np.linspace(0.0, width, nx + 1)
    ys = np.linspace(0.0, height, ny + 1)
    vertices = np.array(np.meshgrid(xs, ys)).T.reshape(-1, 2).astype(np.float32)
    faces = []
    for i in range(nx):
        for j in range(ny):
            p1 = i * (ny + 1) + j
            p2 = p1 + 1
            p3 = p1 + ny + 1
            p4 = p3 + 1
            faces.append([p1, p2, p4])
            faces.append([p1, p4, p3])
    faces = np.array(faces, np.int32)
    cfg = ObjectConfig(
        center=(0.0, 0.0),
        pin_boxes=(((-1.0, -1.0), (width + 1.0, 1e-6)),),
        **mat,
    )
    obj, state = build_object(cfg, vertices, faces, faces.copy())
    top = np.where(np.asarray(state.pos)[:, 1] > height - 1e-6)[0]
    return cfg, obj, state, top


def _axial_load(pos, top, total_p):
    """Total compressive force ``total_p`` (downward for +) split over the
    top-edge vertices."""
    f = np.zeros_like(np.asarray(pos))
    f[top, 1] = -total_p / len(top)
    return jnp.asarray(f)


def _dense_pencil_oracle(obj, pos0, pos1, k):
    """Assemble K₀/K₁ column-by-column from the same HVPs; solve the free-DOF
    pencil K_g φ = μ K₀ φ densely in float64."""
    kv0 = make_stiffness_hvp(obj, pos0)
    kv1 = make_stiffness_hvp(obj, pos1)
    n, d = pos0.shape
    nd = n * d
    K0 = np.zeros((nd, nd))
    K1 = np.zeros((nd, nd))
    for i in range(nd):
        e = np.zeros(nd, np.float32)
        e[i] = 1.0
        v = jnp.asarray(e.reshape(n, d))
        K0[:, i] = np.asarray(kv0(v)).reshape(nd)
        K1[:, i] = np.asarray(kv1(v)).reshape(nd)
    free = np.repeat(np.asarray(obj.free_mask)[:, 0], d).astype(bool)
    K0 = 0.5 * (K0 + K0.T)[np.ix_(free, free)]
    Kg = 0.5 * ((K1 + K1.T))[np.ix_(free, free)] - K0
    return sla.eigh(Kg, K0, eigvals_only=True)[:k]


def test_buckling_matches_dense_pencil_oracle():
    _, obj, state, top = _strip_object(2, 8, 0.05, 0.4)
    f = _axial_load(state.pos, top, 2.0)
    k = 3
    res = linear_buckling(obj, state.pos, f_ext=f, k=k, rounds=24,
                          target_tol=1e-4)
    assert bool(res.base.converged) or bool(res.base.stalled)
    oracle = _dense_pencil_oracle(obj, state.pos, res.base.pos, k)
    # μ are O(load/stiffness) small numbers; compare relative to the most
    # critical one.
    scale = abs(oracle[0])
    np.testing.assert_allclose(
        np.asarray(res.mu), oracle, rtol=0, atol=2e-2 * scale
    )
    # Critical factors are −1/μ of the negative pencil values, ascending.
    lam = np.asarray(res.load_factors)
    assert np.all(lam[:2] > 0) and lam[0] <= lam[1]
    np.testing.assert_allclose(lam[0], -1.0 / oracle[0], rtol=3e-2)


def test_buckling_converges_to_euler_column_formula():
    """Fixed-free Euler column: P_cr = π²·E₂D·I/(4L²) with the 2D uniaxial
    modulus E₂D = 4μ(μ+λ)/(λ+2μ), I = t³/12.  Constant-strain triangles
    are stiff in bending, so the check is CONVERGENCE from above under
    refinement (measured ladder: 1.445 → 1.141 → 1.071 × Euler at
    nx=4/6/8), with the finer mesh within 20%."""
    t = 0.05
    height = 0.5
    ratios = []
    for nx, ny in ((4, 20), (6, 40)):
        cfg, obj, state, top = _strip_object(nx, ny, t, height)
        p_apply = 0.5
        f = _axial_load(state.pos, top, p_apply)
        res = linear_buckling(obj, state.pos, f_ext=f, k=2, rounds=20,
                              inner_iters=max(400, 20 * ny))
        # f32-floor stall is an accepted statics outcome (static.py contract)
        assert bool(res.base.converged) or bool(res.base.stalled)
        lam = float(res.load_factors[0])
        assert np.isfinite(lam) and lam > 0
        mu_l, lam_l = cfg.mu, cfg.s_lambda
        e2d = 4.0 * mu_l * (mu_l + lam_l) / (lam_l + 2.0 * mu_l)
        p_euler = np.pi**2 * e2d * t**3 / 12.0 / (4.0 * height**2)
        ratios.append(lam * p_apply / p_euler)
        # First buckling mode of a column is lateral sway.
        mode = np.asarray(res.modes[0])
        assert np.linalg.norm(mode[:, 0]) > 3.0 * np.linalg.norm(mode[:, 1])
    assert ratios[0] > ratios[1] > 0.98  # stiff-from-above, converging
    assert ratios[1] < 1.20


def test_buckling_slenderness_scaling():
    """P_cr ∝ 1/L² between two columns discretized at the same element
    density (discretization stiffness cancels in the ratio)."""
    t = 0.05
    factors = {}
    for ny, height in ((20, 0.5), (28, 0.7)):
        _, obj, state, top = _strip_object(4, ny, t, height)
        f = _axial_load(state.pos, top, 0.5)
        res = linear_buckling(obj, state.pos, f_ext=f, k=2, rounds=20,
                              inner_iters=max(400, 20 * ny))
        factors[height] = float(res.load_factors[0])
        assert np.isfinite(factors[height]) and factors[height] > 0
    ratio = factors[0.5] / factors[0.7]
    np.testing.assert_allclose(ratio, (0.7 / 0.5) ** 2, rtol=0.12)


def test_buckling_tension_is_stabilizing():
    """The same column loaded in TENSION has no critical factor anywhere
    near the compressive one (geometric stiffness is stabilizing)."""
    _, obj, state, top = _strip_object(2, 10, 0.05, 0.4)
    f_c = _axial_load(state.pos, top, 2.0)
    res_c = linear_buckling(obj, state.pos, f_ext=f_c, k=2, rounds=16)
    lam_c = float(res_c.load_factors[0])
    assert np.isfinite(lam_c) and lam_c > 0
    res_t = linear_buckling(obj, state.pos, f_ext=-f_c, k=2, rounds=16)
    lam_t = float(res_t.load_factors[0])
    assert (not np.isfinite(lam_t)) or lam_t > 10.0 * lam_c


def test_buckling_requires_pins():
    from tests.utils import make_2d_object

    _, obj, state = make_2d_object(subdivisions=3)
    with pytest.raises(ValueError, match="Dirichlet"):
        linear_buckling(obj, state.pos, g_dir=(0.0, -1.0))


def test_buckling_3d_column_smoke():
    """3D tet column under axial compression: finite positive factor,
    lateral first mode."""
    from fem_tpu.models.mesh import construct_3d_grid_mesh

    cfg = ObjectConfig(
        center=(0.0, 0.0, 0.0),
        side_length=0.3,
        subdivisions=3,
        pin_boxes=(((-1.0, -1.0, -1.0), (1.0, 1e-6, 1.0)),),
    )
    v, f, e = construct_3d_grid_mesh(cfg)
    # Stretch into a column: 3× taller than wide.
    v = np.asarray(v, np.float32)
    v[:, 1] *= 3.0
    obj, state = build_object(cfg, v, f, e)
    pos = np.asarray(state.pos)
    top = np.where(pos[:, 1] > pos[:, 1].max() - 1e-6)[0]
    fext = np.zeros_like(pos)
    fext[top, 1] = -0.05 / len(top)
    res = linear_buckling(obj, state.pos, f_ext=jnp.asarray(fext), k=2,
                          rounds=16)
    assert bool(res.base.converged) or bool(res.base.stalled)
    lam = float(res.load_factors[0])
    assert np.isfinite(lam) and lam > 0
    mode = np.asarray(res.modes[0])
    lateral = np.linalg.norm(mode[:, [0, 2]])
    assert lateral > 2.0 * np.linalg.norm(mode[:, 1])
