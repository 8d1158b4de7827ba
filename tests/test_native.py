# coding=utf-8
"""Native C++ mesh kernels vs their numpy fallbacks."""

import numpy as np
import pytest

from fem_tpu.utils.native_ext import (
    get_library,
    native_element_init,
    native_extract_surface,
    native_nearest_vertex,
    native_winding_number,
)
from fem_tpu.models.state import init_element_data

needs_native = pytest.mark.skipif(
    get_library() is None, reason="native library unavailable (no g++?)"
)


def _cube():
    v = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        np.float64,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [0, 4, 7], [0, 7, 3], [1, 2, 6], [1, 6, 5],
        ],
        np.int64,
    )
    return v, f


@needs_native
def test_native_winding_number():
    v, f = _cube()
    pts = np.array(
        [[0.5, 0.5, 0.5], [0.1, 0.9, 0.2], [1.5, 0.5, 0.5], [-0.2, 0, 0]]
    )
    wn = native_winding_number(pts, v, f)
    assert wn[0] > 0.9 and wn[1] > 0.9
    assert abs(wn[2]) < 0.1 and abs(wn[3]) < 0.1


@needs_native
def test_native_extract_surface_matches_numpy():
    from fem_tpu.models.mesh import delaunay_tetrahedralize

    v, f = _cube()
    nodes, tets = delaunay_tetrahedralize(v, f)
    surface, vertex = native_extract_surface(nodes, tets)
    assert surface.shape[0] == 12
    p0, p1, p2 = nodes[surface[:, 0]], nodes[surface[:, 1]], nodes[surface[:, 2]]
    signed_vol = np.einsum("ij,ij->i", p0, np.cross(p1, p2)).sum() / 6.0
    np.testing.assert_allclose(signed_vol, 1.0, rtol=1e-6)
    assert set(vertex) == set(range(8))


@needs_native
def test_native_ray_parity_matches_numpy_bitexact():
    """ray_parity_inside is the mesher classifier's hot loop; its grid-culled
    C++ path must agree with the numpy path on every point (the arithmetic is
    identical by construction, so the assertion is exact equality)."""
    import unittest.mock as mock

    import fem_tpu.utils.native_ext as ne
    from fem_tpu.models.mesh import points_inside_mesh
    from fem_tpu.utils.native_ext import native_points_inside

    v, f = _cube()
    rng = np.random.default_rng(7)
    # Random points straddling the surface + points exactly on the boundary
    # grid (degenerate shadows) + far-outside points (grid clamp path).
    pts = np.concatenate([
        rng.uniform(-0.3, 1.3, (5000, 3)),
        rng.integers(0, 2, (200, 3)).astype(np.float64),
        rng.uniform(5.0, 6.0, (50, 3)),
    ])
    nat = native_points_inside(pts, v, f)
    with mock.patch.object(ne, "native_points_inside", lambda *a: None):
        ref = points_inside_mesh(pts, v, f)
    np.testing.assert_array_equal(nat, ref)


@needs_native
def test_native_ray_parity_empty_faces():
    from fem_tpu.utils.native_ext import native_points_inside

    v = np.zeros((0, 3))
    f = np.zeros((0, 3), np.int64)
    out = native_points_inside(np.random.default_rng(0).normal(size=(10, 3)), v, f)
    assert out.shape == (10,) and not out.any()


@needs_native
def test_native_nearest_vertex():
    rng = np.random.default_rng(0)
    targets = rng.normal(size=(50, 3))
    queries = targets[[3, 7, 11]] + 1e-6
    idx = native_nearest_vertex(queries, targets)
    np.testing.assert_array_equal(idx, [3, 7, 11])


@needs_native
def test_native_element_init_matches_numpy():
    rng = np.random.default_rng(1)
    verts = rng.normal(size=(8, 3))
    elems = np.array([[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7]], np.int64)
    out = native_element_init(verts, elems, rho=3.0)
    assert out is not None
    ref_inv_n, vol_n, mass_n = out
    ref_inv_p, vol_p, mass_p = init_element_data(verts, elems, rho=3.0)
    np.testing.assert_allclose(ref_inv_n, ref_inv_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(vol_n, vol_p, rtol=1e-5)
    np.testing.assert_allclose(mass_n, mass_p, rtol=1e-5)
