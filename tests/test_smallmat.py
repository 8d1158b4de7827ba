# coding=utf-8
"""Closed-form small-matrix ops vs numpy linalg."""

import jax.numpy as jnp
import numpy as np

from fem_tpu.ops import smallmat as sm


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


def test_det_inv_2d():
    m = _rand((17, 2, 2), 0) + 2 * np.eye(2, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(sm.det(jnp.asarray(m))), np.linalg.det(m), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sm.inv(jnp.asarray(m))), np.linalg.inv(m), rtol=2e-4, atol=1e-5
    )


def test_det_inv_3d():
    m = _rand((23, 3, 3), 1) + 2 * np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(sm.det(jnp.asarray(m))), np.linalg.det(m), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sm.inv(jnp.asarray(m))), np.linalg.inv(m), rtol=2e-3, atol=1e-4
    )


def test_trace_transpose_matmul():
    a = _rand((5, 3, 3), 2)
    b = _rand((5, 3, 3), 3)
    np.testing.assert_allclose(
        np.asarray(sm.trace(jnp.asarray(a))), np.trace(a, axis1=-2, axis2=-1),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sm.mT(jnp.asarray(a))), np.swapaxes(a, -1, -2)
    )
    np.testing.assert_allclose(
        np.asarray(sm.matmul(jnp.asarray(a), jnp.asarray(b))), a @ b,
        rtol=1e-5, atol=1e-6,
    )
