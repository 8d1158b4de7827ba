# coding=utf-8
"""Pallas fused element kernel vs the XLA reference path (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np

from fem_tpu.ops.element import explicit_grad_columns
from fem_tpu.ops.pallas_kernels import explicit_grad_columns_pallas
from tests.utils import make_2d_object, two_tet_object


def _perturbed(state, scale, seed=11):
    rng = np.random.default_rng(seed)
    noise = rng.normal(scale=scale, size=state.pos.shape).astype(np.float32)
    return state.replace(pos=state.pos + jnp.asarray(noise))


def test_pallas_grad_columns_match_xla():
    for maker, scale in ((make_2d_object, 0.003), (two_tet_object, 0.02)):
        cfg, obj, state = maker()
        state = _perturbed(state, scale)
        ref = np.asarray(
            explicit_grad_columns(
                state.pos, obj.element_indices, obj.ref_inv, obj.volume,
                obj.mu, obj.s_lambda,
            )
        )
        got = np.asarray(
            explicit_grad_columns_pallas(
                state.pos, obj.element_indices, obj.ref_inv, obj.volume,
                obj.mu, obj.s_lambda,
            )
        )
        assert got.shape == ref.shape
        scale_ref = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(
            got / scale_ref, ref / scale_ref, atol=2e-5
        )


def test_pallas_hessian_blocks_match_xla():
    from fem_tpu.ops.element import hessian_blocks
    from fem_tpu.ops.pallas_kernels import hessian_blocks_pallas

    for maker, scale in ((make_2d_object, 0.003), (two_tet_object, 0.02)):
        cfg, obj, state = maker()
        state = _perturbed(state, scale)
        args = (
            state.pos, obj.element_indices, obj.ref_inv, obj.volume,
            obj.mu, obj.s_lambda,
        )
        ref = np.asarray(hessian_blocks(*args))
        got = np.asarray(hessian_blocks_pallas(*args))
        scale_ref = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(
            got / scale_ref, ref / scale_ref, atol=2e-5
        )


def test_pallas_implicit_force_columns_match_xla():
    from fem_tpu.ops.element import implicit_force_columns
    from fem_tpu.ops.pallas_kernels import implicit_force_columns_pallas

    for maker, scale in ((make_2d_object, 0.003), (two_tet_object, 0.02)):
        cfg, obj, state = maker()
        state = _perturbed(state, scale)
        args = (
            state.pos, obj.element_indices, obj.ref_inv, obj.volume,
            obj.mu, obj.s_lambda,
        )
        ref = np.asarray(implicit_force_columns(*args))
        got = np.asarray(implicit_force_columns_pallas(*args))
        scale_ref = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(
            got / scale_ref, ref / scale_ref, atol=2e-5
        )


def test_pallas_fused_hessian_and_force_match_split():
    """The fused K+force kernel must reproduce both split kernels exactly
    (same formulas, shared F chain)."""
    from fem_tpu.ops.pallas_kernels import (
        hessian_and_force_pallas,
        hessian_blocks_pallas,
        implicit_force_columns_pallas,
    )

    for maker, scale in ((make_2d_object, 0.003), (two_tet_object, 0.02)):
        cfg, obj, state = maker()
        state = _perturbed(state, scale)
        args = (
            state.pos, obj.element_indices, obj.ref_inv, obj.volume,
            obj.mu, obj.s_lambda,
        )
        k_fused, h_fused = hessian_and_force_pallas(*args)
        np.testing.assert_array_equal(
            np.asarray(k_fused), np.asarray(hessian_blocks_pallas(*args))
        )
        np.testing.assert_array_equal(
            np.asarray(h_fused),
            np.asarray(implicit_force_columns_pallas(*args)),
        )


def test_pallas_padding_lanes_are_zeroed():
    """Padded lanes (volume 0, F = I) must not contaminate real output."""
    cfg, obj, state = two_tet_object()
    out = np.asarray(
        explicit_grad_columns_pallas(
            state.pos, obj.element_indices, obj.ref_inv, obj.volume,
            obj.mu, obj.s_lambda,
        )
    )
    assert out.shape == (obj.element_cnt, 3, 3)
    assert np.isfinite(out).all()
