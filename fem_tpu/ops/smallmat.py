# coding=utf-8
"""Batched closed-form small-matrix primitives (dim ∈ {2, 3}).

The whole FEM compute path operates on dense batches of dim×dim matrices
``(E, d, d)``.  On TPU, generic ``jnp.linalg`` batched inverses lower to
expensive/serial code; closed-form cofactor formulas stay fully elementwise
(VPU-friendly, fusable by XLA), which is the idiomatic replacement for the
reference's per-element ``ti.math.inverse`` / ``.determinant()`` calls
(reference: solver/explicit.py:23-24, solver/implicit.py:84,128).

All functions take arrays whose *last two* axes are the matrix axes and are
batched over any leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det(m: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., d, d), d in {2, 3}, closed form."""
    d = m.shape[-1]
    if d == 2:
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    if d == 3:
        return (
            m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
        )
    raise ValueError(f"unsupported matrix dim {d}")


def inv(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., d, d), d in {2, 3}, via adjugate / det."""
    d = m.shape[-1]
    dt = det(m)[..., None, None]
    if d == 2:
        adj = jnp.stack(
            [
                jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1),
                jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        return adj / dt
    if d == 3:
        # Cofactor matrix, transposed (adjugate).
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        adj = jnp.stack(
            [
                jnp.stack([c00, c10, c20], axis=-1),
                jnp.stack([c01, c11, c21], axis=-1),
                jnp.stack([c02, c12, c22], axis=-1),
            ],
            axis=-2,
        )
        return adj / dt
    raise ValueError(f"unsupported matrix dim {d}")


def trace(m: jnp.ndarray) -> jnp.ndarray:
    """Trace of (..., d, d)."""
    return jnp.trace(m, axis1=-2, axis2=-1)


def mT(m: jnp.ndarray) -> jnp.ndarray:
    """Transpose of the last two axes."""
    return jnp.swapaxes(m, -1, -2)


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., d, d) @ (..., d, d).

    Full-f32 precision: TPU matmuls default to bf16 passes, which is far too
    coarse for deformation gradients (F at rest must be I to f32 epsilon).
    """
    return jnp.einsum(
        "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
    )
