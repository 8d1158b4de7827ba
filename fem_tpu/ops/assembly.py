# coding=utf-8
"""Nodal assembly: pure-functional scatter of per-element quantities.

The reference assembles per-element vertex contributions with Taichi *atomic*
adds inside GPU kernels (``obj.particles.force[index] += f`` at
solver/explicit.py:46-49, matrix scatter at solver/implicit.py:151-178, mass
lumping at object.py:358-360).  Atomics are nondeterministic and do not exist
in XLA's functional model; the TPU-native equivalent is a segment reduction
over a flattened (element, local-vertex) axis, which XLA lowers to an efficient
sorted scatter-add and which is bit-deterministic.

``element_contrib_full`` encodes the reference's universal per-element scatter
pattern: local vertices ``1..d`` each receive a dim-vector (one column of a
d×d block), and local vertex ``0`` receives the *negative sum* of those columns
(force balance — solver/explicit.py:42-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_assemble(
    contrib: jnp.ndarray,
    element_indices: jnp.ndarray,
    num_particles: int,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Scatter-add per-element per-vertex vectors onto particles.

    Args:
      contrib: ``(E, d+1, k)`` per-element contribution for each local vertex.
      element_indices: ``(E, d+1)`` int32 global particle ids.
      num_particles: number of particles N.
      axis_name: when running inside ``shard_map`` with elements sharded over
        a mesh axis, the name of that axis — the local partial sums are
        ``psum``-reduced over ICI so every shard holds the full assembly
        (SURVEY §5: the TPU-native replacement for cross-device atomics).

    Returns:
      ``(N, k)`` summed contributions (replicated across shards if reduced).
    """
    k = contrib.shape[-1]
    out = jax.ops.segment_sum(
        contrib.reshape(-1, k),
        element_indices.reshape(-1),
        num_segments=num_particles,
    )
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def segment_assemble_scalar(
    contrib: jnp.ndarray, element_indices: jnp.ndarray, num_particles: int
) -> jnp.ndarray:
    """Scatter-add per-element per-vertex scalars: ``(E, d+1) -> (N,)``."""
    return jax.ops.segment_sum(
        contrib.reshape(-1),
        element_indices.reshape(-1),
        num_segments=num_particles,
    )


def element_contrib_full(columns: jnp.ndarray) -> jnp.ndarray:
    """Expand d columns into the (d+1)-vertex contribution pattern.

    Given ``columns`` of shape ``(E, d, d)`` where ``columns[e, :, j]`` is the
    dim-vector destined for local vertex ``j+1``, returns ``(E, d+1, d)`` where
    row 0 is ``-sum_j columns[:, :, j]`` (local vertex 0) and rows ``1..d`` are
    the columns (reference: solver/explicit.py:42-49).
    """
    cols = jnp.swapaxes(columns, -1, -2)  # (E, d, d): [e, j] = column j
    v0 = -jnp.sum(cols, axis=-2, keepdims=True)  # (E, 1, d)
    return jnp.concatenate([v0, cols], axis=-2)  # (E, d+1, d)


def gather_edge_diffs(pos: jnp.ndarray, element_indices: jnp.ndarray) -> jnp.ndarray:
    """Per-element edge matrix X with columns ``p_{j+1} - p_0``.

    Args:
      pos: ``(N, d)`` particle positions (or any per-particle dim-vectors).
      element_indices: ``(E, d+1)``.

    Returns:
      ``(E, d, d)`` with ``X[e, :, j] = pos[idx[e, j+1]] - pos[idx[e, 0]]``
      (reference: solver/explicit.py:12-16).
    """
    p = pos[element_indices]  # (E, d+1, d)
    diffs = p[:, 1:, :] - p[:, 0:1, :]  # (E, d, d): row j = p_{j+1} - p_0
    return jnp.swapaxes(diffs, -1, -2)  # columns = edges
