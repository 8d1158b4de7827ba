# coding=utf-8
"""Fused Pallas advection kernels.

The advection stages (kinematic.py:14-45, implicit.py:407-438) are chains of
~8-12 tiny elementwise ops on (N, d) arrays; on this per-op-overhead-dominated
backend each op costs ~40 µs regardless of size, so fusing the whole stage
into one kernel could buy most of that back.  These kernels consume the
(N, d) arrays directly — which turned out to be the mistake: d lanes force
Mosaic relayouts that cost MORE than the fused XLA chain (measured 2.76 vs
0.70 ms per call at the spot mesh).  Kept as parity-exact capability and a
documented negative result; a winning version needs the component-planar
(d, N) layout with the transposes amortized across the whole substep.

Obstacle count B is static (shapes); per-block math is a static unroll, each
block seeing the velocity already modified by the previous one — the
reference's sequential semantics (kinematic.py:32-41).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _circle_project(pos, v, center_row, radius, d):
    """One obstacle: remove the radial velocity component for particles
    inside the circle moving toward its center (kinematic.py:36-41)."""
    disp = pos - center_row  # (N, d) − (1, d)
    dist_sq = jnp.sum(disp * disp, axis=1, keepdims=True)
    inside = dist_sq < radius * radius
    toward = jnp.sum(v * (-disp), axis=1, keepdims=True) > 0.0
    hit = inside & toward & (radius > 0.0)
    coeff = jnp.sum(v * disp, axis=1, keepdims=True) / jnp.maximum(
        dist_sq, 1e-30
    )
    return jnp.where(hit, v - coeff * disp, v)


def _kinematic_kernel(
    pos_ref, vel_ref, grad_ref, minv_ref, centers_ref, radii_ref, g_ref,
    pos_out, vel_out, *, dt, damping, n_blocks, d,
):
    pos = pos_ref[:]
    g = g_ref[0:1, :]
    v = (vel_ref[:] + (g * 9.8 - grad_ref[:] * minv_ref[:]) * dt) * jnp.exp(
        jnp.float32(-dt * damping)
    )
    v = jnp.where((pos < 0.0) & (v < 0.0), 0.0, v)
    v = jnp.where((pos > 1.0) & (v > 0.0), 0.0, v)
    for b in range(n_blocks):
        v = _circle_project(
            pos, v, centers_ref[b : b + 1, :], radii_ref[0, b], d
        )
    vel_out[:] = v
    pos_out[:] = pos + v * dt


def _advect_implicit_kernel(
    pos_ref, vel_ref, velg_ref, centers_ref, radii_ref, g_ref,
    pos_out, vel_out, velg_out, *, dt, damping, n_blocks, d,
):
    pos = pos_ref[:]
    g = g_ref[0:1, :]
    decay = jnp.exp(jnp.float32(-dt * damping))
    vel = vel_ref[:] * decay
    velg = (velg_ref[:] + g * 9.8 * dt) * decay
    v = vel + velg

    lower = (pos < 0.0) & (v < 0.0)
    vel = jnp.where(lower, 0.0, vel)
    velg = jnp.where(lower, 0.0, velg)
    v = jnp.where(lower, 0.0, v)
    upper = (pos > 1.0) & (v > 0.0)
    vel = jnp.where(upper, 0.0, vel)  # NOT velg (implicit.py:422)
    v = jnp.where(upper, 0.0, v)

    for b in range(n_blocks):
        center = centers_ref[b : b + 1, :]
        radius = radii_ref[0, b]
        disp = pos - center
        dist_sq = jnp.sum(disp * disp, axis=1, keepdims=True)
        inside = dist_sq < radius * radius
        toward = jnp.sum(v * (-disp), axis=1, keepdims=True) > 0.0
        hit = inside & toward & (radius > 0.0)
        inv_d = 1.0 / jnp.maximum(dist_sq, 1e-30)
        for arr_name in ("v", "vel", "velg"):
            arr = {"v": v, "vel": vel, "velg": velg}[arr_name]
            coeff = jnp.sum(arr * disp, axis=1, keepdims=True) * inv_d
            arr = jnp.where(hit, arr - coeff * disp, arr)
            if arr_name == "v":
                v = arr
            elif arr_name == "vel":
                vel = arr
            else:
                velg = arr

    pos_out[:] = pos + v * dt
    vel_out[:] = vel
    velg_out[:] = velg


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@functools.partial(
    jax.jit, static_argnames=("dt", "damping", "g_dir", "interpret")
)
def kinematic_pallas(
    pos, vel, grad, minv, centers, radii, *, dt, damping, g_dir,
    interpret=False,
):
    """Fused explicit advection (kinematic.py:14-45).  ``minv`` is (N, 1);
    ``centers`` (B, d); ``radii`` (1, B).  Returns (pos', vel')."""
    n, d = pos.shape
    g_row = jnp.asarray(g_dir, jnp.float32).reshape(1, d)
    kernel = functools.partial(
        _kinematic_kernel, dt=dt, damping=damping,
        n_blocks=centers.shape[0], d=d,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), pos.dtype),
            jax.ShapeDtypeStruct((n, d), pos.dtype),
        ),
        in_specs=_vmem_specs(7),
        out_specs=tuple(_vmem_specs(2)),
        interpret=interpret,
    )(pos, vel, grad, minv, centers, radii, g_row)


@functools.partial(
    jax.jit, static_argnames=("dt", "damping", "g_dir", "interpret")
)
def advect_implicit_pallas(
    pos, vel, velg, centers, radii, *, dt, damping, g_dir, interpret=False
):
    """Fused implicit advection (implicit.py:407-438 incl. the vel_g quirk).
    Returns (pos', vel', vel_g')."""
    n, d = pos.shape
    g_row = jnp.asarray(g_dir, jnp.float32).reshape(1, d)
    kernel = functools.partial(
        _advect_implicit_kernel, dt=dt, damping=damping,
        n_blocks=centers.shape[0], d=d,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), pos.dtype),
            jax.ShapeDtypeStruct((n, d), pos.dtype),
            jax.ShapeDtypeStruct((n, d), pos.dtype),
        ),
        in_specs=_vmem_specs(6),
        out_specs=tuple(_vmem_specs(3)),
        interpret=interpret,
    )(pos, vel, velg, centers, radii, g_row)
