# coding=utf-8
"""Uniform-grid broad phase for penalty contact at scale.

The dense pair machinery in fem_tpu/contact.py materializes (ns_a, ns_b)
coefficient matrices — one MXU matmul per body pair, unbeatable for the
multi-body demo scales but O(ns²) in HBM: ~270 MB of transients at an
8k-vertex surface and out of reach at the 212k-tet scale (~20k surface
vertices → 1.6 GB per matrix).  This module is the scaling path: a
uniform grid with cell size = contact radius, rebuilt every substep from
scratch (positions move), in static shapes throughout — the TPU-native
substitute for pointer-chasing neighbor lists:

1. quantize positions to grid cells, encode to one int32 cell id;
2. ``argsort`` the ids (XLA sort — no scatter into per-cell buckets);
3. for each vertex × each of 3^d neighbor cells, ``searchsorted`` into
   the sorted id array and take a FIXED ``cap`` of consecutive slots —
   candidates are (ns, 3^d·cap) gathers, shapes independent of occupancy;
4. elementwise penalty (same formulas as contact._pair_coefs: coefficient
   k·max(0, r−d)/max(d, 0.1r), viscous dashpot on the overlap ramp) over
   the candidate set, each ORDERED pair weighted ½ and scattered to BOTH
   endpoints (+f to i, −f to j) — Newton's third law holds exactly per
   found pair, so momentum is conserved even when a full cell truncates
   one side's candidate list.

Same-body pairs are admitted only when the REST distance exceeds the
exclusion radius (the dense path's precomputed (ns, ns) rest mask, here
evaluated per candidate on the fly — no quadratic storage).  Bodies are
concatenated into one vertex soup with a per-vertex body id, so ONE grid
pass covers every body pair AND self-contact.

Cost: O(ns·(3^d·cap)) work and memory per substep — at 20k surface
vertices with cap 8 in 3D that is ~4.3M candidate slots (~50 MB of
transients) versus 1.6 GB dense.  Truncation: a cell holds at most
~(r/h+1)^d surface vertices (h = surface spacing ≈ r by the auto-radius
rule), so cap 8 is generous for simple contact and cap can be raised for
crushed configurations; truncated pairs soften the penalty (half force
from the surviving direction) but never break momentum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HP = jax.lax.Precision.HIGHEST


def grid_shape(radius: float, dim: int) -> Tuple[int, int]:
    """(cells per axis M, id stride base) for cell size = radius over the
    unit domain with one margin cell each side (positions may leave [0,1]
    transiently; coordinates clamp into the margin)."""
    m = int(np.ceil(1.0 / radius)) + 2
    if m ** dim >= 2 ** 31:
        raise ValueError(
            f"contact radius {radius:g} too small for the int32 grid "
            f"({m}^{dim} cells); raise contact_radius or use the dense path"
        )
    return m, m


def grid_contact_forces(
    pos: jnp.ndarray,  # (ns, d) concatenated participating vertices
    body_id: jnp.ndarray,  # (ns,) int32
    rest_pos: jnp.ndarray,  # (ns, d) rest positions (same-body exclusion)
    radius: float,
    stiffness: float,
    vel: Optional[jnp.ndarray] = None,
    friction_c: float = 0.0,
    cap: int = 8,
    self_contact: bool = False,
    excl_radius: Optional[float] = None,
    mu: float = 0.0,
    mu_slope: float = 0.0,
) -> jnp.ndarray:
    """Penalty contact forces over the vertex soup via the uniform grid.

    Pair admission: different ``body_id`` always; same body only when
    ``self_contact`` and rest distance > ``excl_radius`` (default
    2.5·radius — matching contact.build_contact_plan's dense mask).
    Returns (ns, d) forces in the input order.

    ``mu`` > 0 adds regularized Coulomb pair friction (grid-only — the
    dense matmul path never materializes per-pair vectors, which the
    Coulomb projection needs): per active pair the TANGENTIAL relative
    velocity v_t (normal component projected out) is opposed by
    f_t = −min(mu_slope·|v_t|, μ·|f_n|)·v̂_t with |f_n| = k·pen the pair's
    normal penalty magnitude — a tangential dashpot capped by the Coulomb
    cone (slope ``mu_slope``, typically √(k·m_min) = pair critical
    damping).  Inside the cone contacts creep viscously instead of
    locking (the standard penalty regularization); at the cap a sliding
    body under weight W decelerates at μ·W/m.  Antisymmetric per pair ⇒
    momentum-conserving.  Composes with the isotropic ``friction_c``
    dashpot (which damps normal approach too)."""
    ns, d = pos.shape
    m, _ = grid_shape(radius, d)
    inv = 1.0 / radius
    excl = 2.5 * radius if excl_radius is None else excl_radius

    ic = jnp.clip(
        jnp.floor(pos * inv).astype(jnp.int32) + 1, 0, m - 1
    )  # (ns, d) margin-shifted cell coords
    strides = jnp.asarray(
        [m ** k for k in range(d - 1, -1, -1)], jnp.int32
    )
    cell = jnp.sum(ic * strides[None, :], axis=1)  # (ns,)

    order = jnp.argsort(cell)
    cell_s = cell[order]
    pos_s = pos[order]
    body_s = body_id[order]
    rest_s = rest_pos[order]
    vel_s = vel[order] if vel is not None else None

    # Neighbor cell ids: (ns, 3^d) — the vertex's cell id plus every
    # {-1,0,1}^d offset (clamped coords guarantee the ids stay in range
    # only up to the margin; out-of-range neighbor ids simply miss).
    offs = jnp.asarray(
        np.array(
            np.meshgrid(*([[-1, 0, 1]] * d), indexing="ij")
        ).reshape(d, -1).T @ np.array(
            [int(m ** k) for k in range(d - 1, -1, -1)]
        ),
        jnp.int32,
    )  # (3^d,)
    nbr = cell_s[:, None] + offs[None, :]  # (ns, 3^d)

    start = jnp.searchsorted(cell_s, nbr.reshape(-1)).reshape(
        ns, -1
    )  # (ns, 3^d)
    slot = jnp.arange(cap, dtype=jnp.int32)
    idx = start[:, :, None] + slot[None, None, :]  # (ns, 3^d, cap)
    idx_c = jnp.minimum(idx, ns - 1)
    valid = (idx < ns) & (cell_s[idx_c] == nbr[:, :, None])
    j = idx_c.reshape(ns, -1)  # (ns, q) candidate sorted-positions
    valid = valid.reshape(ns, -1)

    i_row = jnp.arange(ns, dtype=jnp.int32)[:, None]
    valid = valid & (j != i_row)

    same_body = body_s[j] == body_s[:, None]
    if self_contact:
        rd = rest_s[j] - rest_s[:, None, :]  # (ns, q, d)
        rest_ok = jnp.sum(rd * rd, axis=-1) > excl * excl
        admit = jnp.where(same_body, rest_ok, True)
    else:
        admit = ~same_body
    valid = valid & admit

    diff = pos_s[:, None, :] - pos_s[j]  # (ns, q, d)
    d2 = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-18))
    pen = jnp.maximum(radius - dist, 0.0)
    coef = stiffness * pen / jnp.maximum(dist, 0.1 * radius)
    coef = jnp.where(valid, coef, 0.0)
    # Each ordered pair found from side i contributes ±½·f — found from
    # both sides (the common case) the halves sum to the dense force;
    # found from one side (cap truncation) momentum still balances.
    f_pair = 0.5 * coef[..., None] * diff  # (ns, q, d)
    if friction_c > 0.0 and vel is not None:
        w = jnp.where(valid, pen / radius, 0.0)
        dv = vel_s[:, None, :] - vel_s[j]
        f_pair = f_pair - (0.5 * friction_c) * w[..., None] * dv
    if mu > 0.0 and vel is not None:
        active = valid & (pen > 0.0)
        n_hat = diff / dist[..., None]
        dv = vel_s[:, None, :] - vel_s[j]
        v_t = dv - jnp.sum(dv * n_hat, axis=-1, keepdims=True) * n_hat
        t_speed = jnp.sqrt(
            jnp.maximum(jnp.sum(v_t * v_t, axis=-1), 1e-24)
        )
        f_n = stiffness * pen  # normal penalty magnitude
        f_t_mag = jnp.minimum(mu_slope * t_speed, mu * f_n)
        f_t_mag = jnp.where(active, f_t_mag, 0.0)
        f_pair = f_pair - 0.5 * (f_t_mag / t_speed)[..., None] * v_t
    f_s = jnp.sum(f_pair, axis=1)  # +½ f on i
    f_s = f_s.at[j.reshape(-1)].add(
        -f_pair.reshape(-1, d)
    )  # −½ f on every candidate j
    return jnp.zeros_like(pos).at[order].add(f_s)


def grid_overflow_count(
    pos: np.ndarray, radius: float, cap: int
) -> int:
    """Host-side diagnostic: number of (vertex, neighbor-cell) queries
    whose cell occupancy exceeds ``cap`` at these positions — 0 means the
    grid pass finds exactly the dense pair set."""
    ns, d = pos.shape
    m, _ = grid_shape(radius, d)
    ic = np.clip(np.floor(pos / radius).astype(np.int64) + 1, 0, m - 1)
    strides = np.array([m ** k for k in range(d - 1, -1, -1)])
    cell = (ic * strides[None, :]).sum(1)
    _, counts = np.unique(cell, return_counts=True)
    return int((counts > cap).sum())
