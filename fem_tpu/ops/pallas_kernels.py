# coding=utf-8
"""Pallas TPU kernels for the hot element math.

The Neo-Hookean element chain (F = X·R⁻¹ → F⁻¹ → log det F → Piola stress →
gradient columns H = V·P·R⁻ᵀ) is a long elementwise dependency chain over
per-element d×d matrices.  This kernel computes the whole chain in one VMEM
pass using a *component-planar* layout: the (E, d, d) matrix batch is stored
as (d², E) — components on the sublane axis, elements on the 128-wide lane
axis — so every matrix op is an unrolled scalar formula over (1, TILE_E)
vectors on the VPU, with zero intermediate HBM traffic.

The gather of vertex positions stays outside (XLA's gather is near-roofline
on TPU — measured in tools/profile_parts.py); the kernel consumes the edge
matrices X directly.

Exposed as an alternative backend for
:func:`fem_tpu.ops.element.explicit_grad_columns`; selected via
``element_backend="pallas"`` (SimConfig extension).  Falls back to interpret
mode automatically on CPU so tests run everywhere.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 1024  # lanes per grid step (multiple of 128)


# --- small-matrix algebra on lists of (1, T) component rows ---------------

def _mat3_mul(a: Sequence, b: Sequence):
    """Row-major 3×3 product of component lists [a00..a22] × [b00..b22]."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(
                a[3 * i + 0] * b[3 * 0 + j]
                + a[3 * i + 1] * b[3 * 1 + j]
                + a[3 * i + 2] * b[3 * 2 + j]
            )
    return out


def _mat3_det(m: Sequence):
    return (
        m[0] * (m[4] * m[8] - m[5] * m[7])
        - m[1] * (m[3] * m[8] - m[5] * m[6])
        + m[2] * (m[3] * m[7] - m[4] * m[6])
    )


def _mat3_inv(m: Sequence, det):
    inv_det = 1.0 / det
    return [
        (m[4] * m[8] - m[5] * m[7]) * inv_det,
        (m[2] * m[7] - m[1] * m[8]) * inv_det,
        (m[1] * m[5] - m[2] * m[4]) * inv_det,
        (m[5] * m[6] - m[3] * m[8]) * inv_det,
        (m[0] * m[8] - m[2] * m[6]) * inv_det,
        (m[2] * m[3] - m[0] * m[5]) * inv_det,
        (m[3] * m[7] - m[4] * m[6]) * inv_det,
        (m[1] * m[6] - m[0] * m[7]) * inv_det,
        (m[0] * m[4] - m[1] * m[3]) * inv_det,
    ]


def _mat3_T(m: Sequence):
    return [m[0], m[3], m[6], m[1], m[4], m[7], m[2], m[5], m[8]]


def _mat2_mul(a, b):
    return [
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
    ]


def _mat2_det(m):
    return m[0] * m[3] - m[1] * m[2]


def _mat2_inv(m, det):
    inv_det = 1.0 / det
    return [m[3] * inv_det, -m[1] * inv_det, -m[2] * inv_det, m[0] * inv_det]


def _mat2_T(m):
    return [m[0], m[2], m[1], m[3]]


# --- the fused kernel ------------------------------------------------------

def _planar_ops(dim):
    if dim == 3:
        return _mat3_mul, _mat3_det, _mat3_inv, _mat3_T
    return _mat2_mul, _mat2_det, _mat2_inv, _mat2_T


def _planar_trace(m, dim):
    return sum(m[i * dim + i] for i in range(dim))


def _planar_polar(f, dim, iters: int = 12):
    """Higham polar iteration R ← ½(R + R⁻ᵀ) on component-plane lists —
    the planar twin of smallmat.polar_rotation (same fixed iteration count,
    so results agree to f32 roundoff)."""
    mul, det_fn, inv_fn, t_fn = _planar_ops(dim)
    r = f
    for _ in range(iters):
        rit = t_fn(inv_fn(r, det_fn(r)))
        r = [0.5 * (r[i] + rit[i]) for i in range(dim * dim)]
    return r


def _planar_cof2(a, b):
    """Symmetrized bilinear 3×3 cofactor form on plane lists:
    cof2(m, m) = 2·cof(m) and cof2(m, d) = Dcof(m)[d].  The planar twin of
    smallmat.cofactor / d_cofactor (2D cof is linear and handled directly)."""
    idx = [0, 1, 2]
    out = []
    for i in range(3):
        p, q = [r for r in idx if r != i]
        for j in range(3):
            r, s = [c for c in idx if c != j]
            sign = 1.0 if (i + j) % 2 == 0 else -1.0
            out.append(
                sign
                * (
                    a[3 * p + r] * b[3 * q + s]
                    + b[3 * p + r] * a[3 * q + s]
                    - a[3 * p + s] * b[3 * q + r]
                    - b[3 * p + s] * a[3 * q + r]
                )
            )
    return out


def _planar_cof(m, dim):
    if dim == 2:
        return [m[3], -m[2], -m[1], m[0]]
    return [0.5 * v for v in _planar_cof2(m, m)]


def _planar_dcof(m, d, dim):
    if dim == 2:
        return [d[3], -d[2], -d[1], d[0]]
    return _planar_cof2(m, d)


def _material_p_dp_chain(f, d_dir, dim, mu, lam, material, want_dp):
    """Planar (P(F), DP(F)[D]) for the material extensions — the
    component-plane twin of ops/element.first_piola / first_piola_dp
    (stvk exact, linear exact, corotated fixed-R linearization,
    stable_neo_hookean exact polynomial).  ``d_dir`` may be None when
    ``want_dp`` is False."""
    d2 = dim * dim
    mul, det_fn, inv_fn, t_fn = _planar_ops(dim)
    eye = [1.0 if i == j else 0.0 for i in range(dim) for j in range(dim)]
    if material.partition(":")[0] == "mooney_rivlin":
        # Planar compressible Mooney–Rivlin — twin of ops/element.py's
        # branches (P with the unclamped log like first_piola; DP with the
        # reference's det ≥ 1e-4 clamp like first_piola_dp).
        from fem_tpu.ops.element import mooney_params

        c1, c2, lam_log = mooney_params(mu, lam, dim, material)
        k_log = 2.0 * c1 + 2.0 * (dim - 1) * c2
        f_t = t_fn(f)
        c = mul(f_t, f)
        i1 = _planar_trace(c, dim)
        fc = mul(f, c)
        det_f = det_fn(f)
        f_inv = inv_fn(f, det_f)
        f_inv_t = t_fn(f_inv)
        log_j = jnp.log(det_f)
        coef_p = lam_log * log_j - k_log
        p = [
            2.0 * c1 * f[i]
            + 2.0 * c2 * (i1 * f[i] - fc[i])
            + coef_p * f_inv_t[i]
            for i in range(d2)
        ]
        if not want_dp:
            return p, None
        fd = sum(f[i] * d_dir[i] for i in range(d2))
        dtf = mul(t_fn(d_dir), f)
        dtf_t = t_fn(dtf)
        dc = [dtf[i] + dtf_t[i] for i in range(d2)]
        dcm = mul(d_dir, c)
        fdc = mul(f, dc)
        inv_term = mul(mul(f_inv_t, t_fn(d_dir)), f_inv_t)
        tr_fid = _planar_trace(mul(f_inv, d_dir), dim)
        log_j_cl = jnp.log(jnp.maximum(det_f, 1e-4))
        coef = k_log - lam_log * log_j_cl
        dp = [
            2.0 * c1 * d_dir[i]
            + 2.0 * c2 * (2.0 * fd * f[i] + i1 * d_dir[i] - dcm[i] - fdc[i])
            + coef * inv_term[i]
            + lam_log * tr_fid * f_inv_t[i]
            for i in range(d2)
        ]
        return p, dp
    if material.partition(":")[0] == "fiber":
        # Planar transversely isotropic fiber reinforcement — twin of
        # ops/element.py's fiber branches: stable-NH base (recursion below)
        # + 2k(I₄−1)·(Fa)aᵀ with exact polynomial DP.  The fiber direction
        # components are static python floats, so the planes stay pure
        # elementwise arithmetic (MXU/VPU-friendly, no gathers).
        from fem_tpu.ops.element import fiber_params

        a, k = fiber_params(mu, dim, material)
        p0, dp0 = _material_p_dp_chain(
            f, d_dir, dim, mu, lam, "stable_neo_hookean", want_dp
        )
        fa = [
            sum(a[j] * f[i * dim + j] for j in range(dim))
            for i in range(dim)
        ]
        i4 = sum(fa_i * fa_i for fa_i in fa)
        coef = 2.0 * k * (i4 - 1.0)
        p = [
            p0[i * dim + j] + coef * fa[i] * a[j]
            for i in range(dim)
            for j in range(dim)
        ]
        if not want_dp:
            return p, None
        da = [
            sum(a[j] * d_dir[i * dim + j] for j in range(dim))
            for i in range(dim)
        ]
        w_dot = sum(fa_i * da_i for fa_i, da_i in zip(fa, da))
        dp = [
            dp0[i * dim + j]
            + 2.0 * k * (2.0 * w_dot * fa[i] + (i4 - 1.0) * da[i]) * a[j]
            for i in range(dim)
            for j in range(dim)
        ]
        return p, dp
    if material == "stable_neo_hookean":
        lam_p = lam + mu
        g = _planar_cof(f, dim)
        s = lam_p * (det_fn(f) - 1.0) - mu
        p = [mu * f[i] + s * g[i] for i in range(d2)]
        if not want_dp:
            return p, None
        dj = sum(g[i] * d_dir[i] for i in range(d2))
        dg = _planar_dcof(f, d_dir, dim)
        dp = [
            mu * d_dir[i] + lam_p * dj * g[i] + s * dg[i] for i in range(d2)
        ]
        return p, dp
    if material == "corotated":
        rot = _planar_polar(f, dim)
        rot_t = t_fn(rot)
        s_tr = _planar_trace(mul(rot_t, f), dim) - float(dim)
        p = [2.0 * mu * (f[i] - rot[i]) + lam * s_tr * rot[i] for i in range(d2)]
        if not want_dp:
            return p, None
        tr_rd = _planar_trace(mul(rot_t, d_dir), dim)
        dp = [2.0 * mu * d_dir[i] + lam * tr_rd * rot[i] for i in range(d2)]
        return p, dp
    if material == "linear":
        f_t = t_fn(f)
        eps = [0.5 * (f[i] + f_t[i]) - eye[i] for i in range(d2)]
        tr_e = _planar_trace(eps, dim)
        p = [2.0 * mu * eps[i] + lam * tr_e * eye[i] for i in range(d2)]
        if not want_dp:
            return p, None
        d_t = t_fn(d_dir)
        tr_d = _planar_trace(d_dir, dim)
        dp = [
            mu * (d_dir[i] + d_t[i]) + lam * tr_d * eye[i] for i in range(d2)
        ]
        return p, dp
    if material == "stvk":
        c = mul(t_fn(f), f)
        g = [0.5 * (c[i] - eye[i]) for i in range(d2)]
        tr_g = _planar_trace(g, dim)
        s = [2.0 * mu * g[i] + lam * tr_g * eye[i] for i in range(d2)]
        p = mul(f, s)
        if not want_dp:
            return p, None
        dtf = mul(t_fn(d_dir), f)
        dtf_t = t_fn(dtf)
        tr_dtf = _planar_trace(dtf, dim)
        ds = [
            mu * (dtf[i] + dtf_t[i]) + lam * tr_dtf * eye[i]
            for i in range(d2)
        ]
        dp = [a + b for a, b in zip(mul(d_dir, s), mul(f, ds))]
        return p, dp
    raise ValueError(f"unknown material {material!r}")


def grad_cols_chain(x, r, dim, mu, lam, material="neo_hookean"):
    """Shared explicit-path gradient chain: H = P(F)·R⁻ᵀ with the
    reference's UNclamped log (solver/explicit.py:23-49 — NaN for inverted
    elements is parity).  Returns h UNscaled; callers apply +V.  Single
    source of truth for the tiled element kernel and the whole-frame
    explicit kernel (ops/pallas_blocked_frame.py).  Material extensions use
    the planar P(F) chains of :func:`_material_p_dp_chain`."""
    d2 = dim * dim
    mul, det_fn, inv_fn, t_fn = _planar_ops(dim)
    f = mul(x, r)  # deformation gradient
    if material != "neo_hookean":
        p, _ = _material_p_dp_chain(f, None, dim, mu, lam, material, False)
        return mul(p, t_fn(r))
    det_f = det_fn(f)
    f_inv_t = t_fn(inv_fn(f, det_f))
    log_j = jnp.log(det_f)  # NaN for inverted elements, as the reference
    p = [
        mu * f[i] + (lam * log_j - mu) * f_inv_t[i] for i in range(d2)
    ]
    return mul(p, t_fn(r))  # P @ R⁻ᵀ


def _grad_cols_kernel(
    x_ref, r_ref, v_ref, out_ref, *, dim, mu, lam, material="neo_hookean"
):
    """One tile: read X, R⁻¹, V planes; write H = V·P(F)·R⁻ᵀ planes."""
    d2 = dim * dim
    x = [x_ref[i : i + 1, :] for i in range(d2)]
    r = [r_ref[i : i + 1, :] for i in range(d2)]
    v = v_ref[0:1, :]
    h = grad_cols_chain(x, r, dim, mu, lam, material)
    for i in range(d2):
        out_ref[i : i + 1, :] = v * h[i]


def _hessian_kernel(x_ref, r_ref, v_ref, out_ref, *, dim, mu, lam):
    """One tile of the implicit system blocks K_e (reference
    solver/implicit.py:131-147 semantics; see ops/element.hessian_blocks)."""
    d2 = dim * dim
    if dim == 3:
        mul, det_fn, inv_fn, t_fn = _mat3_mul, _mat3_det, _mat3_inv, _mat3_T
    else:
        mul, det_fn, inv_fn, t_fn = _mat2_mul, _mat2_det, _mat2_inv, _mat2_T

    x = [x_ref[i : i + 1, :] for i in range(d2)]
    r = [r_ref[i : i + 1, :] for i in range(d2)]
    v = v_ref[0:1, :]

    f = mul(x, r)
    det_f = det_fn(f)
    f_inv = inv_fn(f, det_f)
    f_inv_t = t_fn(f_inv)
    log_j = jnp.log(jnp.maximum(det_f, 1e-4))  # reference clamp implicit.py:131
    term2 = mul(mul(f_inv_t, t_fn(r)), f_inv_t)
    f_inv_r = mul(f_inv, r)
    tr = sum(f_inv_r[i * dim + i] for i in range(dim))
    blk = [
        mu * r[i] + (mu - lam * log_j) * term2[i] + lam * tr * f_inv_t[i]
        for i in range(d2)
    ]
    k = mul(blk, t_fn(r))
    for i in range(d2):
        out_ref[i : i + 1, :] = -v * k[i]


@functools.partial(
    jax.jit, static_argnames=("mu", "s_lambda", "interpret")
)
def hessian_blocks_planar(
    x_planes: jnp.ndarray,
    r_planes: jnp.ndarray,
    v_plane: jnp.ndarray,
    mu: float,
    s_lambda: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused implicit-system blocks in planar layout: returns (d², E_pad)."""
    d2, e_pad = x_planes.shape
    dim = 3 if d2 == 9 else 2
    assert e_pad % TILE_E == 0
    spec = lambda rows: pl.BlockSpec(
        (rows, TILE_E), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_hessian_kernel, dim=dim, mu=mu, lam=s_lambda)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d2, e_pad), x_planes.dtype),
        grid=(e_pad // TILE_E,),
        in_specs=[spec(d2), spec(d2), spec(1)],
        out_specs=spec(d2),
        interpret=interpret,
    )(x_planes, r_planes, v_plane)


def _implicit_force_kernel(x_ref, r_ref, v_ref, out_ref, *, dim, mu, lam):
    """One tile of the implicit RHS force columns (reference
    solver/implicit.py:87-88: λ/2·log det(FᵀF) form, scaled by −V)."""
    d2 = dim * dim
    if dim == 3:
        mul, det_fn, inv_fn, t_fn = _mat3_mul, _mat3_det, _mat3_inv, _mat3_T
    else:
        mul, det_fn, inv_fn, t_fn = _mat2_mul, _mat2_det, _mat2_inv, _mat2_T

    x = [x_ref[i : i + 1, :] for i in range(d2)]
    r = [r_ref[i : i + 1, :] for i in range(d2)]
    v = v_ref[0:1, :]

    f = mul(x, r)
    det_f = det_fn(f)
    f_inv_t = t_fn(inv_fn(f, det_f))
    # log det(FᵀF) = log((det F)²) — finite for inverted elements, matching
    # the reference's implicit-b expression exactly.
    log_gram = jnp.log(det_f * det_f)
    p = [
        mu * f[i] + (lam / 2.0 * log_gram - mu) * f_inv_t[i]
        for i in range(d2)
    ]
    h = mul(p, t_fn(r))
    for i in range(d2):
        out_ref[i : i + 1, :] = -v * h[i]


@functools.partial(
    jax.jit, static_argnames=("mu", "s_lambda", "interpret")
)
def implicit_force_planar(
    x_planes: jnp.ndarray,
    r_planes: jnp.ndarray,
    v_plane: jnp.ndarray,
    mu: float,
    s_lambda: float,
    interpret: bool = False,
) -> jnp.ndarray:
    d2, e_pad = x_planes.shape
    dim = 3 if d2 == 9 else 2
    assert e_pad % TILE_E == 0
    spec = lambda rows: pl.BlockSpec(
        (rows, TILE_E), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _implicit_force_kernel, dim=dim, mu=mu, lam=s_lambda
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d2, e_pad), x_planes.dtype),
        grid=(e_pad // TILE_E,),
        in_specs=[spec(d2), spec(d2), spec(1)],
        out_specs=spec(d2),
        interpret=interpret,
    )(x_planes, r_planes, v_plane)


def k_and_h_chain(x, r, dim, mu, lam, robust=False, material="neo_hookean"):
    """Shared parity-critical element chain: implicit-system blocks K_e
    (reference implicit.py:131-147, logJ clamp) AND rhs force columns
    (implicit.py:87-88, λ/2·log det(FᵀF) form) from edge planes ``x`` and
    ref_inv planes ``r`` (lists of (1, T) component rows).  Returns (k, h)
    UNscaled — callers apply the −V scaling / padding masks.  Single source
    of truth for the fused element kernel and the whole-frame kernel
    (experiments/pallas_frame.py) so the formulas cannot drift.

    ``robust=True`` applies the robust_inversion extension exactly as the
    XLA path does (ops/element.py, smallmat.safe_inv): sign-preserving
    |det| ≥ 1e-6 clamp inside F⁻¹ and gram-det ≥ 1e-8 in the rhs log.

    Material extensions (no reference counterpart): k = DP(F)[R⁻¹]·R⁻ᵀ via
    the planar :func:`_material_p_dp_chain`, h = P(F)·R⁻ᵀ (the implicit rhs
    force for non-NH is −V·P·R⁻ᵀ, see solvers/implicit.py:
    _material_force_columns); ``robust`` is NH-specific and a no-op here."""
    d2 = dim * dim
    mul, det_fn, inv_fn, t_fn = _planar_ops(dim)
    f = mul(x, r)
    if material != "neo_hookean":
        p, dp = _material_p_dp_chain(f, r, dim, mu, lam, material, True)
        r_t = t_fn(r)
        return mul(dp, r_t), mul(p, r_t)
    det_f = det_fn(f)
    if robust:
        sign = jnp.where(det_f < 0, -1.0, 1.0)
        det_inv = sign * jnp.maximum(jnp.abs(det_f), 1e-6)
    else:
        det_inv = det_f
    f_inv = inv_fn(f, det_inv)
    f_inv_t = t_fn(f_inv)
    r_t = t_fn(r)
    log_j = jnp.log(jnp.maximum(det_f, 1e-4))
    term2 = mul(mul(f_inv_t, r_t), f_inv_t)
    f_inv_r = mul(f_inv, r)
    tr = sum(f_inv_r[i * dim + i] for i in range(dim))
    blk = [
        mu * r[i] + (mu - lam * log_j) * term2[i] + lam * tr * f_inv_t[i]
        for i in range(d2)
    ]
    k = mul(blk, r_t)
    gram = det_f * det_f
    if robust:
        gram = jnp.maximum(gram, 1e-8)
    log_gram = jnp.log(gram)
    p = [
        mu * f[i] + (lam / 2.0 * log_gram - mu) * f_inv_t[i]
        for i in range(d2)
    ]
    h = mul(p, r_t)
    return k, h


def _hessian_and_force_kernel(
    x_ref, r_ref, v_ref, k_out, h_out, *, dim, mu, lam, robust=False,
    material="neo_hookean",
):
    """One tile emitting BOTH implicit-system blocks K_e and rhs force
    columns — they share the whole F/F⁻ᵀ/det chain and the X-plane gather.

    Measured end-to-end effect on this backend: ~zero (731 vs 732 steps/s
    flagship, 11.2 vs 10.8 ms 52k-tet solve) — XLA's async dispatch already
    overlapped the two split kernels; the solve's critical path is the CG
    applies' serial dependency.  Kept as the default pallas path anyway:
    one kernel + one gather is simpler and strictly less work."""
    d2 = dim * dim
    x = [x_ref[i : i + 1, :] for i in range(d2)]
    r = [r_ref[i : i + 1, :] for i in range(d2)]
    v = v_ref[0:1, :]
    k, h = k_and_h_chain(x, r, dim, mu, lam, robust, material)
    for i in range(d2):
        k_out[i : i + 1, :] = -v * k[i]
        h_out[i : i + 1, :] = -v * h[i]


@functools.partial(
    jax.jit,
    static_argnames=("mu", "s_lambda", "interpret", "robust", "material"),
)
def hessian_and_force_planar(
    x_planes: jnp.ndarray,
    r_planes: jnp.ndarray,
    v_plane: jnp.ndarray,
    mu: float,
    s_lambda: float,
    interpret: bool = False,
    robust: bool = False,
    material: str = "neo_hookean",
):
    d2, e_pad = x_planes.shape
    dim = 3 if d2 == 9 else 2
    assert e_pad % TILE_E == 0
    spec = lambda rows: pl.BlockSpec(
        (rows, TILE_E), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _hessian_and_force_kernel, dim=dim, mu=mu, lam=s_lambda,
        robust=robust, material=material,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d2, e_pad), x_planes.dtype),
            jax.ShapeDtypeStruct((d2, e_pad), x_planes.dtype),
        ),
        grid=(e_pad // TILE_E,),
        in_specs=[spec(d2), spec(d2), spec(1)],
        out_specs=(spec(d2), spec(d2)),
        interpret=interpret,
    )(x_planes, r_planes, v_plane)


def hessian_and_force_pallas(
    pos: jnp.ndarray,
    element_indices: jnp.ndarray,
    ref_inv: jnp.ndarray,
    volume: jnp.ndarray,
    mu: float,
    s_lambda: float,
    robust: bool = False,
    material: str = "neo_hookean",
):
    """Fused (K blocks, implicit force columns) — one X-plane gather and one
    kernel for what the split variants do in two of each."""
    x_planes, r_planes, v_plane, e, d = _planar_inputs(
        pos, element_indices, ref_inv, volume
    )
    interpret = jax.default_backend() != "tpu"
    k, h = hessian_and_force_planar(
        x_planes, r_planes, v_plane, mu, s_lambda, interpret, robust,
        material,
    )
    return (
        k[:, :e].T.reshape(e, d, d),
        h[:, :e].T.reshape(e, d, d),
    )


def implicit_force_columns_pallas(
    pos: jnp.ndarray,
    element_indices: jnp.ndarray,
    ref_inv: jnp.ndarray,
    volume: jnp.ndarray,
    mu: float,
    s_lambda: float,
) -> jnp.ndarray:
    """Drop-in Pallas variant of
    :func:`fem_tpu.ops.element.implicit_force_columns` (non-robust path)."""
    x_planes, r_planes, v_plane, e, d = _planar_inputs(
        pos, element_indices, ref_inv, volume
    )
    interpret = jax.default_backend() != "tpu"
    h = implicit_force_planar(
        x_planes, r_planes, v_plane, mu, s_lambda, interpret
    )
    return h[:, :e].T.reshape(e, d, d)


def _planar_inputs(pos, element_indices, ref_inv, volume):
    """Shared planar packing: edge matrices + ref_inv + volume, identity-padded."""
    from fem_tpu.ops.assembly import gather_edge_diffs

    e = element_indices.shape[0]
    d = pos.shape[1]
    d2 = d * d
    e_pad = ((e + TILE_E - 1) // TILE_E) * TILE_E
    x_mat = gather_edge_diffs(pos, element_indices)
    eye = jnp.broadcast_to(
        jnp.eye(d, dtype=pos.dtype).reshape(d2, 1), (d2, e_pad - e)
    )
    x_planes = jnp.concatenate([x_mat.reshape(e, d2).T, eye], axis=1)
    r_planes = jnp.concatenate([ref_inv.reshape(e, d2).T, eye], axis=1)
    v_plane = jnp.concatenate(
        [volume.reshape(1, e), jnp.zeros((1, e_pad - e), pos.dtype)], axis=1
    )
    return x_planes, r_planes, v_plane, e, d


def hessian_blocks_pallas(
    pos: jnp.ndarray,
    element_indices: jnp.ndarray,
    ref_inv: jnp.ndarray,
    volume: jnp.ndarray,
    mu: float,
    s_lambda: float,
) -> jnp.ndarray:
    """Drop-in Pallas variant of :func:`fem_tpu.ops.element.hessian_blocks`
    (non-robust path only — the robust det clamp stays on the XLA path)."""
    x_planes, r_planes, v_plane, e, d = _planar_inputs(
        pos, element_indices, ref_inv, volume
    )
    interpret = jax.default_backend() != "tpu"
    k = hessian_blocks_planar(
        x_planes, r_planes, v_plane, mu, s_lambda, interpret
    )
    return k[:, :e].T.reshape(e, d, d)


@functools.partial(
    jax.jit, static_argnames=("mu", "s_lambda", "interpret", "material")
)
def grad_columns_planar(
    x_planes: jnp.ndarray,  # (d², E_pad) edge-matrix components
    r_planes: jnp.ndarray,  # (d², E_pad) ref_inv components
    v_plane: jnp.ndarray,  # (1, E_pad) volumes
    mu: float,
    s_lambda: float,
    interpret: bool = False,
    material: str = "neo_hookean",
) -> jnp.ndarray:
    """Fused gradient columns in planar layout: returns (d², E_pad)."""
    d2, e_pad = x_planes.shape
    dim = 3 if d2 == 9 else 2
    assert e_pad % TILE_E == 0, "pad the element axis to TILE_E"
    grid = (e_pad // TILE_E,)
    spec = lambda rows: pl.BlockSpec(
        (rows, TILE_E), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _grad_cols_kernel, dim=dim, mu=mu, lam=s_lambda, material=material
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d2, e_pad), x_planes.dtype),
        grid=grid,
        in_specs=[spec(d2), spec(d2), spec(1)],
        out_specs=spec(d2),
        interpret=interpret,
    )(x_planes, r_planes, v_plane)


def explicit_grad_columns_pallas(
    pos: jnp.ndarray,
    element_indices: jnp.ndarray,
    ref_inv: jnp.ndarray,
    volume: jnp.ndarray,
    mu: float,
    s_lambda: float,
    material: str = "neo_hookean",
) -> jnp.ndarray:
    """Drop-in replacement for
    :func:`fem_tpu.ops.element.explicit_grad_columns` running the fused
    Pallas kernel (XLA handles the gather + layout shuffles, which fuse into
    neighbouring ops).  Both X and R⁻¹ pad with identity so padded lanes have
    F = I (det 1, finite log); padded volumes are 0 so their output is zero."""
    x_planes, r_planes, v_plane, e, d = _planar_inputs(
        pos, element_indices, ref_inv, volume
    )
    interpret = jax.default_backend() != "tpu"
    h = grad_columns_planar(
        x_planes, r_planes, v_plane, mu, s_lambda, interpret, material
    )
    return h[:, :e].T.reshape(e, d, d)
