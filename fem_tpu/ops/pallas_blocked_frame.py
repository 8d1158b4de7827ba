# coding=utf-8
"""Whole-FRAME fused kernel for the 3D implicit-CG path: ``sim_count``
substeps — element prep (K blocks + force columns), rhs assembly, the
reference CG solve, and implicit advection/collision — as ONE Pallas op.

This is the end state of the op-count reduction ladder measured in
tools/profile_blocked.py: with the whole-solve kernel
(ops/pallas_blocked_cg.py) the flagship substep still spends ~40% of its
time in the XLA ops around the solve (element prep 52 µs, planarize/pack,
advect) — each op costs ~µs-to-tens-of-µs of fixed overhead on this
backend regardless of its work.  Folding the entire substep loop into one
kernel leaves one fixed cost per *frame*.

Everything irregular is again table-dots against the VMEM-resident block
incidence S_b and gather one-hot G_b (see ops/pallas_blocked_cg.py):

  * element edge matrices: X planes = (pos·G_bᵀ)·S_bᵀ, de-interleaved to
    component-planar (d², Eb) via the static selection tensor P_j
    (lane-map matmuls — Mosaic has no strided lane ops);
  * the element chain K_e / force columns: ``k_and_h_chain``
    (ops/pallas_kernels.py) — the same single source of truth as every
    other element backend, so formulas cannot drift;
  * K planes are written to a VMEM scratch once per substep and reused by
    every CG iteration; the CG loop itself is
    ``reference_cg_core`` / ``block_g_apply`` shared with the whole-solve
    kernel;
  * advection/collision (reference solver/implicit.py:407-438, incl. the
    vel_g-not-zeroed-at-the-upper-wall quirk) is elementwise on the
    (d, N) planes with the obstacle loop statically unrolled.

An earlier whole-frame kernel over the *unblocked* element arrays
(experiments/pallas_frame.py) lost 4.8× to one-hot gathers at (E, N) scale; the
block tables are what make this one win.  Eligibility: the fused tables
fit VMEM (ops/pallas_blocked_cg.FUSED_MAX_BYTES), 2D or 3D, CG;
``robust_inversion`` is supported in-kernel via the shared
``k_and_h_chain`` robust flag — selected by ``frame_backend="auto"`` on
TPU via sim.make_frame_fn.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_tpu.ops.pallas_blocked_cg import (
    _dot,
    _round_up,
    block_g_apply,
    reference_cg_core,
)
from fem_tpu.ops.pallas_kernels import k_and_h_chain




def _pad_x_rows(r_rows, dim):
    """Rest edge-matrix rows X_rest = (R⁻¹)⁻¹ for padded element slots:
    padding with ANY fixed matrix must keep the whole chain finite, and the
    explicit chain's UNclamped log(det F) (parity) NaNs unless det F > 0 —
    X_rest gives F = I exactly."""
    from fem_tpu.ops.pallas_kernels import (
        _mat2_det, _mat2_inv, _mat3_det, _mat3_inv,
    )

    if dim == 3:
        return _mat3_inv(r_rows, _mat3_det(r_rows))
    return _mat2_inv(r_rows, _mat2_det(r_rows))


def _frame_kernel(
    s_ref,  # (B, R, Pb) block incidence
    gall_ref,  # (B·Pb, N_pad) flat gather one-hot
    rv_ref,  # (B, d², Eb) ref_inv component planes
    vol_ref,  # (B, 1, Eb) element volumes (0 on padded slots)
    pj_ref,  # (d, R, Eb) edge→element-plane selection (pj[j][e·d+j, e]=1)
    psum_ref,  # (R, Eb) lane-repeat map (Σ_j pjᵀ)
    pos_ref,  # (d_pad, N_pad) planar positions
    vel_ref,  # (d_pad, N_pad)
    velg_ref,  # (d_pad, N_pad)
    minv_ref,  # (1, N_pad) 1/mass, 0 in padding lanes
    cent_ref,  # (O, d) SMEM obstacle centers
    rad_ref,  # (1, O) SMEM obstacle radii
    *rest_refs,  # [pin_ref] + outs (pos, vel, velg, iters, res [, pin])
    #             + scratches (kp, vb, yt [, p_scr]) — see unpack below
    dim: int,
    num_blocks: int,
    pb: int,
    dt: float,
    damping: float,
    g_dir: Tuple[float, ...],
    mu: float,
    lam: float,
    preconditioned: bool,
    sim_count: int,
    max_iter: int,
    tol: float,
    n_obstacles: int,
    robust: bool,
    fast_math: bool,
    material: str,
    plastic_yield: float = 0.0,
    viscous_mu: float = 0.0,
    viscous_tau: float = 1.0,
    eb: int = 0,
):
    plastic = plastic_yield > 0.0
    viscous = viscous_mu > 0.0
    n_state = int(plastic) + int(viscous)
    refs = list(rest_refs)
    state_in = [refs.pop(0) for _ in range(n_state)]  # [pin][, vin]
    pos_out, vel_out, velg_out, iters_out, res_out = refs[:5]
    refs = refs[5:]
    state_out = [refs.pop(0) for _ in range(n_state)]
    kp_scr, vb_scr, yt_scr = refs[:3]
    state_scr = refs[3:]  # [p_scr][, v_scr]
    pin_ref = state_in[0] if plastic else None
    vin_ref = state_in[-1] if viscous else None
    pin_out = state_out[0] if plastic else None
    vin_out = state_out[-1] if viscous else None
    p_scr = state_scr[0] if plastic else None
    v_scr = state_scr[-1] if viscous else None
    d = dim
    d2 = d * d
    n_pad = pos_ref.shape[1]
    s_pad = iters_out.shape[1]
    minv = minv_ref[0:1, :]
    dt2 = dt * dt
    # Static f32 damping factor (matches the op-composed path's
    # jnp.exp(-dt*damping) up to exp-implementation ulps).
    import numpy as _np

    decay = float(_np.float32(_np.exp(_np.float32(-dt * damping))))

    def eff_r_rows(b, rv, scr):
        """Effective rest-edge-inverse rows for block ``b``: the static
        ``rv`` planes composed with an in-VMEM internal inverse
        (R⁻¹·F_i⁻¹, plane matmul — ops/inelastic.py semantics)."""
        if scr is None:
            return [rv[i : i + 1, :] for i in range(d2)]
        pb_pl = scr[0:d2, pl.ds(b * eb, eb)]  # (d², Eb)
        rows = []
        for i in range(d):
            for j in range(d):
                acc = None
                for k in range(d):
                    term = rv[i * d + k : i * d + k + 1, :] * (
                        pb_pl[k * d + j : k * d + j + 1, :]
                    )
                    acc = term if acc is None else acc + term
                rows.append(acc)
        return rows

    def prep(pos):
        """Fill kp_scr with this substep's K planes; return assembled
        force f (d, N)."""
        vb_scr[0:d, :] = _dot(pos, gall_ref[:, :], (((1,), (1,))))

        def body(b, carry):
            s = s_ref[b]
            xb = vb_scr[0:d, pl.ds(b * pb, pb)]
            st = _dot(xb, s, (((1,), (1,))))  # (d, R)
            v = vol_ref[b][0:1, :]  # (1, Eb)
            # Padded element slots have zero S rows → X = 0 → det F = 0 →
            # NaN through the chain even at volume 0.  Substitute the rest
            # edge matrix (F = I; the −V scaling zeroes the result exactly)
            # — the op-composed path replicates element 0's geometry the
            # same way (ops/blocking.py Blocking docstring).
            pad = (v == 0.0).astype(jnp.float32)  # (1, Eb)
            rv = rv_ref[b]  # (d², Eb)
            r_rows = eff_r_rows(b, rv, p_scr)
            xp = _pad_x_rows(r_rows, d)
            x_rows = [None] * d2
            for j in range(d):
                xj = _dot(st, pj_ref[j, :, :], (((1,), (0,))))  # (d, Eb)
                for i in range(d):
                    x_rows[i * d + j] = (
                        xj[i : i + 1, :] + pad * xp[i * d + j]
                    )
            k, h = k_and_h_chain(x_rows, r_rows, d, mu, lam, robust, material)
            if viscous:
                # Generalized-Maxwell branch: a second material layer on
                # the branch rest inverse R⁻¹·F_v⁻¹ — stable-NH (λ = 0),
                # inversion-finite so the shared pad-substituted X (F = I
                # w.r.t. the BASE layer only) stays NaN-free; volume 0
                # zeroes pad contributions exactly, as for the base.
                rb = eff_r_rows(b, rv, v_scr)
                k2, h2 = k_and_h_chain(
                    x_rows, rb, d, viscous_mu, 0.0, robust,
                    "stable_neo_hookean",
                )
                k = [k[c] + k2[c] for c in range(d2)]
                h = [h[c] + h2[c] for c in range(d2)]
            krows = jnp.concatenate(
                [-v * k[i] for i in range(d2)], axis=0
            )  # (d², Eb)
            kp_scr[b] = _dot(krows, psum_ref[:, :], (((1,), (1,))))  # (d², R)
            tc = None
            for j in range(d):
                hj = jnp.concatenate(
                    [-v * h[c * d + j] for c in range(d)], axis=0
                )  # (d, Eb)
                term = _dot(hj, pj_ref[j, :, :], (((1,), (1,))))  # (d, R)
                tc = term if tc is None else tc + term
            yt_scr[0:d, pl.ds(b * pb, pb)] = _dot(
                tc, s, (((1,), (0,)))
            )  # (d, Pb)
            return carry

        jax.lax.fori_loop(0, num_blocks, body, jnp.int32(0))
        return _dot(yt_scr[0:d, :], gall_ref[:, :], (((1,), (0,))))

    def solve(pos, vel):
        f = prep(pos)
        b_vec = vel + dt * f * minv

        cg_planes = 2 if fast_math else 3

        def apply_a(v):
            gx = block_g_apply(
                kp_scr, s_ref, gall_ref, vb_scr, yt_scr, v, False, d,
                num_blocks, pb, cg_planes,
            )
            return v - dt2 * gx * minv

        def apply_at(v):
            gz = block_g_apply(
                kp_scr, s_ref, gall_ref, vb_scr, yt_scr, v * minv, True, d,
                num_blocks, pb, cg_planes,
            )
            return v - dt2 * gz

        if preconditioned:
            operator = lambda v: apply_at(apply_a(v))
            rhs = apply_at(b_vec)
        else:
            operator = apply_a
            rhs = b_vec
        # reference: x₀ = b (implicit.py:314)
        return reference_cg_core(operator, rhs, b_vec, max_iter, tol)

    def advect(pos, vel, velg):
        """Reference implicit advection (solver/implicit.py:407-438)."""
        grow = jnp.concatenate(
            [
                jnp.full((1, n_pad), 9.8 * g_dir[i] * dt, jnp.float32)
                for i in range(d)
            ],
            axis=0,
        )
        velg = (velg + grow) * decay
        vel = vel * decay
        v = vel + velg

        lower = (pos < 0.0) & (v < 0.0)
        vel = jnp.where(lower, 0.0, vel)
        velg = jnp.where(lower, 0.0, velg)
        v = jnp.where(lower, 0.0, v)

        upper = (pos > 1.0) & (v > 0.0)
        vel = jnp.where(upper, 0.0, vel)
        # Reference deliberately does NOT zero vel_g here (implicit.py:422).
        v = jnp.where(upper, 0.0, v)

        for o in range(n_obstacles):
            radius = rad_ref[0, o]
            c_col = jnp.concatenate(
                [
                    jnp.full((1, n_pad), cent_ref[o, i], jnp.float32)
                    for i in range(d)
                ],
                axis=0,
            )
            disp = pos - c_col
            dist_sq = jnp.sum(disp * disp, axis=0, keepdims=True)  # (1, N)
            inside = dist_sq < radius * radius
            toward = jnp.sum(v * (-disp), axis=0, keepdims=True) > 0.0
            hit = inside & toward & (radius > 0.0)
            denom = jnp.maximum(dist_sq, 1e-30)

            def proj(u):
                return (
                    jnp.sum(u * disp, axis=0, keepdims=True) / denom
                ) * disp

            v = jnp.where(hit, v - proj(v), v)
            vel = jnp.where(hit, vel - proj(vel), vel)
            velg = jnp.where(hit, velg - proj(velg), velg)

        return pos + v * dt, vel, velg

    def internal_update(pos):
        """In-kernel internal-variable update (ops/inelastic semantics on
        component planes): F from the END-of-substep positions against the
        ORIGINAL rest state, then per state set — trial strain F·F_i⁻¹,
        radial return / Maxwell relaxation in principal Hencky space
        (Jacobi ``sym_eigh_core`` — pure plane arithmetic,
        Mosaic-lowerable), F_i⁻¹ ← F⁻¹·F_new.  Writes the state scratches
        in place."""
        from fem_tpu.ops.inelastic import (
            _p_adjugate, _p_det, _p_matmul, _p_plastic_return,
            _p_viscous_relax,
        )

        vb_scr[0:d, :] = _dot(pos, gall_ref[:, :], (((1,), (1,))))

        def body(b, carry):
            s = s_ref[b]
            xb = vb_scr[0:d, pl.ds(b * pb, pb)]
            st = _dot(xb, s, (((1,), (1,))))  # (d, R)
            v = vol_ref[b][0:1, :]
            pad = (v == 0.0).astype(jnp.float32)
            rv = rv_ref[b]
            r_rows = [rv[i : i + 1, :] for i in range(d2)]  # ORIGINAL rest
            xp = _pad_x_rows(r_rows, d)
            x_rows = [None] * d2
            for j in range(d):
                xj = _dot(st, pj_ref[j, :, :], (((1,), (0,))))
                for i in range(d):
                    x_rows[i * d + j] = (
                        xj[i : i + 1, :] + pad * xp[i * d + j]
                    )
            f_rows = _p_matmul(x_rows, r_rows, d)  # F = X·R⁻¹
            det = _p_det(f_rows, d)
            ok = det > 1e-9
            eye = [
                1.0 if (c // d) == (c % d) else 0.0 for c in range(d2)
            ]
            f_safe = [jnp.where(ok, f_rows[c], eye[c]) for c in range(d2)]
            f_inv_det = _p_det(f_safe, d)
            adjf = _p_adjugate(f_safe, d)
            f_inv = [adjf[c] / f_inv_det for c in range(d2)]
            if plastic:
                p_b = p_scr[0:d2, pl.ds(b * eb, eb)]
                p_rows = [p_b[c : c + 1, :] for c in range(d2)]
                fe = _p_matmul(f_rows, p_rows, d)
                fe_new, yielded = _p_plastic_return(fe, plastic_yield, d)
                fp_new = _p_matmul(f_inv, fe_new, d)
                upd = ok & yielded
                p_scr[0:d2, pl.ds(b * eb, eb)] = jnp.concatenate(
                    [
                        jnp.where(upd, fp_new[c], p_rows[c])
                        for c in range(d2)
                    ],
                    axis=0,
                )
            if viscous:
                v_b = v_scr[0:d2, pl.ds(b * eb, eb)]
                v_rows = [v_b[c : c + 1, :] for c in range(d2)]
                fbe = _p_matmul(f_rows, v_rows, d)
                fbe_new = _p_viscous_relax(fbe, dt, viscous_tau, d)
                fv_new = _p_matmul(f_inv, fbe_new, d)
                v_scr[0:d2, pl.ds(b * eb, eb)] = jnp.concatenate(
                    [
                        jnp.where(ok, fv_new[c], v_rows[c])
                        for c in range(d2)
                    ],
                    axis=0,
                )
            return carry

        jax.lax.fori_loop(0, num_blocks, body, jnp.int32(0))

    def substep(s, carry):
        pos, vel, velg, itv, resv = carry
        x, it, delta = solve(pos, vel)
        pos, vel, velg = advect(pos, x, velg)
        if n_state:
            internal_update(pos)
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1) == s
        ).astype(jnp.float32)
        itv = itv + it.astype(jnp.float32) * mask
        resv = resv + delta * mask
        return pos, vel, velg, itv, resv

    if plastic:
        p_scr[:, :] = pin_ref[:, :]
    if viscous:
        v_scr[:, :] = vin_ref[:, :]
    zeros_s = jnp.zeros((1, s_pad), jnp.float32)
    pos, vel, velg, itv, resv = jax.lax.fori_loop(
        0,
        sim_count,
        substep,
        (
            pos_ref[0:d, :],
            vel_ref[0:d, :],
            velg_ref[0:d, :],
            zeros_s,
            zeros_s,
        ),
    )
    for ref, val in ((pos_out, pos), (vel_out, vel), (velg_out, velg)):
        ref[0:d, :] = val
        if d < ref.shape[0]:
            ref[d:, :] = jnp.zeros_like(ref[d:, :])
    iters_out[0:1, :] = itv
    res_out[0:1, :] = resv
    if plastic:
        pin_out[:, :] = p_scr[:, :]
    if viscous:
        vin_out[:, :] = v_scr[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "dim", "dt", "damping", "g_dir", "mu", "s_lambda",
        "preconditioned", "sim_count", "max_iter", "tol", "robust",
        "fast_math", "material", "plastic_yield", "viscous_mu", "viscous_tau",
    ),
)
def fused_blocked_frame(
    blocking,  # ops.blocking.Blocking with fused tables
    pos: jnp.ndarray,  # (N, d)
    vel: jnp.ndarray,  # (N, d)
    vel_g: jnp.ndarray,  # (N, d)
    mass: jnp.ndarray,  # (N,)
    centers: jnp.ndarray,  # (O, d) obstacle centers
    radii: jnp.ndarray,  # (O,)
    *,
    dim: int,
    dt: float,
    damping: float,
    g_dir: Tuple[float, ...],
    mu: float,
    s_lambda: float,
    preconditioned: bool,
    sim_count: int,
    max_iter: int = 500,
    tol: float = 1e-5,
    robust: bool = False,
    fast_math: bool = False,
    material: str = "neo_hookean",
    plastic_inv: jnp.ndarray | None = None,
    plastic_yield: float = 0.0,
    viscous_inv: jnp.ndarray | None = None,
    viscous_mu: float = 0.0,
    viscous_tau: float = 1.0,
):
    """One rendered frame (= ``sim_count`` implicit-CG substeps) as one
    device op.  Returns (pos', vel', vel_g', iters (S,), residual (S,))
    — plus the updated (E, d, d) internal inverses (plastic first, then
    viscous) for each enabled inelastic extension: the von-Mises return
    map and the Maxwell relaxation run IN-KERNEL on block-ordered
    component planes, and the Maxwell branch adds a second stable-NH
    material layer to the in-kernel prep (ops/inelastic.py semantics)."""
    d = dim
    d2 = d * d
    n = pos.shape[0]
    b_cnt, eb = blocking.num_blocks, blocking.eb
    r = eb * d
    n_pad = _round_up(n, 128)
    s_pad = _round_up(max(int(sim_count), 1), 128)
    d_pad = 8
    n_obst = int(radii.shape[0])
    plastic = plastic_yield > 0.0
    viscous = viscous_mu > 0.0

    # Static element planes: ref_inv components + volumes in block order.
    rv = (
        blocking.ref_inv.reshape(b_cnt, eb, d2).transpose(0, 2, 1)
    )  # (B, d², Eb)
    vol = blocking.volume.reshape(b_cnt, 1, eb)
    # Edge→plane selection tensors (static iota maps).
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, eb), 0)
    ee = jax.lax.broadcasted_iota(jnp.int32, (r, eb), 1)
    pj = jnp.stack(
        [(rr == ee * d + j).astype(jnp.bfloat16) for j in range(d)], axis=0
    )  # (d, R, Eb) — bf16 one-hot, consumed by the exact split-dot
    psum = (rr // d == ee).astype(jnp.bfloat16)  # (R, Eb)

    def planar(a):
        return jnp.zeros((d_pad, n_pad), jnp.float32).at[:d, :n].set(a.T)

    minv = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(1.0 / mass)

    kernel = functools.partial(
        _frame_kernel,
        dim=d,
        num_blocks=b_cnt,
        pb=blocking.pb,
        dt=dt,
        damping=damping,
        g_dir=tuple(g_dir),
        mu=mu,
        lam=s_lambda,
        preconditioned=preconditioned,
        sim_count=int(sim_count),
        max_iter=max_iter,
        tol=tol,
        n_obstacles=n_obst,
        robust=robust,
        fast_math=fast_math,
        material=material,
        plastic_yield=float(plastic_yield),
        viscous_mu=float(viscous_mu),
        viscous_tau=float(viscous_tau),
        eb=eb,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
    ]
    out_specs = [vspec] * 5
    scratch = [
        pltpu.VMEM((b_cnt, d2, r), jnp.float32),
        pltpu.VMEM((d, b_cnt * blocking.pb), jnp.float32),
        pltpu.VMEM((d, b_cnt * blocking.pb), jnp.float32),
    ]
    inputs = [
        blocking.s_dense, blocking.g_dense, rv, vol, pj, psum,
        planar(pos), planar(vel), planar(vel_g), minv,
        centers.astype(jnp.float32), radii.reshape(1, -1).astype(jnp.float32),
    ]
    in_specs = [vspec] * 10 + [sspec, sspec]
    def to_planes(fi_inv):
        # Internal inverse as (d², B·Eb) block-ordered planes.
        return (
            fi_inv.reshape(-1, d2)[blocking.element_perm]
            .reshape(b_cnt, eb, d2)
            .transpose(2, 0, 1)
            .reshape(d2, b_cnt * eb)
        )

    state_arrays = ([plastic_inv] if plastic else []) + (
        [viscous_inv] if viscous else []
    )
    for fi_inv in state_arrays:
        inputs.append(to_planes(fi_inv))
        in_specs.append(vspec)
        out_shape.append(
            jax.ShapeDtypeStruct((d2, b_cnt * eb), jnp.float32)
        )
        out_specs.append(vspec)
        scratch.append(pltpu.VMEM((d2, b_cnt * eb), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        # The resident tables + transients exceed the default 16 MB scoped
        # VMEM cap; v5e has 128 MB of VMEM per core.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    pos_p, vel_p, velg_p, itv, resv = outs[:5]
    s = int(sim_count)
    ret = (
        pos_p[:d, :n].T,
        vel_p[:d, :n].T,
        velg_p[:d, :n].T,
        itv[0, :s].astype(jnp.int32),
        resv[0, :s],
    )
    for i in range(len(state_arrays)):
        fi_new = (
            outs[5 + i]
            .reshape(d2, b_cnt, eb)
            .transpose(1, 2, 0)
            .reshape(b_cnt * eb, d2)[blocking.element_slot]
            .reshape(-1, d, d)
        )
        ret = ret + (fi_new,)
    return ret


# ---------------------------------------------------------------------------
# Explicit / autodiff whole-frame kernel
# ---------------------------------------------------------------------------

def _explicit_frame_kernel(
    s_ref,  # (B, R, Pb)
    gall_ref,  # (B·Pb, N_pad)
    rv_ref,  # (B, d², Eb)
    vol_ref,  # (B, 1, Eb)
    pj_ref,  # (d, R, Eb)
    pos_ref,  # (d_pad, N_pad)
    vel_ref,  # (d_pad, N_pad)
    minv_ref,  # (1, N_pad)
    cent_ref,  # (O, d) SMEM
    rad_ref,  # (1, O) SMEM
    *rest_refs,  # [pin][, vin] + (pos_out, vel_out) + [pin_out][, vin_out]
    #             + (vb_scr, yt_scr) + [p_scr][, v_scr]
    dim: int,
    num_blocks: int,
    pb: int,
    dt: float,
    damping: float,
    g_dir: Tuple[float, ...],
    mu: float,
    lam: float,
    sim_count: int,
    n_obstacles: int,
    material: str,
    plastic_yield: float = 0.0,
    viscous_mu: float = 0.0,
    viscous_tau: float = 1.0,
    eb: int = 0,
):
    """The explicit/autodiff substep loop (reference solver/explicit.py +
    kinematic.py:14-45) as one device op: per substep, assemble the energy
    gradient via the blocked tables, then the kinematic update with sticky
    walls and sequential circle projections.  Inelastic internal state (if
    any) lives in (d², B·Eb) VMEM plane scratches — same in-kernel scheme
    as the implicit whole-frame kernel."""
    from fem_tpu.ops.pallas_kernels import grad_cols_chain

    plastic = plastic_yield > 0.0
    viscous = viscous_mu > 0.0
    n_state = int(plastic) + int(viscous)
    refs = list(rest_refs)
    state_in = [refs.pop(0) for _ in range(n_state)]
    pos_out, vel_out = refs[:2]
    refs = refs[2:]
    state_out = [refs.pop(0) for _ in range(n_state)]
    vb_scr, yt_scr = refs[:2]
    state_scr = refs[2:]
    pin_ref = state_in[0] if plastic else None
    vin_ref = state_in[-1] if viscous else None
    pin_out = state_out[0] if plastic else None
    vin_out = state_out[-1] if viscous else None
    p_scr = state_scr[0] if plastic else None
    v_scr = state_scr[-1] if viscous else None
    d = dim
    d2 = d * d
    n_pad = pos_ref.shape[1]
    minv = minv_ref[0:1, :]
    import numpy as _np

    decay = float(_np.float32(_np.exp(_np.float32(-dt * damping))))

    def eff_r_rows(rv, scr, b):
        if scr is None:
            return [rv[i : i + 1, :] for i in range(d2)]
        pb_pl = scr[0:d2, pl.ds(b * eb, eb)]
        rows = []
        for i in range(d):
            for j in range(d):
                acc = None
                for k in range(d):
                    term = rv[i * d + k : i * d + k + 1, :] * (
                        pb_pl[k * d + j : k * d + j + 1, :]
                    )
                    acc = term if acc is None else acc + term
                rows.append(acc)
        return rows

    def gradient(pos):
        """Assembled +∂U/∂x (d, N) — the reference's particles.force."""
        vb_scr[0:d, :] = _dot(pos, gall_ref[:, :], (((1,), (1,))))

        def body(b, carry):
            s = s_ref[b]
            xb = vb_scr[0:d, pl.ds(b * pb, pb)]
            st = _dot(xb, s, (((1,), (1,))))  # (d, R)
            v = vol_ref[b][0:1, :]
            pad = (v == 0.0).astype(jnp.float32)
            rv = rv_ref[b]
            r_rows = eff_r_rows(rv, p_scr, b)
            xp = _pad_x_rows(r_rows, d)
            x_rows = [None] * d2
            for j in range(d):
                xj = _dot(st, pj_ref[j, :, :], (((1,), (0,))))
                for i in range(d):
                    x_rows[i * d + j] = (
                        xj[i : i + 1, :] + pad * xp[i * d + j]
                    )
            h = grad_cols_chain(x_rows, r_rows, d, mu, lam, material)
            if viscous:
                rb = eff_r_rows(rv, v_scr, b)
                h2 = grad_cols_chain(
                    x_rows, rb, d, viscous_mu, 0.0, "stable_neo_hookean"
                )
                h = [h[c] + h2[c] for c in range(d2)]
            tc = None
            for j in range(d):
                hj = jnp.concatenate(
                    [v * h[c * d + j] for c in range(d)], axis=0
                )
                term = _dot(hj, pj_ref[j, :, :], (((1,), (1,))))
                tc = term if tc is None else tc + term
            yt_scr[0:d, pl.ds(b * pb, pb)] = _dot(tc, s, (((1,), (0,))))
            return carry

        jax.lax.fori_loop(0, num_blocks, body, jnp.int32(0))
        return _dot(yt_scr[0:d, :], gall_ref[:, :], (((1,), (0,))))

    def internal_update(pos):
        """Same in-kernel internal-variable update as the implicit kernel
        (plane return map / Maxwell relaxation; ops/inelastic semantics)."""
        from fem_tpu.ops.inelastic import (
            _p_adjugate, _p_det, _p_matmul, _p_plastic_return,
            _p_viscous_relax,
        )

        vb_scr[0:d, :] = _dot(pos, gall_ref[:, :], (((1,), (1,))))

        def body(b, carry):
            s = s_ref[b]
            xb = vb_scr[0:d, pl.ds(b * pb, pb)]
            st = _dot(xb, s, (((1,), (1,))))
            v = vol_ref[b][0:1, :]
            pad = (v == 0.0).astype(jnp.float32)
            rv = rv_ref[b]
            r_rows = [rv[i : i + 1, :] for i in range(d2)]
            xp = _pad_x_rows(r_rows, d)
            x_rows = [None] * d2
            for j in range(d):
                xj = _dot(st, pj_ref[j, :, :], (((1,), (0,))))
                for i in range(d):
                    x_rows[i * d + j] = (
                        xj[i : i + 1, :] + pad * xp[i * d + j]
                    )
            f_rows = _p_matmul(x_rows, r_rows, d)
            det = _p_det(f_rows, d)
            ok = det > 1e-9
            eye = [1.0 if (c // d) == (c % d) else 0.0 for c in range(d2)]
            f_safe = [jnp.where(ok, f_rows[c], eye[c]) for c in range(d2)]
            f_inv_det = _p_det(f_safe, d)
            adjf = _p_adjugate(f_safe, d)
            f_inv = [adjf[c] / f_inv_det for c in range(d2)]
            if plastic:
                p_b = p_scr[0:d2, pl.ds(b * eb, eb)]
                p_rows = [p_b[c : c + 1, :] for c in range(d2)]
                fe = _p_matmul(f_rows, p_rows, d)
                fe_new, yielded = _p_plastic_return(fe, plastic_yield, d)
                fp_new = _p_matmul(f_inv, fe_new, d)
                upd = ok & yielded
                p_scr[0:d2, pl.ds(b * eb, eb)] = jnp.concatenate(
                    [
                        jnp.where(upd, fp_new[c], p_rows[c])
                        for c in range(d2)
                    ],
                    axis=0,
                )
            if viscous:
                v_b = v_scr[0:d2, pl.ds(b * eb, eb)]
                v_rows = [v_b[c : c + 1, :] for c in range(d2)]
                fbe = _p_matmul(f_rows, v_rows, d)
                fbe_new = _p_viscous_relax(fbe, dt, viscous_tau, d)
                fv_new = _p_matmul(f_inv, fbe_new, d)
                v_scr[0:d2, pl.ds(b * eb, eb)] = jnp.concatenate(
                    [
                        jnp.where(ok, fv_new[c], v_rows[c])
                        for c in range(d2)
                    ],
                    axis=0,
                )
            return carry

        jax.lax.fori_loop(0, num_blocks, body, jnp.int32(0))

    def kinematic(pos, vel, grad):
        """Reference kinematic.py:14-45 on (d, N) planes."""
        grow = jnp.concatenate(
            [
                jnp.full((1, n_pad), 9.8 * g_dir[i], jnp.float32)
                for i in range(d)
            ],
            axis=0,
        )
        vel = vel + (grow - grad * minv) * dt
        vel = vel * decay
        vel = jnp.where((pos < 0.0) & (vel < 0.0), 0.0, vel)
        vel = jnp.where((pos > 1.0) & (vel > 0.0), 0.0, vel)
        for o in range(n_obstacles):
            radius = rad_ref[0, o]
            c_col = jnp.concatenate(
                [
                    jnp.full((1, n_pad), cent_ref[o, i], jnp.float32)
                    for i in range(d)
                ],
                axis=0,
            )
            disp = pos - c_col
            dist_sq = jnp.sum(disp * disp, axis=0, keepdims=True)
            inside = dist_sq < radius * radius
            toward = jnp.sum(vel * (-disp), axis=0, keepdims=True) > 0.0
            hit = inside & toward & (radius > 0.0)
            coeff = jnp.sum(vel * disp, axis=0, keepdims=True) / jnp.maximum(
                dist_sq, 1e-30
            )
            vel = jnp.where(hit, vel - coeff * disp, vel)
        return pos + vel * dt, vel

    def substep(s, carry):
        pos, vel = carry
        grad = gradient(pos)
        pos, vel = kinematic(pos, vel, grad)
        if n_state:
            internal_update(pos)
        return pos, vel

    if plastic:
        p_scr[:, :] = pin_ref[:, :]
    if viscous:
        v_scr[:, :] = vin_ref[:, :]
    pos, vel = jax.lax.fori_loop(
        0, sim_count, substep, (pos_ref[0:d, :], vel_ref[0:d, :])
    )
    for ref, val in ((pos_out, pos), (vel_out, vel)):
        ref[0:d, :] = val
        if d < ref.shape[0]:
            ref[d:, :] = jnp.zeros_like(ref[d:, :])
    if plastic:
        pin_out[:, :] = p_scr[:, :]
    if viscous:
        vin_out[:, :] = v_scr[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "dim", "dt", "damping", "g_dir", "mu", "s_lambda", "sim_count",
        "material", "plastic_yield", "viscous_mu", "viscous_tau",
    ),
)
def fused_explicit_frame(
    blocking,
    pos: jnp.ndarray,  # (N, d)
    vel: jnp.ndarray,  # (N, d)
    mass: jnp.ndarray,  # (N,)
    centers: jnp.ndarray,  # (O, d)
    radii: jnp.ndarray,  # (O,)
    *,
    dim: int,
    dt: float,
    damping: float,
    g_dir: Tuple[float, ...],
    mu: float,
    s_lambda: float,
    sim_count: int,
    material: str = "neo_hookean",
    plastic_inv: jnp.ndarray | None = None,
    plastic_yield: float = 0.0,
    viscous_inv: jnp.ndarray | None = None,
    viscous_mu: float = 0.0,
    viscous_tau: float = 1.0,
):
    """One explicit/autodiff rendered frame as one device op.
    Returns (pos', vel') — plus the updated (E, d, d) internal inverses
    (plastic first, then viscous) for each enabled inelastic extension
    (in-kernel plane return map / relaxation, as in the implicit
    whole-frame kernel)."""
    d = dim
    d2 = d * d
    n = pos.shape[0]
    b_cnt, eb = blocking.num_blocks, blocking.eb
    r = eb * d
    n_pad = _round_up(n, 128)
    d_pad = 8
    n_obst = int(radii.shape[0])
    plastic = plastic_yield > 0.0
    viscous = viscous_mu > 0.0

    rv = blocking.ref_inv.reshape(b_cnt, eb, d2).transpose(0, 2, 1)
    vol = blocking.volume.reshape(b_cnt, 1, eb)
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, eb), 0)
    ee = jax.lax.broadcasted_iota(jnp.int32, (r, eb), 1)
    pj = jnp.stack(
        [(rr == ee * d + j).astype(jnp.bfloat16) for j in range(d)], axis=0
    )

    def planar(a):
        return jnp.zeros((d_pad, n_pad), jnp.float32).at[:d, :n].set(a.T)

    minv = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(1.0 / mass)

    kernel = functools.partial(
        _explicit_frame_kernel,
        dim=d,
        num_blocks=b_cnt,
        pb=blocking.pb,
        dt=dt,
        damping=damping,
        g_dir=tuple(g_dir),
        mu=mu,
        lam=s_lambda,
        sim_count=int(sim_count),
        n_obstacles=n_obst,
        material=material,
        plastic_yield=float(plastic_yield),
        viscous_mu=float(viscous_mu),
        viscous_tau=float(viscous_tau),
        eb=eb,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
    ]
    out_specs = [vspec, vspec]
    scratch = [
        pltpu.VMEM((d, b_cnt * blocking.pb), jnp.float32),
        pltpu.VMEM((d, b_cnt * blocking.pb), jnp.float32),
    ]
    inputs = [
        blocking.s_dense, blocking.g_dense, rv, vol, pj,
        planar(pos), planar(vel), minv,
        centers.astype(jnp.float32), radii.reshape(1, -1).astype(jnp.float32),
    ]
    in_specs = [vspec] * 8 + [sspec, sspec]

    def to_planes(fi_inv):
        return (
            fi_inv.reshape(-1, d2)[blocking.element_perm]
            .reshape(b_cnt, eb, d2)
            .transpose(2, 0, 1)
            .reshape(d2, b_cnt * eb)
        )

    state_arrays = ([plastic_inv] if plastic else []) + (
        [viscous_inv] if viscous else []
    )
    for fi_inv in state_arrays:
        inputs.append(to_planes(fi_inv))
        in_specs.append(vspec)
        out_shape.append(jax.ShapeDtypeStruct((d2, b_cnt * eb), jnp.float32))
        out_specs.append(vspec)
        scratch.append(pltpu.VMEM((d2, b_cnt * eb), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)
    pos_p, vel_p = outs[:2]
    ret = (pos_p[:d, :n].T, vel_p[:d, :n].T)
    for i in range(len(state_arrays)):
        fi_new = (
            outs[2 + i]
            .reshape(d2, b_cnt, eb)
            .transpose(1, 2, 0)
            .reshape(b_cnt * eb, d2)[blocking.element_slot]
            .reshape(-1, d, d)
        )
        ret = ret + (fi_new,)
    return ret
