# coding=utf-8
"""Whole-CG-solve Pallas kernel over the block partition: ONE device op for
the implicit solve, eligible at flagship-scale meshes.

Motivation (measured, tools/profile_blocked.py on the 4,068-tet flagship):
each CG iteration through the op-composed blocked path costs ~110 µs, of
which the useful arithmetic is microseconds — the rest is per-XLA-op
overhead on this relay backend (gather 3 µs, Pallas matvec 26 µs, segment
-sum 20 µs, × 2 applies per preconditioned iteration, + dots/axpys).  The
earlier dense-S whole-solve kernel (experiments/pallas_cg.py) could not hold the
flagship mesh (S = E·d×N = 49 MB > VMEM gate) and lost its margin to
per-call K-plane prep.

This kernel runs the entire reference-semantics CG (x₀ = b, absolute
tol 1e-5 on ‖r‖², ≤500 iterations, optional normal-equations mode —
reference solver/implicit.py:289-341, 311-386) in a single ``pallas_call``
over the *block-partitioned* operator (ops/blocking.py):

    G(K)·x = Σ_b G_bᵀ·S_bᵀ·(K_b ∘ (S_b·G_b·x))

with S_b (R, Pb) the block incidence and G_b (Pb, N) the one-hot block
gather.  Both are static mesh topology: precomputed dense at build time
(``build_fused_tables``), passed as jit arguments, and VMEM-resident for
the whole solve — loaded once per solve, reused across every CG iteration,
so the irregular gather/scatter that dominates the op-composed path becomes
two small MXU dots per block per apply.  The rhs assembly
``b = vel + dt·f/m`` (f from per-element force columns, reference
solver/explicit.py:42-49 scatter) is folded into the same kernel.

Size gate: S + G tables ≤ ``FUSED_MAX_BYTES`` of VMEM (the split S·G form
is the low-rank factorization of the block rows of the global incidence
matrix — both smaller and cheaper than the fused (R, N) form).  The block
loop is a ``fori_loop`` with dynamic leading-dim ref loads (an unrolled
python loop spilled 128 MB of vregs); the gather/scatter one-hot is kept
FLAT (B·Pb, N) so those two dots issue once per apply, not once per block.

Selected via ``operator_mode="fused"`` (auto on TPU when the tables fit).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Budget for the resident S (B, R, Pb) + G (B, Pb, N_pad) tables.
FUSED_MAX_BYTES = 48 * 1024 * 1024

_HP = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_tables_bytes(num_blocks: int, eb: int, pb: int, d: int, n: int) -> int:
    r = eb * d
    n_pad = _round_up(n, 128)
    # Tables are stored in bf16 (0/±1 are exact; consumed by the exact
    # split-dot), so 2 bytes per entry.
    return 2 * num_blocks * (r * pb + pb * n_pad)


def build_fused_tables(
    plus: np.ndarray, minus: np.ndarray, block_particles: np.ndarray, n: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense per-block incidence S (B, R, Pb) and gather one-hot
    G (B, Pb, N_pad) from the Blocking index arrays (host-side, build time).

    Padded element rows have plus == minus → S row 0; padded particle slots
    keep G row = one-hot of particle 0 (they gather a real value that no S
    row consumes, and scatter an exact 0) — identical semantics to the
    op-composed path (ops/blocking.py:_build_s / blocked_scatter_sum).
    """
    plus = np.asarray(plus)[..., 0]  # (B, R)
    minus = np.asarray(minus)[..., 0]
    bp = np.asarray(block_particles)  # (B, Pb)
    b_cnt, r = plus.shape
    pb = bp.shape[1]
    n_pad = _round_up(n, 128)
    slot = np.arange(pb, dtype=np.int32)
    s = (
        (plus[:, :, None] == slot).astype(np.float32)
        - (minus[:, :, None] == slot).astype(np.float32)
    )  # (B, R, Pb)
    # G is stored FLAT (B·Pb, N_pad) so the per-apply block gather/scatter
    # is ONE MXU dot each instead of one per block — the hot CG loop is
    # dot-issue-bound, not FLOP-bound, on this hardware.
    g = (
        bp.reshape(-1)[:, None] == np.arange(n_pad, dtype=np.int32)
    ).astype(np.float32)  # (B·Pb, N_pad)
    return s, g


def _dot(a, b, contract, planes: int = 3):
    """EXACT f32 dot against a 0/±1 table at ~single-pass weight traffic.

    Every dot in these kernels has a one-hot/±1 incidence table on one
    side, stored in bf16 (0/±1 are exact).  The value side is split into
    three bf16 planes (a = a₁+a₂+a₃ captures all 24 mantissa bits); each
    partial product against an exact-±1 weight is exact in bf16, and the
    f32 accumulation reassembles the exact f32 result.  Measured in round
    2: a HIGHEST (6-pass f32) dot here costs ~2.5× the full substep time
    of the 3-dot split form — the one-hot dots' MXU weight volume is the
    hot loop's entire cost.

    Round 3: the planes are STACKED along the value side's sublane axis
    and issued as ONE dot_general — the table streams through the MXU
    once instead of once per plane (the value side is a handful of
    sublanes, far below the tile granularity, so the wider activation is
    nearly free).  The per-plane partial products are recovered by static
    sublane slices and added in the same (a₁+a₂)+a₃ order as the separate
    dots — bit-identical results (parity drift exactly 0.0 over 100
    flagship frames, measured).  Measured same-session A/B on a quiet
    chip: flagship whole-frame kernel **3,919 → 5,684 settled steps/s
    (+45%)** — the VMEM-table dots in the fused kernels ARE
    stream-bound, and round 2's "3-pass structural floor" falls.  The
    68k-tet op-composed blocked matvec gains only 364 → 321 µs/apply:
    that kernel is MXU-pipeline-fill-bound per block, not stream-bound
    (see BASELINE.md round-3 findings / tools/mfu.py).

    ``planes=2`` is the opt-in ``cg_fast_math`` mode: 16 captured mantissa
    bits (~8e-6 relative error) — used ONLY for CG operator applications
    (never for positions/forces, whose edge differences cancel
    catastrophically).
    """
    bb = b if b.dtype == jnp.bfloat16 else b.astype(jnp.bfloat16)
    a1 = a.astype(jnp.bfloat16)
    r1 = a - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    parts = [a1, a2]
    if planes >= 3:
        parts.append((r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16))
    (ca,), _ = contract
    assert ca == 1, "value side is always (rows, contract)"
    rows = a.shape[0]
    stacked = jnp.concatenate(parts, axis=0)  # (planes·rows, K)
    out = jax.lax.dot_general(
        stacked, bb, (contract, ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = None
    for i in range(len(parts)):
        t = out[i * rows : (i + 1) * rows]
        acc = t if acc is None else acc + t
    return acc


def block_g_apply(
    kp_ref, s_ref, gall_ref, vb_scr, yt_scr, v, transpose_k, dim,
    num_blocks, pb, planes=3,
):
    """Σ_b G_bᵀ·S_bᵀ·(K_b ∘ (S_b·G_b·v)) with VMEM-resident tables —
    shared by the whole-solve and whole-frame kernels (``kp_ref`` may be an
    input or a scratch ref).

    The gather and scatter against the FLAT one-hot ``gall_ref``
    (B·Pb, N) run as ONE MXU dot each; only the block-diagonal incidence
    part loops (``fori_loop`` with dynamic leading-dim ref loads — an
    unrolled python loop spills 128 MB of vregs here; see the register-
    pressure note in CLAUDE.md).  Per-block slices go through the
    (d, B·Pb) scratch refs via 128-aligned dynamic lane slices (Mosaic
    lowers no dynamic_slice on *values*, only on refs)."""
    d = dim
    vb_scr[0:d, :] = _dot(v, gall_ref[:, :], (((1,), (1,))), planes)

    def body(b, carry):
        s = s_ref[b]  # (R, Pb)
        kp = kp_ref[b]  # (d², R)
        vb = vb_scr[0:d, pl.ds(b * pb, pb)]
        st = _dot(vb, s, (((1,), (1,))), planes)  # (d, R)
        rows = []
        for i in range(d):
            t_i = None
            for k in range(d):
                kidx = (k * d + i) if transpose_k else (i * d + k)
                term = kp[kidx, :] * st[k, :]
                t_i = term if t_i is None else t_i + term
            rows.append(t_i)
        t = jnp.stack(rows, 0)  # (d, R)
        yt_scr[0:d, pl.ds(b * pb, pb)] = _dot(
            t, s, (((1,), (0,))), planes
        )
        return carry

    jax.lax.fori_loop(0, num_blocks, body, jnp.int32(0))
    return _dot(
        yt_scr[0:d, :], gall_ref[:, :], (((1,), (0,))), planes
    )  # (d, N)


def reference_cg_core(operator, rhs, x0, max_iter, tol):
    """The reference CG loop (solver/implicit.py:289-341): absolute tol on
    ‖r‖², ≤``max_iter``, no restart branch.  Returns (x, iterations, ‖r‖²).
    Shared by the whole-solve and whole-frame kernels."""
    r0 = rhs - operator(x0)
    delta0 = jnp.sum(r0 * r0)

    def cond(c):
        _, _, _, delta, it = c
        return (it < max_iter) & (delta > tol)

    def body(c):
        x, r, dvec, delta, it = c
        q = operator(dvec)
        alpha = delta / jnp.sum(dvec * q)
        x = x + alpha * dvec
        r = r - alpha * q
        delta_next = jnp.sum(r * r)
        beta = delta_next / delta
        dvec = r + beta * dvec
        return (x, r, dvec, delta_next, it + 1)

    x, _, _, delta, it = jax.lax.while_loop(
        cond, body, (x0, r0, r0, delta0, jnp.int32(0))
    )
    return x, it, delta


def _fused_cg_kernel(
    s_ref,  # (B, R, Pb)
    gall_ref,  # (B·Pb, N_pad) flat gather one-hot
    kp_ref,  # (B, d², R) K planes (make_kplane layout)
    tc_ref,  # (B, d, R) force-column planes (blocked_assemble layout)
    vel_ref,  # (d_pad, N_pad) planar velocity
    minv_ref,  # (1, N_pad) 1/mass, 0 in padding lanes
    x_out_ref,  # (d_pad, N_pad)
    it_out_ref,  # (1, 1) int32 SMEM
    res_out_ref,  # (1, 1) f32 SMEM
    vb_scr,  # scratch (d, B·Pb) gathered operand
    yt_scr,  # scratch (d, B·Pb) block partials
    *,
    dim: int,
    num_blocks: int,
    pb: int,
    dt: float,
    preconditioned: bool,
    max_iter: int,
    tol: float,
    fast_math: bool = False,
):
    d = dim
    minv = minv_ref[0:1, :]
    vel = vel_ref[0:d, :]
    cg_planes = 2 if fast_math else 3

    def g_apply(v, transpose_k):
        return block_g_apply(
            kp_ref, s_ref, gall_ref, vb_scr, yt_scr, v, transpose_k, d,
            num_blocks, pb, cg_planes,
        )

    dt2 = dt * dt

    def apply_a(v):
        return v - dt2 * g_apply(v, False) * minv

    def apply_at(v):
        return v - dt2 * g_apply(v * minv, True)

    # rhs assembly b = vel + dt·f/m with f = Σ_b G_bᵀ·S_bᵀ·t_b (the
    # reference force scatter, solver/explicit.py:42-49, in block form).
    def f_body(b, carry):
        yt_scr[0:d, pl.ds(b * pb, pb)] = _dot(
            tc_ref[b], s_ref[b], (((1,), (0,)))
        )
        return carry

    jax.lax.fori_loop(0, num_blocks, f_body, jnp.int32(0))
    f = _dot(yt_scr[0:d, :], gall_ref[:, :], (((1,), (0,))))
    b_vec = vel + dt * f * minv

    if preconditioned:
        operator = lambda v: apply_at(apply_a(v))
        rhs = apply_at(b_vec)
    else:
        operator = apply_a
        rhs = b_vec

    # reference: x₀ = b (implicit.py:314)
    x, it, delta = reference_cg_core(operator, rhs, b_vec, max_iter, tol)
    x_out_ref[0:d, :] = x
    if d < x_out_ref.shape[0]:
        x_out_ref[d:, :] = jnp.zeros_like(x_out_ref[d:, :])
    it_out_ref[0, 0] = it
    res_out_ref[0, 0] = delta


@functools.partial(
    jax.jit,
    static_argnames=(
        "dim", "dt", "preconditioned", "max_iter", "tol", "fast_math",
    ),
)
def fused_blocked_cg_solve(
    blocking,  # ops.blocking.Blocking with fused tables attached
    k_flat: jnp.ndarray,  # (B·Eb, d, d) block-ordered K blocks
    cols_flat: jnp.ndarray,  # (B·Eb, d, d) block-ordered force columns
    vel: jnp.ndarray,  # (N, d)
    mass: jnp.ndarray,  # (N,)
    *,
    dim: int,
    dt: float,
    preconditioned: bool,
    max_iter: int = 500,
    tol: float = 1e-5,
    fast_math: bool = False,
):
    """Returns (vel_next (N, d), iterations, residual) — the whole implicit
    velocity solve (rhs assembly + reference CG) as one device op.
    ``fast_math`` applies 2-plane split-dots to the CG operator only
    (extension, ~8e-6 relative operator error; rhs/forces stay exact)."""
    from fem_tpu.ops.blocking import make_kplane

    d = dim
    n = vel.shape[0]
    b_cnt, eb = blocking.num_blocks, blocking.eb
    r = eb * d
    n_pad = _round_up(n, 128)
    d_pad = 8

    kplane = make_kplane(blocking, k_flat, d)  # (B, d², R)
    tcols = (
        cols_flat.reshape(b_cnt, eb, d, d)
        .transpose(0, 2, 1, 3)
        .reshape(b_cnt, d, r)
    )
    vel_p = jnp.zeros((d_pad, n_pad), jnp.float32).at[:d, :n].set(vel.T)
    minv = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(1.0 / mass)

    kernel = functools.partial(
        _fused_cg_kernel,
        dim=d,
        num_blocks=b_cnt,
        pb=blocking.pb,
        dt=dt,
        preconditioned=preconditioned,
        max_iter=max_iter,
        tol=tol,
        fast_math=fast_math,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x_p, it, res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[vspec] * 6,
        out_specs=(
            vspec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, b_cnt * blocking.pb), jnp.float32),
            pltpu.VMEM((d, b_cnt * blocking.pb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(blocking.s_dense, blocking.g_dense, kplane, tcols, vel_p, minv)
    return x_p[:d, :n].T, it[0, 0], res[0, 0]
