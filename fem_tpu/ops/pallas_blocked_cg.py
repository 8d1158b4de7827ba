# coding=utf-8
"""Whole-CG-solve Pallas kernel over the block partition: ONE device op for
the implicit solve, eligible at flagship-scale meshes.

Motivation (measured, tools/profile_blocked.py on the 4,068-tet flagship):
each CG iteration through the op-composed blocked path costs ~110 µs, of
which the useful arithmetic is microseconds — the rest is per-XLA-op
overhead on this relay backend (gather 3 µs, Pallas matvec 26 µs, segment
-sum 20 µs, × 2 applies per preconditioned iteration, + dots/axpys).  The
earlier dense-S whole-solve kernel (ops/pallas_cg.py) could not hold the
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
loop is python-unrolled (B is small under the gate), so no dynamic
indexing layouts are needed in-kernel.

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
    return 4 * num_blocks * (r * pb + pb * n_pad)


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
    g = (bp[:, :, None] == np.arange(n_pad, dtype=np.int32)).astype(
        np.float32
    )  # (B, Pb, N_pad)
    return s, g


def _dot(a, b, contract):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), precision=_HP,
        preferred_element_type=jnp.float32,
    )


def _fused_cg_kernel(
    s_ref,  # (B, R, Pb)
    g_ref,  # (B, Pb, N_pad)
    kp_ref,  # (B, d², R) K planes (make_kplane layout)
    tc_ref,  # (B, d, R) force-column planes (blocked_assemble layout)
    vel_ref,  # (d_pad, N_pad) planar velocity
    minv_ref,  # (1, N_pad) 1/mass, 0 in padding lanes
    x_out_ref,  # (d_pad, N_pad)
    it_out_ref,  # (1, 1) int32 SMEM
    res_out_ref,  # (1, 1) f32 SMEM
    *,
    dim: int,
    num_blocks: int,
    dt: float,
    preconditioned: bool,
    max_iter: int,
    tol: float,
):
    d = dim
    minv = minv_ref[0:1, :]
    vel = vel_ref[0:d, :]

    def g_apply(v, transpose_k):
        """Σ_b G_bᵀ·S_bᵀ·(K_b ∘ (S_b·G_b·v)) — ``fori_loop`` over blocks
        with dynamic leading-dim ref loads (an unrolled python loop spills
        128 MB of vregs here; see the register-pressure note in CLAUDE.md)."""

        def body(b, acc):
            g = g_ref[b]  # (Pb, N)
            s = s_ref[b]  # (R, Pb)
            kp = kp_ref[b]  # (d², R)
            vb = _dot(v, g, (((1,), (1,))))  # (d, Pb)
            st = _dot(vb, s, (((1,), (1,))))  # (d, R)
            rows = []
            for i in range(d):
                t_i = None
                for k in range(d):
                    kidx = (k * d + i) if transpose_k else (i * d + k)
                    term = kp[kidx, :] * st[k, :]
                    t_i = term if t_i is None else t_i + term
                rows.append(t_i)
            t = jnp.stack(rows, 0)  # (d, R)
            yt = _dot(t, s, (((1,), (0,))))  # (d, Pb)
            return acc + _dot(yt, g, (((1,), (0,))))  # (d, N)

        return jax.lax.fori_loop(0, num_blocks, body, jnp.zeros_like(v))

    dt2 = dt * dt

    def apply_a(v):
        return v - dt2 * g_apply(v, False) * minv

    def apply_at(v):
        return v - dt2 * g_apply(v * minv, True)

    # rhs assembly b = vel + dt·f/m with f = Σ_b G_bᵀ·S_bᵀ·t_b (the
    # reference force scatter, solver/explicit.py:42-49, in block form).
    def f_body(b, f):
        yt = _dot(tc_ref[b], s_ref[b], (((1,), (0,))))  # (d, Pb)
        return f + _dot(yt, g_ref[b], (((1,), (0,))))

    f = jax.lax.fori_loop(0, num_blocks, f_body, jnp.zeros_like(vel))
    b_vec = vel + dt * f * minv

    if preconditioned:
        operator = lambda v: apply_at(apply_a(v))
        rhs = apply_at(b_vec)
    else:
        operator = apply_a
        rhs = b_vec

    x0 = b_vec  # reference: x₀ = b (implicit.py:314)
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
    x_out_ref[0:d, :] = x
    if d < x_out_ref.shape[0]:
        x_out_ref[d:, :] = jnp.zeros_like(x_out_ref[d:, :])
    it_out_ref[0, 0] = it
    res_out_ref[0, 0] = delta


@functools.partial(
    jax.jit,
    static_argnames=("dim", "dt", "preconditioned", "max_iter", "tol"),
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
):
    """Returns (vel_next (N, d), iterations, residual) — the whole implicit
    velocity solve (rhs assembly + reference CG) as one device op."""
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
        dt=dt,
        preconditioned=preconditioned,
        max_iter=max_iter,
        tol=tol,
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
        interpret=jax.default_backend() != "tpu",
    )(blocking.s_dense, blocking.g_dense, kplane, tcols, vel_p, minv)
    return x_p[:d, :n].T, it[0, 0], res[0, 0]
