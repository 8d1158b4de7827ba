# coding=utf-8
"""Whole-CG-solve Pallas kernel: the implicit solve as ONE device op.

On this dispatch/op-overhead-dominated backend each XLA op costs ~40 µs
regardless of size, so a CG iteration built from ~10 ops is overhead-bound.
This kernel keeps the dense ±1 edge-difference operator S (see
``solvers/implicit.build_edge_matrix``) resident in VMEM and runs the entire
reference-semantics CG loop (x₀ = b, absolute tol 1e-5 on ‖r‖², ≤500
iterations, optional normal-equations mode — solver/implicit.py:311-386)
inside a single ``pallas_call``:

    A·x  = x − dt²·M⁻¹·Sᵀ(K ∘ (S x))      (planar layout: vectors are (d, N))
    Aᵀ·y = y − dt²·Sᵀ(Kᵀ ∘ (S (M⁻¹ y)))

K arrives pre-expanded to (d², E·d) planes (component-planar, lane-repeated ×d
so element e's block aligns with its d edge rows).  Everything lives in VMEM:
S is the big tenant (~13 MB f32 at the spot mesh), vectors are a few KB.

Size gate: E·d·N·4 bytes ≲ 13 MB.  Single chip, d = 2 or 3.

Measured (spot mesh, TPU v5e via relay, honest value-fetch timing): 0.65 ms
per solve at 2 CG iterations — correct (3e-5 of the XLA path) but *not*
faster than the ``operator_mode="mxu"`` XLA formulation (~0.4 ms), because
the per-call K-plane prep (transpose/repeat/pad, ~5 XLA ops) plus the kernel
invocation costs as much as the handful of XLA ops it replaces.  Kept as a
demonstrated, tested alternative; it would win on a backend where the
while_loop's per-iteration op overhead dominates (many-iteration regimes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for S in f32 (leave headroom for vectors/accumulators).
MAX_S_BYTES = 12 * 1024 * 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _cg_kernel(
    s_ref,  # (Ed_pad, N_pad) edge operator
    krep_ref,  # (d², Ed_pad) K planes, lane-repeated ×d
    krep_t_ref,  # (d², Ed_pad) Kᵀ planes, lane-repeated ×d
    b_ref,  # (d_pad, N_pad) rhs, planar
    minv_ref,  # (1, N_pad) 1/mass (0 in padding lanes)
    x_out_ref,  # (d_pad, N_pad)
    it_out_ref,  # (1, 1) int32 in SMEM
    *,
    dim: int,
    dt2: float,
    preconditioned: bool,
    max_iter: int,
    tol: float,
):
    d = dim
    s_mat = s_ref[:]  # (Ed, N)
    minv = minv_ref[0:1, :]  # (1, N)
    b = b_ref[0:d, :]  # (d, N)

    def g_apply(krep, v):  # v: (d, N) -> (d, N)
        # s[c, e·d+j] = component c of edge vector j of element e.
        s = jax.lax.dot_general(
            v, s_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, Ed)
        # t[c', :] = Σ_c K[c'·d+c, :] * s[c, :]
        t = jnp.concatenate(
            [
                sum(
                    krep[cp * d + c : cp * d + c + 1, :] * s[c : c + 1, :]
                    for c in range(d)
                )
                for cp in range(d)
            ],
            axis=0,
        )  # (d, Ed)
        return jax.lax.dot_general(
            t, s_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, N)

    def apply_a(v):
        return v - dt2 * g_apply(krep_ref[:], v) * minv

    def apply_at(v):
        return v - dt2 * g_apply(krep_t_ref[:], v * minv)

    if preconditioned:
        operator = lambda v: apply_at(apply_a(v))
        rhs = apply_at(b)
    else:
        operator = apply_a
        rhs = b

    x0 = b  # reference: x₀ = b (implicit.py:314)
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

    x, _, _, _, it = jax.lax.while_loop(
        cond, body, (x0, r0, r0, delta0, jnp.int32(0))
    )
    x_out_ref[0:d, :] = x
    if d < x_out_ref.shape[0]:
        x_out_ref[d:, :] = jnp.zeros_like(x_out_ref[d:, :])
    it_out_ref[0, 0] = it


def supports_pallas_cg(obj) -> bool:
    if obj.edge_matrix is None or jax.default_backend() != "tpu":
        return False
    ed, n = obj.edge_matrix.shape
    return _round_up(ed, 128) * _round_up(n, 128) * 4 <= MAX_S_BYTES


@functools.partial(
    jax.jit,
    static_argnames=("dim", "dt2", "preconditioned", "max_iter", "tol"),
)
def cg_solve_pallas(
    s_mat: jnp.ndarray,  # (E·d, N)
    k_blocks: jnp.ndarray,  # (E, d, d)
    b: jnp.ndarray,  # (N, d)
    mass: jnp.ndarray,  # (N,)
    *,
    dim: int,
    dt2: float,
    preconditioned: bool,
    max_iter: int = 500,
    tol: float = 1e-5,
):
    """Returns (x (N, d), iterations) — the reference CG solution."""
    d = dim
    ed, n = s_mat.shape
    e = ed // d
    ed_pad = _round_up(ed, 128)
    n_pad = _round_up(n, 128)
    d_pad = 8  # sublane minimum

    s_p = jnp.zeros((ed_pad, n_pad), jnp.float32).at[:ed, :n].set(s_mat)
    # K planes (d², E) -> lane-repeat ×d so lane e·d+j carries K_e.
    kp = k_blocks.reshape(e, d * d).T  # (d², E)
    krep = jnp.repeat(kp, d, axis=1)  # (d², E·d)
    kp_t = jnp.swapaxes(k_blocks, -1, -2).reshape(e, d * d).T
    krep_t = jnp.repeat(kp_t, d, axis=1)
    krep = jnp.zeros((d * d, ed_pad), jnp.float32).at[:, :ed].set(krep)
    krep_t = jnp.zeros((d * d, ed_pad), jnp.float32).at[:, :ed].set(krep_t)

    b_p = jnp.zeros((d_pad, n_pad), jnp.float32).at[:d, :n].set(b.T)
    minv = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(1.0 / mass)

    kernel = functools.partial(
        _cg_kernel,
        dim=d,
        dt2=dt2,
        preconditioned=preconditioned,
        max_iter=max_iter,
        tol=tol,
    )
    x_p, it = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=jax.default_backend() != "tpu",
    )(s_p, krep, krep_t, b_p, minv)
    return x_p[:d, :n].T, it[0, 0]
