# coding=utf-8
"""Whole-FRAME fused Pallas kernel: ``sim_count`` implicit-CG substeps as ONE
device op.

The per-op dispatch overhead of this backend (~40 µs/op) dominates the
flagship substep, which is otherwise a few hundred µs of real work.  This
kernel runs the ENTIRE frame loop — per-element Hessian blocks K_e, rhs
b = v + dt·M⁻¹f (reference solver/implicit.py:65-107), the reference-
semantics preconditioned CG (x₀ = b, absolute tol 1e-5, ≤500 iters,
normal-equations mode; implicit.py:311-386), and implicit advection with the
vel_g channel and collision quirks (implicit.py:407-438) — inside a single
``pallas_call`` with everything VMEM-resident.

Gather/scatter without a stored operator: the mesh incidence is applied by
**on-the-fly one-hot matmuls**.  For an element tile, the mask
``M_k[n, e] = (n == idx_k[e])`` is generated from a broadcasted iota and one
int32 compare; then

    gather:   X_j = x · (M_{j+1} − M_0)             (edge vectors, MXU)
    scatter:  f  += t_j · M_{j+1}ᵀ − (Σ_j t_j) · M_0ᵀ

Each mask is exact 0/1, and all dots run at ``Precision.HIGHEST``, so the
matmul gather/scatter is bit-exact f32 — no dense S (the whole-CG kernel in
``pallas_cg.py`` needs E·d·N·4 B of VMEM for S; this needs only the index
planes).  Masks are regenerated per tile per use; at the flagship size that
is ~15 M VPU ops per operator application vs ~0.4 GFLOP of MXU work.

Layout: component-planar everywhere.  State vectors are (8, N_pad) f32
(sublanes 0..d-1 live), element quantities are (d², E_pad) planes exactly as
in ``pallas_kernels.py`` (whose small-matrix formula helpers are reused).
Padded element lanes run the full chain on F = 0 (det 0 → non-finite
intermediates) and are zeroed by an explicit validity mask before any
scatter; padded particle lanes have 1/m = 0 and never move.

Eligibility (``supports_fused_frame``): TPU, implicit CG, reference Hessian,
neo-Hookean, non-robust, unsharded, and the VMEM budget below.  Selected via
``frame_backend="fused"`` (SimConfig extension); parity with the op-composed
path is pinned by tests/test_pallas_frame.py (interpret mode on CPU).

MEASURED RESULT (TPU v5e, flagship 959 particles / 3,759 tets, honest
value-fetch timing): **parity-exact (1e-6 positions after 120 frames) but
4.8× SLOWER than the op-composed path** (66 ms vs 13.7 ms per impact-regime
frame).  Root cause: this Mosaic build lowers **no gather primitive at all**
(``take_along_axis`` on lanes or sublanes, fancy indexing, and ``jnp.take``
all fail — microtested), so the one-hot matmul is the only in-kernel
gather/scatter available, and it does O(N·E) MXU work with M=8 (6% MXU
utilization) × 6-pass f32 where a real gather would do O(E).  First attempts
were worse: a python-unrolled tile loop kept every tile's masks live and
spilled 905 MB of vector registers; the committed version (fori_loop tiles,
one ~0.5 MB mask live at a time, K planes in a VMEM scratch) compiles to a
17 MB→fits footprint and is compute-bound on the mask dots.  Kept as a
tested opt-in and a documented negative result — the design becomes the
right one on a Mosaic with lane gathers (the ops path's XLA gathers are what
it would replace); ``frame_backend="auto"`` therefore resolves to "ops".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_tpu.ops.pallas_kernels import k_and_h_chain

TILE_E = 128  # element lanes per mask tile (256 overflowed scoped VMEM)
_HP = jax.lax.Precision.HIGHEST

# VMEM ceiling for the transient mask set: (d+1) masks of (N_pad, TILE_E) f32
# live at once, plus the persistent planes.  Keep the whole working set well
# under the ~16 MB scoped limit.
MAX_MASK_BYTES = 8 * 1024 * 1024
MAX_PLANE_BYTES = 4 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _frame_kernel(
    pos_ref,  # (8, N_pad)
    vel_ref,
    velg_ref,
    rinv_ref,  # (d², E_pad) ref_inv planes (identity in padding)
    vol_ref,  # (1, E_pad) volumes (0 in padding)
    valid_ref,  # (1, E_pad) 1.0 for real elements, 0.0 padding
    idx_ref,  # (d+1, E_pad) int32 vertex ids (0 in padding)
    minv_ref,  # (1, N_pad) 1/mass (0 in padding)
    pos_out,
    vel_out,
    velg_out,
    iters_out,  # (1, 128) f32: per-substep CG iteration counts
    resid_out,  # (1, 128) f32: per-substep final delta_new
    k_ref,  # (d², E_pad) VMEM scratch: this substep's Hessian planes
    *,
    d: int,
    n_pad: int,
    e_pad: int,
    dt: float,
    sim_count: int,
    mu: float,
    lam: float,
    damping: float,
    g_dir: Tuple[float, ...],
    centers: Tuple[Tuple[float, ...], ...],
    radii: Tuple[float, ...],
    precond: bool,
    max_iter: int,
    tol: float,
):
    d2 = d * d
    n_tiles = e_pad // TILE_E
    dt2 = dt * dt
    minv = minv_ref[0:1, :]  # (1, N_pad)

    def _mask(t, k):
        """One-hot vertex mask M_k (N_pad, TILE_E) of element tile ``t``.
        Masks are ~1 MB of vector registers each; callers generate each mask
        immediately before its dot and let it die — keeping all d+1 live at
        once spilled ~900 MB and ran 4× slower than the op-composed path."""
        iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, TILE_E), 0)
        return (
            iota == idx_ref[k : k + 1, pl.ds(t * TILE_E, TILE_E)]
        ).astype(jnp.float32)

    def gather_edges(x, t):
        """Edge planes of one tile: rows i*d+j = component i of edge j
        (X_j = x·M_{j+1} − x·M_0, one mask live at a time)."""
        moments = []
        for k in range(d + 1):
            m = _mask(t, k)
            moments.append(
                jax.lax.dot_general(
                    x[0:d, :], m, (((1,), (0,)), ((), ())), precision=_HP
                )  # (d, TILE_E)
            )
        return [
            moments[j + 1][i : i + 1, :] - moments[0][i : i + 1, :]
            for i in range(d)
            for j in range(d)
        ]

    def _pad_rows(a):
        """(d, N) → (8, N) with zero rows (Mosaic lacks scatter-add, so the
        accumulator stays full-height and updates are plain adds)."""
        return jnp.concatenate(
            [a, jnp.zeros((8 - d, a.shape[1]), jnp.float32)], axis=0
        )

    def scatter_cols(h, t, acc):
        """acc += Σ_j h_j·M_{j+1}ᵀ − (Σ_j h_j)·M_0ᵀ for one tile's column
        planes h (list of d² rows (1, TILE_E)); one mask live at a time."""
        h_j = [
            jnp.concatenate([h[i * d + j] for i in range(d)], axis=0)
            for j in range(d)
        ]  # each (d, TILE_E)
        h_sum = sum(h_j)
        for k in range(d + 1):
            coeff = -h_sum if k == 0 else h_j[k - 1]
            m = _mask(t, k)
            acc = acc + _pad_rows(
                jax.lax.dot_general(
                    coeff, m, (((1,), (1,)), ((), ())), precision=_HP
                )
            )
        return acc

    def element_pass(pos):
        """One sweep over element tiles: writes the K planes (d², E_pad)
        into the ``k_ref`` scratch and returns the assembled elastic force
        (8, N_pad) for the rhs.  Tiles run under ``lax.fori_loop`` — a python
        unroll kept every tile's masks/intermediates live at once and spilled
        ~900 MB of vector registers."""

        def tile_body(t, f_acc):
            lo = t * TILE_E
            x = gather_edges(pos, t)
            r = [
                rinv_ref[i : i + 1, pl.ds(lo, TILE_E)] for i in range(d2)
            ]
            v = vol_ref[0:1, pl.ds(lo, TILE_E)]
            valid = valid_ref[0:1, pl.ds(lo, TILE_E)]
            # Shared parity-critical chain (single source of truth with the
            # element kernels — ops/pallas_kernels.k_and_h_chain).
            k, h = k_and_h_chain(x, r, d, mu, lam)
            k_ref[:, pl.ds(lo, TILE_E)] = jnp.concatenate(
                [jnp.where(valid > 0, -v * k[i], 0.0) for i in range(d2)],
                axis=0,
            )
            h = [jnp.where(valid > 0, -v * h[i], 0.0) for i in range(d2)]
            return scatter_cols(h, t, f_acc)

        return jax.lax.fori_loop(
            0, n_tiles, tile_body, jnp.zeros((8, n_pad), jnp.float32)
        )

    def g_apply(x, transpose):
        """Assembled element-Laplacian product G(K)·x (or G(Kᵀ)·x) with the
        K planes read from the ``k_ref`` scratch."""

        def tile_body(t, acc):
            lo = t * TILE_E
            s = gather_edges(x, t)  # rows c*d+j = comp c of edge j
            ts = []
            for i in range(d):
                for j in range(d):
                    val = 0.0
                    for c in range(d):
                        kk = (c * d + i) if transpose else (i * d + c)
                        val = val + k_ref[
                            kk : kk + 1, pl.ds(lo, TILE_E)
                        ] * s[c * d + j]
                    ts.append(val)
            return scatter_cols(ts, t, acc)

        return jax.lax.fori_loop(
            0, n_tiles, tile_body, jnp.zeros((8, n_pad), jnp.float32)
        )

    def substep(carry, i):
        pos, vel, velg, iters_row, resid_row = carry
        f_elastic = element_pass(pos)  # also fills k_ref

        b = vel + dt * minv * f_elastic  # (8, N_pad); padded rows stay 0

        def apply_a(v):
            return v - dt2 * minv * g_apply(v, False)

        def apply_at(v):
            return v - dt2 * g_apply(v * minv, True)

        if precond:
            operator = lambda v: apply_at(apply_a(v))
            rhs = apply_at(b)
        else:
            operator = apply_a
            rhs = b

        x0 = b  # reference: x₀ = b (implicit.py:314)
        r0 = rhs - operator(x0)
        delta0 = jnp.sum(r0 * r0)

        def cg_cond(c):
            _, _, _, delta, it = c
            return (it < max_iter) & (delta > tol)

        def cg_body(c):
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
            cg_cond, cg_body, (x0, r0, r0, delta0, jnp.int32(0))
        )
        vel = x  # vel ← x (implicit.py:222-223)

        # --- advect_implicit (implicit.py:407-438), planar ----------------
        # Static columns built from iota arithmetic (pallas kernels may not
        # capture array constants).
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

        def _const_col(values):
            return sum(
                (row_ids == c).astype(jnp.float32) * float(values[c])
                for c in range(d)
            )

        g_col = _const_col(g_dir)
        decay = jnp.exp(jnp.float32(-dt * damping))
        vel = vel * decay
        velg = (velg + g_col * 9.8 * dt) * decay
        v_tot = vel + velg
        lower = (pos < 0.0) & (v_tot < 0.0)
        vel = jnp.where(lower, 0.0, vel)
        velg = jnp.where(lower, 0.0, velg)
        v_tot = jnp.where(lower, 0.0, v_tot)
        upper = (pos > 1.0) & (v_tot > 0.0)
        vel = jnp.where(upper, 0.0, vel)  # NOT velg (implicit.py:422)
        v_tot = jnp.where(upper, 0.0, v_tot)
        for b_i in range(len(radii)):
            if radii[b_i] <= 0.0:  # zero-radius skip (circle_blocks parity)
                continue
            c_col = _const_col(centers[b_i])
            disp = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (8, n_pad), 0) < d,
                pos - c_col, 0.0,
            )
            dist_sq = jnp.sum(disp * disp, axis=0, keepdims=True)
            inside = dist_sq < radii[b_i] * radii[b_i]
            toward = jnp.sum(v_tot * (-disp), axis=0, keepdims=True) > 0.0
            hit = inside & toward
            inv_dd = 1.0 / jnp.maximum(dist_sq, 1e-30)
            for which in range(3):
                arr = (v_tot, vel, velg)[which]
                coeff = jnp.sum(arr * disp, axis=0, keepdims=True) * inv_dd
                arr = jnp.where(hit, arr - coeff * disp, arr)
                if which == 0:
                    v_tot = arr
                elif which == 1:
                    vel = arr
                else:
                    velg = arr
        pos = pos + v_tot * dt

        onehot_i = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == i
        ).astype(jnp.float32)
        iters_row = iters_row + onehot_i * it.astype(jnp.float32)
        resid_row = resid_row + onehot_i * delta
        return (pos, vel, velg, iters_row, resid_row), None

    zero_row = jnp.zeros((1, 128), jnp.float32)
    carry = (pos_ref[:], vel_ref[:], velg_ref[:], zero_row, zero_row)

    def body(i, c):
        c2, _ = substep(c, i)
        return c2

    pos, vel, velg, iters_row, resid_row = jax.lax.fori_loop(
        0, sim_count, body, carry
    )
    pos_out[:] = pos
    vel_out[:] = vel
    velg_out[:] = velg
    iters_out[:] = iters_row
    resid_out[:] = resid_row


def supports_fused_frame(obj, cfg) -> bool:
    """VMEM + semantics eligibility for the fused frame kernel."""
    from fem_tpu.utils.config import CONJUGATE_GRADIENT_METHOD

    if cfg.auto_diff or cfg.use_explicit_method:
        return False
    if cfg.implicit_method != CONJUGATE_GRADIENT_METHOD:
        return False
    if cfg.robust_inversion or cfg.hessian != "reference":
        return False
    if any(o.material != "neo_hookean" for o in cfg.objects):
        return False
    if any(
        getattr(o, "plastic_yield", 0.0) > 0.0
        or getattr(o, "viscous_mu", 0.0) > 0.0
        for o in cfg.objects
    ):
        return False  # inelastic internal variables run op-composed
    if obj.free_mask is not None:  # Dirichlet pins run op-composed
        return False
    if obj.damping_beta != 0.0:  # Rayleigh damping runs op-composed
        return False
    if any(o.type != "sphere" for o in getattr(cfg, "obstacles", ())):
        return False  # SDF obstacle extensions run op-composed
    if cfg.sim_count > 128:
        return False
    d = obj.dim
    n_pad = _round_up(obj.particle_cnt, 128)
    e_pad = _round_up(obj.element_cnt, TILE_E)
    mask_bytes = (d + 1) * n_pad * TILE_E * 4
    plane_bytes = 3 * d * d * e_pad * 4  # rinv + K + transient tile joins
    return mask_bytes <= MAX_MASK_BYTES and plane_bytes <= MAX_PLANE_BYTES


@functools.partial(
    jax.jit,
    static_argnames=(
        "d", "dt", "sim_count", "mu", "lam", "damping", "g_dir",
        "centers", "radii", "precond", "max_iter", "tol", "interpret",
    ),
)
def fused_frame(
    pos_p, vel_p, velg_p, rinv_p, vol_p, valid_p, idx_p, minv_p,
    *, d, dt, sim_count, mu, lam, damping, g_dir, centers, radii,
    precond, max_iter=500, tol=1e-5, interpret=False,
):
    n_pad = pos_p.shape[1]
    e_pad = vol_p.shape[1]
    kernel = functools.partial(
        _frame_kernel,
        d=d, n_pad=n_pad, e_pad=e_pad, dt=dt, sim_count=sim_count,
        mu=mu, lam=lam, damping=damping, g_dir=g_dir, centers=centers,
        radii=radii, precond=precond, max_iter=max_iter, tol=tol,
    )
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 5)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ),
        in_specs=specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((d * d, e_pad), jnp.float32)],
        interpret=interpret,
    )(pos_p, vel_p, velg_p, rinv_p, vol_p, valid_p, idx_p, minv_p)


def make_fused_frame_fn(obj, cfg):
    """Drop-in counterpart of :func:`fem_tpu.sim.make_frame_fn` running the
    whole frame as one fused kernel.  Returns ``frame(state, obstacles)`` →
    ``(state', StepAux)`` with per-substep iteration counts, matching the
    scan-based path's contract."""
    from fem_tpu.sim import StepAux

    d = obj.dim
    d2 = d * d
    n = obj.particle_cnt
    e = obj.element_cnt
    n_pad = _round_up(n, 128)
    e_pad = _round_up(e, TILE_E)

    # Host-side packing (once per frame fn).
    rinv = np.asarray(obj.ref_inv).reshape(e, d2).T  # (d², E)
    eye = np.broadcast_to(
        np.eye(d, dtype=np.float32).reshape(d2, 1), (d2, e_pad - e)
    )
    rinv_p = jnp.asarray(
        np.concatenate([rinv, eye], axis=1).astype(np.float32)
    )
    vol_p = jnp.asarray(
        np.concatenate(
            [np.asarray(obj.volume).reshape(1, e),
             np.zeros((1, e_pad - e), np.float32)], axis=1
        ).astype(np.float32)
    )
    valid_p = jnp.asarray(
        np.concatenate(
            [np.ones((1, e), np.float32), np.zeros((1, e_pad - e), np.float32)],
            axis=1,
        )
    )
    idx = np.asarray(obj.element_indices).T  # (d+1, E)
    idx_p = jnp.asarray(
        np.concatenate(
            [idx, np.zeros((d + 1, e_pad - e), idx.dtype)], axis=1
        ).astype(np.int32)
    )
    minv_p = jnp.asarray(
        np.concatenate(
            [1.0 / np.asarray(obj.mass).reshape(1, n),
             np.zeros((1, n_pad - n), np.float32)], axis=1
        ).astype(np.float32)
    )
    interpret = jax.default_backend() != "tpu"

    # Obstacles become static kernel constants; memoize the device→host
    # fetch AND the jitted pack→kernel→unpack runner per obstacle set so the
    # per-frame call neither syncs nor dispatches the ~15 pack/unpack ops
    # eagerly (they would cost ~0.5 ms/frame on this 40 µs/op backend).  The
    # memo value holds the arrays themselves — keying by id() alone risks
    # CPython id reuse after GC returning stale geometry.
    _runner_memo: dict = {}

    def _build_runner(centers, radii):
        @jax.jit
        def run(pos, vel, velg):
            def pack(arr):
                out = jnp.zeros((8, n_pad), jnp.float32)
                return out.at[:d, :n].set(arr.T)

            pos2, vel2, velg2, iters_row, resid_row = fused_frame(
                pack(pos), pack(vel), pack(velg),
                rinv_p, vol_p, valid_p, idx_p, minv_p,
                d=d, dt=cfg.delta_time, sim_count=cfg.sim_count,
                mu=obj.mu, lam=obj.s_lambda, damping=obj.damping,
                g_dir=tuple(cfg.g_dir), centers=centers, radii=radii,
                precond=cfg.preconditioned == 1, interpret=interpret,
            )
            return (
                pos2[:d, :n].T, vel2[:d, :n].T, velg2[:d, :n].T,
                iters_row[0, : cfg.sim_count].astype(jnp.int32),
                resid_row[0, : cfg.sim_count],
            )

        return run

    def _runner_for(obstacles):
        key = (id(obstacles.centers), id(obstacles.radii))
        if key not in _runner_memo:
            centers = tuple(
                tuple(float(c) for c in row)
                for row in np.asarray(obstacles.centers)
            )
            radii = tuple(float(r) for r in np.asarray(obstacles.radii))
            # Hold the arrays so their ids stay unique while memoized.
            _runner_memo[key] = (
                obstacles.centers, obstacles.radii,
                _build_runner(centers, radii),
            )
        return _runner_memo[key][2]

    def frame(state, obstacles):
        run = _runner_for(obstacles)
        pos, vel, velg, iters, resid = run(state.pos, state.vel, state.vel_g)
        new_state = state.replace(pos=pos, vel=vel, vel_g=velg)
        return new_state, StepAux(
            solver_iterations=iters, solver_residual=resid
        )

    return frame
