# coding=utf-8
"""Block-partitioned MXU operator for the implicit system (large meshes).

The matrix-free graph operator (solvers/implicit.py:graph_block_apply) is
bandwidth-pathological on TPU at large mesh sizes: its gather/scatter moves
(E·(d+1)) rows of d floats — far below the (8, 128) tile granularity — and
measured ~1.7 GB/s effective on a 68k-tet mesh (5.4 ms per apply).  The dense
edge-matrix MXU mode (build_edge_matrix) fixes that but costs O(E·d·N) HBM,
untenable beyond ~16M entries.

This module is the TPU-idiomatic middle: partition elements into **locality
blocks** (Morton-ordered greedy packing) such that each block's elements touch
at most ``Pb`` distinct particles, then the incidence operator restricted to a
block is a small dense ±1 matrix S_b of shape (Eb·d, Pb) — and the element-
Laplacian product G(K)·x = Σ_b S_bᵀ·(K_b ∘ (S_b·x_b)) becomes B batched MXU
matmuls.  S_b is never materialized in HBM: each Pallas grid step rebuilds it
in VMEM from two (Eb·d,) local-slot index vectors via an iota comparison
(3 KB of indices instead of 393 KB of one-hot floats per block), so the HBM
traffic per apply is just the K planes + the block-gathered x.

Measured on TPU v5e (68,508 tets / 12,037 particles): 0.62 ms per operator
apply vs 5.36 ms for the graph operator (8.6×), parity 8e-8.

Semantics are exactly the reference's decoupled-block system (reference
solver/implicit.py:141-194, see ops/element.hessian_blocks); this is a pure
execution-strategy change.  ``operator_mode="auto"`` prefers this operator
for every CG solve (build_object attaches a Blocking to every mesh), both
single-chip and sharded — under ``shard_map`` whole blocks partition across
the device axis and one psum per apply completes the particle-space
reduction (fem_tpu.parallel.sharding).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@struct.dataclass
class Blocking:
    """Element-block partition + block-ordered element arrays.

    The element arrays here are *padded copies* in block order (row b·Eb+e is
    block b's e-th element); padded slots replicate the mesh's element 0 with
    ``volume = 0`` so the shared element kernels produce finite zeros for
    them (an all-zero padded element would put F = 0 → log det = -inf → NaN
    through the force chain even at volume 0).
    """

    block_particles: jnp.ndarray  # (B, Pb) int32 global particle ids, 0-padded
    plus: jnp.ndarray  # (B, Eb·d, 1) int32 local slot receiving +1 per row
    minus: jnp.ndarray  # (B, Eb·d, 1) int32 local slot receiving −1 per row
    element_indices: jnp.ndarray  # (B·Eb, d+1) int32 block-ordered, padded
    ref_inv: jnp.ndarray  # (B·Eb, d, d)
    volume: jnp.ndarray  # (B·Eb,) — 0 on padded slots
    # Global mesh element id of each block-ordered slot (padded slots repeat
    # element 0) — lets DYNAMIC per-element state (e.g. the inelastic
    # internal-variable inverses, ops/inelastic.py) be gathered into block
    # order on device so the blocked operator/prep can consume effective
    # rest-edge inverses that change every substep.
    element_perm: jnp.ndarray = None  # (B·Eb,) int32
    # Inverse of ``element_perm`` restricted to real elements: mesh element
    # id → its (unique non-padded) block slot.  Lets block-ordered
    # per-element results (e.g. :func:`blocked_edge_matrices`) un-permute
    # back to mesh order with one static-index gather.
    element_slot: jnp.ndarray = None  # (E,) int32
    # Dense per-block incidence / gather tables for the whole-solve fused CG
    # kernel (ops/pallas_blocked_cg.py); None when the mesh exceeds its VMEM
    # gate.  Static topology — safe as ordinary pytree leaves.
    s_dense: jnp.ndarray = None  # (B, Eb·d, Pb) f32 or None
    g_dense: jnp.ndarray = None  # (B·Pb, N_pad) f32 flat one-hot or None
    # Per-particle incidence plan over the flat (B·Pb) block slots for
    # gather-based assembly of block partials — TPUs prefer gathers to
    # scatters.  TWO-TIER: the slot-degree distribution is skewed (median
    # 2-3, tail ~10 at block seams), so a single (N, maxdeg) plan gathers
    # N·maxdeg rows mostly into sentinel padding.  ``scatter_lo`` covers the
    # first ``cap`` slots of every particle; the few particles with more
    # (``scatter_out``) get their remaining slots from ``scatter_hi`` via a
    # small index-add.  cap minimizes total gathered rows at build time
    # (68k tets: 120k → 54k rows; isolated scatter 211 → 54 µs, end-to-end
    # implicit +15% — BASELINE.md).  All None under sharding (indices are
    # global; that path segment-sums + psums).
    scatter_lo: jnp.ndarray = None  # (N, cap) int32
    scatter_hi: jnp.ndarray = None  # (N2, maxdeg-cap) int32 or None
    scatter_out: jnp.ndarray = None  # (N2,) int32 outlier particle ids
    num_blocks: int = struct.field(pytree_node=False, default=0)
    eb: int = struct.field(pytree_node=False, default=0)
    pb: int = struct.field(pytree_node=False, default=0)


def _morton_order(centroids: np.ndarray) -> np.ndarray:
    """Sort key: 3-axis interleaved 10-bit Morton code of element centroids —
    consecutive elements are spatially adjacent, so greedy packing yields
    blocks with small particle perimeters (high Pb fill)."""
    lo, hi = centroids.min(0), centroids.max(0)
    q = ((centroids - lo) / np.maximum(hi - lo, 1e-30) * 1023).astype(
        np.uint64
    )

    def spread(x):
        x = (x | (x << 32)) & 0x1F00000000FFFF
        x = (x | (x << 16)) & 0x1F0000FF0000FF
        x = (x | (x << 8)) & 0x100F00F00F00F00F
        x = (x | (x << 4)) & 0x10C30C30C30C30C3
        x = (x | (x << 2)) & 0x1249249249249249
        return x

    code = spread(q[:, 0])
    for k in range(1, centroids.shape[1]):
        code = code | (spread(q[:, k]) << k)
    return np.argsort(code, kind="stable")


def build_blocking(
    element_indices: np.ndarray,
    ref_inv: np.ndarray,
    volume: np.ndarray,
    rest_pos: np.ndarray,
    eb: int = 256,
    pb: int = 128,
) -> Blocking:
    """Host-side partitioner: Morton-order elements, greedily pack runs into
    blocks capped at ``eb`` elements / ``pb`` distinct particles.  Runs once
    at load (O(E) python; ~0.4 s at 68k tets)."""
    idx = np.asarray(element_indices, np.int64)
    e_cnt, dp1 = idx.shape
    d = dp1 - 1
    order = _morton_order(np.asarray(rest_pos)[idx].mean(1))

    blocks = []
    cur: list = []
    cur_parts: set = set()
    for ei in order:
        new = cur_parts | set(idx[ei].tolist())
        if len(cur) + 1 > eb or len(new) > pb:
            blocks.append((cur, sorted(cur_parts)))
            cur, cur_parts = [ei], set(idx[ei].tolist())
        else:
            cur.append(ei)
            cur_parts = new
    if cur:
        blocks.append((cur, sorted(cur_parts)))

    b_cnt = len(blocks)
    # Multi-block grid steps (round-4 probe, tools/probe_pairblock.py):
    # processing 4 blocks per Pallas grid step lets Mosaic interleave the
    # independent dot chains into each other's MXU fill bubbles — measured
    # 719.6 → 630.5 µs/apply at 68k tets, bit-exact.  Pad the block count
    # to a multiple of 4 with EMPTY blocks (zero S rows / volume-0 slots,
    # the pad_blocking convention) — but only for meshes past the fused
    # VMEM gate: the flagship whole-frame kernels loop all blocks per
    # apply, and extra empty blocks would cost more there than pairing
    # saves on the op-composed path they don't use.
    from fem_tpu.ops.pallas_blocked_cg import (
        FUSED_MAX_BYTES as _FMB, fused_tables_bytes as _ftb,
    )

    n = rest_pos.shape[0]
    if _ftb(b_cnt, eb, pb, d, n) > _FMB:
        while len(blocks) % 4:
            blocks.append(([], []))
        b_cnt = len(blocks)
    r = eb * d
    blk_parts = np.zeros((b_cnt, pb), np.int32)
    plus = np.zeros((b_cnt, r), np.int32)
    minus = np.zeros((b_cnt, r), np.int32)
    # Padded element slots replicate element 0 (finite geometry) at volume 0;
    # their plus == minus == 0 makes the corresponding S rows exactly zero.
    blk_elems = np.zeros((b_cnt, eb), np.int64)
    vol_b = np.zeros((b_cnt, eb), np.float32)
    nparts = np.zeros((b_cnt,), np.int64)
    for b, (els, parts) in enumerate(blocks):
        lmap = {p: i for i, p in enumerate(parts)}
        blk_parts[b, : len(parts)] = parts
        nparts[b] = len(parts)
        for k, ei in enumerate(els):
            blk_elems[b, k] = ei
            vol_b[b, k] = volume[ei]
            l0 = lmap[idx[ei, 0]]
            for j in range(d):
                plus[b, k * d + j] = lmap[idx[ei, j + 1]]
                minus[b, k * d + j] = l0
    flat = blk_elems.reshape(-1)
    from fem_tpu.ops.pallas_blocked_cg import (
        FUSED_MAX_BYTES, build_fused_tables, fused_tables_bytes,
    )

    n = rest_pos.shape[0]
    # Gather plan over REAL block slots only (padded slots hold particle 0
    # and would inflate its degree by thousands; their partials are exact
    # zeros that the segment scatter adds but a gather may simply skip).
    real = (np.arange(pb)[None, :] < nparts[:, None]).reshape(-1)
    slot_rows = np.nonzero(real)[0]  # flat (B·Pb) row ids of real slots
    slot_parts = blk_parts.reshape(-1)[real]
    order = np.argsort(slot_parts, kind="stable")
    counts = np.bincount(slot_parts, minlength=n)
    maxdeg = int(counts.max()) if counts.size else 1
    sentinel = b_cnt * pb
    scatter_plan = np.full((n, maxdeg), sentinel, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ranks = np.arange(order.size) - starts[slot_parts[order]]
    scatter_plan[slot_parts[order], ranks] = slot_rows[order]
    scatter_plan = scatter_plan.astype(np.int32)
    # Two-tier split (see Blocking field docs; shared cap logic with the
    # element-assembly plan).  min_saving=0: the block-slot distribution is
    # always skewed enough at production sizes, and the neutral small-mesh
    # case costs nothing.
    from fem_tpu.ops.assembly import split_two_tier

    lo_np, hi_np, out_np = split_two_tier(scatter_plan, counts, 0.0)
    scatter_lo = jnp.asarray(lo_np)
    scatter_hi = None if hi_np is None else jnp.asarray(hi_np)
    scatter_out = None if out_np is None else jnp.asarray(out_np)
    s_dense = g_dense = None
    if fused_tables_bytes(b_cnt, eb, pb, d, n) <= FUSED_MAX_BYTES:
        s_np, g_np = build_fused_tables(
            plus.reshape(b_cnt, r, 1), minus.reshape(b_cnt, r, 1),
            blk_parts, n,
        )
        # bf16 storage: 0/±1 are exact in bf16, the kernels' exact
        # split-dot (pallas_blocked_cg._dot) consumes bf16 tables, and the
        # VMEM footprint halves.
        s_dense = jnp.asarray(s_np).astype(jnp.bfloat16)
        g_dense = jnp.asarray(g_np).astype(jnp.bfloat16)
    return Blocking(
        block_particles=jnp.asarray(blk_parts),
        plus=jnp.asarray(plus.reshape(b_cnt, r, 1)),
        minus=jnp.asarray(minus.reshape(b_cnt, r, 1)),
        element_indices=jnp.asarray(
            np.asarray(element_indices, np.int32)[flat]
        ),
        ref_inv=jnp.asarray(np.asarray(ref_inv)[flat]),
        volume=jnp.asarray(vol_b.reshape(-1)),
        element_perm=jnp.asarray(flat.astype(np.int32)),
        # block slot of each mesh eid's REAL occurrence (padded slots
        # replicate element 0 but carry volume 0, so the volume>0 slots
        # enumerate every element exactly once)
        element_slot=jnp.asarray(_element_slot(flat, vol_b.reshape(-1))),
        s_dense=s_dense,
        g_dense=g_dense,
        scatter_lo=scatter_lo,
        scatter_hi=scatter_hi,
        scatter_out=scatter_out,
        num_blocks=b_cnt,
        eb=eb,
        pb=pb,
    )


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _element_slot(flat: np.ndarray, vol_flat: np.ndarray) -> np.ndarray:
    """Mesh eid → block slot of its real (volume > 0) occurrence."""
    real = np.asarray(vol_flat) > 0.0
    slots = np.full(int(np.asarray(flat).max()) + 1, -1, np.int64)
    slots[np.asarray(flat)[real]] = np.nonzero(real)[0]
    assert (slots >= 0).all(), "every mesh element needs a real block slot"
    return slots.astype(np.int32)


def _build_s(plus, minus, r: int, pb: int) -> jnp.ndarray:
    """The block incidence matrix S_b (r, pb) rebuilt in VMEM: row e·d+j has
    +1 at the local slot of vertex j+1 and −1 at the slot of vertex 0
    (padded rows have plus == minus → exactly zero).  bf16: 0/±1 are exact
    and the exact split-dot (pallas_blocked_cg._dot) consumes it at 3
    single-pass MXU dots instead of a 6-pass HIGHEST matmul."""
    col = jax.lax.broadcasted_iota(jnp.int32, (r, pb), 1)
    return (col == plus).astype(jnp.bfloat16) - (col == minus).astype(
        jnp.bfloat16
    )


def _grid_pair(num_blocks: int) -> int:
    """Blocks per Pallas grid step for the op-composed kernels: 4 when the
    count divides (build_blocking pads scale meshes to a multiple of 4),
    degrading to 2/1 otherwise (e.g. per-shard counts under shard_map).
    Round-4 measurement (tools/probe_pairblock.py): the per-block dot
    chains are independent, so multi-block kernel bodies hide part of the
    MXU pipeline fill — 719.6 → 630.5 µs/apply at 68k, bit-exact."""
    for pair in (4, 2):
        if num_blocks % pair == 0:
            return pair
    return 1


def _matvec_kernel(
    plus_ref, minus_ref, xbt_ref, kp_ref, out_ref, *, dim, transpose_k, pair
):
    """``pair`` blocks of yᵀ = S_bᵀ·(K_b ∘ (S_b·x_b)) with S built in-VMEM.

    Layouts: xbt (d, Pb) — components on sublanes; kp (d², R) planes with
    kp[i·d+k, e·d+j] = K_e[i, k]; out (d, Pb).
    """
    from fem_tpu.ops.pallas_blocked_cg import _dot

    r, pb = plus_ref.shape[1], xbt_ref.shape[2]
    for j in range(pair):
        s = _build_s(plus_ref[j], minus_ref[j], r, pb)
        # st (d, R): column e·d+j = edge-difference vector s_j of elem e.
        st = _dot(xbt_ref[j], s, (((1,), (1,))))
        kp = kp_ref[j]
        rows = []
        for i in range(dim):
            acc = None
            for k in range(dim):
                kidx = (k * dim + i) if transpose_k else (i * dim + k)
                term = kp[kidx, :] * st[k, :]
                acc = term if acc is None else acc + term
            rows.append(acc)
        t = jnp.stack(rows, 0)  # (d, R): column e·d+j = K_e @ s_j
        out_ref[j] = _dot(t, s, (((1,), (0,))))


def _scatter_kernel(plus_ref, minus_ref, t_ref, out_ref, *, pair):
    """``pair`` blocks of the assembly yᵀ = S_bᵀ·t — scatter per-element
    columns (t[:, e·d+j] to local vertex j+1, −Σ_j to vertex 0) as MXU
    matmuls."""
    from fem_tpu.ops.pallas_blocked_cg import _dot

    r, pb = plus_ref.shape[1], out_ref.shape[2]
    for j in range(pair):
        s = _build_s(plus_ref[j], minus_ref[j], r, pb)
        out_ref[j] = _dot(t_ref[j], s, (((1,), (0,))))


def _prep_kernel(
    plus_ref,  # (1, R, 1)
    minus_ref,  # (1, R, 1)
    pj_ref,  # (d, R, Eb) edge→element-plane selection (block-independent)
    psum_ref,  # (R, Eb) lane-repeat map
    rv_ref,  # (1, d², Eb) ref_inv component planes
    vol_ref,  # (1, 1, Eb) volumes (0 on padded slots)
    xbt_ref,  # (1, d, Pb) block-gathered positions
    *out_refs,  # implicit: (kp (1, d², R), yt (1, d, Pb)); explicit: (yt,)
    dim: int,
    mu: float,
    lam: float,
    robust: bool,
    mode: str,
    material: str,
    pair: int,
):
    """One block of element prep entirely in VMEM: edge matrices via
    S_b·x_b MXU dots (no XLA row gather), the shared element chain, and the
    outputs already in the layouts the blocked operator consumes — K planes
    (make_kplane layout) and per-block force partials (blocked_scatter_sum
    input).  Same per-block structure as the whole-frame kernel's ``prep``
    (ops/pallas_blocked_frame.py), factored for meshes past the fused-table
    VMEM gate and for the sharded path."""
    from fem_tpu.ops.pallas_blocked_cg import _dot
    from fem_tpu.ops.pallas_blocked_frame import _pad_x_rows
    from fem_tpu.ops.pallas_kernels import grad_cols_chain, k_and_h_chain

    d = dim
    d2 = d * d
    r, pb = plus_ref.shape[1], xbt_ref.shape[2]
    for g in range(pair):
        s = _build_s(plus_ref[g], minus_ref[g], r, pb)
        st = _dot(xbt_ref[g, :, :], s, (((1,), (1,))))  # (d, R)
        v = vol_ref[g, :, :]  # (1, Eb)
        # Padded element slots have zero S rows → X = 0 → NaN through the
        # chain; substitute the rest edge matrix (F = I), volume 0 zeroes
        # the result exactly (same convention as the whole-frame kernel).
        pad = (v == 0.0).astype(jnp.float32)
        rv = rv_ref[g, :, :]  # (d², Eb)
        r_rows = [rv[i : i + 1, :] for i in range(d2)]
        xp = _pad_x_rows(r_rows, d)
        x_rows = [None] * d2
        for j in range(d):
            xj = _dot(st, pj_ref[j, :, :], (((1,), (0,))))  # (d, Eb)
            for i in range(d):
                x_rows[i * d + j] = xj[i : i + 1, :] + pad * xp[i * d + j]
        if mode == "edges":
            (xt_out,) = out_refs
            xt_out[g] = jnp.concatenate(x_rows, axis=0)  # (d², Eb)
            continue
        if mode == "implicit":
            kp_out, yt_out = out_refs
            k, h = k_and_h_chain(
                x_rows, r_rows, d, mu, lam, robust, material
            )
            krows = jnp.concatenate(
                [-v * k[i] for i in range(d2)], axis=0
            )  # (d², Eb)
            kp_out[g] = _dot(krows, psum_ref[:, :], (((1,), (1,))))  # (d², R)
            sign = -1.0
        else:
            (yt_out,) = out_refs
            h = grad_cols_chain(x_rows, r_rows, d, mu, lam, material)
            sign = 1.0
        tc = None
        for j in range(d):
            hj = jnp.concatenate(
                [sign * v * h[c * d + j] for c in range(d)], axis=0
            )  # (d, Eb)
            term = _dot(hj, pj_ref[j, :, :], (((1,), (1,))))  # (d, R)
            tc = term if tc is None else tc + term
        yt_out[g] = _dot(tc, s, (((1,), (0,))))  # (d, Pb)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("dim", "transpose_k"))
def _blocked_matvec_call(
    blocking: Blocking, kplane: jnp.ndarray, xbt: jnp.ndarray,
    dim: int, transpose_k: bool,
) -> jnp.ndarray:
    b, eb, pb = blocking.num_blocks, blocking.eb, blocking.pb
    r = eb * dim
    pair = _grid_pair(b)
    spec = lambda *shape: pl.BlockSpec(
        (pair,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _matvec_kernel, dim=dim, transpose_k=transpose_k, pair=pair
    )
    return pl.pallas_call(
        kernel,
        grid=(b // pair,),
        in_specs=[spec(r, 1), spec(r, 1), spec(dim, pb), spec(dim * dim, r)],
        out_specs=spec(dim, pb),
        out_shape=jax.ShapeDtypeStruct((b, dim, pb), jnp.float32),
        interpret=_interpret(),
    )(blocking.plus, blocking.minus, xbt, kplane)


@functools.partial(jax.jit, static_argnames=("dim",))
def _blocked_scatter_call(
    blocking: Blocking, t_planes: jnp.ndarray, dim: int
) -> jnp.ndarray:
    b, eb, pb = blocking.num_blocks, blocking.eb, blocking.pb
    r = eb * dim
    pair = _grid_pair(b)
    spec = lambda *shape: pl.BlockSpec(
        (pair,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_scatter_kernel, pair=pair),
        grid=(b // pair,),
        in_specs=[spec(r, 1), spec(r, 1), spec(dim, r)],
        out_specs=spec(dim, pb),
        out_shape=jax.ShapeDtypeStruct((b, dim, pb), jnp.float32),
        interpret=_interpret(),
    )(blocking.plus, blocking.minus, t_planes)


@functools.partial(
    jax.jit,
    static_argnames=("dim", "mu", "s_lambda", "robust", "mode", "material"),
)
def _blocked_prep_call(
    blocking: Blocking, ref_inv_flat: jnp.ndarray, xbt: jnp.ndarray,
    dim: int, mu: float, s_lambda: float, robust: bool, mode: str,
    material: str, ref_planes: jnp.ndarray | None = None,
):
    b_cnt, eb, pb = blocking.num_blocks, blocking.eb, blocking.pb
    d = dim
    d2 = d * d
    r = eb * d
    # ``ref_planes`` (B, d², Eb) skips the (B·Eb, d, d) reshape: dynamic
    # per-substep rest-edge inverses (inelasticity) compose in plane layout
    # end-to-end — the padded (E, d, d) intermediates of the flat form
    # measured ~8 ms/substep in-frame at 68k (round-5 bisect, BASELINE.md).
    if ref_planes is not None:
        rv = ref_planes
    else:
        rv = ref_inv_flat.reshape(b_cnt, eb, d2).transpose(0, 2, 1)
    vol = blocking.volume.reshape(b_cnt, 1, eb)
    # Static selection tensors (bf16 one-hots, consumed by the exact
    # split-dot) — loop-invariant, hoisted by XLA out of any substep scan.
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, eb), 0)
    ee = jax.lax.broadcasted_iota(jnp.int32, (r, eb), 1)
    pj = jnp.stack(
        [(rr == ee * d + j).astype(jnp.bfloat16) for j in range(d)], axis=0
    )
    psum = (rr // d == ee).astype(jnp.bfloat16)
    pair = _grid_pair(b_cnt)
    spec = lambda *shape: pl.BlockSpec(
        (pair,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    whole = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _prep_kernel, dim=d, mu=mu, lam=s_lambda, robust=robust, mode=mode,
        material=material, pair=pair,
    )
    if mode == "edges":
        out_shape = [jax.ShapeDtypeStruct((b_cnt, d2, eb), jnp.float32)]
        out_specs = [spec(d2, eb)]
    else:
        out_shape = [jax.ShapeDtypeStruct((b_cnt, d, pb), jnp.float32)]
        out_specs = [spec(d, pb)]
        if mode == "implicit":
            out_shape.insert(
                0, jax.ShapeDtypeStruct((b_cnt, d2, r), jnp.float32)
            )
            out_specs.insert(0, spec(d2, r))
    return pl.pallas_call(
        kernel,
        grid=(b_cnt // pair,),
        in_specs=[
            spec(r, 1), spec(r, 1), whole(d, r, eb), whole(r, eb),
            spec(d2, eb), spec(1, eb), spec(d, pb),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(blocking.plus, blocking.minus, pj, psum, rv, vol, xbt)


def blocked_prep(
    blocking: Blocking, pos: jnp.ndarray, dim: int, mu: float,
    s_lambda: float, robust: bool = False, material: str = "neo_hookean",
    ref_inv_flat: jnp.ndarray | None = None,
    ref_planes: jnp.ndarray | None = None,
):
    """Implicit element prep through the block tables: returns
    ``(kplane (B, d², R), yt (B, d, Pb))`` — K planes in the exact
    :func:`make_kplane` layout and implicit force partials ready for
    :func:`blocked_scatter_sum`.  Replaces, in one Pallas pass over blocks,
    the E·(d+1)-row XLA edge gather + planar element kernel + K-plane
    repack of the op-composed path (the gather alone measured ~1.4 ms per
    substep at 68k tets).  Works per-shard under ``shard_map`` (blocking =
    this shard's blocks; scatter psums).

    ``ref_inv_flat`` overrides the static block-ordered rest-edge inverses
    with a DYNAMIC (B·Eb, d, d) array — the inelastic extension's effective
    ``ref_inv·F_i⁻¹`` (ops/inelastic.py), gathered into block order via
    ``Blocking.element_perm``; ``ref_planes`` is the same override already
    in (B, d², Eb) plane layout (preferred — see
    ops/inelastic.layer_ref_planes_blocked)."""
    xbt = blocked_gather(pos, blocking)
    if ref_inv_flat is None:
        ref_inv_flat = blocking.ref_inv
    return _blocked_prep_call(
        blocking, ref_inv_flat, xbt, dim, float(mu), float(s_lambda),
        bool(robust), "implicit", material, ref_planes=ref_planes,
    )


def blocked_grad_prep(
    blocking: Blocking, pos: jnp.ndarray, dim: int, mu: float,
    s_lambda: float, material: str = "neo_hookean",
    ref_inv_flat: jnp.ndarray | None = None,
    ref_planes: jnp.ndarray | None = None,
):
    """Explicit/analytic energy-gradient partials ``yt (B, d, Pb)`` through
    the block tables (reference solver/explicit.py:23-49 chain with the
    UNclamped log, +V scaling); feed to :func:`blocked_scatter_sum`.
    ``ref_inv_flat`` / ``ref_planes`` as in :func:`blocked_prep`."""
    xbt = blocked_gather(pos, blocking)
    if ref_inv_flat is None:
        ref_inv_flat = blocking.ref_inv
    (yt,) = _blocked_prep_call(
        blocking, ref_inv_flat, xbt, dim, float(mu), float(s_lambda), False,
        "explicit", material, ref_planes=ref_planes,
    )
    return yt


def blocked_edge_matrices(
    blocking: Blocking, pos: jnp.ndarray, dim: int
) -> jnp.ndarray:
    """Per-element edge matrices X in MESH element order, (E, d, d), via the
    in-VMEM ``S_b·x_b`` split-dots (exact — S is 0/±1 and the split-dot
    reassembles full f32, so each entry is the same ``p_{j+1} − p_0``
    subtraction ``gather_edge_diffs`` computes).

    Exists because the XLA row gather behind ``gather_edge_diffs`` measured
    ~10 ms/substep IN-FRAME at 68k tets when called once per substep by the
    inelastic internal-variable update (isolated it reads ~2 ms — it does
    not pipeline between substeps), which made a minimal-flow plastic body
    4.4× slower than elastic.  The block route plus the static
    ``element_slot`` un-permute brings the whole update to ~1 ms (round-5
    A/B, BASELINE.md)."""
    xt = blocked_edge_planes(blocking, pos, dim)
    b_cnt, eb = xt.shape[0], blocking.eb
    x = xt.transpose(0, 2, 1).reshape(b_cnt * eb, dim, dim)
    return x[blocking.element_slot]


def blocked_edge_planes(
    blocking: Blocking, pos: jnp.ndarray, dim: int
) -> jnp.ndarray:
    """Per-element edge matrices as (B, d², Eb) component planes in BLOCK
    order (plane i·d+j = X[i, j]); padded slots carry the rest edge matrix
    (F = I downstream).  The plane form feeds the inelastic internal-
    variable update without ever materializing padded (E, d, d) tensors."""
    xbt = blocked_gather(pos, blocking)
    (xt,) = _blocked_prep_call(
        blocking, blocking.ref_inv, xbt, dim, 0.0, 0.0, False, "edges",
        "neo_hookean",
    )
    return xt


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------

def make_kplane(blocking: Blocking, k_flat: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(B·Eb, d, d) K blocks → (B, d², Eb·d) planes with the component pair
    (i, k) on sublane i·d+k, replicated ×d along lanes so the kernel's
    per-row multiply needs no in-kernel lane expansion."""
    b, eb = blocking.num_blocks, blocking.eb
    kp = (
        k_flat.reshape(b, eb, dim, dim)
        .transpose(0, 2, 3, 1)
        .reshape(b, dim * dim, eb)
    )
    return jnp.repeat(kp, dim, axis=2)


def kplane_to_kflat(
    blocking: Blocking, kplane: jnp.ndarray, dim: int
) -> jnp.ndarray:
    """Inverse of :func:`make_kplane`: (B, d², Eb·d) planes → (B·Eb, d, d)
    K blocks (the lane axis repeats each element ×d; lane ``e·d`` recovers
    element e).  Used by the block-Jacobi PCG to assemble diagonal blocks
    from the pallas-prep kplane without recomputing the element chain."""
    b, eb = blocking.num_blocks, blocking.eb
    kp = kplane[:, :, ::dim]  # (B, d², Eb)
    return kp.transpose(0, 2, 1).reshape(b * eb, dim, dim)


def blocked_gather(x: jnp.ndarray, blocking: Blocking) -> jnp.ndarray:
    """(N, d) → (B, d, Pb) block-local transposed copies (duplicating shared
    halo particles)."""
    return jnp.transpose(x[blocking.block_particles], (0, 2, 1))


def blocked_scatter_sum(
    yt: jnp.ndarray,
    blocking: Blocking,
    num_particles: int,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """(B, d, Pb) block partials → (N, d) via segment-sum over the block→
    global particle map (halo contributions add; padded slots add 0 to
    particle 0).  Under ``shard_map`` with blocks sharded over ``axis_name``
    the local partials ``psum``-reduce over ICI — the multi-chip form of the
    reference's atomic scatter (SURVEY §5)."""
    d = yt.shape[1]
    rows = jnp.transpose(yt, (0, 2, 1)).reshape(-1, d)
    if axis_name is None and blocking.scatter_lo is not None:
        from fem_tpu.ops.assembly import gather_assemble

        out = gather_assemble(rows[:, None, :], blocking.scatter_lo)
        if blocking.scatter_hi is not None:
            hi = gather_assemble(rows[:, None, :], blocking.scatter_hi)
            out = out.at[blocking.scatter_out].add(hi)
        return out
    out = jax.ops.segment_sum(
        rows,
        blocking.block_particles.reshape(-1),
        num_segments=num_particles,
    )
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def blocked_graph_apply(
    blocking: Blocking,
    kplane: jnp.ndarray,
    x: jnp.ndarray,
    num_particles: int,
    dim: int,
    transpose_k: bool = False,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """G(K)·x (graph_block_apply semantics) through the blocked MXU path.
    With ``axis_name``, ``blocking`` holds this shard's blocks and the result
    is psum-reduced to the full replicated (N, d) product."""
    xbt = blocked_gather(x, blocking)
    yt = _blocked_matvec_call(blocking, kplane, xbt, dim, transpose_k)
    return blocked_scatter_sum(yt, blocking, num_particles, axis_name)


def blocked_assemble(
    blocking: Blocking,
    cols_flat: jnp.ndarray,
    num_particles: int,
    dim: int,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Assembly of per-element columns (B·Eb, d, d) → (N, d), the blocked
    equivalent of ``assemble_for(obj, element_contrib_full(cols))``: local
    vertex j+1 receives column j, vertex 0 receives −Σ_j (reference scatter,
    solver/explicit.py:42-49)."""
    b, eb = blocking.num_blocks, blocking.eb
    # t planes (B, d, Eb·d): column e·d+j = cols[e][:, j].
    t = (
        cols_flat.reshape(b, eb, dim, dim)
        .transpose(0, 2, 1, 3)
        .reshape(b, dim, eb * dim)
    )
    yt = _blocked_scatter_call(blocking, t, dim)
    return blocked_scatter_sum(yt, blocking, num_particles, axis_name)


def pad_blocking(blocking: Blocking, multiple: int) -> Blocking:
    """Pad the block count to a multiple of ``multiple`` so blocks shard
    evenly across a device mesh axis (fem_tpu.parallel.sharding).

    Padded blocks are *empty*: ``plus == minus == 0`` makes every S row
    exactly zero, ``volume == 0`` zeroes all element contributions, their
    element slots replicate element 0 (finite geometry — same padding
    convention as :class:`Blocking` itself), and ``block_particles == 0``
    scatter-adds exact zeros to particle 0.  The dense fused tables are
    dropped — the whole-solve/whole-frame kernels are single-chip paths.
    """
    b = blocking.num_blocks
    target = ((b + multiple - 1) // multiple) * multiple
    pad = target - b
    if pad == 0:
        return blocking.replace(s_dense=None, g_dense=None, scatter_lo=None,
                                scatter_hi=None, scatter_out=None,
                                element_slot=None)
    eb, r = blocking.eb, blocking.plus.shape[1]

    def pad0(x, rows):
        return jnp.concatenate(
            [x, jnp.zeros((rows,) + x.shape[1:], x.dtype)], axis=0
        )

    return blocking.replace(
        block_particles=pad0(blocking.block_particles, pad),
        plus=pad0(blocking.plus, pad),
        minus=pad0(blocking.minus, pad),
        element_indices=jnp.concatenate(
            [
                blocking.element_indices,
                jnp.tile(blocking.element_indices[:1], (pad * eb, 1)),
            ]
        ),
        ref_inv=jnp.concatenate(
            [blocking.ref_inv, jnp.tile(blocking.ref_inv[:1], (pad * eb, 1, 1))]
        ),
        volume=pad0(blocking.volume, pad * eb),
        element_perm=jnp.concatenate(
            [blocking.element_perm,
             jnp.tile(blocking.element_perm[:1], (pad * eb,))]
        ),
        s_dense=None,
        g_dense=None,
        scatter_lo=None,
        scatter_hi=None,
        scatter_out=None,
        element_slot=None,
        num_blocks=target,
    )
