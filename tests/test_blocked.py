# coding=utf-8
"""Block-partitioned MXU operator (ops/blocking.py) vs the graph operator.

The blocked mode is an execution-strategy change only — every test here pins
it against the graph path, which is itself validated against the dense oracle
in tests/test_implicit.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_tpu.models.mesh import delaunay_tetrahedralize
from fem_tpu.models.state import build_object
from fem_tpu.ops.assembly import assemble_for, element_contrib_full
from fem_tpu.ops.blocking import (
    Blocking,
    blocked_assemble,
    blocked_graph_apply,
    build_blocking,
    make_kplane,
)
from fem_tpu.ops.element import hessian_blocks, implicit_force_columns
from fem_tpu.ops import smallmat as sm
from fem_tpu.solvers.implicit import (
    graph_block_apply,
    implicit_velocity_solve,
)
from fem_tpu.utils.config import ObjectConfig

DT = 5e-4


def _cube_mesh(spacing=0.4):
    v = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        np.float64,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [0, 4, 7], [0, 7, 3], [1, 2, 6], [1, 6, 5],
        ],
        np.int64,
    )
    nodes, tets = delaunay_tetrahedralize(v, f, spacing)
    return nodes, f, tets


@pytest.fixture(scope="module")
def blocked_obj():
    nodes, f, tets = _cube_mesh()
    cfg = ObjectConfig(obj="cube", center=(2.0, 2.0, 2.0))
    obj, state = build_object(cfg, nodes.astype(np.float32), f, tets)
    # Tiny caps so the small mesh still splits into several blocks with
    # interspersed padding — the shape the production path sees at scale.
    blk = build_blocking(
        np.asarray(obj.element_indices),
        np.asarray(obj.ref_inv),
        np.asarray(obj.volume),
        np.asarray(obj.rest_pos),
        eb=8,
        pb=16,
    )
    assert blk.num_blocks >= 3
    return obj.replace(blocking=blk, edge_matrix=None), state


def _deformed(state, seed=0):
    rng = np.random.default_rng(seed)
    return state.replace(
        pos=state.pos + jnp.asarray(
            rng.uniform(-0.02, 0.02, state.pos.shape).astype(np.float32)
        ),
        vel=jnp.asarray(
            rng.uniform(-0.1, 0.1, state.pos.shape).astype(np.float32)
        ),
    )


def test_blocked_matvec_matches_graph(blocked_obj):
    obj, state = blocked_obj
    state = _deformed(state)
    blk = obj.blocking
    K = hessian_blocks(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda,
    )
    k_flat = hessian_blocks(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda,
    )
    x = state.vel
    ref = graph_block_apply(obj, K, x)
    got = blocked_graph_apply(
        blk, make_kplane(blk, k_flat, 3), x, obj.particle_cnt, 3
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * float(
        jnp.max(jnp.abs(ref))
    ))


def test_blocked_matvec_transpose_matches_blockwise_transpose(blocked_obj):
    obj, state = blocked_obj
    state = _deformed(state, seed=1)
    blk = obj.blocking
    k_flat = hessian_blocks(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda,
    )
    x = state.vel
    # Gᵀ(K) = G(Kᵀ) (symmetric sparsity, transposed blocks).
    ref = blocked_graph_apply(
        blk, make_kplane(blk, sm.mT(k_flat), 3), x, obj.particle_cnt, 3
    )
    got = blocked_graph_apply(
        blk, make_kplane(blk, k_flat, 3), x, obj.particle_cnt, 3,
        transpose_k=True,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6 * float(
        jnp.max(jnp.abs(ref))
    ))


def test_blocked_assemble_matches_gather_assembly(blocked_obj):
    obj, state = blocked_obj
    state = _deformed(state, seed=2)
    blk = obj.blocking
    cols = implicit_force_columns(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda, False,
    )
    cols_b = implicit_force_columns(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda, False,
    )
    ref = assemble_for(obj, element_contrib_full(cols))
    got = blocked_assemble(blk, cols_b, obj.particle_cnt, 3)
    assert bool(jnp.isfinite(got).all())  # padded slots must stay finite
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * float(
        jnp.max(jnp.abs(ref))
    ))


@pytest.mark.parametrize("preconditioned", [0, 1])
def test_blocked_solve_matches_graph_solve(blocked_obj, preconditioned):
    obj, state = blocked_obj
    state = _deformed(state, seed=3)
    ref_state, ref_aux = implicit_velocity_solve(
        obj, state, DT, method=1, preconditioned=preconditioned,
        operator_mode="graph",
    )
    got_state, got_aux = implicit_velocity_solve(
        obj, state, DT, method=1, preconditioned=preconditioned,
        operator_mode="blocked",
    )
    np.testing.assert_allclose(
        got_state.vel, ref_state.vel, rtol=5e-4, atol=1e-6
    )
    # identical arithmetic semantics → iteration counts should agree or be
    # within one step of each other (rounding in the residual)
    assert abs(int(got_aux.iterations) - int(ref_aux.iterations)) <= 1


@pytest.mark.parametrize("preconditioned", [0, 1])
def test_fused_cg_solve_matches_blocked_solve(blocked_obj, preconditioned):
    """Whole-solve Pallas kernel (ops/pallas_blocked_cg.py, interpret mode
    on CPU) vs the op-composed blocked path: same CG semantics, one op."""
    obj, state = blocked_obj
    assert obj.blocking.s_dense is not None
    state = _deformed(state, seed=7)
    ref_state, ref_aux = implicit_velocity_solve(
        obj, state, DT, method=1, preconditioned=preconditioned,
        operator_mode="blocked",
    )
    got_state, got_aux = implicit_velocity_solve(
        obj, state, DT, method=1, preconditioned=preconditioned,
        operator_mode="fused",
    )
    np.testing.assert_allclose(
        got_state.vel, ref_state.vel, rtol=5e-4, atol=1e-6
    )
    assert abs(int(got_aux.iterations) - int(ref_aux.iterations)) <= 1
    assert bool(jnp.isfinite(jnp.asarray(got_aux.residual)))


def test_fused_tables_semantics(blocked_obj):
    """S/G dense tables reproduce the index-based gather/scatter exactly."""
    from fem_tpu.ops.blocking import blocked_gather, blocked_scatter_sum

    obj, state = blocked_obj
    blk = obj.blocking
    state = _deformed(state, seed=8)
    x = np.asarray(state.vel)
    b_cnt, pb = blk.num_blocks, blk.pb
    g = np.asarray(blk.g_dense)[:, : obj.particle_cnt]  # (B·Pb, N)
    # gather: G · x == x[block_particles]
    ref_gather = np.asarray(blocked_gather(state.vel, blk))  # (B, d, Pb)
    got_gather = np.einsum("pn,nd->pd", g, x).reshape(
        b_cnt, pb, 3
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(got_gather, ref_gather, atol=1e-6)
    # scatter: Gᵀ · yt_flat == gather-plan assembly == segment-sum.  Real
    # kernel partials are EXACTLY ZERO on padded block slots (their S
    # columns are all zero) — the invariant that lets the gather-plan path
    # skip them; the synthetic yt must honor it.
    yt = np.asarray(ref_gather) * 0.5 + 1.0
    bp = np.asarray(blk.block_particles)  # (B, Pb)
    plan = np.asarray(blk.scatter_lo).reshape(-1)
    if blk.scatter_hi is not None:
        plan = np.concatenate([plan, np.asarray(blk.scatter_hi).reshape(-1)])
    real = np.zeros((b_cnt * pb,), bool)
    real[plan[plan < b_cnt * pb]] = True
    yt *= real.reshape(b_cnt, pb)[:, None, :]
    ref_scatter = np.asarray(
        blocked_scatter_sum(jnp.asarray(yt), blk, obj.particle_cnt)
    )
    yt_flat = yt.transpose(0, 2, 1).reshape(b_cnt * pb, 3)
    got_scatter = np.einsum("pn,pd->nd", g, yt_flat)
    np.testing.assert_allclose(got_scatter, ref_scatter, rtol=1e-6, atol=1e-5)
    # and the plain segment-sum agrees (the sharded path's form).
    seg = np.zeros((obj.particle_cnt, 3))
    np.add.at(seg, bp.reshape(-1), yt_flat)
    np.testing.assert_allclose(seg, ref_scatter, rtol=1e-6, atol=1e-5)


def test_explicit_gradient_uses_blocked_assembly(blocked_obj):
    from fem_tpu.solvers.explicit import analytic_energy_gradient

    obj, state = blocked_obj
    state = _deformed(state, seed=4)
    ref = analytic_energy_gradient(
        obj.replace(blocking=None), state.pos
    )
    got = analytic_energy_gradient(obj, state.pos)
    assert bool(jnp.isfinite(got).all())
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * float(
        jnp.max(jnp.abs(ref))
    ))


def test_autodiff_gradient_uses_blocked_assembly(blocked_obj):
    from fem_tpu.solvers.explicit import autodiff_energy_gradient

    obj, state = blocked_obj
    state = _deformed(state, seed=5)
    ref = autodiff_energy_gradient(obj.replace(blocking=None), state.pos)
    got = autodiff_energy_gradient(obj, state.pos)
    assert bool(jnp.isfinite(got).all())
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * float(
        jnp.max(jnp.abs(ref))
    ))


def test_blocked_requires_blocking():
    nodes, f, tets = _cube_mesh()
    cfg = ObjectConfig(obj="cube", center=(2.0, 2.0, 2.0))
    obj, state = build_object(cfg, nodes.astype(np.float32), f, tets)
    assert obj.blocking is not None  # built for every 3D mesh
    obj = obj.replace(blocking=None)
    with pytest.raises(ValueError, match="blocked"):
        implicit_velocity_solve(
            obj, state, DT, method=1, preconditioned=1,
            operator_mode="blocked",
        )


def test_blocking_covers_every_element_once(blocked_obj):
    obj, _ = blocked_obj
    blk = obj.blocking
    # Real (volume > 0) blocked slots biject onto the original elements.
    vol_b = np.asarray(blk.volume)
    real = vol_b > 0
    assert real.sum() == obj.element_cnt
    orig = np.sort(np.asarray(obj.element_indices), axis=1)
    got = np.sort(np.asarray(blk.element_indices)[real], axis=1)
    orig_keys = set(map(tuple, orig.tolist()))
    got_keys = sorted(map(tuple, got.tolist()))
    assert len(got_keys) == len(orig_keys) >= 1
    assert set(got_keys) == orig_keys


def test_split_dot_exactness():
    """The bf16 split-dot (pallas_blocked_cg._dot) must reconstruct the
    exact f32 product against 0/±1 tables: the table side is exact in
    bf16 and the 3 bf16 planes of the value side cover all 24 mantissa
    bits.  Checked against float64 matmul to ~1 ulp f32."""
    from fem_tpu.ops.pallas_blocked_cg import _dot

    rng = np.random.default_rng(42)
    # adversarial values: wide exponent range + sign mixes
    a = (rng.standard_normal((8, 256)) *
         10.0 ** rng.uniform(-6, 6, (8, 256))).astype(np.float32)
    table = rng.choice(
        np.array([-1.0, 0.0, 1.0], np.float32), size=(128, 256),
        p=[0.05, 0.9, 0.05],
    )
    got = np.asarray(_dot(jnp.asarray(a), jnp.asarray(table),
                          (((1,), (1,)))))
    want = a.astype(np.float64) @ table.astype(np.float64).T
    # f32 accumulation error bound: ulp error relative to the sum of
    # absolute terms (cancellation is inherent to ANY f32 dot, including
    # a HIGHEST-precision matmul — the split must add no loss beyond it).
    mag = np.abs(a).astype(np.float64) @ np.abs(table).astype(np.float64).T
    err = np.abs(got - want)
    assert np.all(err <= mag * 2 ** -18 + 1e-30), float(
        (err / np.maximum(mag, 1e-30)).max()
    )
    # and a well-conditioned case must be near-exact relative to the value
    b2 = np.asarray(
        _dot(jnp.asarray(np.abs(a)), jnp.asarray(np.abs(table)),
             (((1,), (1,))))
    )
    want2 = np.abs(a).astype(np.float64) @ np.abs(table).astype(np.float64).T
    rel = np.abs(b2 - want2) / np.maximum(want2, 1e-30)
    assert float(rel.max()) < 2e-6, float(rel.max())


def test_blocked_prep_matches_op_composed_prep(blocked_obj):
    """blocked_prep (ops/blocking.py): K planes + force partials computed
    in-VMEM from S_b·x_b dots must match make_kplane(hessian_blocks) +
    blocked_assemble(implicit_force_columns) to split-dot ulps."""
    from fem_tpu.ops.blocking import blocked_prep, blocked_scatter_sum

    obj, state = blocked_obj
    state = _deformed(state, seed=9)
    blk = obj.blocking
    k_flat = hessian_blocks(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda,
    )
    cols_flat = implicit_force_columns(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda, False,
    )
    kp_ref = make_kplane(blk, k_flat, 3)
    f_ref = blocked_assemble(blk, cols_flat, obj.particle_cnt, 3)
    kp, yt = blocked_prep(blk, state.pos, 3, obj.mu, obj.s_lambda)
    f_got = blocked_scatter_sum(yt, blk, obj.particle_cnt)
    assert kp.shape == kp_ref.shape
    assert bool(jnp.isfinite(kp).all()) and bool(jnp.isfinite(f_got).all())
    np.testing.assert_allclose(
        kp, kp_ref, rtol=2e-6, atol=2e-6 * float(jnp.max(jnp.abs(kp_ref)))
    )
    np.testing.assert_allclose(
        f_got, f_ref, rtol=2e-6, atol=2e-6 * float(jnp.max(jnp.abs(f_ref)))
    )


def test_blocked_prep_robust_matches_op_composed_prep(blocked_obj):
    from fem_tpu.ops.blocking import blocked_prep, blocked_scatter_sum

    obj, state = blocked_obj
    state = _deformed(state, seed=10)
    blk = obj.blocking
    k_flat = hessian_blocks(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda, True,
    )
    cols_flat = implicit_force_columns(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda, True,
    )
    kp_ref = make_kplane(blk, k_flat, 3)
    f_ref = blocked_assemble(blk, cols_flat, obj.particle_cnt, 3)
    kp, yt = blocked_prep(blk, state.pos, 3, obj.mu, obj.s_lambda, True)
    f_got = blocked_scatter_sum(yt, blk, obj.particle_cnt)
    np.testing.assert_allclose(
        kp, kp_ref, rtol=2e-6, atol=2e-6 * float(jnp.max(jnp.abs(kp_ref)))
    )
    np.testing.assert_allclose(
        f_got, f_ref, rtol=2e-6, atol=2e-6 * float(jnp.max(jnp.abs(f_ref)))
    )


def test_blocked_grad_prep_matches_op_composed(blocked_obj):
    """blocked_grad_prep: explicit-chain gradient partials (UNclamped log,
    +V scaling) vs explicit_grad_columns + blocked_assemble."""
    from fem_tpu.ops.blocking import blocked_grad_prep, blocked_scatter_sum
    from fem_tpu.ops.element import explicit_grad_columns

    obj, state = blocked_obj
    state = _deformed(state, seed=11)
    blk = obj.blocking
    g_cols = explicit_grad_columns(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda,
    )
    g_ref = blocked_assemble(blk, g_cols, obj.particle_cnt, 3)
    yt = blocked_grad_prep(blk, state.pos, 3, obj.mu, obj.s_lambda)
    g_got = blocked_scatter_sum(yt, blk, obj.particle_cnt)
    assert bool(jnp.isfinite(g_got).all())
    np.testing.assert_allclose(
        g_got, g_ref, rtol=2e-6, atol=2e-6 * float(jnp.max(jnp.abs(g_ref)))
    )


@pytest.mark.parametrize("preconditioned", [0, 1])
def test_blocked_solve_pallas_prep_matches_xla_prep(blocked_obj, preconditioned):
    """The full implicit solve through element_backend='pallas' (in-VMEM
    blocked prep) vs the XLA-prep blocked path."""
    obj, state = blocked_obj
    state = _deformed(state, seed=12)
    ref_state, ref_aux = implicit_velocity_solve(
        obj, state, DT, method=1, preconditioned=preconditioned,
        operator_mode="blocked", element_backend="xla",
    )
    got_state, got_aux = implicit_velocity_solve(
        obj, state, DT, method=1, preconditioned=preconditioned,
        operator_mode="blocked", element_backend="pallas",
    )
    np.testing.assert_allclose(
        got_state.vel, ref_state.vel, rtol=5e-4, atol=1e-6
    )
    assert abs(int(got_aux.iterations) - int(ref_aux.iterations)) <= 1


def test_explicit_gradient_pallas_backend_blocked(blocked_obj):
    from fem_tpu.solvers.explicit import analytic_energy_gradient

    obj, state = blocked_obj
    state = _deformed(state, seed=13)
    ref = analytic_energy_gradient(obj, state.pos, element_backend="xla")
    got = analytic_energy_gradient(obj, state.pos, element_backend="pallas")
    assert bool(jnp.isfinite(got).all())
    np.testing.assert_allclose(
        got, ref, rtol=2e-6, atol=2e-6 * float(jnp.max(jnp.abs(ref)))
    )


def test_two_tier_scatter_plan_covers_real_slots_once(blocked_obj):
    """scatter_lo ∪ scatter_hi enumerate every real (non-padded) block slot
    exactly once, and the two-tier scatter equals the plain segment-sum."""
    from fem_tpu.ops.blocking import blocked_gather, blocked_scatter_sum

    obj, state = blocked_obj
    blk = obj.blocking
    b_cnt, pb = blk.num_blocks, blk.pb
    sentinel = b_cnt * pb
    rows = list(np.asarray(blk.scatter_lo).reshape(-1))
    if blk.scatter_hi is not None:
        rows += list(np.asarray(blk.scatter_hi).reshape(-1))
        assert blk.scatter_out is not None and blk.scatter_out.shape[0] > 0
    rows = np.array([r for r in rows if r != sentinel])
    assert rows.size == np.unique(rows).size  # each slot consumed once
    # The real slots are exactly those holding a particle beyond padding:
    # reconstruct from the slot→particle map used by the segment-sum path.
    bp = np.asarray(blk.block_particles).reshape(-1)
    yt = np.asarray(blocked_gather(state.pos, blk)) * 0.0
    rng = np.random.default_rng(11)
    vals = rng.standard_normal((b_cnt, 3, pb)).astype(np.float32)
    real = np.zeros((b_cnt * pb,), bool)
    real[rows] = True
    yt = vals * real.reshape(b_cnt, pb)[:, None, :]
    got = np.asarray(
        blocked_scatter_sum(jnp.asarray(yt), blk, obj.particle_cnt)
    )
    seg = np.zeros((obj.particle_cnt, 3), np.float64)
    np.add.at(seg, bp, yt.transpose(0, 2, 1).reshape(-1, 3))
    np.testing.assert_allclose(got, seg, rtol=1e-5, atol=1e-5)


def test_snapshot_jacobi_rides_blocked_operator(blocked_obj):
    """jacobi_sweep="snapshot" with a blocking attached routes its residual
    operator through the blocked MXU apply; same solve as the graph apply."""
    obj, state = blocked_obj
    state = _deformed(state, seed=12)
    ref_state, ref_aux = implicit_velocity_solve(
        obj.replace(blocking=None), state, DT, method=0, preconditioned=0,
        jacobi_sweep="snapshot", operator_mode="graph",
    )
    got_state, got_aux = implicit_velocity_solve(
        obj, state, DT, method=0, preconditioned=0,
        jacobi_sweep="snapshot", operator_mode="blocked",
    )
    np.testing.assert_allclose(
        got_state.vel, ref_state.vel, rtol=5e-4, atol=1e-6
    )
    assert abs(int(got_aux.iterations) - int(ref_aux.iterations)) <= 1
