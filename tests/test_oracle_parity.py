# coding=utf-8
"""Trajectory parity against the independent float64 numpy oracle
(tests/oracle.py — implements the reference's step semantics from the SURVEY
spec with no shared code).  This is the strongest parity evidence available
without the Taichi runtime."""

import numpy as np
import pytest

from fem_tpu.models.mesh import construct_2d_mesh
from fem_tpu.models.state import Obstacles, build_object
from fem_tpu.sim import make_substep_fn
from fem_tpu.utils.config import BlockConfig, ObjectConfig, SimConfig
from tests.oracle import Oracle

DT = 5e-4
BLOCKS = [((0.55, 0.55), 0.12)]


def _setup(sub=4):
    ocfg = ObjectConfig(
        center=(0.45, 0.65), side_length=0.2, subdivisions=sub,
        E=4e4, nu=0.2, damping=14.5, rho=500.0,
    )
    v, f, e = construct_2d_mesh(ocfg)
    obj, state = build_object(ocfg, v, f, e)
    oracle = Oracle(
        np.asarray(state.pos, np.float64), e, ocfg.rho, ocfg.mu,
        ocfg.s_lambda, ocfg.damping,
    )
    obstacles = Obstacles.from_configs(
        tuple(
            BlockConfig(block_center=c, block_radius=r) for c, r in BLOCKS
        ),
        2,
    )
    return ocfg, obj, state, oracle, obstacles


def test_explicit_trajectory_matches_oracle():
    """200 substeps (0.1 s: free fall + wall/obstacle contact) must track the
    float64 oracle to ~1e-4 (f32 accumulation)."""
    ocfg, obj, state, oracle, obstacles = _setup()
    cfg = SimConfig(
        dim=2, sim_count=1, auto_diff=False, use_explicit_method=True,
        objects=(ocfg,),
        blocks=tuple(
            BlockConfig(block_center=c, block_radius=r) for c, r in BLOCKS
        ),
    )
    step = make_substep_fn(obj, cfg)
    for k in range(200):
        state, _ = step(state, obstacles)
        oracle.step_explicit(DT, (0.0, -1.0), BLOCKS)
        if k % 50 == 49:
            np.testing.assert_allclose(
                np.asarray(state.pos), oracle.pos, atol=2e-4,
                err_msg=f"diverged from oracle at substep {k}",
            )


@pytest.mark.parametrize("sweep", ["serial", "snapshot"])
def test_implicit_jacobi_trajectory_matches_oracle(sweep):
    """Jacobi incl. the cross-step past_vec_x relaxation anchor, under both
    sweep semantics: "serial" is the reference's actual execution (in-place
    Gauss–Seidel-style sweep — see PARITY.md), "snapshot" the parallel
    extension."""
    ocfg, obj, state, oracle, obstacles = _setup(sub=3)
    cfg = SimConfig(
        dim=2, sim_count=1, auto_diff=False, use_explicit_method=False,
        implicit_method=0, jacobi_sweep=sweep,
        objects=(ocfg,),
        blocks=tuple(
            BlockConfig(block_center=c, block_radius=r) for c, r in BLOCKS
        ),
    )
    step = make_substep_fn(obj, cfg)
    for k in range(120):
        state, _ = step(state, obstacles)
        oracle.step_implicit_jacobi(DT, (0.0, -1.0), BLOCKS, sweep=sweep)
        if k % 40 == 39:
            np.testing.assert_allclose(
                np.asarray(state.pos), oracle.pos, atol=5e-4,
                err_msg=f"diverged from oracle at substep {k}",
            )


def test_3d_explicit_trajectory_matches_oracle():
    """Two shared-face tets, explicit analytic, free fall + floor contact."""
    verts = np.array(
        [[0, 0, 0], [0.3, 0, 0], [0, 0.3, 0], [0, 0, 0.3],
         [0.3, 0.3, 0.3]], np.float32,
    ) + np.array([0.4, 0.12, 0.4], np.float32)
    elems = np.array([[0, 1, 2, 3], [1, 2, 3, 4]], np.int32)
    ocfg = ObjectConfig(
        center=(0.0, 0.0, 0.0), E=4e4, nu=0.3, damping=10.0, rho=800.0
    )
    obj, state = build_object(
        ocfg, verts, np.zeros((0, 3), np.int32), elems
    )
    oracle = Oracle(
        np.asarray(state.pos, np.float64), elems, ocfg.rho, ocfg.mu,
        ocfg.s_lambda, ocfg.damping,
    )
    cfg = SimConfig(
        dim=3, sim_count=1, auto_diff=False, use_explicit_method=True,
        g_dir=(0.0, -1.0, 0.0), objects=(ocfg,), blocks=(),
    )
    obstacles = Obstacles.from_configs((), 3)
    step = make_substep_fn(obj, cfg)
    for k in range(200):
        state, _ = step(state, obstacles)
        oracle.step_explicit(DT, (0.0, -1.0, 0.0), [])
    np.testing.assert_allclose(np.asarray(state.pos), oracle.pos, atol=3e-4)


@pytest.mark.parametrize("precond", [1, 0], ids=["precond", "plain"])
def test_implicit_cg_trajectory_matches_oracle(precond):
    ocfg, obj, state, oracle, obstacles = _setup(sub=3)
    cfg = SimConfig(
        dim=2, sim_count=1, auto_diff=False, use_explicit_method=False,
        implicit_method=1, preconditioned=precond,
        objects=(ocfg,),
        blocks=tuple(
            BlockConfig(block_center=c, block_radius=r) for c, r in BLOCKS
        ),
    )
    step = make_substep_fn(obj, cfg)
    for k in range(150):
        state, _ = step(state, obstacles)
        oracle.step_implicit_cg(DT, (0.0, -1.0), BLOCKS, precond)
        if k % 50 == 49:
            np.testing.assert_allclose(
                np.asarray(state.pos), oracle.pos, atol=5e-4,
                err_msg=f"diverged from oracle at substep {k}",
            )
