# coding=utf-8
"""Whole-CG-solve Pallas kernel vs the XLA reference path (interpret mode on
CPU; compiles with Mosaic + validated on TPU — see the module docstring)."""

import numpy as np
import pytest

from fem_tpu.ops.element import hessian_blocks
from fem_tpu.experiments.pallas_cg import cg_solve_pallas
from fem_tpu.solvers.implicit import implicit_rhs, implicit_velocity_solve
from tests.test_implicit import _perturbed
from tests.utils import make_2d_object, two_tet_object

DT = 5e-4


@pytest.mark.parametrize("precond", [True, False], ids=["precond", "plain"])
@pytest.mark.parametrize(
    "maker,scale", [(make_2d_object, 0.004), (two_tet_object, 0.03)],
    ids=["2d", "3d"],
)
def test_pallas_cg_matches_reference_solver(maker, scale, precond):
    from tests.utils import attach_edge_matrix

    cfg, obj, state = maker()
    obj = attach_edge_matrix(obj)
    state = _perturbed(state, scale)
    K = hessian_blocks(
        state.pos, obj.element_indices, obj.ref_inv, obj.volume,
        obj.mu, obj.s_lambda,
    )
    b = implicit_rhs(obj, state, DT)
    x, it = cg_solve_pallas(
        obj.edge_matrix, K, b, obj.mass,
        dim=obj.dim, dt2=DT * DT, preconditioned=precond,
    )
    s_ref, aux = implicit_velocity_solve(
        obj, state, DT, 1, 1 if precond else 0, operator_mode="graph"
    )
    assert int(it) == int(aux.iterations)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(s_ref.vel), rtol=1e-4, atol=1e-5
    )
