# coding=utf-8
"""Quasi-statics: hang a slab from its pinned top edge and solve for the
gravity-sag equilibrium directly (no time stepping), then release it into
dynamics from the equilibrium — it should barely move.

Extensions used (the reference is a dynamics-only simulator with no
kinematic constraints): ``pin_boxes`` Dirichlet BCs + ``Simulation.
solve_static`` (solvers/static.py).

Run: python examples/static_sag.py
"""

import numpy as np

from fem_tpu.api import Simulation

import os
FAST = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"

CONFIG = {
    "dim": 2,
    "delta_time": 5e-4,
    "sim_count": 10,
    "use_explicit_method": False,
    "implicit_method": 1,
    "preconditioned": 0,
    "cg_precond": "none",
    "g_dir": [0.0, -1.0],
    "objects": [
        {
            "center": [0.4, 0.5],
            "E": 2e4,
            "nu": 0.2,
            "damping": 30.0,
            "side_length": 0.2,
            "subdivisions": 8,
            "pin_boxes": [[[0.35, 0.695], [0.65, 0.705]]],
        }
    ],
}


def main():
    sim = Simulation.from_dict(CONFIG)
    rest = np.asarray(sim.positions())

    (res,) = sim.solve_static()
    sag = np.asarray(res.pos)[:, 1] - rest[:, 1]
    print(
        f"static solve: {int(res.iterations)} Newton iters, "
        f"residual {float(res.grad_norm):.2e} N, max sag {-sag.min():.4f}"
    )

    # Release into dynamics from equilibrium: the state should stay put.
    before = np.asarray(sim.positions())
    sim.run(frames=5 if FAST else 60)
    drift = np.abs(np.asarray(sim.positions()) - before).max()
    print(f"dynamic drift off the static equilibrium: {drift:.2e}")
    assert drift < 5e-3, "static equilibrium should be dynamics-stationary"


if __name__ == "__main__":
    main()
