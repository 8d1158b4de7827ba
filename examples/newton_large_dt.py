# coding=utf-8
"""Fully implicit backward Euler at a time step the reference cannot take.

The reference's implicit method is semi-implicit — ONE linearized solve per
substep (/root/reference/solver/implicit.py:201-223) — so when
κ = dt²·‖K‖/m approaches 1 (stiff material, fine mesh, large dt) it
silently NaNs: the linearization error of the single solve diverges, not
the linear algebra.  ``integrator: "newton"`` (solvers/newton.py) closes
the nonlinear elastic residual every substep instead, which removes that
stability cap outright.

This example drops a stiff fine-mesh 2D block at a dt with κ ≈ 60:
the reference integrator NaNs within a few frames; the Newton integrator
runs the same scenario to rest.  (At scale the same contrast holds on real
geometry: the reference's own spot.obj soaks 10+ virtual seconds under
Newton at the dt that NaNs semi-implicitly — BASELINE.md round-4 rows.)

Run: python examples/newton_large_dt.py
"""

import os

import numpy as np

from fem_tpu.api import Simulation

FAST = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"

BASE = {
    "dim": 2,
    "delta_time": 2e-3,  # kappa ~ 60 on this mesh: far past the wall
    "sim_count": 10,
    "use_explicit_method": False,
    "implicit_method": 1,
    "preconditioned": 0,
    "cg_precond": "none",
    "g_dir": [0.0, -1.0],
    "objects": [
        {
            "center": [0.5, 0.8],
            "E": 4e5,
            "nu": 0.2,
            "damping": 14.5,
            "side_length": 0.2,
            "subdivisions": 7,
        }
    ],
}


def run(config, frames):
    sim = Simulation.from_dict(config)
    for i in range(frames):
        sim.step_frame()
        if not np.isfinite(np.asarray(sim.positions())).all():
            return i, sim
    return None, sim


def main():
    frames = 6 if FAST else 30

    nan_frame, _ = run(dict(BASE), frames)
    if nan_frame is None:
        print(f"semi-implicit: survived {frames} frames (unexpected)")
    else:
        print(f"semi-implicit: NaN at frame {nan_frame} (kappa blow-up)")

    newton_cfg = dict(BASE, integrator="newton", newton_hessian="decoupled")
    nan_frame, sim = run(newton_cfg, frames)
    assert nan_frame is None, f"newton NaN at frame {nan_frame}"
    pos = np.asarray(sim.positions())
    print(
        f"newton: {frames} frames finite at the same dt "
        f"(ymin={pos[:, 1].min():.3f})"
    )
    print("newton_large_dt OK")


if __name__ == "__main__":
    main()
