# coding=utf-8
"""Fiber-reinforced anisotropy + the implicit-midpoint integrator.

Two framework extensions beyond the reference's isotropic backward-Euler
world:

1. ``material: "fiber:a1,a2[:kappa]"`` — a transversely isotropic solid
   (stable-Neo-Hookean base + kappa·mu/2·(I4−1)² along the unit fiber
   direction, ops/element.fiber_params).  A block hanging from a pinned
   top edge stretches measurably less when its fibers run vertically
   (load-aligned) than horizontally.

2. ``newton_theta: 0.5`` — the implicit midpoint rule on the Newton
   integrator (solvers/newton.py): second-order in dt and
   energy-conserving in free vibration, where backward Euler (θ = 1)
   numerically bleeds kinetic+elastic energy every period.

Run: python examples/anisotropic_fibers.py
"""

import os

import numpy as np

from fem_tpu.api import Simulation

FAST = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"


def sag_config(material):
    return {
        "dim": 2,
        "delta_time": 5e-4,
        "sim_count": 8,
        "use_explicit_method": True,
        "auto_diff": False,
        "g_dir": [0.0, -1.0],
        "objects": [
            {
                "center": [0.5, 0.5],
                "E": 4e4,
                "nu": 0.2,
                "damping": 14.5,
                "side_length": 0.2,
                "subdivisions": 6,
                "material": material,
                # Hang from the top edge: the body stretches under its own
                # weight and the fiber direction sets how much.
                "pin_boxes": [[[0.35, 0.595], [0.65, 0.65]]],
            }
        ],
    }


def min_y(material, frames):
    sim = Simulation.from_dict(sag_config(material))
    for _ in range(frames):
        sim.step_frame()
    pos = np.asarray(sim.positions())
    assert np.isfinite(pos).all()
    return float(pos[:, 1].min())


def energy_drift(theta, frames):
    """Free elastic vibration (no gravity, no damping): relative energy
    change after `frames` frames under the θ-scheme."""
    cfg = {
        "dim": 2,
        "delta_time": 4e-4,
        "sim_count": 8,
        "use_explicit_method": False,
        "implicit_method": 1,
        "preconditioned": 0,
        "cg_precond": "none",
        "integrator": "newton",
        "newton_theta": theta,
        "newton_tol": 1e-6,
        "g_dir": [0.0, 0.0],
        "objects": [
            {
                "center": [0.5, 0.5],
                "E": 4e4,
                "nu": 0.2,
                "damping": 0.0,
                "side_length": 0.2,
                "subdivisions": 5,
            }
        ],
    }
    sim = Simulation.from_dict(cfg)
    # Stretch 8% about the center: pure elastic oscillation.
    st = sim.scene[0].state
    center = st.pos.mean(axis=0, keepdims=True)
    sim.scene[0].state = st.replace(pos=center + 1.08 * (st.pos - center))

    def total_energy():
        m = sim.metrics()
        return float(m.elastic_energy + m.kinetic_energy)

    e0 = total_energy()
    for _ in range(frames):
        sim.step_frame()
    return (total_energy() - e0) / e0


def main():
    frames = 4 if FAST else 12

    y_vert = min_y("fiber:0,1:4.0", frames)
    y_horiz = min_y("fiber:1,0:4.0", frames)
    print(
        f"sag after {frames} frames: vertical fibers ymin={y_vert:.4f}, "
        f"horizontal fibers ymin={y_horiz:.4f}"
    )
    assert y_vert > y_horiz, "load-aligned fibers must sag less"

    n_vib = 6 if FAST else 18
    d_mid = energy_drift(0.5, n_vib)
    d_be = energy_drift(1.0, n_vib)
    print(
        f"free-vibration energy drift over {n_vib} frames: "
        f"midpoint {d_mid:+.2%}, backward Euler {d_be:+.2%}"
    )
    assert abs(d_mid) < abs(d_be), "midpoint must conserve better"
    print("anisotropic_fibers OK")


if __name__ == "__main__":
    main()
