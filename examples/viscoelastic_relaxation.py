# coding=utf-8
"""Stress relaxation: stretch a viscoelastic block, hold it, watch the
branch stress decay with the configured time constant.

The reference is purely hyperelastic (its entire material surface is the
Neo-Hookean pair, /root/reference/solver/explicit.py:23-28): held strain
holds its stress forever.  With ``viscous_mu``/``viscous_tau`` (one
generalized-Maxwell branch, fem_tpu/ops/inelastic.py) the instantaneous
response is stiffer — transient modulus μ + μ_v — and the branch stress
relaxes as exp(−t/τ) toward the base material.

Protocol (the textbook relaxation test): pin both vertical edges, stretch
the whole block uniaxially by 8% at t = 0 (pins hold the stretched ends —
pin semantics keep a pinned vertex wherever it is), then integrate with no
gravity and read the total elastic energy per frame.  The energy starts at
the transient (μ + μ_v) level, decays exponentially, and plateaus at the
base-material level; the demo fits the decay constant and compares it to
the configured τ.

Run: python examples/viscoelastic_relaxation.py
"""

import os

import numpy as np

from fem_tpu.api import Simulation

FAST = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"

TAU = 0.02  # seconds
SPEC = {
    "dim": 2,
    "delta_time": 1e-4,
    "sim_count": 10,
    "use_explicit_method": False,
    "implicit_method": 1,
    "preconditioned": 0,
    "g_dir": [0.0, 0.0],
    "objects": [
        {
            "center": [0.5, 0.5],
            "E": 4e4,
            "nu": 0.25,
            "damping": 40.0,
            "side_length": 0.2,
            "subdivisions": 4 if FAST else 8,
            "viscous_mu": 3e4,
            "viscous_tau": TAU,
            # Pin thin strips at both vertical edges of the (stretched)
            # block; boxes are evaluated on INITIAL world positions.
            "pin_boxes": [
                [[0.495, 0.0], [0.515, 1.0]],
                [[0.685, 0.0], [0.705, 1.0]],
            ],
        }
    ],
    "blocks": [],
}


def main():
    import jax.numpy as jnp

    from fem_tpu.sim import element_phi

    sim = Simulation.from_dict(SPEC)
    scene = sim.scene[0]
    # Instantaneous 8% uniaxial stretch about the block's left edge.
    pos = np.array(scene.state.pos)  # writable copy
    x0 = pos[:, 0].min()
    pos[:, 0] = x0 + (pos[:, 0] - x0) * 1.08
    scene.state = scene.state.replace(pos=jnp.asarray(pos))

    frames = 30 if FAST else 120
    frame_s = SPEC["sim_count"] * SPEC["delta_time"]
    t, u = [], []
    for i in range(frames):
        sim.step_frame()
        t.append((i + 1) * frame_s)
        u.append(float(np.sum(np.asarray(element_phi(scene.obj, scene.state)))))
    t, u = np.asarray(t), np.asarray(u)

    # The relaxing part of the energy: U(t) − U(∞).  Fit log-linear decay
    # over the first ~2τ (later samples sit in the plateau noise).
    u_inf = u[-5:].mean()
    mask = (t < 2.0 * TAU) & (u - u_inf > 1e-12)
    rate, _ = np.polyfit(t[mask], np.log(u[mask] - u_inf), 1)
    tau_fit = -1.0 / rate
    print(
        f"U(0+)={u[0]:.4f} J  U(inf)={u_inf:.4f} J  "
        f"(relaxed fraction {(u[0] - u_inf) / u[0]:.2f})"
    )
    # The branch ENERGY decays at ~tau/2 (energy is quadratic in the branch
    # strain, which itself decays at tau).
    print(
        f"fitted energy decay constant {tau_fit * 1e3:.1f} ms "
        f"vs tau/2 = {TAU / 2 * 1e3:.1f} ms (configured tau {TAU * 1e3:.0f} ms)"
    )
    ok = 0.5 * TAU / 2 < tau_fit < 2.0 * TAU / 2
    print("relaxation timescale matches" if ok else "timescale MISMATCH")


if __name__ == "__main__":
    main()
