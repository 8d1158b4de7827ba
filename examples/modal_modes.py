# coding=utf-8
"""Modal analysis: natural frequencies and mode shapes of a hanging slab.

Extensions used (the reference has no eigenanalysis): ``pin_boxes``
Dirichlet BCs + ``Simulation.modes`` (solvers/modal.py — matrix-free
shift-invert LOBPCG on the exact material Hessian).  Renders each mode as
an animated displacement gif and cross-checks mode 1 against what damped
dynamics actually does: kick the body along the mode shape and measure the
ring-down frequency.

Run: python examples/modal_modes.py [outdir]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from fem_tpu.api import Simulation

FAST = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"

CONFIG = {
    "dim": 2,
    "delta_time": 5e-4,
    "sim_count": 10,
    "use_explicit_method": False,
    "implicit_method": 1,
    "preconditioned": 0,
    "cg_precond": "none",
    "g_dir": [0.0, 0.0],  # modes about the REST pose: no gravity preload
    "objects": [
        {
            "center": [0.4, 0.5],
            "E": 2e4,
            "nu": 0.2,
            "damping": 0.5,
            "side_length": 0.2,
            "subdivisions": 8,
            "pin_boxes": [[[0.35, 0.695], [0.65, 0.705]]],
        }
    ],
}


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fem_modes"
    os.makedirs(outdir, exist_ok=True)
    sim = Simulation.from_dict(CONFIG)
    k = 3 if FAST else 5
    res = sim.modes(k=k)
    freqs = np.asarray(res.frequencies)
    print("natural frequencies (Hz):", np.round(freqs, 3))
    print("relative residuals:", np.asarray(res.residuals))

    # Render each mode as a displacement animation.
    if not FAST:
        try:
            import imageio
            import jax.numpy as jnp

            rest = np.asarray(sim.positions())
            body = sim.scene[0]
            rest_state = body.state
            for i in range(k):
                mode = np.asarray(res.modes[i])
                amp = 0.03 / (np.abs(mode).max() + 1e-30)
                frames = []
                for t in range(24):
                    disp = amp * np.sin(2 * np.pi * t / 24) * mode
                    body.state = rest_state.replace(
                        pos=jnp.asarray((rest + disp).astype(np.float32))
                    )
                    frames.append(
                        sim.render(msgs=(f"mode {i + 1}: {freqs[i]:.2f} Hz",))
                    )
                imageio.mimsave(
                    os.path.join(outdir, f"mode_{i + 1}.gif"), frames, fps=12
                )
            body.state = rest_state
            print(f"mode gifs -> {outdir}")
        except Exception as exc:  # rendering is optional
            print(f"render skipped: {exc}")

    # Cross-check: kick along mode 1 and measure the ring-down frequency
    # from zero crossings of the modal coordinate.
    mode1 = np.asarray(res.modes[0])
    body = sim.scene[0]
    import jax.numpy as jnp

    rest_pos = np.asarray(sim.positions())
    kick = 0.2 * mode1 / (np.abs(mode1).max() + 1e-30)
    body.state = body.state.replace(vel=jnp.asarray(kick.astype(np.float32)))
    coord = []
    n_frames = 30 if FAST else 240
    for _ in range(n_frames):
        sim.step_frame()
        disp = np.asarray(sim.positions()) - rest_pos
        coord.append(float((disp * mode1).sum()))
    if not FAST:
        sig = np.asarray(coord) - np.mean(coord)
        crossings = np.where(np.diff(np.sign(sig)) != 0)[0]
        if len(crossings) >= 3:
            period_frames = 2.0 * np.mean(np.diff(crossings))
            frame_dt = CONFIG["sim_count"] * CONFIG["delta_time"]
            f_measured = 1.0 / (period_frames * frame_dt)
            print(
                f"mode-1 ring-down: {f_measured:.2f} Hz measured vs "
                f"{freqs[0]:.2f} Hz predicted"
            )


if __name__ == "__main__":
    main()
