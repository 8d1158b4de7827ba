# coding=utf-8
"""Structural stability + frequency-domain walkthrough: the three analysis
types the reference (a dynamics-only simulator) has no counterpart for.

1. **Linear buckling** (`Simulation.buckling`, solvers/buckling.py): a
   slender pinned column under axial compression — critical load factor
   vs the Euler formula, and the lateral sway mode.
2. **Arc-length continuation** (`Simulation.arc_length`, solvers/riks.py):
   a shallow arch pushed at the crown — the full load–deflection path
   through the snap-through fold, printed as an ASCII λ–w curve.
3. **Harmonic response** (`Simulation.harmonic`, solvers/harmonic.py):
   FRF of the column tip under lateral excitation across its first
   resonances.

Run: python examples/stability_analysis.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

FAST = os.environ.get("FEM_TPU_EXAMPLE_FAST") == "1"


def build_strip(nx, ny, width, height, rise=0.0, pin="bottom"):
    """Rectangular strip (optionally bent into a sine arch) as a raw
    FemObject — the same helper family as tests/test_buckling.py."""
    import jax.numpy as jnp  # noqa: F401  (env setup before heavy imports)

    from fem_tpu.models.state import build_object
    from fem_tpu.utils.config import ObjectConfig

    xs = np.linspace(0.0, width, nx + 1)
    ys = np.linspace(0.0, height, ny + 1)
    v = np.array(np.meshgrid(xs, ys)).T.reshape(-1, 2).astype(np.float32)
    if rise:
        v[:, 1] += (rise * np.sin(np.pi * v[:, 0] / width)).astype(
            np.float32
        )
    faces = []
    for i in range(nx):
        for j in range(ny):
            p1 = i * (ny + 1) + j
            faces.append([p1, p1 + 1, p1 + ny + 2])
            faces.append([p1, p1 + ny + 2, p1 + ny + 1])
    faces = np.array(faces, np.int32)
    if pin == "bottom":
        boxes = (((-1.0, -1.0), (width + 1.0, 1e-6)),)
    else:  # both ends of a horizontal strip/arch
        eps = width / nx / 4.0
        boxes = (
            ((-1.0, -1.0), (eps, 1.0)),
            ((width - eps, -1.0), (width + 1.0, 1.0)),
        )
    cfg = ObjectConfig(center=(0.0, 0.0), pin_boxes=boxes)
    obj, state = build_object(cfg, v, faces, faces.copy())
    return cfg, obj, state


def main():
    import jax.numpy as jnp

    from fem_tpu.solvers.buckling import linear_buckling
    from fem_tpu.solvers.harmonic import harmonic_response
    from fem_tpu.solvers.modal import modal_analysis_chebyshev
    from fem_tpu.solvers.riks import arc_length_path

    # ---- 1. Euler column buckling --------------------------------------
    t, height = 0.05, 0.5
    nx, ny = (4, 20) if FAST else (6, 40)
    cfg, obj, state = build_strip(nx, ny, t, height, pin="bottom")
    pos = np.asarray(state.pos)
    top = np.where(pos[:, 1] > pos[:, 1].max() - 1e-6)[0]
    f = np.zeros_like(pos)
    f[top, 1] = -0.5 / len(top)
    res = linear_buckling(obj, state.pos, f_ext=jnp.asarray(f), k=2,
                          rounds=12 if FAST else 20)
    p_cr = float(res.load_factors[0]) * 0.5
    mu_l, lam_l = cfg.mu, cfg.s_lambda
    e2d = 4.0 * mu_l * (mu_l + lam_l) / (lam_l + 2.0 * mu_l)
    p_euler = np.pi**2 * e2d * t**3 / 12.0 / (4.0 * height**2)
    print(f"[buckling] column P_cr = {p_cr:.3f} N  "
          f"(Euler fixed-free: {p_euler:.3f} N, "
          f"CST mesh is {p_cr / p_euler:.2f}x — converges from above)")

    # ---- 2. Snap-through of a shallow arch ------------------------------
    nxa = 32 if FAST else 48
    _, arch, astate = build_strip(nxa, 2, 1.0, 0.012, rise=0.06, pin="ends")
    apos = np.asarray(astate.pos)
    crown = np.where(np.abs(apos[:, 0] - 0.5) < 1.0 / nxa * 0.6)[0]
    fa = np.zeros_like(apos)
    fa[crown, 1] = -1.0 / len(crown)
    from fem_tpu.solvers.riks import _SparseTangent

    dx_lin = _SparseTangent(arch).factor(astate.pos)(
        np.asarray(fa, np.float64)
    )
    scale = 0.10 * 0.06 / abs(float(np.mean(dx_lin[crown, 1])))
    path = arc_length_path(
        arch, astate.pos, jnp.asarray(fa * scale),
        n_steps=12 if FAST else 30, dlam0=0.3, record_path=False,
    )
    lam = np.asarray(path.lam)
    w = -np.asarray(path.control)
    past = np.where(w > 0.06)[0]
    fold = lam[: past[0]].max() if past.size else lam.max()
    print(f"[riks] arch path: {path.steps_taken} steps, "
          f"fold at lambda = {fold:.2f}")
    # ASCII λ–w curve (λ vertical, crown deflection horizontal) — the fold
    # shows as the curve doubling back under its own peak.
    rows, cols = 12, 56
    lmax = lam.max()
    for r in range(rows, -1, -1):
        lo, hi = lmax * (r - 0.5) / rows, lmax * (r + 0.5) / rows
        marks = [" "] * cols
        for l, wi in zip(lam, w):
            if lo <= l < hi:
                marks[int(wi / max(w.max(), 1e-9) * (cols - 1))] = "*"
        print(f"  {hi:7.2f} |" + "".join(marks))
    print("          +" + "-" * cols + f"  (crown deflection -> {w.max():.3f})")

    # ---- 3. Harmonic response of the column -----------------------------
    modal = modal_analysis_chebyshev(obj, state.pos, k=4,
                                     rounds=4 if FAST else 8)
    f1 = float(modal.frequencies[0])
    fh = np.zeros_like(pos)
    fh[top, 0] = 0.01 / len(top)  # lateral tip excitation
    freqs = np.linspace(0.3 * f1, 3.0 * f1, 9 if FAST else 25).astype(
        np.float32
    )
    h = harmonic_response(modal, jnp.asarray(fh), jnp.asarray(freqs),
                          zeta=np.full(4, 0.02, np.float32))
    amp = np.asarray(h.amplitude).max(axis=(1, 2))
    print(f"[harmonic] column FRF (f1 = {f1:.2f} Hz):")
    for fq, a in zip(freqs, amp):
        bar = "#" * min(int(a / amp.max() * 40), 40)
        print(f"  {fq:7.2f} Hz |{bar}")
    peak = freqs[int(np.argmax(amp))]
    print(f"  peak at {peak:.2f} Hz (mode 1 at {f1:.2f} Hz)")


if __name__ == "__main__":
    main()
