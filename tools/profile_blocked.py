# coding=utf-8
"""Breakdown of the blocked-operator apply on the current backend.

Times each piece (block gather, Pallas matvec kernel, segment-sum scatter,
K-plane prep) via lax.scan iteration slopes with scalar outputs — per-call
output transfer on the relayed backend costs ~1 ms/MB, so per-piece jits
with array outputs measure the relay, not the TPU (see CLAUDE.md).

Usage: python tools/profile_blocked.py [--spacing 0.04]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_us(make_scan, lens=(8, 40), warm=2):
    """Compile scan(f, n) for two lengths; slope = per-iteration cost."""
    ts = []
    for n in lens:
        fn = make_scan(n)
        for _ in range(warm):
            out = fn()
        np.asarray(out)  # hard sync (block_until_ready lies on this relay)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
            np.asarray(out)
        ts.append((time.perf_counter() - t0) / reps)
    return (ts[1] - ts[0]) / (lens[1] - lens[0]) * 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spacing", type=float, default=0.04)
    p.add_argument("--lens", type=int, nargs=2, default=(8, 40))
    args = p.parse_args()

    from fem_tpu.models.mesh import load_object_mesh
    from fem_tpu.models.state import build_object
    from fem_tpu.ops import blocking as B
    from fem_tpu.ops.element import hessian_blocks
    from fem_tpu.utils.config import ObjectConfig, read_config

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = read_config(os.path.join(here, "configs", "demo_spot.json"))
    ocfg = ObjectConfig(
        **{**cfg.objects[0].__dict__,
           "obj": os.path.join(here, cfg.objects[0].obj)}
    )
    spacing = args.spacing if args.spacing and args.spacing > 0 else None
    verts, faces, elems, _ = load_object_mesh(ocfg, spacing)
    obj, state = build_object(ocfg, verts, faces, elems)
    blk = obj.blocking
    n_part, d = obj.particle_cnt, obj.dim
    print(
        f"mesh: {elems.shape[0]} tets / {n_part} particles | "
        f"blocks={blk.num_blocks} Eb={blk.eb} Pb={blk.pb} "
        f"gather rows={blk.num_blocks * blk.pb} "
        f"({blk.num_blocks * blk.pb / n_part:.2f}x N)",
        file=sys.stderr,
    )

    k_flat = hessian_blocks(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda,
    ).reshape(-1, d, d)
    kplane = B.make_kplane(blk, k_flat, d)
    x0 = state.pos
    xbt0 = B.blocked_gather(x0, blk)
    yt0 = B._blocked_matvec_call(blk, kplane, xbt0, d, False)
    lens = tuple(args.lens)

    def piece(name, body):
        # `body` must consume the carry (a (N, d) array) so the scan can't
        # hoist it as loop-invariant; the 1e-30 feedback keeps a sequential
        # dependence without perturbing values at f32 precision.
        def mk(n):
            @jax.jit
            def g(x):
                def step(c, _):
                    y = body(c)
                    leaf = jax.tree_util.tree_leaves(y)[0]
                    return c * (1.0 + 1e-30 * jnp.sum(leaf)), jnp.float32(0)

                c, _ = jax.lax.scan(step, x, None, length=n)
                return jnp.sum(c)

            return lambda: g(x0)

        us = slope_us(mk, lens)
        print(f"{name:34s} {us:9.1f} us/iter")
        return us

    dep = lambda x: 1.0 + 1e-30 * jnp.sum(x)  # runtime-dependent ~1.0

    piece("blocked apply (full)", lambda x: B.blocked_graph_apply(
        blk, kplane, x, n_part, d))
    piece("block gather x[bp]", lambda x: B.blocked_gather(x, blk))
    piece("pallas matvec kernel only", lambda x: B._blocked_matvec_call(
        blk, kplane, xbt0 * dep(x), d, False))
    piece("scatter (two-tier plan)", lambda x: B.blocked_scatter_sum(
        yt0 * dep(x), blk, n_part))
    piece("make_kplane", lambda x: B.make_kplane(blk, k_flat * dep(x), d))
    piece("hessian_blocks (xla)", lambda x: hessian_blocks(
        x, blk.element_indices, blk.ref_inv, blk.volume, obj.mu, obj.s_lambda))

    from fem_tpu.ops.pallas_kernels import hessian_and_force_pallas

    piece("hessian_and_force_pallas", lambda x: hessian_and_force_pallas(
        x, blk.element_indices, blk.ref_inv, blk.volume, obj.mu,
        obj.s_lambda))
    cols0 = jnp.zeros((blk.element_indices.shape[0], d, d), jnp.float32)
    piece("blocked_assemble (rhs f)", lambda x: B.blocked_assemble(
        blk, cols0 * dep(x), n_part, d))


if __name__ == "__main__":
    main()
