# coding=utf-8
"""MFU / FLOP accounting for the headline configs (VERDICT r2 missing #2).

Separates three quantities per operator apply and per substep:

* **useful FLOPs** — the minimal matrix-free algorithm cost of the
  reference-semantics operator (graph_block_apply): per element,
  edge-differences (d·d subs), t_j = K_e·s_j (d²·d MACs → 2·d³ FLOPs),
  and the (d+1)-vertex scatter adds.  This is what ANY implementation of
  the decoupled-block operator must compute.
* **issued MXU MACs** — what the blocked execution strategy actually
  feeds the MXU: the one-hot/±1 incidence dots (ops/blocking.py /
  ops/pallas_blocked_cg.py), exactly computable from table shapes
  (stacked 3-plane split-dots issue 3 value rows per logical row).
* **achieved FLOP/s vs chip peak** — issued MACs×2 / measured apply
  time, against the v5e peak (197 TFLOP/s bf16 / 98.5 f32).

The ratio useful/issued is the price of mapping irregular FEM incidence
onto dense MXU tiles; achieved/peak is how hard the MXU itself is driven.
Both are reported so the BASELINE "fast on TPU" claims are quantified
against hardware rather than only against the reference algorithm.

Timing uses lax.scan iteration slopes ending in a device->host value
fetch (the only reliable completion barrier on this relayed backend —
see CLAUDE.md / BASELINE.md measurement notes).

Usage: python tools/mfu.py [--spacing 0.04]   (omit --spacing for the
4,068-tet flagship mesh)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12


def slope_s(make_scan, lens=(8, 40), warm=2):
    ts = []
    for n in lens:
        fn = make_scan(n)
        for _ in range(warm):
            out = fn()
        np.asarray(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
            np.asarray(out)
        ts.append((time.perf_counter() - t0) / reps)
    return (ts[1] - ts[0]) / (lens[1] - lens[0])


def useful_flops_per_apply(e_cnt: int, d: int) -> float:
    """Minimal matrix-free cost of one G(K)·x: per element, d edge
    differences (d·d subs), d small matvecs (2·d³), scatter of d columns +
    negative sum onto d+1 vertices (~2·d·(d+1) adds)."""
    return e_cnt * (d * d + 2 * d ** 3 + 2 * d * (d + 1))


def issued_macs_per_apply(blocking, d: int, planes: int = 3) -> float:
    """MXU MACs per blocked operator apply (op-composed path,
    ops/blocking.py::_matvec_kernel): per block, the stacked split-dot
    issues (planes·d, Pb)×(Pb, R) + (planes·d, R)×(R, Pb)."""
    b_cnt, eb, pb = blocking.num_blocks, blocking.eb, blocking.pb
    r = eb * d
    return b_cnt * (planes * d) * pb * r * 2


def issued_macs_per_fused_apply(blocking, d: int, n: int, planes: int = 3):
    """MXU MACs per whole-solve-kernel apply: block S dots plus the flat
    gather/scatter one-hot dots against (B·Pb, N_pad)."""
    from fem_tpu.ops.pallas_blocked_cg import _round_up

    b_cnt, eb, pb = blocking.num_blocks, blocking.eb, blocking.pb
    r = eb * d
    n_pad = _round_up(n, 128)
    s_dots = b_cnt * (planes * d) * pb * r * 2
    g_dots = (planes * d) * (b_cnt * pb) * n_pad * 2
    return s_dots + g_dots


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spacing", type=float, default=None)
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
    verts, faces, elems, _ = load_object_mesh(ocfg, args.spacing)
    obj, state = build_object(ocfg, verts, faces, elems)
    d, n, e_cnt = obj.dim, obj.particle_cnt, obj.element_cnt
    blk = obj.blocking
    print(
        f"mesh: {e_cnt} tets / {n} particles | blocks={blk.num_blocks} "
        f"Eb={blk.eb} Pb={blk.pb}", file=sys.stderr,
    )

    K = hessian_blocks(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda,
    )
    kplane = B.make_kplane(blk, K, d)
    x0 = state.pos

    def mk_apply(n_iter):
        @jax.jit
        def run(blocking, kp, x):
            def step(c, _):
                y = B.blocked_graph_apply(blocking, kp, c, n, d)
                return y, None

            y, _ = jax.lax.scan(step, x, None, length=n_iter)
            return jnp.sum(y)

        return lambda: run(blk, kplane, x0)

    t_apply = slope_s(mk_apply)
    useful = useful_flops_per_apply(e_cnt, d)
    issued = issued_macs_per_apply(blk, d)
    achieved = issued * 2 / t_apply
    rows = [
        ("apply time (op-composed blocked)", f"{t_apply * 1e6:.1f} us"),
        ("useful FLOPs/apply (matrix-free algorithm)", f"{useful / 1e6:.2f} M"),
        ("issued MXU MACs/apply (incidence dots)", f"{issued / 1e6:.1f} M"),
        ("useful / issued-FLOPs", f"{useful / (issued * 2):.2%}"),
        ("achieved MXU FLOP/s", f"{achieved / 1e12:.2f} T"),
        ("MFU vs v5e bf16 peak (197T)", f"{achieved / V5E_PEAK_BF16:.2%}"),
        ("MFU vs v5e f32 peak (98.5T)", f"{achieved / V5E_PEAK_F32:.2%}"),
        ("useful-FLOP/s (algorithmic)", f"{useful / t_apply / 1e9:.1f} G"),
    ]
    if blk.s_dense is not None:
        fused_issued = issued_macs_per_fused_apply(blk, d, n)
        rows.append(
            ("whole-solve kernel issued MACs/apply", f"{fused_issued / 1e6:.1f} M")
        )
        rows.append(
            ("  of which flat gather/scatter one-hot",
             f"{(fused_issued - issued) / 1e6:.1f} M")
        )
    for k, v in rows:
        print(f"{k:45s} {v}")


if __name__ == "__main__":
    main()
