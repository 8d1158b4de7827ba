# coding=utf-8
"""VERDICT r3 #8 probe: one fresh attack on the 68k blocked-matvec
pipeline-fill bound.

Round-3 measurement: the op-composed blocked apply is MXU-pipeline-FILL
bound — 1.2 µs/block ≈ the systolic fill of each small (d, Pb)×(Pb, R) dot,
0.8% MFU, and neither stacked split-dots (−12%) nor scatter work moves it.
Hypothesis to test here: processing TWO blocks per Pallas grid step (their
dot chains are independent) lets Mosaic interleave the second block's
S-build/first dot into the first block's fill bubbles.  If pairing helps,
quad-ing would too; if it measures neutral-to-worse, the fill bound is set
by in-order MXU issue within a kernel body and the negative result closes
this family (recorded in BASELINE.md).

Usage: python tools/probe_pairblock.py [--spacing 0.04] [--iters 200]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("dim", "pair"))
def paired_matvec(blocking, kplane, xbt, dim: int, pair: int):
    """The _blocked_matvec_call kernel with ``pair`` blocks per grid step."""
    from fem_tpu.ops.blocking import _build_s
    from fem_tpu.ops.pallas_blocked_cg import _dot

    b, eb, pb = blocking.num_blocks, blocking.eb, blocking.pb
    assert b % pair == 0, (b, pair)
    r = eb * dim

    def kernel(plus_ref, minus_ref, xbt_ref, kp_ref, out_ref):
        for j in range(pair):
            s = _build_s(plus_ref[j], minus_ref[j], r, pb)
            st = _dot(xbt_ref[j], s, (((1,), (1,))))
            kp = kp_ref[j]
            rows = []
            for i in range(dim):
                acc = None
                for k in range(dim):
                    term = kp[i * dim + k, :] * st[k, :]
                    acc = term if acc is None else acc + term
                rows.append(acc)
            t = jnp.stack(rows, 0)
            out_ref[j] = _dot(t, s, (((1,), (0,))))

    spec = lambda *shape: pl.BlockSpec(
        (pair,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // pair,),
        in_specs=[spec(r, 1), spec(r, 1), spec(dim, pb),
                  spec(dim * dim, r)],
        out_specs=spec(dim, pb),
        out_shape=jax.ShapeDtypeStruct((b, dim, pb), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(blocking.plus, blocking.minus, xbt, kplane)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spacing", type=float, default=0.04)
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()

    from fem_tpu.models.mesh import load_object_mesh
    from fem_tpu.models.state import build_object
    from fem_tpu.ops.blocking import (
        _blocked_matvec_call, blocked_gather, make_kplane, pad_blocking,
    )
    from fem_tpu.ops.element import hessian_blocks
    from fem_tpu.utils.config import ObjectConfig

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ocfg = ObjectConfig(
        center=(2.0, 0.7, 2.0), rho=1000.0, E=4e4, nu=0.4, damping=10.0,
        obj=os.path.join(here, "assets", "spot.obj"),
    )
    v, f, e, _ = load_object_mesh(ocfg, args.spacing)
    obj, state = build_object(ocfg, v, f, e)
    blk = obj.blocking
    d = obj.dim
    print(f"{obj.element_cnt} tets, {blk.num_blocks} blocks", flush=True)
    K = hessian_blocks(
        state.pos, blk.element_indices, blk.ref_inv, blk.volume,
        obj.mu, obj.s_lambda,
    )
    kp = make_kplane(blk, K, d)
    xbt = blocked_gather(state.pos, blk)

    def timeit(fn, *a, **kw):
        out = fn(*a, **kw)
        _ = np.asarray(out)  # warm + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a, **kw)
        _ = np.asarray(out)
        return (time.perf_counter() - t0) / args.iters * 1e6, out

    t1, o1 = timeit(_blocked_matvec_call, blk, kp, xbt, d, False)
    print(f"baseline 1-block/step : {t1:8.1f} us/apply", flush=True)
    for pair in (2, 4):
        if blk.num_blocks % pair:
            blk_p = pad_blocking(blk, pair)
            kp_p = jnp.zeros(
                (blk_p.num_blocks,) + kp.shape[1:], kp.dtype
            ).at[: kp.shape[0]].set(kp)
            xbt_p = blocked_gather(state.pos, blk_p)
        else:
            blk_p, kp_p, xbt_p = blk, kp, xbt
        tp, op = timeit(paired_matvec, blk_p, kp_p, xbt_p, d, pair)
        diff = float(
            jnp.max(jnp.abs(op[: o1.shape[0]] - o1))
        )
        print(
            f"paired {pair}-block/step: {tp:8.1f} us/apply "
            f"(maxdiff {diff:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
