# coding=utf-8
"""Probe: int8 incidence tables on the MXU (VERDICT r4 #9 / round-3 seed).

The fused kernels' hot cost is the one-hot/±1 table weight stream through
the MXU (BASELINE.md MFU table: 99.4% of issued MACs are incidence
overhead).  v5e runs int8×int8→int32 MXU at 2× the bf16 rate, and 0/±1
tables are exact in int8 — IF Mosaic lowers int8 dots at these shapes and
IF the value side can ride along (int8×bf16 mixed, or an int8 fixed-point
value decomposition), the weight-stream cost halves.

This probe measures, inside a Pallas kernel at the fused kernels' actual
shapes (flagship: G (2048, 1024) flat gather table, S (16·768, 128)
per-block incidence):

  1. bf16×bf16 → f32 dot (the shipped `_dot` single-pass form)
  2. int8×int8 → int32 dot (both sides quantized)
  3. int8×bf16 mixed (expected not to lower; recorded either way)

Each timed as a standalone repeated-dot kernel with a device→host value
fetch (relay: block_until_ready lies — CLAUDE.md).  Output: µs/dot and
the ratio; the verdict line goes to BASELINE.md.

Usage: python tools/probe_int8.py [--reps 200] [--n 1024] [--rows 6]
       [--cols 2048]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=200,
                   help="dots chained inside ONE kernel invocation")
    p.add_argument("--outer", type=int, default=30)
    p.add_argument("--n", type=int, default=1024, help="contract dim (N)")
    p.add_argument("--rows", type=int, default=6,
                   help="value-side rows (d·planes for d=3, 2-plane)")
    p.add_argument("--cols", type=int, default=2048,
                   help="table columns (B·Pb)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    table_np = rng.integers(-1, 2, size=(args.n, args.cols)).astype(np.int8)
    val_np = rng.standard_normal((args.rows, args.n)).astype(np.float32)

    def make_kernel(wdtype, adtype, acc_dtype):
        def kernel(a_ref, w_ref, o_ref):
            a = a_ref[...]
            w = w_ref[...]
            acc = None
            for _ in range(args.reps):
                t = jax.lax.dot_general(
                    a, w, ((((1,), (0,))), ((), ())),
                    preferred_element_type=acc_dtype,
                )
                acc = t if acc is None else acc + t
                # rotate the value side so the chain cannot collapse
                a = jnp.roll(a, 1, axis=0)
            o_ref[...] = acc.astype(jnp.float32)

        a = jnp.asarray(val_np.astype(adtype)) if adtype != jnp.int8 else (
            jnp.asarray(np.clip(val_np * 100, -127, 127).astype(np.int8))
        )
        w = jnp.asarray(table_np.astype(wdtype))
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (args.rows, args.cols), jnp.float32
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )
        return jax.jit(lambda a_, w_: fn(a_, w_)), a, w

    results = {}
    for name, wdt, adt, accdt in (
        ("bf16xbf16", jnp.bfloat16, jnp.bfloat16, jnp.float32),
        ("int8xint8", jnp.int8, jnp.int8, jnp.int32),
        ("int8xbf16", jnp.int8, jnp.bfloat16, jnp.float32),
    ):
        try:
            fn, a, w = make_kernel(wdt, adt, accdt)
            out = fn(a, w)
            _ = np.asarray(out)  # compile + completion barrier
            times = []
            for _ in range(args.outer):
                t0 = time.perf_counter()
                out = fn(a, w)
                _ = np.asarray(out)
                times.append(time.perf_counter() - t0)
            best = min(times)
            per_dot_us = best / args.reps * 1e6
            results[name] = per_dot_us
            print(f"{name}: {per_dot_us:.2f} us/dot "
                  f"(best-of-{args.outer}, {args.reps} chained)")
        except Exception as e:
            results[name] = None
            print(f"{name}: FAILED to lower/run: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")

    if results.get("bf16xbf16") and results.get("int8xint8"):
        r = results["bf16xbf16"] / results["int8xint8"]
        print(f"int8xint8 speedup over bf16: {r:.2f}x "
              f"({'PROMISING — worth an exactness scheme' if r > 1.3 else 'NEGATIVE — weight stream not int8-bound at these shapes'})")


if __name__ == "__main__":
    main()
