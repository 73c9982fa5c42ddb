"""Measure XLA dot-general attention vs the Pallas flash kernel on TPU.

Produces the crossover table that decides where `attn_impl='pallas'` is
worth dispatching (the reference's analogue is torch SDPA being the
default attention processor, unet1d/attention_processor.py:971-1052).

Run on the TPU chip:  python scripts/bench_attention.py
Prints one row per (Tq=Tk, dtype): ms per call for both impls.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NS2VC_CACHE", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


import numpy as np


def timeit(fn, q, k, v, iters=10):
    """ms per call: time a chain of `iters` data-dependent calls (each
    output feeds the next query) ending in a host readback, divide by
    iters. Chaining defeats identical-dispatch dedup, and the readback is
    the only sync this backend honors — block_until_ready returns early
    here, timing ~0.02 ms regardless of FLOPs."""
    q = fn(q, k, v)
    np.asarray(q[0, 0, 0, :1])  # warmup/compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        q = fn(q, k, v)
    np.asarray(q[0, 0, 0, :1])
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--head_dim", type=int, default=32)
    p.add_argument("--lens", type=int, nargs="+",
                   default=[512, 2048, 8192, 16384])
    p.add_argument("--block_q", type=int, default=128)
    p.add_argument("--block_k", type=int, default=128)
    p.add_argument("--skip_xla", action="store_true")
    args = p.parse_args()

    from ns2vc_tpu.ops.attention import scaled_dot_product_attention
    from ns2vc_tpu.ops.pallas_attention import flash_attention

    rows = []
    for t in args.lens:
        for dtype in (jnp.bfloat16, jnp.float32):
            rng = jax.random.PRNGKey(0)
            shape = (args.batch, args.heads, t, args.head_dim)
            q = jax.random.normal(rng, shape, dtype)
            k = jax.random.normal(jax.random.fold_in(rng, 1), shape, dtype)
            v = jax.random.normal(jax.random.fold_in(rng, 2), shape, dtype)

            xla_fn = jax.jit(scaled_dot_product_attention)
            ms_xla = None
            if not args.skip_xla:
                try:
                    ms_xla = timeit(xla_fn, q, k, v)
                except Exception as e:  # OOM at very long T
                    print(f"T={t} {dtype.__name__} xla failed: {e}")
            try:
                ms_pl = timeit(
                    lambda a, b, c: flash_attention(
                        a, b, c, block_q=args.block_q, block_k=args.block_k),
                    q, k, v)
            except Exception as e:
                ms_pl = None
                print(f"T={t} {dtype.__name__} pallas failed: {e}")
            row = {"t": t, "dtype": dtype.__name__,
                   "xla_ms": None if ms_xla is None else round(ms_xla, 3),
                   "pallas_ms": None if ms_pl is None else round(ms_pl, 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
