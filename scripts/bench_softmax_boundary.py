"""Microbenchmark: can the attention-probs fusion boundary be made bf16?

The synthesize program's batch-scaling cliff is XLA materializing the f32
softmax(probs) fusion output in VMEM while it fits (82 MB at B=16) and
spilling to HBM past that (B=24+) — see ops/attention.py capacity note.
Three mitigations are recorded negative (optimization_barrier, Pallas
flash in-program, fused resnet epilogue). This tests a FOURTH structure:
flash-style *unnormalized* attention — materialize exp(l - max) cast to
bf16 (half the footprint), dot with V, and divide by the f32 row-sum
AFTER the dot. The cast sits at the root of a plain elementwise producer
whose consumer is a bare dot, giving XLA's fusion pass a different (and
hopefully bf16) boundary than softmax-div -> convert -> dot.

Numerics: exp values are in [0, 1] after max-subtraction and the row-sum
is accumulated in f32 from the f32 exps inside the producer fusion, so
the only loss vs the current path is bf16 rounding of individual probs —
the same rounding the current path applies one op later (weights.astype
(v.dtype) at attention.py:56).

Run: python scripts/bench_softmax_boundary.py [--batches 16 24 32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NS2VC_CACHE", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np


from ns2vc_tpu.ops import attention as A

# the real implementations the NS2VC_ATTN_IMPL knob dispatches to
sdpa = jax.jit(A.scaled_dot_product_attention)
postdiv = jax.jit(A.sdpa_postdiv)
def make_blocked(block_k):
    return jax.jit(functools.partial(A.sdpa_blocked, block_k=block_k))


def timeit(fn, q, k, v, iters=20):
    o = fn(q, k, v)
    np.asarray(o[0, 0, 0, :1])                    # compile + sync
    for _ in range(iters):                        # untimed warm round
        o = fn(o, k, v)
    np.asarray(o[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(o, k, v)
    np.asarray(o[0, 0, 0, :1])
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 24, 32])
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--head_dim", type=int, default=16,
                    help="UNet level-0 head_dim (C=128 / 8 heads)")
    ap.add_argument("--t", type=int, default=400)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block_k", type=int, default=200,
                    help="key block for sdpa_blocked (200 divides T=400 -> no pad)")
    args = ap.parse_args()

    blocked = make_blocked(args.block_k)
    rng = jax.random.PRNGKey(0)
    print(f"T={args.t} H={args.heads} D={args.head_dim} bf16 "
          f"(ms/call, chained+readback)")
    print(f"{'B':>4}{'sdpa':>10}{'postdiv':>10}{'blocked':>10}"
          f"{'max|diff|':>12}")
    for b in args.batches:
        shape = (b, args.heads, args.t, args.head_dim)
        q = jax.random.normal(rng, shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), shape,
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(rng, 2), shape,
                              jnp.bfloat16)
        base = sdpa(q, k, v).astype(jnp.float32)
        diff = max(
            float(jnp.max(jnp.abs(base
                                  - postdiv(q, k, v)
                                  .astype(jnp.float32)))),
            float(jnp.max(jnp.abs(base
                                  - blocked(q, k, v)
                                  .astype(jnp.float32)))))
        ms_a = timeit(sdpa, q, k, v, args.iters)
        ms_b = timeit(postdiv, q, k, v, args.iters)
        ms_c = timeit(blocked, q, k, v, args.iters)
        print(f"{b:>4}{ms_a:>10.3f}{ms_b:>10.3f}{ms_c:>10.3f}"
              f"{diff:>12.4f}", flush=True)


if __name__ == "__main__":
    main()
