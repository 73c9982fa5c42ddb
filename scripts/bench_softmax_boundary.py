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


@jax.jit
def sdpa(q, k, v):
    """Current path (ops/attention.py::scaled_dot_product_attention)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@jax.jit
def postdiv(q, k, v):
    """Unnormalized bf16 exps, f32 row-sum, divide after the PV dot."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1)                       # f32 (B,H,Tq)
    o = jnp.einsum("bhqk,bhkd->bhqd", e.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return (o / s[..., None]).astype(v.dtype)


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
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    print(f"T={args.t} H={args.heads} D={args.head_dim} bf16 "
          f"(ms/call, chained+readback)")
    print(f"{'B':>4}{'sdpa':>10}{'postdiv':>10}{'max|diff|':>12}")
    for b in args.batches:
        shape = (b, args.heads, args.t, args.head_dim)
        q = jax.random.normal(rng, shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), shape,
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(rng, 2), shape,
                              jnp.bfloat16)
        diff = float(jnp.max(jnp.abs(
            sdpa(q, k, v).astype(jnp.float32)
            - postdiv(q, k, v).astype(jnp.float32))))
        ms_a = timeit(sdpa, q, k, v, args.iters)
        ms_b = timeit(postdiv, q, k, v, args.iters)
        print(f"{b:>4}{ms_a:>10.3f}{ms_b:>10.3f}{diff:>12.4f}", flush=True)


if __name__ == "__main__":
    main()
