"""Microbenchmark the UNet GEGLU feed-forward fusion on TPU.

Motivation (round-3 profile, /tmp/prof/b16): the largest single family in
the synthesize device profile is the ~20 `add_add_fusion` instructions —
XLA output-fusions computing [GEGLU elementwise -> down-projection dot ->
bias + residual adds] at the four UNet level shapes, ~50 ms of the
175 ms/call B=16 total, running ~3x off the HBM roofline. The suspected
cost is the exact-erf gelu (reference unet1d/attention.py:310-388 uses
torch F.gelu = erf form) evaluated on 3-7M elements per execution on the
VPU. The tanh approximation's max error (~1e-3 absolute near |x|~1) is
below bf16 resolution, so for bf16 execution it is numerically free.

This script times the fused FF block res + (value * act(gate)) @ W at
each UNet level geometry for act in {erf-gelu, tanh-gelu, relu, identity}
(identity = the pure dot+adds floor), using the repo's honest protocol:
chained data-dependent calls, host-readback sync, one untimed warm round.

Run: python scripts/bench_geglu.py [--batch 16] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
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

ACTS = {
    "gelu_erf": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "identity": lambda x: x,
}


@functools.partial(jax.jit, static_argnames="act")
def ff(h, w, b, res, act):
    d = h.shape[-1] // 2
    gated = h[..., :d] * ACTS[act](h[..., d:])
    return res + (jnp.einsum("btk,kc->btc", gated, w,
                             preferred_element_type=jnp.float32)
                  .astype(res.dtype) + b)


def timeit(fn, h, w, b, res, iters):
    res = fn(h, w, b, res)
    np.asarray(res[0, 0, :1])           # compile + sync
    for _ in range(iters):              # untimed warm round (first
        res = fn(h, w, b, res)          # distinct-args round is ~25x slow)
    np.asarray(res[0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        res = fn(h, w, b, res)
    np.asarray(res[0, 0, :1])
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)

    # (T, C) per UNet level at the flagship T=400 bench geometry
    levels = [(400, 128), (200, 256), (100, 384), (50, 512)]
    rng = jax.random.PRNGKey(0)
    print(f"B={args.batch} dtype={args.dtype} "
          f"(ms/call, chained+readback, {args.iters} iters)")
    header = f"{'shape':>18}" + "".join(f"{a:>12}" for a in ACTS)
    print(header)
    for t, c in levels:
        inner = 4 * c
        h = jax.random.normal(rng, (args.batch, t, 2 * inner), dtype)
        w = jax.random.normal(jax.random.fold_in(rng, 1), (inner, c),
                              dtype) / inner ** 0.5
        b = jnp.zeros((c,), dtype)
        res = jax.random.normal(jax.random.fold_in(rng, 2),
                                (args.batch, t, c), dtype)
        row = f"({args.batch},{t},{2 * inner})"
        cells = []
        for act in ACTS:
            fn = lambda h_, w_, b_, r_, a=act: ff(h_, w_, b_, r_, a)
            cells.append(timeit(fn, h, w, b, res, args.iters))
        print(f"{row:>18}" + "".join(f"{ms:12.3f}" for ms in cells))


if __name__ == "__main__":
    main()
