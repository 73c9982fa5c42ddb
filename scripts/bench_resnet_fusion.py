"""Measure the fused GN+SiLU+conv Pallas epilogue vs XLA on-chip.

Conv is ~35% of the B=16 synthesize device profile (CLAUDE.md), so
VERDICT round-2 #7 asks for a measured verdict on a fused ResnetBlock1D
epilogue. This benchmarks the exact composite the block runs —
GroupNorm -> SiLU -> conv1d(k3, SAME) — at the UNet's four level shapes
(B=16, T=400/200/100/50, C=Co=128/256/384/512, bf16 activations) both as
plain XLA and as ops/pallas_resnet.gn_silu_conv1d.

Timing protocol per CLAUDE.md: chained data-dependent calls, one untimed
warm round, host readback as the only sync.

Usage: python scripts/bench_resnet_fusion.py [--iters 20]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NS2VC_CACHE", os.path.join(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import flax.linen as nn

from ns2vc_tpu.ops.pallas_resnet import gn_silu_conv1d

SHAPES = [  # (T, C) per UNet level at B=16, flagship T=400
    (400, 128), (200, 256), (100, 384), (50, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b = args.batch

    for t, c in SHAPES:
        r = np.random.default_rng(c)
        x0 = jnp.asarray(r.standard_normal((b, t, c)), jnp.bfloat16)
        gamma = jnp.asarray(1 + 0.1 * r.standard_normal(c), jnp.float32)
        beta = jnp.asarray(0.1 * r.standard_normal(c), jnp.float32)
        w = jnp.asarray(r.standard_normal((3, c, c)) / np.sqrt(3 * c),
                        jnp.bfloat16)
        bias = jnp.asarray(0.1 * r.standard_normal(c), jnp.float32)

        gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)

        @jax.jit
        def xla_chain(x):
            h = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
            h = nn.silu(h)
            h = nn.Conv(c, (3,), padding="SAME", dtype=jnp.bfloat16).apply(
                {"params": {"kernel": w, "bias": bias}}, h)
            return h.astype(jnp.bfloat16)

        @jax.jit
        def pallas_chain(x):
            return gn_silu_conv1d(x, gamma, beta, w, bias).astype(
                jnp.bfloat16)

        def timed(fn):
            x = fn(x0)                       # compile
            np.asarray(x[:1, :1, :1])
            for _ in range(args.iters):      # untimed warm chained round
                x = fn(x * jnp.bfloat16(0.999) + x0 * jnp.bfloat16(0.001))
            np.asarray(x[:1, :1, :1])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                x = fn(x * jnp.bfloat16(0.999) + x0 * jnp.bfloat16(0.001))
            np.asarray(x[:1, :1, :1])
            return (time.perf_counter() - t0) / args.iters * 1e3

        # numeric sanity at this shape before timing
        ref = np.asarray(xla_chain(x0), np.float32)
        got = np.asarray(pallas_chain(x0), np.float32)
        err = float(np.max(np.abs(ref - got)))

        ms_xla = timed(xla_chain)
        ms_pal = timed(pallas_chain)
        print(json.dumps({
            "shape": f"B{b}xT{t}xC{c}", "xla_ms": round(ms_xla, 3),
            "pallas_ms": round(ms_pal, 3),
            "speedup": round(ms_xla / ms_pal, 2),
            "max_abs_err": round(err, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
