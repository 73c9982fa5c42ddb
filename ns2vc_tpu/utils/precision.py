"""Mixed-precision helpers.

The reference trains under `accelerator.autocast()` (reference
model.py:859, backend-configured fp16/bf16); the TPU-native policy here:
keep float32 master parameters (optimizer state in f32), cast parameters +
activations to bfloat16 at apply time. This halves HBM
traffic on the weight/activation streams while:
- flax norm layers force float32 reductions regardless of input dtype
  (flax/linen/normalization.py force_float32_reductions), and
- the attention cores compute softmax in float32
  (ns2vc_tpu/ops/attention.py),
so no loss scaling is needed (bf16 shares float32's exponent range).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast floating-point leaves to `dtype`, leaving ints/bools alone."""
    def leaf(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(leaf, tree)


def resolve_dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]
