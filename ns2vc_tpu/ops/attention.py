"""Attention cores.

`multihead_attention` is the functional scaled-dot-product core used by the
encoder layers (reference operations.py:304-641 MultiheadAttention /
F.multi_head_attention_forward) and the UNet attention processors
(reference unet1d/attention_processor.py:971-1052 AttnProcessor2_0).

At this model's sizes (T <= ~512, heads 8, head_dim 16-64) XLA's fused
dot-general attention already runs at MXU speed-of-light; a Pallas
flash-attention kernel (ns2vc_tpu/ops/pallas_attention.py) is selected for
long-sequence batched inference where the O(T^2) intermediate would spill
VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """q (..., H, Tq, D), k/v (..., H, Tk, D) -> (..., H, Tq, D).

    Softmax is computed in float32 regardless of input dtype (bf16-safe),
    matching torch SDPA numerics closely."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, T, C) -> (B, H, T, C/H)."""
    b, t, c = x.shape
    return x.reshape(b, t, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, D) -> (B, T, H*D)."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Projected multi-head attention on (B, T, C) tensors.

    bias broadcasts against (B, H, Tq, Tk) — pass (B, 1, 1, Tk) for a key
    padding bias."""
    out = scaled_dot_product_attention(
        split_heads(q, num_heads), split_heads(k, num_heads),
        split_heads(v, num_heads), bias=bias, scale=scale)
    return merge_heads(out)
