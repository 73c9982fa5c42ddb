"""Encoder-layer operation registry.

Rebuild of the reference's `OPERATIONS_ENCODER` numbered constructor table
(operations.py:953-972): 15 layer ids covering weight-normed conv layers
(k in {1,5,9,13,17,21,25}), self-attention layers (8/4/2 heads, kernel-9/
1/15 conv FFNs), chunked local self-attention, a BiLSTM layer, and
Gaussian-distance-biased attention. The VC config instantiates only id 8
(operations.py:961 via model.py:107), but the registry is part of the
reference's capability surface (its TTS branch selects ops by id).

All layers take/return (B, T, C) with a boolean validity mask and follow
the reference's pre-LN + residual + mask discipline.

TPU notes: the local-attention layer is expressed as one full attention
with a block-banded bias (identical semantics to the reference's python
chunk loop at operations.py:838-879, minus its output-zeroing sign bug —
see EncLocalSALayer's docstring) so it stays a single fused program; the
BiLSTM is two lax.scan passes (inherently sequential, as upstream).
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ns2vc_tpu.models.encoders import (
    LN_EPS, ConvFFN, EncSALayer, WNConvResidual,
)
from ns2vc_tpu.ops.attention import multihead_attention
from ns2vc_tpu.ops.masking import apply_mask, mask_to_bias


class EncLocalSALayer(nn.Module):
    """Chunked local self-attention + conv FFN (reference
    operations.py:824-879, chunk_size 101): queries in block b (width 51,
    starting s = 51*b) attend keys in [s-50, s+101).

    Note: the reference multiplies the attention output by
    `1 - q_nonpadding` (operations.py:869), which zeroes *valid* positions
    — an evident sign bug in an unused layer. This implementation zeroes
    padded positions instead."""

    channels: int
    num_heads: int = 2
    chunk_size: int = 101
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        t = x.shape[1]
        half = self.chunk_size // 2
        pos = np.arange(t)
        block_start = (pos // (half + 1)) * (half + 1)
        allowed = ((pos[None, :] >= block_start[:, None] - half)
                   & (pos[None, :] < block_start[:, None] + self.chunk_size))
        band_bias = jnp.asarray(
            np.where(allowed, 0.0, -1e9)[None, None], jnp.float32)

        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm1")(x)
        # packed projection with the band folded into the attention bias
        h2 = nn.DenseGeneral((3, self.channels), axis=-1, use_bias=False,
                             name="in_proj")(h)
        q, k, v = h2[..., 0, :], h2[..., 1, :], h2[..., 2, :]
        bias = band_bias + mask_to_bias(mask)[:, None, None, :]
        out = multihead_attention(q, k, v, self.num_heads, bias=bias)
        out = nn.Dense(self.channels, use_bias=False, name="out_proj")(out)
        out = apply_mask(out, mask)
        h = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm2")(x)
        h = ConvFFN(self.channels, 9, dropout=self.dropout, name="ffn")(
            h, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return residual + h


class EncLSTMLayer(nn.Module):
    """LN -> BiLSTM -> Linear(2c->c) -> dropout -> residual
    (reference operations.py:882-902)."""

    channels: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(x)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.channels), name="lstm_fwd")(h)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.channels), reverse=True,
                     keep_order=True, name="lstm_bwd")(h)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        h = nn.Dense(self.channels, name="out_proj")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return residual + h


class EncGausSALayer(nn.Module):
    """Self-attention with a learnable per-head Gaussian distance bias
    -(i-j)^2/2 * tao_h^-4 (reference operations.py:28-112 SelfAttention +
    115-147 EncGausSALayer; projections carry biases here, unlike
    EncSALayer's)."""

    channels: int
    num_heads: int = 1
    dropout: float = 0.2
    gaus_bias: bool = False
    gaus_tao: float = 10.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        t = x.shape[1]
        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm1")(x)
        q = nn.Dense(self.channels, name="w_q")(h)
        k = nn.Dense(self.channels, name="w_k")(h)
        v = nn.Dense(self.channels, name="w_v")(h)
        bias = mask_to_bias(mask)[:, None, None, :]
        if self.gaus_bias:
            tao = self.param("tao", nn.initializers.constant(self.gaus_tao),
                             (self.num_heads,))
            dist = jnp.asarray(
                -np.abs(np.arange(t)[:, None] - np.arange(t)[None, :]) ** 2
                / 2.0, jnp.float32)
            bias = bias + dist[None, None] * (tao ** -4)[None, :, None, None]
        out = multihead_attention(q, k, v, self.num_heads, bias=bias)
        out = nn.Dense(self.channels, name="fc")(out)
        h = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm2")(x)
        h = ConvFFN(self.channels, 9, dropout=self.dropout, name="ffn")(
            h, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return residual + h


# id -> constructor(channels, dropout) (reference operations.py:953-972)
OPERATIONS_ENCODER = {
    1: lambda c, p: WNConvResidual(c, 1, p),
    2: lambda c, p: WNConvResidual(c, 5, p),
    3: lambda c, p: WNConvResidual(c, 9, p),
    4: lambda c, p: WNConvResidual(c, 13, p),
    5: lambda c, p: WNConvResidual(c, 17, p),
    6: lambda c, p: WNConvResidual(c, 21, p),
    7: lambda c, p: WNConvResidual(c, 25, p),
    8: lambda c, p: EncSALayer(c, 8, ffn_kernel=9, dropout=p),
    9: lambda c, p: EncSALayer(c, 4, ffn_kernel=9, dropout=p),
    10: lambda c, p: EncSALayer(c, 8, ffn_kernel=9, dropout=p),
    11: lambda c, p: EncLocalSALayer(c, 2, dropout=p),
    12: lambda c, p: EncLSTMLayer(c, p),
    13: lambda c, p, g_bias=False, tao=10.0: EncGausSALayer(
        c, 1, p, gaus_bias=g_bias, gaus_tao=tao),
    14: lambda c, p: EncSALayer(c, 2, ffn_kernel=1, dropout=p),
    15: lambda c, p: EncSALayer(c, 2, ffn_kernel=15, dropout=p),
}
