"""Conditioning encoders: content (PhoneEncoder), reference-mel
(PromptEncoder), attention pooling, and the TTS-branch F0 predictor.

Behavioral parity targets (all re-designed for (B, T, C) layout and XLA —
the reference works in fairseq's (T, B, C) with a ConvTBC native op):

- PhoneEncoder / PromptEncoder: reference model.py:98-190 — LN+1x1-conv pre
  projection, 6x pre-LN transformer layers (8-head self-attn, kernel-9 conv
  FFN scaled k^-0.5 — operations.py:784-821 EncSALayer, op id 8 at
  operations.py:961), LN+1x1-conv out projection, final LN, masks applied
  between every stage.
- AttentionPooling / TextTimeEmbedding: reference unet1d/embeddings.py:
  421-434, 499-546 (deep-floyd attention pooling over a mean class token).
- F0Predictor: reference model.py:215-268 (disabled in the VC config but
  part of the capability surface) — 10x [3 weight-normed conv layers ->
  LN -> cross-attention into the prompt].

Dropout layers use flax's `deterministic` convention (train vs eval).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ns2vc_tpu.ops.attention import multihead_attention
from ns2vc_tpu.ops.masking import apply_mask, mask_to_bias

LN_EPS = 1e-5  # torch nn.LayerNorm default


def _conv_init(kernel_size: int, dropout: float):
    """N(0, sqrt(4*(1-p)/(k*c_in))) — reference model.py:83."""
    def init(key, shape, dtype=jnp.float32):
        k, c_in, _ = shape
        std = math.sqrt((4 * (1.0 - dropout)) / (kernel_size * c_in))
        return std * jnp.asarray(
            nn.initializers.normal(1.0)(key, shape, dtype))
    return init


class LNConv(nn.Module):
    """LayerNorm then conv (reference ConvLayer, model.py:78-96). Padded
    frames are zeroed before the norm, as the reference masked_fills."""

    out_channels: int
    kernel_size: int = 1
    dropout: float = 0.0  # only shapes the init std, as in the reference

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if mask is not None:
            x = apply_mask(x, mask)
        x = nn.LayerNorm(epsilon=LN_EPS)(x)
        return nn.Conv(
            self.out_channels, (self.kernel_size,), padding="SAME",
            kernel_init=_conv_init(self.kernel_size, self.dropout),
            bias_init=nn.initializers.zeros)(x)


class MultiheadSelfAttention(nn.Module):
    """Packed-projection self-attention, no biases (reference
    operations.py:304-641 with bias=False as instantiated at 792-794)."""

    channels: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        qkv = nn.DenseGeneral((3, self.channels), axis=-1, use_bias=False,
                              name="in_proj")(x)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        bias = None
        if key_mask is not None:
            bias = mask_to_bias(key_mask)[:, None, None, :]
        out = multihead_attention(q, k, v, self.num_heads, bias=bias)
        out = nn.Dense(self.channels, use_bias=False, name="out_proj")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ConvFFN(nn.Module):
    """Kernel-k FFN: conv(C->4C, k) * k^-0.5 -> relu -> dropout -> dense
    (reference TransformerFFNLayer, operations.py:644-692 — its k shifted
    Linears with a single bias are exactly one SAME conv; the Conv1d-based
    NewTransformerFFNLayer, operations.py:725-781, is the same module with
    `padding` selecting SAME or causal LEFT).

    `step` is the TPU-native form of the reference's incremental mode
    (operations.py:740-752: keep the last k inputs, emit one frame) — a
    pure function over an explicit (B, k-1, C) ring buffer instead of a
    mutable incremental_state dict, matching LEFT-padded full-sequence
    output frame for frame (zeros-initialized buffer == the zero pad)."""

    channels: int
    kernel_size: int = 9
    dropout: float = 0.0
    padding: str = "SAME"  # "SAME" | "LEFT" (causal)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        pad = ("SAME" if self.padding == "SAME"
               else [(self.kernel_size - 1, 0)])
        h = nn.Conv(4 * self.channels, (self.kernel_size,), padding=pad,
                    name="ffn_1")(x)
        if self.kernel_size > 1:
            h = h * self.kernel_size ** -0.5
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.channels, name="ffn_2")(h)

    def init_buffer(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        """(B, k-1, C) zeros — the causal pad the first steps see."""
        return jnp.zeros((batch, self.kernel_size - 1, self.channels), dtype)

    @nn.compact
    def step(self, x_new: jnp.ndarray, buffer: jnp.ndarray):
        """One streaming frame: x_new (B, 1, C) + buffer (B, k-1, C) ->
        (y (B, 1, C), new_buffer). Same params as __call__."""
        window = jnp.concatenate([buffer, x_new], axis=1)  # (B, k, C)
        # VALID conv over exactly one window == one einsum against the
        # ffn_1 kernel (k, C, 4C)
        h = nn.Conv(4 * self.channels, (self.kernel_size,), padding="VALID",
                    name="ffn_1")(window)
        if self.kernel_size > 1:
            h = h * self.kernel_size ** -0.5
        h = nn.relu(h)
        y = nn.Dense(self.channels, name="ffn_2")(h)
        return y, window[:, 1:]


class EncSALayer(nn.Module):
    """Pre-LN self-attention + conv-FFN block with masking after each
    residual (reference operations.py:784-821, op id 8: 8 heads,
    attention_dropout=0, kernel 9)."""

    channels: int
    num_heads: int = 8
    ffn_kernel: int = 9
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm1")(x)
        h = MultiheadSelfAttention(self.channels, self.num_heads,
                                   dropout=0.0, name="self_attn")(
            h, key_mask=mask, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = apply_mask(residual + h, mask)

        residual = x
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm2")(x)
        h = ConvFFN(self.channels, self.ffn_kernel, dropout=self.dropout,
                    name="ffn")(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return apply_mask(residual + h, mask)


class _EncoderStack(nn.Module):
    """Shared pre/layers/out/final-LN trunk of Phone/PromptEncoder
    (reference model.py:98-190)."""

    hidden_channels: int
    out_channels: int
    n_layers: int
    p_dropout: float
    n_heads: int = 8
    ffn_kernel: int = 9
    last_ln: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = LNConv(self.hidden_channels, 1, self.p_dropout, name="pre")(x, mask)
        x = apply_mask(x, mask)
        for i in range(self.n_layers):
            x = EncSALayer(self.hidden_channels, self.n_heads, self.ffn_kernel,
                           self.p_dropout, name=f"layers_{i}")(
                x, mask, deterministic=deterministic)
        x = LNConv(self.out_channels, 1, self.p_dropout, name="out_proj")(x, mask)
        if self.last_ln:
            x = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(x)
            x = apply_mask(x, mask)
        return x


class PhoneEncoder(nn.Module):
    """Content encoder over contentvec features + pooled speaker embedding
    (reference model.py:98-145). x (B, T, in_channels), g (B, 100)."""

    in_channels: int = 256
    hidden_channels: int = 256
    out_channels: int = 256
    n_layers: int = 6
    p_dropout: float = 0.2
    n_heads: int = 8
    ffn_kernel: int = 9
    last_ln: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, g: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        spk = nn.Dense(self.hidden_channels, name="spk_proj")(g)  # 1x1 conv
        x = x + spk[:, None, :]
        return _EncoderStack(
            self.hidden_channels, self.out_channels, self.n_layers,
            self.p_dropout, self.n_heads, self.ffn_kernel, self.last_ln,
            name="stack")(x, mask, deterministic=deterministic)


class PromptEncoder(nn.Module):
    """Reference-mel encoder (reference model.py:147-190).
    x (B, Tp, in_channels=100)."""

    in_channels: int = 100
    hidden_channels: int = 256
    out_channels: int = 256
    n_layers: int = 6
    p_dropout: float = 0.2
    n_heads: int = 8
    ffn_kernel: int = 9
    last_ln: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        return _EncoderStack(
            self.hidden_channels, self.out_channels, self.n_layers,
            self.p_dropout, self.n_heads, self.ffn_kernel, self.last_ln,
            name="stack")(x, mask, deterministic=deterministic)


class AttentionPooling(nn.Module):
    """Mean-token attention pooling (reference unet1d/embeddings.py:499-546).
    x (B, T, C) -> (B, C)."""

    num_heads: int
    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (1, self.embed_dim))
        cls = jnp.mean(x, axis=1, keepdims=True) + pos.astype(x.dtype)
        xc = jnp.concatenate([cls, x], axis=1)
        q = nn.Dense(self.embed_dim, name="q_proj")(cls)
        k = nn.Dense(self.embed_dim, name="k_proj")(xc)
        v = nn.Dense(self.embed_dim, name="v_proj")(xc)
        out = multihead_attention(q, k, v, self.num_heads)
        return out[:, 0, :]


class TextTimeEmbedding(nn.Module):
    """LN -> attention pool -> proj -> LN (reference
    unet1d/embeddings.py:421-434). Used both as the speaker reference
    pooler (model.py:340 with (100, 100, 1)) and the UNet's 'text'
    addition embedding (unet_1d_condition.py:353-361)."""

    encoder_dim: int
    time_embed_dim: int
    num_heads: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)
        x = AttentionPooling(self.num_heads, self.encoder_dim, name="pool")(x)
        x = nn.Dense(self.time_embed_dim, name="proj")(x)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)


class WNConvResidual(nn.Module):
    """Weight-normed conv + relu + dropout + residual, pre-LN and masked
    (reference EncConvLayer, model.py:192-214)."""

    channels: int
    kernel_size: int = 5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        residual = x
        h = apply_mask(x, mask)
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(h)
        # weight norm over output channels (reference weight_norm(conv, dim=2))
        v = self.param("conv_v", _conv_init(self.kernel_size, self.dropout),
                       (self.kernel_size, self.channels, self.channels))
        g = self.param("conv_g",
                       lambda key, shape: jnp.linalg.norm(
                           v.reshape(-1, self.channels), axis=0),
                       (self.channels,))
        b = self.param("conv_b", nn.initializers.zeros, (self.channels,))
        norm = jnp.linalg.norm(v.reshape(-1, self.channels), axis=0)
        kernel = v * (g / norm)[None, None, :]
        pad = (self.kernel_size - 1) // 2
        h = jax.lax.conv_general_dilated(
            h, kernel.astype(h.dtype), (1,), [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC")) + b.astype(h.dtype)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h + residual



class CrossAttention(nn.Module):
    """Biased multi-head cross attention with packed kv, no biases
    (reference operations.py MultiheadAttention used encoder-decoder style
    in F0Predictor, model.py:238-240)."""

    channels: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mem: jnp.ndarray,
                 mem_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        q = nn.Dense(self.channels, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.channels, use_bias=False, name="k_proj")(mem)
        v = nn.Dense(self.channels, use_bias=False, name="v_proj")(mem)
        bias = None
        if mem_mask is not None:
            bias = mask_to_bias(mem_mask)[:, None, None, :]
        out = multihead_attention(q, k, v, self.num_heads, bias=bias)
        return nn.Dense(self.channels, use_bias=False, name="out_proj")(out)


class F0Predictor(nn.Module):
    """Prompt-conditioned F0 predictor (reference model.py:215-268; part of
    the TTS branch, config.json:34-42). Inputs are (B, T, C) content
    (stop-gradient applied by the caller), (B, Tp, C) prompt, (B, T, 1)
    normalized log-F0."""

    in_channels: int = 256
    hidden_channels: int = 256
    out_channels: int = 1
    attention_layers: int = 10
    n_heads: int = 8
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, prompt: jnp.ndarray,
                 norm_f0: jnp.ndarray, x_mask: jnp.ndarray,
                 prompt_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = jax.lax.stop_gradient(x)
        prompt = jax.lax.stop_gradient(prompt)
        x = LNConv(self.hidden_channels, 5, self.p_dropout, name="pre")(x, x_mask)
        x = x + LNConv(self.hidden_channels, 3, self.p_dropout,
                       name="f0_prenet")(norm_f0, x_mask)
        x = apply_mask(x, x_mask)
        prompt = apply_mask(prompt, prompt_mask)
        for i in range(self.attention_layers):
            for j in range(3):
                x = WNConvResidual(self.hidden_channels, 5, self.p_dropout,
                                   name=f"conv_{i}_{j}")(
                    x, x_mask, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=LN_EPS, name=f"norm_{i}")(x)
            x = x + CrossAttention(self.hidden_channels, self.n_heads,
                                   name=f"attn_{i}")(x, prompt, prompt_mask)
        x = apply_mask(x, x_mask)
        x = LNConv(self.out_channels, 5, self.p_dropout, name="proj")(x, x_mask)
        return apply_mask(x, x_mask)
