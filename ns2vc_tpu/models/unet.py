"""Conditional 1D UNet denoiser.

A TPU-first rebuild of exactly the subgraph the reference instantiates from
its 8.3k-LoC diffusers fork (reference model.py:391-400 +
unet1d/unet_1d_condition.py:61-1037): the ~20 unused block variants, LoRA
plumbing, attention-processor registry and dual transformers are dropped;
what remains is the VC model's actual topology:

    conv_in(k3) -> [CrossAttnDown x3, Down] -> CrossAttnMid
                -> [Up, CrossAttnUp x3] -> GN+SiLU+conv_out(k3)

with: block channels (128, 256, 384, 512), 2 resnets per block, GroupNorm(8),
8 attention heads at every level (head_dim = C/8 — the diffusers
attention_head_dim naming bug, unet_1d_condition.py:215-221), cross-attention
to a 256-d prompt, FiLM ('scale_shift') time conditioning
(unet1d/resnet.py:627-629), and a pooled-prompt 'text' addition embedding
added to the time embedding (unet_1d_condition.py:353-361, 869-870).

Layout is (B, T, C) (channels-last — XLA-native on TPU; the reference is
(B, C, T)). All matmuls are MXU-shaped; attention softmax is computed in
fp32. `remat=True` wraps each block in jax.checkpoint for memory-bound
training (the reference exposes the same switch, unet_1d_blocks.py:947).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ns2vc_tpu.ops.attention import multihead_attention
from ns2vc_tpu.ops.masking import mask_to_bias
from ns2vc_tpu.ops.norms import make_group_norm


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """DDPM sinusoidal embedding (reference unet1d/embeddings.py:24-64).
    timesteps (B,) (may be fractional) -> (B, embedding_dim)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    return emb


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear (reference unet1d/embeddings.py:157-201)."""

    time_embed_dim: int

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, name="linear_1")(sample)
        sample = nn.silu(sample)
        return nn.Dense(self.time_embed_dim, name="linear_2")(sample)


class Attention(nn.Module):
    """diffusers-style attention: no qkv bias, biased out proj
    (reference unet1d/attention_processor.py:26-355 + AttnProcessor2_0).

    `kv=(k, v)` skips the key/value projections — used to hoist the
    step-invariant cross-attention K/V of the prompt out of the sampler
    scan (the reference recomputes them on every NFE)."""

    query_dim: int
    heads: int
    dim_head: int

    def setup(self):
        inner = self.heads * self.dim_head
        self.to_q = nn.Dense(inner, use_bias=False)
        self.to_k = nn.Dense(inner, use_bias=False)
        self.to_v = nn.Dense(inner, use_bias=False)
        self.to_out_0 = nn.Dense(self.query_dim)

    def compute_kv(self, context: jnp.ndarray):
        return self.to_k(context), self.to_v(context)

    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 bias: Optional[jnp.ndarray] = None,
                 kv: Optional[tuple] = None) -> jnp.ndarray:
        if kv is None and context is None and not self.is_initializing():
            # self-attention: one fused (C, 3*inner) matmul instead of
            # three — one read of x from HBM, one MXU dispatch. The param
            # tree keeps the reference's to_q/to_k/to_v layout (converter
            # and checkpoints unchanged); the concat of the kernels is
            # step-invariant and hoisted by XLA.
            w = jnp.concatenate(
                [self.to_q.variables["params"]["kernel"],
                 self.to_k.variables["params"]["kernel"],
                 self.to_v.variables["params"]["kernel"]], axis=1)
            q, k, v = jnp.split(x @ w.astype(x.dtype), 3, axis=-1)
        else:
            q = self.to_q(x)
            if kv is None:
                k, v = self.compute_kv(x if context is None else context)
            else:
                k, v = kv
        out = multihead_attention(q, k, v, self.heads, bias=bias,
                                  scale=self.dim_head ** -0.5)
        return self.to_out_0(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward, mult 4 (reference unet1d/attention.py:310-388;
    torch F.gelu is the exact erf form).

    The gelu form is tied to the compute dtype: float32 uses the exact
    erf (bit-comparable to the reference — every parity test runs here),
    bfloat16 uses the tanh approximation. The approximation's max
    absolute error (~1e-3 near |x|~1) is below bf16 resolution, while
    the erf evaluation dominates the FF dot output-fusions on the
    sampler hot path — measured end-to-end on v5e: B=16 synthesis
    380.7x -> 460.8x real time (+21%) from this swap alone (round-4
    sweep; scripts/bench_geglu.py isolates the fusion). NS2VC_GELU=
    {erf,tanh} forces either form regardless of dtype (read at trace
    time)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        hidden = nn.Dense(inner * 2, name="proj")(x)
        h, gate = jnp.split(hidden, 2, axis=-1)
        force = os.environ.get("NS2VC_GELU")
        if force in ("erf", "tanh"):
            approx = force == "tanh"
        else:
            approx = gate.dtype == jnp.bfloat16
        h = h * nn.gelu(gate, approximate=approx)
        return nn.Dense(self.dim, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """pre-LN self-attn -> cross-attn -> GEGLU FF
    (reference unet1d/attention.py:26-203)."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.attn1 = Attention(self.dim, self.heads, self.dim_head)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.attn2 = Attention(self.dim, self.heads, self.dim_head)
        self.norm3 = nn.LayerNorm(epsilon=1e-5)
        self.ff = GEGLUFeedForward(self.dim)

    def cross_kv(self, context: jnp.ndarray):
        return self.attn2.compute_kv(context)

    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 context_bias: Optional[jnp.ndarray] = None,
                 kv: Optional[tuple] = None) -> jnp.ndarray:
        h = self.norm1(x)
        x = x + self.attn1(h)
        h = self.norm2(x)
        x = x + self.attn2(h, context=context, bias=context_bias, kv=kv)
        h = self.norm3(x)
        return x + self.ff(h)


class Transformer1D(nn.Module):
    """GN -> 1x1 proj in -> transformer block -> 1x1 proj out + residual
    (reference unet1d/transformer_1d.py:41-326, continuous input path)."""

    channels: int
    heads: int
    cross_attention_dim: int
    norm_num_groups: int = 8

    def setup(self):
        self.norm = make_group_norm(self.norm_num_groups, epsilon=1e-6)
        self.proj_in = nn.Dense(self.channels)
        self.blocks_0 = BasicTransformerBlock(
            self.channels, self.heads, self.channels // self.heads,
            self.cross_attention_dim)
        self.proj_out = nn.Dense(self.channels)

    def cross_kv(self, context: jnp.ndarray):
        return self.blocks_0.cross_kv(context)

    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 context_bias: Optional[jnp.ndarray] = None,
                 kv: Optional[tuple] = None) -> jnp.ndarray:
        residual = x
        h = self.norm(x)
        h = self.proj_in(h)
        h = self.blocks_0(h, context, context_bias, kv=kv)
        h = self.proj_out(h)
        return h + residual


class DualTransformer1D(nn.Module):
    """Two Transformer1D experts mixed at a ratio, each cross-attending to
    its own slice of the condition tokens (reference
    unet1d/dual_transformer_1d.py:21-155). No reference config instantiates
    it (dual_cross_attention is always False); provided for inventory
    completeness with the same contract: condition token slices of lengths
    `condition_lengths`, routing via `transformer_index_for_condition`, and
    out = mix * (T_a(x) - x) + (1 - mix) * (T_b(x) - x) + x."""

    channels: int
    heads: int
    cross_attention_dim: int
    norm_num_groups: int = 8
    condition_lengths: Tuple[int, int] = (77, 257)
    transformer_index_for_condition: Tuple[int, int] = (1, 0)
    mix_ratio: float = 0.5

    def setup(self):
        self.transformers = [
            Transformer1D(self.channels, self.heads, self.cross_attention_dim,
                          self.norm_num_groups, name=f"transformers_{i}")
            for i in range(2)
        ]

    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 context_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # context_bias (B, 1, 1, Tk) is sliced alongside the tokens; the
        # reference ignores its attention_mask here ("not used yet") — we
        # honor it, which is strictly more correct for padded prompts.
        encoded = []
        start = 0
        for i in range(2):
            n = self.condition_lengths[i]
            cond = context[:, start:start + n]
            cbias = (None if context_bias is None
                     else context_bias[..., start:start + n])
            t = self.transformers[self.transformer_index_for_condition[i]]
            encoded.append(t(x, cond, cbias) - x)
            start += n
        return encoded[0] * self.mix_ratio + encoded[1] * (1 - self.mix_ratio) + x


class _GNParams(nn.Module):
    """GroupNorm-shaped parameter holder (tree-identical to nn.GroupNorm:
    {scale, bias}) for the fused resnet epilogue path."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _ConvParams(nn.Module):
    """nn.Conv-shaped parameter holder ({kernel, bias}, same default
    initializers) for the fused resnet epilogue path."""

    shape: Tuple[int, int, int]  # (K, C_in, C_out)

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           self.shape),
                self.param("bias", nn.initializers.zeros, (self.shape[-1],)))


def _use_fused_resnet(in_channels: int, out_channels: int) -> bool:
    """Fused Pallas epilogue dispatch: measured win only at the UNet's
    level-0 shape (C128->C128: kernel 3.3x vs XLA's conv at B=16 T=400;
    it LOSES at C>=256 — scripts/bench_resnet_fusion.py), so the gate is
    exactly that regime, on TPU, opt-in via NS2VC_FUSED_RESNET=1."""
    import os

    return (os.environ.get("NS2VC_FUSED_RESNET") == "1"
            and jax.default_backend() != "cpu"
            and in_channels == 128 and out_channels == 128)


class ResnetBlock1D(nn.Module):
    """GN -> SiLU -> conv(k3) -> FiLM(temb) -> GN -> SiLU -> conv(k3)
    + 1x1 shortcut; 'scale_shift' time conditioning
    (reference unet1d/resnet.py:461-640).

    At the level-0 shape the two GN(+FiLM)+SiLU+conv epilogues can run as
    one Pallas kernel each (ops/pallas_resnet.py) — parameter tree
    unchanged (checkpoints/converter unaffected), dispatch per
    `_use_fused_resnet`."""

    out_channels: int
    groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        fused = _use_fused_resnet(in_channels, self.out_channels)

        t = nn.silu(temb)
        t = nn.Dense(2 * self.out_channels, name="time_emb_proj")(t)

        if fused:
            from ns2vc_tpu.ops.pallas_resnet import gn_silu_conv1d

            s1, b1 = _GNParams(in_channels, name="norm1")()
            k1, c1 = _ConvParams((3, in_channels, self.out_channels),
                                 name="conv1")()
            h = gn_silu_conv1d(x, s1, b1, k1.astype(x.dtype), c1,
                               groups=self.groups, eps=self.eps)
            scale, shift = jnp.split(t, 2, axis=-1)      # (B, C) each
            s2, b2 = _GNParams(self.out_channels, name="norm2")()
            k2, c2 = _ConvParams((3, self.out_channels, self.out_channels),
                                 name="conv2")()
            h = gn_silu_conv1d(h, s2, b2, k2.astype(x.dtype), c2,
                               groups=self.groups, eps=self.eps,
                               film_scale=scale, film_shift=shift)
        else:
            h = make_group_norm(self.groups, epsilon=self.eps,
                                name="norm1")(x)
            h = nn.silu(h)
            h = nn.Conv(self.out_channels, (3,), padding="SAME",
                        name="conv1")(h)

            scale, shift = jnp.split(t[:, None, :], 2, axis=-1)
            h = make_group_norm(self.groups, epsilon=self.eps,
                                name="norm2")(h)
            h = h * (1 + scale) + shift
            h = nn.silu(h)
            h = nn.Conv(self.out_channels, (3,), padding="SAME",
                        name="conv2")(h)

        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), name="conv_shortcut")(x)
        return x + h


class Downsample1D(nn.Module):
    """conv k3 stride 2 (reference unet1d/resnet.py:176-223 with
    use_conv=True, padding=1)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.channels, (3,), strides=(2,), padding=[(1, 1)],
                       name="conv")(x)


class Upsample1D(nn.Module):
    """nearest x2 then conv k3 (reference unet1d/resnet.py:104-173)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c = x.shape
        x = jnp.repeat(x, 2, axis=1)
        return nn.Conv(self.channels, (3,), padding="SAME", name="conv")(x)


class UNet1DConditionModel(nn.Module):
    """See module docstring. Inputs:
    sample (B, T, in_channels) with T % 8 == 0, timesteps (B,),
    encoder_hidden_states (B, Tp, cross_attention_dim),
    encoder_attention_mask (B, Tp) bool (True = keep).
    Returns (B, T, out_channels)."""

    in_channels: int = 356
    out_channels: int = 100
    block_out_channels: Tuple[int, ...] = (128, 256, 384, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 8
    norm_eps: float = 1e-5
    cross_attention_dim: int = 256
    num_attention_heads: int = 8
    addition_embed_heads: int = 64
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True
    remat: bool = False
    remat_policy: str = "all"  # "all" | "dots" (see TrainConfig)

    def _cross_attn_layout(self):
        """(name, channels) of every cross-attention transformer, in forward
        order — shared by the forward pass and the K/V precompute."""
        chans = self.block_out_channels
        n_levels = len(chans)
        out = []
        for i, ch in enumerate(chans):
            if i < n_levels - 1:
                for j in range(self.layers_per_block):
                    out.append((f"down_{i}_attn_{j}", ch))
        out.append(("mid_attn_0", chans[-1]))
        for i, ch in enumerate(reversed(chans)):
            if i > 0:
                for j in range(self.layers_per_block + 1):
                    out.append((f"up_{i}_attn_{j}", ch))
        return out

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 encoder_attention_mask: Optional[jnp.ndarray] = None,
                 cross_kv: Optional[tuple] = None,
                 aug_emb: Optional[jnp.ndarray] = None,
                 precompute_kv: bool = False):
        from ns2vc_tpu.models.encoders import TextTimeEmbedding

        chans = self.block_out_channels
        time_embed_dim = chans[0] * 4
        n_levels = len(chans)

        if self.remat:
            policy = {
                "all": None,  # recompute everything (min memory)
                "dots": jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable,
            }[self.remat_policy]
            maybe_remat = (lambda f: nn.remat(f, policy=policy))
        else:
            maybe_remat = (lambda f: f)

        def transformer(ch, name):
            return maybe_remat(Transformer1D)(
                ch, self.num_attention_heads, self.cross_attention_dim,
                self.norm_num_groups, name=name)

        if precompute_kv:
            # step-invariant conditioning: pooled-prompt embedding + every
            # cross-attention K/V (the reference recomputes these on every
            # sampler NFE; here they are hoisted out of the sampling scan)
            aug = TextTimeEmbedding(self.cross_attention_dim, time_embed_dim,
                                    self.addition_embed_heads,
                                    name="add_embedding")(encoder_hidden_states)
            kvs = tuple(
                Transformer1D(ch, self.num_attention_heads,
                              self.cross_attention_dim, self.norm_num_groups,
                              name=name).cross_kv(encoder_hidden_states)
                for name, ch in self._cross_attn_layout())
            return aug, kvs

        assert sample.shape[1] % (2 ** (n_levels - 1)) == 0, (
            f"T={sample.shape[1]} must be divisible by {2 ** (n_levels - 1)}")

        context_bias = None
        if encoder_attention_mask is not None:
            context_bias = mask_to_bias(encoder_attention_mask)[:, None, None, :]

        # time + pooled-prompt embedding
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = get_timestep_embedding(timesteps, chans[0],
                                       self.flip_sin_to_cos, self.freq_shift)
        emb = TimestepEmbedding(time_embed_dim, name="time_embedding")(
            t_emb.astype(sample.dtype))
        if aug_emb is None:
            aug_emb = TextTimeEmbedding(self.cross_attention_dim,
                                        time_embed_dim,
                                        self.addition_embed_heads,
                                        name="add_embedding")(
                encoder_hidden_states)
        emb = emb + aug_emb

        kv_iter = iter(cross_kv) if cross_kv is not None else None

        def next_kv():
            return next(kv_iter) if kv_iter is not None else None

        def resnet(out_ch, name):
            return maybe_remat(ResnetBlock1D)(
                out_ch, self.norm_num_groups, self.norm_eps, name=name)

        h = nn.Conv(chans[0], (3,), padding="SAME", name="conv_in")(sample)
        skips = [h]

        # ---- down path: CrossAttnDown x3, Down (no downsample on the last)
        # (reference unet_1d_condition.py:159-163, 950-984)
        for i, ch in enumerate(chans):
            is_last = i == n_levels - 1
            for j in range(self.layers_per_block):
                h = resnet(ch, f"down_{i}_resnet_{j}")(h, emb)
                if not is_last:  # CrossAttnDownBlock2D
                    h = transformer(ch, f"down_{i}_attn_{j}")(
                        h, encoder_hidden_states, context_bias, kv=next_kv())
                skips.append(h)
            if not is_last:
                h = Downsample1D(ch, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # ---- mid: resnet, [attn, resnet] (unet_1d_blocks.py:516-614)
        h = resnet(chans[-1], "mid_resnet_0")(h, emb)
        h = transformer(chans[-1], "mid_attn_0")(
            h, encoder_hidden_states, context_bias, kv=next_kv())
        h = resnet(chans[-1], "mid_resnet_1")(h, emb)

        # ---- up path: Up, CrossAttnUp x3 (unet_1d_condition.py:165,
        # 1001-1026; skip-concat resnets per unet_1d_blocks.py:1986-2230)
        for i, ch in enumerate(reversed(chans)):
            is_first = i == 0  # plain UpBlock2D
            is_last = i == n_levels - 1
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = resnet(ch, f"up_{i}_resnet_{j}")(h, emb)
                if not is_first:  # CrossAttnUpBlock2D
                    h = transformer(ch, f"up_{i}_attn_{j}")(
                        h, encoder_hidden_states, context_bias, kv=next_kv())
            if not is_last:
                h = Upsample1D(ch, name=f"up_{i}_upsample")(h)

        h = make_group_norm(self.norm_num_groups, epsilon=self.norm_eps,
                            name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3,), padding="SAME",
                       name="conv_out")(h)
