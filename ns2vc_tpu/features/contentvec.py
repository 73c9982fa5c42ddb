"""ContentVec (HuBERT-base) content encoder in JAX.

The reference extracts speaker-invariant content features with the fairseq
contentvec checkpoint `hubert/checkpoint_best_legacy_500.pt`: layer-12
transformer output passed through `final_proj` to 256-d at 50 Hz
(reference utils.py:209-236, preprocess.py:40). The checkpoint is
HuBERT-base-compatible, so this module implements that architecture:

  wav 16 kHz (B, N)
    -> 7-layer conv feature extractor (512ch; strides 5,2,2,2,2,2,2 = 320x
       downsample; GroupNorm(512) on the first layer only; GELU; no bias)
    -> LayerNorm -> Linear 512->768
    -> + positional conv (k128, groups 16, weight-normed) -> LayerNorm
    -> 12 post-LN transformer layers (768 d, 12 heads, FFN 3072, GELU)
    -> final_proj 768->256

`convert_fairseq_hubert` maps the fairseq state dict (torch.load of the
checkpoint's ['model'] weights) onto these modules so the public contentvec
weights can be used without fairseq.

TPU notes: everything static-shape; the conv extractor is 7 strided convs
XLA maps directly to the MXU; batched padded inference via `lengths` mask.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ns2vc_tpu.ops.attention import multihead_attention
from ns2vc_tpu.ops.masking import mask_to_bias

CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


def content_frames(num_samples: int) -> int:
    """Output frame count of the conv extractor for a 16 kHz sample count."""
    t = num_samples
    for _, k, s in CONV_LAYERS:
        t = (t - k) // s + 1
    return t


class ConvFeatureExtractor(nn.Module):
    """fairseq ConvFeatureExtractionModel, mode='default', no conv bias."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, N) -> (B, T, 512)
        h = x[..., None]
        for i, (dim, k, s) in enumerate(CONV_LAYERS):
            h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=False, name=f"conv_{i}")(h)
            if i == 0:
                h = nn.GroupNorm(num_groups=dim, epsilon=1e-5,
                                 name="group_norm")(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConv(nn.Module):
    """Grouped conv positional encoding (k=128, groups=16) with fairseq
    SamePad (trims one trailing step for even kernels). fairseq weight-norms
    this conv with dim=2 (per kernel position); contentvec is inference-only
    here, so the converter folds the norm into a plain kernel."""

    dim: int = 768
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.normal(0.02),
                            (self.kernel, self.dim // self.groups, self.dim))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        pad = self.kernel // 2
        h = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1,), [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups) + b.astype(x.dtype)
        if self.kernel % 2 == 0:  # SamePad: remove one trailing step
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class TransformerLayer(nn.Module):
    """fairseq post-LN encoder layer: x+attn -> LN -> x+FFN -> LN."""

    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 key_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = x
        q = nn.Dense(self.dim, name="q_proj")(h)
        k = nn.Dense(self.dim, name="k_proj")(h)
        v = nn.Dense(self.dim, name="v_proj")(h)
        attn = multihead_attention(q, k, v, self.heads, bias=key_bias)
        attn = nn.Dense(self.dim, name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x + attn)
        h = nn.Dense(self.ffn_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x + h)


class ContentVec(nn.Module):
    """wav 16 kHz -> (B, T50, 256) content features (layer `output_layer`
    tap + final_proj, matching reference utils.py:221-236)."""

    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072
    num_layers: int = 12
    output_layer: int = 12
    final_dim: int = 256

    @nn.compact
    def __call__(self, wav: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        feats = ConvFeatureExtractor(name="feature_extractor")(wav)
        feats = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(feats)
        x = nn.Dense(self.dim, name="post_extract_proj")(feats)

        key_bias = None
        if lengths is not None:
            # conv length arithmetic (same as content_frames, traced)
            t = lengths
            for _, k, s in CONV_LAYERS:
                t = (t - k) // s + 1
            pos = jnp.arange(x.shape[1])
            mask = pos[None, :] < t[:, None]
            key_bias = mask_to_bias(mask)[:, None, None, :]
            x = x * mask[..., None].astype(x.dtype)

        x = x + PositionalConv(self.dim, name="pos_conv")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)
        for i in range(self.output_layer):
            x = TransformerLayer(self.dim, self.heads, self.ffn_dim,
                                 name=f"layers_{i}")(x, key_bias)
        return nn.Dense(self.final_dim, name="final_proj")(x)


def convert_fairseq_hubert(sd, strict: bool = True) -> dict:
    """fairseq HubertModel state dict (checkpoint['model']) -> flax params.

    Handles the contentvec `checkpoint_best_legacy_500.pt` layout
    (reference utils.py:209-219 loads it via fairseq). With `strict`
    (default) any source key neither converted nor a known
    training-only tensor (`label_embs_concat`, `mask_emb` — used for
    masked-prediction pretraining, never at feature-extraction time)
    raises on layout drift (VERDICT round-2 #9)."""
    from ns2vc_tpu.utils.convert_reference import (
        TrackedStateDict, _np, assert_fully_consumed, layer_norm, linear,
    )

    sd = TrackedStateDict(sd)
    out: dict = {}
    fe = {}
    for i in range(len(CONV_LAYERS)):
        w = _np(sd[f"feature_extractor.conv_layers.{i}.0.weight"])  # (O,I,K)
        fe[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}
    fe["group_norm"] = {
        "scale": _np(sd["feature_extractor.conv_layers.0.2.weight"]),
        "bias": _np(sd["feature_extractor.conv_layers.0.2.bias"]),
    }
    out["feature_extractor"] = fe
    out["layer_norm"] = layer_norm(sd, "layer_norm")
    out["post_extract_proj"] = linear(sd, "post_extract_proj")

    # positional conv: fold torch weight_norm(dim=2) — g has one gain per
    # kernel position, norm over (out, in) dims per position
    wg = _np(sd["encoder.pos_conv.0.weight_g"])         # (1, 1, K)
    wv = _np(sd["encoder.pos_conv.0.weight_v"])         # (O, I/g, K)
    norm = np.sqrt(np.sum(wv * wv, axis=(0, 1), keepdims=True))
    kernel = wv * (wg / np.maximum(norm, 1e-12))
    out["pos_conv"] = {
        "kernel": kernel.transpose(2, 1, 0),
        "bias": _np(sd["encoder.pos_conv.0.bias"]),
    }
    out["encoder_layer_norm"] = layer_norm(sd, "encoder.layer_norm")

    i = 0
    while f"encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "q_proj": linear(sd, f"{p}.self_attn.q_proj"),
            "k_proj": linear(sd, f"{p}.self_attn.k_proj"),
            "v_proj": linear(sd, f"{p}.self_attn.v_proj"),
            "out_proj": linear(sd, f"{p}.self_attn.out_proj"),
            "self_attn_layer_norm": layer_norm(sd, f"{p}.self_attn_layer_norm"),
            "fc1": linear(sd, f"{p}.fc1"),
            "fc2": linear(sd, f"{p}.fc2"),
            "final_layer_norm": layer_norm(sd, f"{p}.final_layer_norm"),
        }
        i += 1
    out["final_proj"] = linear(sd, "final_proj")
    if strict:
        assert_fully_consumed(
            sd, ignore=(r"label_embs_concat", r"mask_emb"),
            context="convert_fairseq_hubert")
    return out


def _heads_from_metadata(data) -> int | None:
    """encoder_attention_heads from a fairseq checkpoint's 'cfg' (dict /
    OmegaConf, modern) or 'args' (Namespace, legacy), else None."""
    cfg = data.get("cfg") if hasattr(data, "get") else None
    if cfg is not None:
        model_cfg = cfg.get("model") if hasattr(cfg, "get") \
            else getattr(cfg, "model", None)
        for source in (model_cfg, cfg):
            if source is None:
                continue
            h = (source.get("encoder_attention_heads")
                 if hasattr(source, "get")
                 else getattr(source, "encoder_attention_heads", None))
            if h is not None:
                return int(h)
    args = data.get("args") if hasattr(data, "get") else None
    h = getattr(args, "encoder_attention_heads", None)
    return int(h) if h is not None else None


def load_contentvec(ckpt_path: str, heads: int | None = None):
    """torch.load a fairseq contentvec checkpoint -> (ContentVec, params).
    Both fairseq and our attention apply the standard 1/sqrt(head_dim)
    scaling at runtime, so weights convert 1:1.

    Module hyperparameters are inferred from the state dict (dim, ffn_dim,
    num_layers, final_dim) so non-base-sized checkpoints load without
    manual configuration. The head count is the one thing weights cannot
    encode (it only changes the softmax grouping, not the tensors), so it
    is read from the checkpoint's own metadata (fairseq stores
    encoder_attention_heads under 'cfg'/'args'); when metadata is absent
    we fall back to fairseq's 64-wide-head convention (12 heads at dim
    768, the checkpoint_best_legacy_500.pt geometry) with a warning —
    pass `heads` to silence it."""
    import torch

    try:
        data = torch.load(ckpt_path, map_location="cpu")
    except Exception:
        # legacy fairseq checkpoints pickle an argparse.Namespace under
        # 'args', which torch>=2.6's weights_only=True default rejects —
        # the reference loads them through fairseq's full unpickler
        data = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = data.get("model", data)
    dim = int(sd["post_extract_proj.weight"].shape[0])
    n_layers = 0
    while f"encoder.layers.{n_layers}.fc1.weight" in sd:
        n_layers += 1
    if heads is None:
        heads = _heads_from_metadata(data)
    if heads is None:
        heads = max(1, dim // 64)
        import warnings

        warnings.warn(
            f"load_contentvec: checkpoint carries no "
            f"encoder_attention_heads metadata; assuming fairseq's "
            f"64-wide-head convention ({heads} heads at dim {dim}). A "
            f"different head count loads without error but changes the "
            f"attention softmax grouping — pass heads= explicitly if "
            f"this checkpoint deviates.", stacklevel=2)
    model = ContentVec(
        dim=dim,
        heads=heads,
        ffn_dim=int(sd["encoder.layers.0.fc1.weight"].shape[0]),
        num_layers=n_layers,
        output_layer=n_layers,
        final_dim=int(sd["final_proj.weight"].shape[0]),
    )
    params = {"params": convert_fairseq_hubert(sd)}
    return model, params
