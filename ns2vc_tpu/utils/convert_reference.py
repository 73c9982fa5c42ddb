"""Convert reference (adelacvg/NS2VC, PyTorch) weights to this framework.

Two uses:
1. parity tests: instantiate a reference torch module with random weights,
   convert, and assert the JAX forward matches;
2. migration: load an author-trained `model-{N}.pt` (reference
   model.py:812-815 saves `{'step', 'model'}`) into the JAX model.

Layout notes:
- reference encoders run (T, B, C) with ConvTBC whose weight is already
  (K, C_in, C_out) — identical to flax nn.Conv kernels;
- torch nn.Conv1d weights are (C_out, C_in, K) -> transpose to (K, C_in, C_out);
- torch nn.Linear weights are (out, in) -> transpose;
- fairseq MultiheadAttention packs qkv as in_proj_weight (3C, C)
  (reference operations.py:327) -> DenseGeneral kernel (C, 3, C).

Only torch is required (CPU); all functions accept a flat
`state_dict`-style mapping of numpy arrays or torch tensors.
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _j(p: str, name: str) -> str:
    return f"{p}.{name}" if p else name


def linear(sd, p, bias=True):
    out = {"kernel": _np(sd[f"{p}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def layer_norm(sd, p):
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def conv1d(sd, p, bias=True):
    """torch Conv1d (O, I, K) -> flax (K, I, O)."""
    out = {"kernel": _np(sd[f"{p}.weight"]).transpose(2, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{p}.bias"])
    return out


def conv_tbc(sd, p):
    """reference ConvTBC weight is already (K, C_in, C_out) (model.py:71-72)."""
    return {"kernel": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def ln_conv(sd, p):
    """reference ConvLayer = LayerNorm + ConvTBC (model.py:78-96)."""
    return {"LayerNorm_0": layer_norm(sd, f"{p}.layer_norm"),
            "Conv_0": conv_tbc(sd, f"{p}.conv")}


def mha_self(sd, p):
    """fairseq-style packed self-attention, no biases
    (operations.py:304-354 with bias=False)."""
    w = _np(sd[f"{p}.in_proj_weight"])  # (3C, C)
    c = w.shape[1]
    kernel = w.reshape(3, c, c).transpose(2, 0, 1)  # (C_in, 3, C_out)
    return {
        "in_proj": {"kernel": kernel},
        "out_proj": {"kernel": _np(sd[f"{p}.out_proj.weight"]).T},
    }


def mha_cross(sd, p):
    """Packed qkv split into separate projections for CrossAttention."""
    w = _np(sd[f"{p}.in_proj_weight"])
    c = w.shape[1]
    wq, wk, wv = w[:c], w[c : 2 * c], w[2 * c :]
    return {
        "q_proj": {"kernel": wq.T},
        "k_proj": {"kernel": wk.T},
        "v_proj": {"kernel": wv.T},
        "out_proj": {"kernel": _np(sd[f"{p}.out_proj.weight"]).T},
    }


def conv_ffn(sd, p, kernel_size=9):
    """reference TransformerFFNLayer (operations.py:644-692): k shifted
    Linears (bias on tap 0 only) == one SAME conv."""
    if f"{p}.ffn_1.weight" in sd:  # kernel_size == 1 variant: a plain Linear
        return {"ffn_1": linear(sd, f"{p}.ffn_1"),
                "ffn_2": linear(sd, f"{p}.ffn_2")}
    taps = [_np(sd[f"{p}.ffn_1.{i}.weight"]).T for i in range(kernel_size)]
    # reference quirk (operations.py:684: `shifted = padded[i:...] if i else x`):
    # tap 0 is applied to the *unshifted* input, i.e. it lands on the center
    # tap, and position -((k-1)//2) is effectively zero. Fold that into the
    # equivalent conv kernel so converted weights reproduce it exactly.
    kernel = np.stack([np.zeros_like(taps[0])] + taps[1:], axis=0)
    kernel[(kernel_size - 1) // 2] += taps[0]
    return {
        "ffn_1": {"kernel": kernel, "bias": _np(sd[f"{p}.ffn_1.0.bias"])},
        "ffn_2": linear(sd, f"{p}.ffn_2"),
    }


def enc_sa_layer(sd, p, kernel_size=9):
    """reference EncSALayer via TransformerEncoderLayer wrapper: params live
    under `<p>.op.` (model.py:50-59)."""
    return {
        "layer_norm1": layer_norm(sd, f"{p}.op.layer_norm1"),
        "self_attn": mha_self(sd, f"{p}.op.self_attn"),
        "layer_norm2": layer_norm(sd, f"{p}.op.layer_norm2"),
        "ffn": conv_ffn(sd, f"{p}.op.ffn", kernel_size),
    }


def encoder_stack(sd, p, n_layers=6, last_ln=True, ffn_kernel=9):
    out = {"pre": ln_conv(sd, _j(p, "pre")),
           "out_proj": ln_conv(sd, _j(p, "out_proj"))}
    for i in range(n_layers):
        out[f"layers_{i}"] = enc_sa_layer(sd, _j(p, f"layers.{i}"), ffn_kernel)
    if last_ln:
        out["layer_norm"] = layer_norm(sd, _j(p, "layer_norm"))
    return out


def phone_encoder(sd, p="", n_layers=6):
    w = _np(sd[_j(p, "spk_proj.weight")])  # Conv1d (C_out, 100, 1)
    return {
        "spk_proj": {"kernel": w[:, :, 0].T, "bias": _np(sd[_j(p, "spk_proj.bias")])},
        "stack": encoder_stack(sd, p, n_layers=n_layers),
    }


def prompt_encoder(sd, p="", n_layers=6):
    return {"stack": encoder_stack(sd, p, n_layers=n_layers)}


def attention_pooling(sd, p):
    """reference unet1d/embeddings.py:499-546."""
    return {
        "positional_embedding": _np(sd[f"{p}.positional_embedding"]),
        "q_proj": linear(sd, f"{p}.q_proj"),
        "k_proj": linear(sd, f"{p}.k_proj"),
        "v_proj": linear(sd, f"{p}.v_proj"),
    }


def text_time_embedding(sd, p):
    """reference unet1d/embeddings.py:421-434."""
    return {
        "norm1": layer_norm(sd, f"{p}.norm1"),
        "pool": attention_pooling(sd, f"{p}.pool"),
        "proj": linear(sd, f"{p}.proj"),
        "norm2": layer_norm(sd, f"{p}.norm2"),
    }
