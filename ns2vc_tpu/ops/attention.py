"""Attention cores.

`multihead_attention` is the functional scaled-dot-product core used by the
encoder layers (reference operations.py:304-641 MultiheadAttention /
F.multi_head_attention_forward) and the UNet attention processors
(reference unet1d/attention_processor.py:971-1052 AttnProcessor2_0).

At this model's sizes (T <= ~512, heads 8, head_dim 16-64) XLA's fused
dot-general attention already runs at MXU speed-of-light; a Pallas
flash-attention kernel lives in ns2vc_tpu/ops/pallas_attention.py and can
be swapped in via the `attn_impl` argument where a measured crossover
justifies it (see that module's benchmark notes).

`init_kv_cache`/`streaming_attention` are the TPU-native equivalent of the
reference's fairseq incremental_state plumbing (operations.py:432-503):
a fixed-capacity K/V buffer carried functionally (scan-friendly static
shapes) instead of a mutable per-module dict.
"""

from __future__ import annotations

import os

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
    matching torch SDPA numerics closely.

    Capacity note (v5e, profile-verified): XLA materializes the f32 probs
    fusion output in VMEM (S(1)) while it fits — at this model's shapes
    that holds through B=16 (16x8x400^2 xf32 = 82 MB) and spills to HBM at
    B=24 (118 MB), which is the bench's batch-scaling cliff. Forcing a
    bf16 probs boundary via optimization_barrier was tried and measured
    WORSE (barrier results live in default memory space, so XLA
    double-materializes f32-in-VMEM + bf16-in-HBM: b16 attention
    175 -> 219 ms/call). B=16 per chip is the roofline-sane operating
    point; shard batch over the mesh to scale further."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def sdpa_postdiv(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Flash-style *unnormalized* SDPA: materialize exp(l - max) cast to
    the value dtype (half the f32-probs footprint in bf16), dot with V,
    and divide by the f32 row-sum AFTER the dot.

    Numerically this only moves the bf16 rounding of individual probs one
    op earlier than `scaled_dot_product_attention` (which casts the
    normalized softmax output at the same precision, attention.py:56);
    the row-sum is still accumulated in f32 inside the producer fusion.
    Structurally it hands XLA a different fusion boundary — a bf16
    elementwise root feeding a bare dot instead of softmax-div -> convert
    -> dot — as a candidate fix for the f32-probs VMEM-spill cliff (the
    capacity note above). Experiment knob: NS2VC_ATTN_IMPL=postdiv;
    measured by scripts/bench_softmax_boundary.py."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1)
    o = jnp.einsum("...qk,...kd->...qd", e.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return (o / s[..., None]).astype(v.dtype)


def sdpa_blocked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
    block_k: int = 128,
) -> jnp.ndarray:
    """Online-softmax attention blocked over keys via `lax.scan` — a pure
    XLA flash variant that never materializes the (.., Tq, Tk) probs
    tensor (peak logits footprint is one (.., Tq, block_k) block).

    Fifth structural candidate for the f32-probs VMEM-spill batch cliff
    (capacity note in scaled_dot_product_attention): unlike the Pallas
    kernel it stays inside XLA (no custom-call fusion boundary, no
    400 -> 512 key padding), and unlike postdiv it bounds the footprint
    instead of halving it. The per-block probs are cast to the value
    dtype before the PV dot (same rounding as the other impls); max/sum/
    output accumulate in f32. Experiment knob: NS2VC_ATTN_IMPL=blocked
    (NS2VC_BLOCK_K overrides the block size)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    tq, tk = q.shape[-2], k.shape[-2]
    nb = -(-tk // block_k)
    # pad keys up to a whole number of blocks; padded keys are masked off
    # through the bias (conventions: True=valid, bias -1e4; -1e9 here so
    # a padded block can never win the running max). The bias stays at
    # its broadcastable shape (e.g. (B, 1, 1, Tk) key padding) and is
    # sliced per block inside the scan — pre-broadcasting it to the
    # logits shape would materialize exactly the probs-sized tensor this
    # impl exists to avoid.
    pad = nb * block_k - tk
    if pad:
        k = jnp.pad(k, [(0, 0)] * (k.ndim - 2) + [(0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, pad), (0, 0)])
    if bias is not None:
        bias_b = jnp.pad(bias.astype(jnp.float32),
                         [(0, 0)] * (bias.ndim - 1) + [(0, pad)],
                         constant_values=-1e9)
    else:
        bias_b = jnp.where(jnp.arange(nb * block_k) < tk,
                           0.0, -1e9)[None, None, None, :]

    lead = q.shape[:-2]  # (..., H)
    o0 = jnp.zeros(lead + (tq, v.shape[-1]), jnp.float32)
    m0 = jnp.full(lead + (tq, 1), -1e30, jnp.float32)
    s0 = jnp.zeros(lead + (tq, 1), jnp.float32)

    def body(carry, i):
        o, m, s = carry
        kblk = jax.lax.dynamic_slice_in_dim(k, i * block_k, block_k, -2)
        vblk = jax.lax.dynamic_slice_in_dim(v, i * block_k, block_k, -2)
        bblk = jax.lax.dynamic_slice_in_dim(bias_b, i * block_k,
                                            block_k, -1)
        logits = jnp.einsum("...qd,...kd->...qk", q, kblk,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + bblk
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        s = s * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum("...qk,...kd->...qd",
                                   p.astype(v.dtype), vblk,
                                   preferred_element_type=jnp.float32)
        return (o, m_new, s), None

    (o, _, s), _ = jax.lax.scan(body, (o0, m0, s0), jnp.arange(nb))
    return (o / s).astype(v.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, T, C) -> (B, H, T, C/H)."""
    b, t, c = x.shape
    return x.reshape(b, t, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, D) -> (B, T, H*D)."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


# measured XLA->Pallas crossover on v5e (scripts/bench_attention.py):
# XLA's materialized-logits attention is HBM-bound past ~2k keys and OOMs
# outright at 8k (B=8, H=8: the f32 logits alone exceed HBM); the flash
# kernel is ~1.8x faster at 4k and the only feasible impl from 8k up.
FLASH_MIN_KEYS = 2048
# second dispatch axis, DISABLED by default (VERDICT round-2 #1 outcome):
# XLA keeps the f32 probs fusion output in VMEM while it fits and spills
# to HBM past ~100 MB (profile-verified: 82 MB at B=16 resident, 118 MB
# at B=24 spills — the bench's batch cliff). The probs-free flash kernel
# WINS the isolated comparison in the spill regime (T=400 H=8 D=32 bf16,
# scripts/bench_attention.py: XLA 6.3/9.9/5.3/7.0 ms vs kernel
# 6.1/6.4/3.8/4.8 at B=16/24/32/48) but LOSES end-to-end when dispatched
# inside the synthesize program (bench.py --sweep, round 3: B=24
# 275.6x vs 288x XLA, B=32 202.3x vs 251x — the kernel call breaks XLA's
# surrounding fusions/async-copy scheduling and pads 400 -> 512 keys,
# costing more than the avoided spill). Set NS2VC_FLASH_PROBS_MB to
# re-enable for experiments; B=16/chip stays the roofline-sane operating
# point, scale batch over the mesh instead.
def _flash_probs_bytes() -> int | None:
    """Read NS2VC_FLASH_PROBS_MB at CALL time (like NS2VC_ATTN_IMPL), so
    setting the experiment knob after this module is imported — it is
    pulled in transitively by every entry point — still takes effect."""
    probs_mb = os.environ.get("NS2VC_FLASH_PROBS_MB")
    return int(probs_mb) * 1024 * 1024 if probs_mb else None


def _key_padding_bias(bias: jnp.ndarray | None) -> bool:
    return bias is None or (bias.ndim == 4
                            and bias.shape[1] == bias.shape[2] == 1)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Projected multi-head attention on (B, T, C) tensors.

    bias broadcasts against (B, H, Tq, Tk) — pass (B, 1, 1, Tk) for a key
    padding bias. attn_impl: 'xla' (fused dot-general), 'postdiv'
    (unnormalized bf16 probs, divide after the PV dot — see sdpa_postdiv),
    'pallas' (flash kernel; requires bias=None or key-padding-only bias),
    or 'auto' (default) which picks 'pallas' on TPU past FLASH_MIN_KEYS
    keys OR when the would-be f32 probs tensor reaches the VMEM-spill
    regime (NS2VC_FLASH_PROBS_MB — large batch x short T).
    `NS2VC_ATTN_IMPL` in the env overrides 'auto' for experiments.

    Env knobs are read at TRACE time: programs already compiled for a
    geometry (Svc._infer_cache, the trainer step, bench) keep their
    baked-in impl when the env changes mid-process — set knobs before
    the first call of each program (same caveat as NS2VC_GELU)."""
    if attn_impl == "auto":
        forced = os.environ.get("NS2VC_ATTN_IMPL")
        on_tpu = jax.default_backend() != "cpu"
        probs_bytes = q.shape[0] * num_heads * q.shape[1] * k.shape[1] * 4
        # probs-footprint route: off unless NS2VC_FLASH_PROBS_MB is set
        # (see _flash_probs_bytes above for the measured end-to-end
        # loss); when enabled it is gated to sub-f32 inputs (f32 XLA
        # keeps winning even the isolated comparison, e.g. 6.6 vs 7.2 ms
        # at B=48)
        flash_probs_bytes = _flash_probs_bytes()
        spill = (flash_probs_bytes is not None
                 and probs_bytes >= flash_probs_bytes
                 and q.dtype != jnp.float32)
        if forced in ("xla", "pallas", "postdiv", "blocked"):
            attn_impl = forced
        else:
            attn_impl = ("pallas" if on_tpu and _key_padding_bias(bias)
                         and (k.shape[1] >= FLASH_MIN_KEYS or spill)
                         else "xla")
    qh, kh, vh = (split_heads(x, num_heads) for x in (q, k, v))
    if attn_impl == "postdiv":
        out = sdpa_postdiv(qh, kh, vh, bias=bias, scale=scale)
    elif attn_impl == "blocked":
        out = sdpa_blocked(qh, kh, vh, bias=bias, scale=scale,
                           block_k=int(os.environ.get("NS2VC_BLOCK_K",
                                                      "128")))
    elif attn_impl == "pallas":
        from ns2vc_tpu.ops.pallas_attention import flash_attention

        key_bias = None
        if bias is not None:
            # the kernel takes a per-key bias (B, Tk); accept the
            # (B, 1, 1, Tk) padding-bias shape used across the models
            assert _key_padding_bias(bias), \
                "pallas path supports key-padding bias only"
            key_bias = bias[:, 0, 0, :]
        # shrink blocks toward the sequence lengths: at T=400 the default
        # (512, 1024) blocks would pad the k axis 2.6x
        blk_q = min(512, -(-q.shape[1] // 128) * 128)
        blk_k = min(1024, -(-k.shape[1] // 128) * 128)
        out = flash_attention(qh, kh, vh, bias=key_bias, scale=scale,
                              block_q=blk_q, block_k=blk_k,
                              interpret=jax.default_backend() == "cpu")
    else:
        out = scaled_dot_product_attention(qh, kh, vh, bias=bias,
                                           scale=scale)
    return merge_heads(out)


# -- incremental KV-cache streaming (reference operations.py:432-503) -----


def init_kv_cache(batch: int, num_heads: int, head_dim: int, capacity: int,
                  dtype=jnp.float32) -> dict:
    """Fixed-capacity streaming K/V cache. The reference stores prev_key/
    prev_value/prev_key_padding_mask in a mutable incremental_state dict
    (operations.py:480-503); here the cache is a pytree carried through
    scan with static shapes: K/V buffers (B, H, capacity, D) plus a fill
    index."""
    shape = (batch, num_heads, capacity, head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype),
            "idx": jnp.zeros((), jnp.int32)}


def streaming_attention(
    q: jnp.ndarray,
    k_new: jnp.ndarray | None,
    v_new: jnp.ndarray | None,
    cache: dict,
    num_heads: int,
    static_kv: bool = False,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> tuple[jnp.ndarray, dict]:
    """One streaming step: append the new projected K/V chunk (B, S, C)
    to the cache and attend q (B, Sq, C) over every cached position.

    static_kv=True reproduces the reference's encoder-decoder mode
    (operations.py:437-440, 484-491): K/V are read from the cache and
    k_new/v_new are ignored. The caller is responsible for
    idx + S <= capacity (shapes are static; there is no ring wrap)."""
    idx = cache["idx"]
    if static_kv:
        k_buf, v_buf, new_idx = cache["k"], cache["v"], idx
    else:
        kh = split_heads(k_new, num_heads).astype(cache["k"].dtype)
        vh = split_heads(v_new, num_heads).astype(cache["v"].dtype)
        k_buf = jax.lax.dynamic_update_slice(cache["k"], kh, (0, 0, idx, 0))
        v_buf = jax.lax.dynamic_update_slice(cache["v"], vh, (0, 0, idx, 0))
        new_idx = idx + k_new.shape[1]
    valid = jnp.arange(k_buf.shape[2]) < new_idx
    fill_bias = jnp.where(valid, 0.0, -1e4)[None, None, None, :]
    if bias is not None:
        fill_bias = fill_bias + bias
    out = scaled_dot_product_attention(
        split_heads(q, num_heads), k_buf, v_buf, bias=fill_bias, scale=scale)
    return merge_heads(out), {"k": k_buf, "v": v_buf, "idx": new_idx}
