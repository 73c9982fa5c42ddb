"""Pallas TPU flash-attention (forward) with key-padding bias.

The reference relies on torch SDPA/flash kernels
(unet1d/attention_processor.py:971-1052, operations.py:411). At NS2VC's
shapes (T <= 400, head_dim 16-64) XLA's fused dot-general attention is
already at the MXU roofline, so this kernel is the *long-sequence* path:
batched serving with thousands of prompt/content frames, where the
O(Tq*Tk) logits tensor exceeds HBM (XLA OOMs at Tq=Tk=8192, B=8, H=8:
the f32 logits alone are 16 GiB). `multihead_attention` in
ops/attention.py stays the default; dispatch via `attn_impl='pallas'`
or call `flash_attention` directly.

Implementation: streaming softmax over a 3-D grid
(batch*heads, q-blocks, k-blocks). K/V are tiled into VMEM one
(block_k, D) block per grid step — never the full sequence, so VMEM
stays bounded at any Tk — with the (Bq, D) output accumulator and
(Bq,) running max/denominator carried across the k dimension in VMEM
scratch (the k axis is declared 'arbitrary', i.e. sequential, so the
carry is sound). Softmax statistics are f32 regardless of input dtype.

Measured crossover (v5e chip, B=8 H=8 D=32, blocks 512/1024, chained-call
timing with host-readback sync — scripts/bench_attention.py):

    Tq=Tk   XLA bf16    this kernel
     512     3.10 ms      3.14 ms   (both dispatch-bound)
    2048     6.32 ms      4.79 ms
    4096    15.25 ms      8.30 ms
    8192     OOM         22.9  ms
   16384     OOM         79.1  ms

`attn_impl='auto'` in ops/attention.py routes to this kernel at
>= 2048 keys on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# lane width: scratch trailing dims must tile to 128 on TPU
_LANES = 128


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, scale: float, num_kb: int):
    """Grid (BH, nq, nk): one (Bq, D) query block x one (Bk, D) k/v block.

    q_ref (1, Bq, D); k_ref/v_ref (1, Bk, D); bias_ref (1, 1, Bk);
    o_ref (1, Bq, D). Scratch: acc (Bq, D) f32, m/l (Bq, LANES) f32
    (lane-replicated running max / denominator)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (Bq, Bk)
    logits = logits + bias_ref[0, 0, :][None, :]

    m_prev = m_ref[:, 0]                                  # (Bq,)
    l_prev = l_ref[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    p = jnp.exp(logits - m_new[:, None])
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ki == num_kb - 1)
    def _finish():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0] = (acc_ref[...] / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: jnp.ndarray | None = None,
                    scale: float | None = None,
                    block_q: int = 512, block_k: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """q (B, H, Tq, D), k/v (B, H, Tk, D), bias (B, Tk) additive key bias
    (0 keep / -1e4 drop) -> (B, H, Tq, D).

    Tq/Tk are padded to the block sizes internally; padded keys are masked
    via the bias, padded queries are sliced off. Default blocks (512, 1024)
    are the measured v5e sweet spot — see scripts/bench_attention.py; the
    (128, 128) naive choice was 6.8x slower at T=8192 (grid-step overhead
    across 64x more steps)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = d ** -0.5 if scale is None else scale

    pad_q = (-tq) % block_q
    pad_k = (-tk) % block_k
    if bias is None:
        bias = jnp.zeros((b, tk), jnp.float32)
    bias = bias.astype(jnp.float32)
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_k)), constant_values=NEG_INF)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    tq_p, tk_p = tq + pad_q, tk + pad_k
    num_kb = tk_p // block_k

    qf = q.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk_p, d)
    vf = v.reshape(b * h, tk_p, d)
    # (B, Tk) -> (B, 1, Tk), blocked per batch-head via index_map i // h
    # (no jnp.repeat materialization)
    bias_b = bias[:, None, :]

    grid = (b * h, tq_p // block_q, num_kb)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, num_kb=num_kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, ki: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, ki: (i, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, ki: (i, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda i, j, ki, h=h: (i // h, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, ki: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, bias_b)
    return out.reshape(b, h, tq_p, d)[:, :, :tq, :]
