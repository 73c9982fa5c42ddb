"""Pallas TPU flash-attention (forward) with key-padding bias.

The reference relies on torch SDPA/flash kernels
(unet1d/attention_processor.py:971-1052, operations.py:411). At NS2VC's
shapes (T <= 400, head_dim 16-64) XLA's fused dot-general attention is
already at the MXU roofline, so this kernel is the *long-sequence* path:
batched serving with thousands of prompt/content frames, where the
O(Tq*Tk) logits tensor would spill VMEM. `multihead_attention` in
ops/attention.py stays the default; call `flash_attention` explicitly or
pass `use_flash=True` where wired.

Implementation: classic streaming-softmax tiling. Grid = (batch*heads,
q-blocks); the kernel keeps one (Bq, D) accumulator plus (Bq,) running
max/denominator in VMEM and loops k-blocks with `jax.lax.fori_loop`.
Softmax statistics are f32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int,
                  scale: float):
    """One (Bq, D) query block against all of k/v for one batch-head.

    q_ref: (1, Bq, D); k_ref/v_ref: (1, Tk, D); bias_ref: (1, Tk);
    o_ref: (1, Bq, D).
    """
    q = q_ref[0].astype(jnp.float32) * scale
    tk = k_ref.shape[1]
    bq, d = q.shape
    num_kb = tk // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (Bq, Bk)
        logits = logits + bias_ref[0, pl.ds(i * block_k, block_k)][None, :]

        m_cur = jnp.max(logits, axis=-1)                  # (Bq,)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: jnp.ndarray | None = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """q (B, H, Tq, D), k/v (B, H, Tk, D), bias (B, Tk) additive key bias
    (0 keep / -1e4 drop) -> (B, H, Tq, D).

    Tq/Tk are padded to the block sizes internally; padded keys are masked
    via the bias, padded queries are sliced off."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = d ** -0.5

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

    qf = q.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk_p, d)
    vf = v.reshape(b * h, tk_p, d)
    bias_bh = jnp.repeat(bias, h, axis=0)  # (B*H, Tk)

    grid = (b * h, tq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tk_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tk_p), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bias_bh)
    return out.reshape(b, h, tq_p, d)[:, :, :tq, :]
