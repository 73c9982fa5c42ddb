"""Pallas TPU fused resnet epilogue: per-channel affine -> SiLU -> conv(k3).

The UNet's ResnetBlock1D (models/unet.py:237-266; reference
unet1d/resnet.py:461-640) spends its conv time in two k=3 SAME convs, each
preceded by GroupNorm (+ optional FiLM) and SiLU. Both prologues reduce to
a *per-(batch, channel) affine* once the GroupNorm statistics are known:

    gn(x)            = x * rstd_g*gamma_c + (beta_c - mean_g*rstd_g*gamma_c)
    gn(x)*(1+s) + sh = same shape of affine, FiLM folded in

so the whole epilogue is y = conv1d_k3(silu(x * A + B)) with A, B of shape
(batch, C). The stats/fold are tiny reductions left to XLA; this kernel
fuses the big part — the elementwise chain is applied in VMEM as the conv
inputs stream through the MXU (3 shifted (T, C) @ (C, Cout) matmuls), so
the normalized/activated tensor never round-trips to HBM.

Whether that beats XLA's conv + elementwise fusion at NS2VC shapes is an
empirical question — scripts/bench_resnet_fusion.py measures both; see its
docstring / CLAUDE.md for the verdict on v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, *, t_valid: int):
    """Grid (B,): whole (T, C) plane per step; conv k3 SAME as 3 matmuls.

    x_ref (1, T, C); a_ref/b_ref (B, C) — the FULL per-batch affine table
    (a (1, C) block would violate the TPU (8, 128) block-tiling rule;
    the whole table is a few KB, so every grid step just loads it and
    picks its row); w_ref (3, C, Co); bias_ref (1, Co); o_ref (1, T, Co).
    """
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)                       # (T, C)
    # row-select via one-hot reduction: Mosaic cannot prove a dynamic
    # sublane index (a_ref[i]) is 8-aligned, but a (B, C) multiply+sum
    # over the tiny affine table is free
    rows = jax.lax.broadcasted_iota(jnp.int32, (a_ref.shape[0], 1), 0)
    sel = (rows == i).astype(jnp.float32)
    a = jnp.sum(a_ref[...].astype(jnp.float32) * sel, axis=0)[None, :]
    b = jnp.sum(b_ref[...].astype(jnp.float32) * sel, axis=0)[None, :]
    xn = x * a + b
    xn = xn * jax.nn.sigmoid(xn)                           # SiLU
    # zero out padded tail rows so they don't bleed into valid outputs
    t = xn.shape[0]
    if t_valid < t:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        xn = jnp.where(row < t_valid, xn, 0.0)
    zero = jnp.zeros((1, xn.shape[1]), xn.dtype)
    left = jnp.concatenate([zero, xn[:-1]], axis=0)        # x[t-1]
    right = jnp.concatenate([xn[1:], zero], axis=0)        # x[t+1]
    w = w_ref[...].astype(jnp.float32)
    acc = jax.lax.dot_general(left, w[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(xn, w[1], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(right, w[2], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[0] = (acc + bias_ref[0].astype(jnp.float32)[None, :]).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def affine_silu_conv1d(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                       w: jnp.ndarray, bias: jnp.ndarray,
                       interpret: bool | None = None) -> jnp.ndarray:
    """y = conv1d_k3_SAME(silu(x * a + b), w) + bias.

    x (B, T, C); a, b (B, C) per-batch-channel affine (GroupNorm/FiLM
    folded by the caller); w (3, C, Co) flax-layout kernel; bias (Co,).
    T is padded to a multiple of 8 internally (sublane tiling); C and Co
    must be multiples of 128 (lane width) — true for the UNet's
    (128, 256, 384, 512) level widths."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bsz, t, c = x.shape
    co = w.shape[-1]
    assert w.shape == (3, c, co), w.shape
    assert c % 128 == 0 and co % 128 == 0, (c, co)
    pad_t = (-t) % 8
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    t_p = t + pad_t

    out = pl.pallas_call(
        functools.partial(_kernel, t_valid=t),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, t_p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bsz, c), lambda i: (0, 0)),
            pl.BlockSpec((bsz, c), lambda i: (0, 0)),
            pl.BlockSpec((3, c, co), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_p, co), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t_p, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, a, b, w, bias[None, :])
    return out[:, :t, :]


def gn_silu_conv1d(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   w: jnp.ndarray, bias: jnp.ndarray, groups: int = 8,
                   eps: float = 1e-5, film_scale: jnp.ndarray | None = None,
                   film_shift: jnp.ndarray | None = None,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Full fused epilogue: GroupNorm(+optional FiLM) -> SiLU -> conv k3.

    Matches `nn.GroupNorm(groups, eps)` -> [h*(1+scale)+shift] -> silu ->
    `nn.Conv(co, (3,), SAME)` on (B, T, C) input. Stats are computed here
    (tiny XLA reductions in f32); the heavy fused pass runs in Pallas."""
    bsz, t, c = x.shape
    xg = x.astype(jnp.float32).reshape(bsz, t, groups, c // groups)
    mean = xg.mean(axis=(1, 3))                            # (B, G)
    var = xg.var(axis=(1, 3))
    rstd = jax.lax.rsqrt(var + eps)
    rstd_c = jnp.repeat(rstd, c // groups, axis=1)         # (B, C)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    a = rstd_c * gamma[None, :]
    b = beta[None, :] - mean_c * a
    if film_scale is not None:
        a = a * (1.0 + film_scale)
        b = b * (1.0 + film_scale) + film_shift
    return affine_silu_conv1d(x, a.astype(x.dtype), b.astype(x.dtype),
                              w, bias, interpret=interpret)
