"""Sequence utilities (reference modules/commons.py:7-189), JAX-native.

Includes the TTS-branch helpers (timing signals, duration->alignment path
generation, segment slicing, KL divergence, gumbel sampling). `sequence_mask`
lives in ops/masking.py; gradient clipping is optax's job
(train/trainer.py, replacing clip_grad_value_ at commons.py:174-189).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def slice_segments(x: jnp.ndarray, ids_str: jnp.ndarray,
                   segment_size: int = 4) -> jnp.ndarray:
    """Gather fixed-size segments: x (B, T, C), ids_str (B,) start frames
    (reference commons.py:65-72, (B,C,T) there)."""
    idx = ids_str[:, None] + jnp.arange(segment_size)[None, :]
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def rand_slice_segments(x: jnp.ndarray, rng: jax.Array,
                        x_lengths: jnp.ndarray | None = None,
                        segment_size: int = 4):
    """Random per-item segment start + slice (reference commons.py:74-82).
    Returns (segments, ids_str)."""
    b, t, _ = x.shape
    lengths = x_lengths if x_lengths is not None else jnp.full((b,), t)
    max_start = jnp.maximum(lengths - segment_size + 1, 1)
    ids_str = (jax.random.uniform(rng, (b,)) * max_start).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def get_timing_signal_1d(length: int, channels: int,
                         min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4) -> jnp.ndarray:
    """Tensor2Tensor sinusoidal timing signal (reference commons.py:94-108).
    Returns (1, length, channels)."""
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = channels // 2
    log_timescale_increment = (math.log(max_timescale / min_timescale)
                               / max(num_timescales - 1, 1))
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32)
        * -log_timescale_increment)
    scaled = position[:, None] * inv_timescales[None, :]
    signal = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
    signal = jnp.pad(signal, ((0, 0), (0, channels % 2)))
    return signal[None]


def add_timing_signal_1d(x: jnp.ndarray, min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4) -> jnp.ndarray:
    """(B, T, C) + timing signal (reference commons.py:110-113)."""
    _, t, c = x.shape
    return x + get_timing_signal_1d(t, c, min_timescale,
                                    max_timescale).astype(x.dtype)


def cat_timing_signal_1d(x: jnp.ndarray, min_timescale: float = 1.0,
                         max_timescale: float = 1.0e4) -> jnp.ndarray:
    """Concat timing signal on channels (reference commons.py:116-119)."""
    b, t, c = x.shape
    sig = jnp.broadcast_to(
        get_timing_signal_1d(t, c, min_timescale, max_timescale),
        (b, t, c)).astype(x.dtype)
    return jnp.concatenate([x, sig], axis=-1)


def subsequent_mask(length: int) -> jnp.ndarray:
    """Causal mask (1, 1, T, T) True=visible (reference commons.py:122-125)."""
    return jnp.tril(jnp.ones((length, length), bool))[None, None]


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Monotonic duration -> alignment path (reference commons.py:156-171).

    duration (B, 1, T_text), mask (B, 1, T_mel, T_text) ->
    path (B, 1, T_mel, T_text) where path[b, 0, t, s] = 1 iff mel frame t
    is attributed to text token s."""
    b, _, t_x = duration.shape
    t_y = mask.shape[2]
    cum = jnp.cumsum(duration, axis=-1)                  # (B, 1, T_text)
    frames = jnp.arange(t_y, dtype=cum.dtype)
    # frame t belongs to token s iff cum[s-1] <= t < cum[s]
    below = frames[None, None, :, None] < cum[:, :, None, :]
    path = below.astype(mask.dtype)
    path = path - jnp.pad(path, ((0, 0), (0, 0), (0, 0), (1, 0)))[..., :-1]
    return path * mask


def kl_divergence(m_p, logs_p, m_q, logs_q):
    """KL(P||Q) for diagonal gaussians (reference commons.py:47-52)."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) \
        * jnp.exp(-2.0 * logs_q)
    return kl


def rand_gumbel(rng: jax.Array, shape) -> jnp.ndarray:
    """Gumbel noise, numerically clipped (reference commons.py:54-58)."""
    u = jax.random.uniform(rng, shape) * 0.99998 + 0.00001
    return -jnp.log(-jnp.log(u))


def fused_add_tanh_sigmoid_multiply(a: jnp.ndarray, b: jnp.ndarray,
                                    n_channels: int) -> jnp.ndarray:
    """WaveNet gate (reference commons.py:128-135): channels-last halves."""
    x = a + b
    t_act = jnp.tanh(x[..., :n_channels])
    s_act = jax.nn.sigmoid(x[..., n_channels:])
    return t_act * s_act


# -- F0 conditioning helpers (jnp ports of reference utils.py:25-80,197-206,
#    used by the optional F0-predictor path) --------------------------------

F0_BIN = 256


def f0_to_coarse_jnp(f0: jnp.ndarray) -> jnp.ndarray:
    """256-bin mel-scale F0 quantization (reference utils.py:197-206),
    traceable version of audio/f0.py::f0_to_coarse."""
    import numpy as np

    f0_mel_min = 1127.0 * np.log(1.0 + 50.0 / 700.0)
    f0_mel_max = 1127.0 * np.log(1.0 + 1100.0 / 700.0)
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = ((f0_mel - f0_mel_min) * (F0_BIN - 2)
              / (f0_mel_max - f0_mel_min) + 1.0)
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, F0_BIN - 1)
    return jnp.rint(f0_mel).astype(jnp.int32)


def normalize_f0_jnp(f0: jnp.ndarray, uv: jnp.ndarray, rng=None) -> jnp.ndarray:
    """Masked mean-centering with optional random scale in [0.8, 1.2]
    (reference utils.py:66-80). f0 (B, T, 1), uv (B, T)."""
    uv_sum = jnp.sum(uv, axis=1, keepdims=True)
    uv_sum = jnp.where(uv_sum == 0, 9999.0, uv_sum)
    means = jnp.sum(f0[..., 0] * uv, axis=1, keepdims=True) / uv_sum
    if rng is not None:
        factor = jax.random.uniform(rng, (f0.shape[0], 1),
                                    minval=0.8, maxval=1.2)
    else:
        factor = jnp.ones((f0.shape[0], 1))
    return (f0 - means[..., None]) * factor[..., None]
