"""Polyphase windowed-sinc resampling as a single strided XLA convolution.

Numerically matches `torchaudio.transforms.Resample` defaults
(sinc interpolation, hann window, lowpass_filter_width=6, rolloff=0.99),
which the reference uses for every 16 kHz / 24 kHz conversion
(preprocess.py:30-31, dataset.py:27/75, inference/infer_tool.py:161/171).

The polyphase kernel bank is precomputed on the host in float64; the device
side is one `lax.conv_general_dilated` with stride = orig/gcd — a dense,
MXU-friendly op with static shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int]:
    """Build the polyphase kernel bank.

    Returns (kernel (new_freq_r, width_total), width) where freqs are reduced
    by their gcd and `width` is the left padding used at apply time.
    """
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    assert lowpass_filter_width > 0
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))

    idx = np.arange(-width, width + orig, dtype=np.float64) / orig   # (W,)
    t = (-np.arange(new, dtype=np.float64) / new)[:, None] + idx[None, :]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * base_freq / orig
    return kernel.astype(np.float32), width


class Resampler:
    """Fixed-rate-pair resampler: (..., L) -> (..., ceil(L * new / orig))."""

    def __init__(self, orig_freq: int, new_freq: int,
                 lowpass_filter_width: int = 6, rolloff: float = 0.99):
        self.orig_freq = orig_freq
        self.new_freq = new_freq
        gcd = math.gcd(orig_freq, new_freq)
        self.orig = orig_freq // gcd
        self.new = new_freq // gcd
        kernel, width = sinc_resample_kernel(
            orig_freq, new_freq, lowpass_filter_width, rolloff)
        self.width = width
        # conv kernel layout OIH: (new, 1, W)
        self.kernel = jnp.asarray(kernel[:, None, :])

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        if self.orig == self.new:
            return wav
        return _apply_kernel(wav, self.kernel, self.orig, self.new, self.width)


@functools.partial(jax.jit, static_argnames=("orig", "new", "width"))
def _apply_kernel(wav: jnp.ndarray, kernel: jnp.ndarray,
                  orig: int, new: int, width: int) -> jnp.ndarray:
    batch_shape = wav.shape[:-1]
    length = wav.shape[-1]
    x = wav.reshape((-1, 1, length)).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, T')
    y = jnp.swapaxes(y, 1, 2).reshape((x.shape[0], -1))
    target_length = -(-new * length // orig)  # ceil
    return y[:, :target_length].reshape(batch_shape + (target_length,))


@functools.lru_cache(maxsize=16)
def _get_resampler(orig_freq: int, new_freq: int) -> Resampler:
    return Resampler(orig_freq, new_freq)


def resample(wav: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """One-shot resample with cached kernels per rate pair."""
    if orig_freq == new_freq:
        return wav
    return _get_resampler(orig_freq, new_freq)(wav)


@functools.lru_cache(maxsize=16)
def _get_np_kernel(orig_freq: int, new_freq: int):
    gcd = math.gcd(orig_freq, new_freq)
    kernel, width = sinc_resample_kernel(orig_freq, new_freq)
    return kernel, width, orig_freq // gcd, new_freq // gcd


def resample_np(wav: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """NumPy twin of `resample` (identical polyphase kernel, host matmul).
    For device-free contexts — e.g. forked data-loader workers, where
    touching the inherited JAX client is unsafe."""
    if orig_freq == new_freq:
        return wav
    kernel, width, orig, new = _get_np_kernel(orig_freq, new_freq)
    length = wav.shape[-1]
    x = np.pad(np.asarray(wav, np.float32), (width, width + orig))
    w_total = kernel.shape[1]
    frames = np.lib.stride_tricks.sliding_window_view(x, w_total)[::orig]
    y = (frames @ kernel.T).reshape(-1)  # (n_pos, new) -> interleaved
    return y[: -(-new * length // orig)]
