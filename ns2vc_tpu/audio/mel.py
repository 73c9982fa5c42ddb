"""STFT / log-mel / iSTFT as fixed-shape, jittable XLA programs.

Semantics match the reference's feature extraction
(`torchaudio.transforms.MelSpectrogram(sample_rate=24000, n_fft=1024,
hop_length=256, n_mels=100, center=True, power=1)` followed by
`log(clip(. , 1e-7))` — reference preprocess.py:50-60 and
inference/infer_tool.py:171-182): hann window (periodic), reflect center
padding, magnitude spectrogram, HTK mel scale, no filterbank norm.

TPU notes:
- framing is done with a hop-block reshape + K shifted slices (no gather),
  which XLA fuses into the rfft;
- the mel projection is a single (T, n_freqs) @ (n_freqs, n_mels) matmul on
  the MXU;
- everything is static-shape: `num_frames = 1 + len(x) // hop`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(freq: np.ndarray | float) -> np.ndarray:
    """HTK mel scale (torchaudio's default for MelSpectrogram)."""
    return 2595.0 * np.log10(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_to_hz(mel: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, HTK scale, no norm.

    Equivalent to torchaudio `melscale_fbanks(n_freqs, f_min, f_max, n_mels,
    sample_rate, norm=None, mel_scale="htk")` which backs the reference's
    MelSpectrogram (preprocess.py:50-57). Returns (n_freqs, n_mels) float32.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)                             # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]        # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _frame(x: jnp.ndarray, n_fft: int, hop: int, num_frames: int) -> jnp.ndarray:
    """Extract overlapping frames from (..., L) -> (..., num_frames, n_fft).

    Uses the hop-block trick when hop | n_fft: reshape the signal into hop
    sized blocks and stack K = n_fft // hop shifted slices. Pure
    slice/reshape — no gather, so XLA keeps it in registers/VMEM.
    """
    if n_fft % hop == 0:
        k = n_fft // hop
        need = (num_frames + k - 1) * hop
        pad = need - x.shape[-1]
        if pad > 0:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        else:
            x = x[..., :need]
        blocks = x.reshape(x.shape[:-1] + (num_frames + k - 1, hop))
        parts = [blocks[..., i : i + num_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    # general fallback: gather
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center"))
def stft(
    x: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of (..., L) -> (..., 1 + L//hop, n_fft//2 + 1).

    center=True pads n_fft//2 on both sides with reflect (torch.stft
    semantics used by the reference's MelSpectrogram)."""
    if win_length < n_fft:  # torch center-pads the window to n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        num_frames = 1 + x.shape[-1] // hop
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)],
                    mode="reflect")
    else:
        num_frames = 1 + (x.shape[-1] - n_fft) // hop
    frames = _frame(x, n_fft, hop, num_frames)
    frames = frames * window
    return jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)


class MelSpectrogram:
    """Log-mel extractor with precomputed filterbank/window constants.

    `__call__(wav)` maps (..., L) float waveform at `sample_rate` to
    (..., n_mels, 1 + L//hop) log-mel, matching reference preprocess.py:50-60
    bit-closely (fp32 rfft + MXU matmul)."""

    def __init__(
        self,
        sample_rate: int = 24000,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int | None = None,
        n_mels: int = 100,
        f_min: float = 0.0,
        f_max: float | None = None,
        power: float = 1.0,
        log_clip: float = 1e-7,
    ):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length or n_fft
        self.n_mels = n_mels
        self.power = power
        self.log_clip = log_clip
        self.window = jnp.asarray(hann_window(self.win_length))
        self.fbank = jnp.asarray(
            mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max))

    def __call__(self, wav: jnp.ndarray, log: bool = True) -> jnp.ndarray:
        spec = stft(wav, self.window, self.n_fft, self.hop_length,
                    self.win_length, center=True)
        mag = jnp.abs(spec)
        if self.power != 1.0:
            mag = mag ** self.power
        mel = jnp.einsum("...tf,fm->...mt", mag, self.fbank,
                         preferred_element_type=jnp.float32)
        if log:
            mel = jnp.log(jnp.clip(mel, min=self.log_clip))
        return mel


def log_mel_spectrogram(wav: jnp.ndarray, sample_rate: int = 24000,
                        n_fft: int = 1024, hop_length: int = 256,
                        n_mels: int = 100) -> jnp.ndarray:
    """One-shot convenience wrapper (constants are cached per geometry)."""
    return _get_mel(sample_rate, n_fft, hop_length, n_mels)(wav)


@functools.lru_cache(maxsize=8)
def _get_mel(sample_rate: int, n_fft: int, hop_length: int, n_mels: int) -> MelSpectrogram:
    return MelSpectrogram(sample_rate=sample_rate, n_fft=n_fft,
                          hop_length=hop_length, n_mels=n_mels)


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """OLA of (..., T, n_fft) -> (..., (T-1)*hop + n_fft).

    Scatter-free dual of `_frame`: split each frame into K = n_fft/hop hop
    blocks and sum K shifted reshapes."""
    n_fft = frames.shape[-1]
    num_frames = frames.shape[-2]
    assert n_fft % hop == 0, "istft requires hop | n_fft"
    k = n_fft // hop
    out_blocks = num_frames + k - 1
    out = jnp.zeros(frames.shape[:-2] + (out_blocks, hop), frames.dtype)
    split = frames.reshape(frames.shape[:-1] + (k, hop))
    for i in range(k):
        out = out.at[..., i : i + num_frames, :].add(split[..., i, :])
    return out.reshape(frames.shape[:-2] + (out_blocks * hop,))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "length"))
def istft(
    spec: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT with window-envelope normalization (torch.istft
    semantics — needed for the Vocos iSTFT head, see models/vocos.py).

    spec: (..., T, n_fft//2+1) complex -> (..., samples)."""
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    frames = frames * window
    sig = _overlap_add(frames, hop)
    # window-square envelope for normalization
    wsq = jnp.broadcast_to(window * window, frames.shape[-2:])
    env = _overlap_add(wsq, hop)
    sig = sig / jnp.maximum(env, 1e-11)
    if center:
        sig = sig[..., n_fft // 2 :]
        if length is not None:
            sig = sig[..., :length]
        else:
            sig = sig[..., : sig.shape[-1] - n_fft // 2]
    elif length is not None:
        sig = sig[..., :length]
    return sig
