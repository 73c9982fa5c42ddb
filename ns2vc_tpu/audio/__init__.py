from ns2vc_tpu.audio.mel import MelSpectrogram, log_mel_spectrogram, istft, stft
from ns2vc_tpu.audio.resample import Resampler, resample
from ns2vc_tpu.audio.f0 import (
    compute_f0_dio,
    interpolate_f0,
    resize_f0,
    f0_to_coarse,
    normalize_f0,
)
from ns2vc_tpu.audio.slicer import Slicer, cut, chunks2audio

__all__ = [
    "MelSpectrogram",
    "log_mel_spectrogram",
    "stft",
    "istft",
    "Resampler",
    "resample",
    "compute_f0_dio",
    "interpolate_f0",
    "resize_f0",
    "f0_to_coarse",
    "normalize_f0",
    "Slicer",
    "cut",
    "chunks2audio",
]
