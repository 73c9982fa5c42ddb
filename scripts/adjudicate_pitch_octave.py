"""Adjudicate the wav1 frames-83-96 octave disagreement with
estimator-independent evidence (VERDICT r4 next #4).

Background: on /root/reference/dataset/1/1.wav (24 kHz, hop 320) the
from-scratch Praat-AC tracker (ns2vc_tpu/audio/pitch_ac.py) reports
~87 Hz over frames 83-96 while the checked-in pyworld DIO+StoneMask
golden (1.wav.f0.npy) reports ~174 Hz — a one-octave disagreement that
dominates the recorded raw RMSE (40.7 Hz) in
tests/test_native_and_pitch.py::TestACRealSpeechBounds. Real Praat is
not installable in this image, so neither tracker can adjudicate itself.

This script decides the region with three estimators that share no code
or model family with either tracker, all computed directly from the
spectrum of each 80 ms frame window:

1. **Odd-harmonic energy ratio** — the decisive physical test. If the
   true f0 were 87 Hz, the spectrum would carry energy at the ODD
   multiples of 87 (87, 261, 435, ... Hz); if the true f0 is 174 Hz,
   energy appears only at multiples of 174 (the even multiples of 87).
   We measure sum|X| at odd multiples of 87 divided by sum|X| at
   multiples of 174 over the first 10 harmonics. Ratio << 1 => 174 Hz.
2. **Harmonic product spectrum** (HPS, product of the spectrum
   downsampled by 1..5) — peak location in [50, 400] Hz.
3. **Real cepstrum** — peak quefrency in the [50, 400] Hz lag band.

Usage: python scripts/adjudicate_pitch_octave.py [--frames 80 100]
Prints a per-frame table and a verdict line.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 24000
HOP = 320
WIN_S = 0.080  # 80 ms: ~7 periods at 87 Hz, enough lag support for both


def frame_window(w24: np.ndarray, frame: int, hop: int = HOP,
                 win_s: float = WIN_S) -> np.ndarray:
    """Window centered on the frame's analysis time (frame*hop/sr)."""
    n = int(win_s * SR)
    c = frame * hop
    lo = max(0, c - n // 2)
    x = w24[lo : lo + n].astype(np.float64)
    return (x - x.mean()) * np.hanning(len(x))


def spectrum(x: np.ndarray, nfft: int = 1 << 15):
    mag = np.abs(np.fft.rfft(x, nfft))
    freqs = np.fft.rfftfreq(nfft, 1.0 / SR)
    return freqs, mag


def band_peak_mag(freqs, mag, f, half_bw=10.0) -> float:
    """Max magnitude within +-half_bw Hz of f (tolerates vibrato/jitter)."""
    m = (freqs >= f - half_bw) & (freqs <= f + half_bw)
    return float(mag[m].max()) if m.any() else 0.0


def odd_harmonic_ratio(freqs, mag, f_low: float, n_harm: int = 10) -> float:
    """sum of peaks at ODD multiples of f_low / sum at multiples of
    2*f_low. << 1 means the f_low subharmonic is spurious."""
    odd = sum(band_peak_mag(freqs, mag, (2 * k + 1) * f_low)
              for k in range(n_harm))
    even = sum(band_peak_mag(freqs, mag, 2 * (k + 1) * f_low)
               for k in range(n_harm))
    return odd / max(even, 1e-12)


def hps_peak(freqs, mag, fmin=50.0, fmax=400.0, n_down=5) -> float:
    h = np.log(mag + 1e-12).copy()
    acc = h.copy()
    for d in range(2, n_down + 1):
        acc[: len(h) // d] += h[: len(h) * d // d : d][: len(h) // d]
    band = (freqs >= fmin) & (freqs <= fmax)
    idx = np.nonzero(band)[0]
    return float(freqs[idx[np.argmax(acc[idx])]])


def cepstrum_peak(x: np.ndarray, fmin=50.0, fmax=400.0) -> float:
    nfft = 1 << 15
    logmag = np.log(np.abs(np.fft.rfft(x, nfft)) + 1e-12)
    ceps = np.fft.irfft(logmag)
    q = np.arange(len(ceps)) / SR  # quefrency (s)
    m = (q >= 1.0 / fmax) & (q <= 1.0 / fmin)
    idx = np.nonzero(m)[0]
    return float(1.0 / q[idx[np.argmax(ceps[idx])]])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", default="/root/reference/dataset/1/1.wav")
    ap.add_argument("--golden", default="/root/reference/dataset/1/1.wav.f0.npy")
    ap.add_argument("--frames", type=int, nargs=2, default=(80, 100))
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ns2vc_tpu.audio.pitch_ac import compute_f0_ac
    from ns2vc_tpu.audio.resample import resample
    from ns2vc_tpu.utils.wavio import read_wav

    wav, sr = read_wav(args.wav)
    if wav.ndim > 1:
        wav = wav.mean(axis=0)
    w24 = np.asarray(resample(jnp.asarray(wav), sr, SR))
    gold = np.load(args.golden)
    ac = compute_f0_ac(w24, SR, hop_length=HOP, p_len=len(gold))

    lo, hi = args.frames
    hi = min(hi, len(gold), len(ac))
    print(f"frame |   AC    gold |  odd/even@AC  HPS(Hz)  cepstrum(Hz)")
    votes_174, votes_87 = 0, 0
    rows = []
    for fr in range(lo, hi):
        if ac[fr] <= 0 or gold[fr] <= 0:
            continue
        x = frame_window(w24, fr)
        freqs, mag = spectrum(x)
        f_low = min(ac[fr], gold[fr])
        f_high = max(ac[fr], gold[fr])
        if not (1.7 < f_high / f_low < 2.3):
            continue  # not an octave disagreement at this frame
        ratio = odd_harmonic_ratio(freqs, mag, f_low)
        hps = hps_peak(freqs, mag)
        cep = cepstrum_peak(x)
        # each independent estimator votes for the candidate it is closer
        # to (in log-frequency)
        def closer(f):
            return (f_low if abs(np.log(f / f_low)) < abs(np.log(f / f_high))
                    else f_high)
        est_votes = [closer(hps), closer(cep),
                     f_low if ratio > 0.5 else f_high]
        n_high = sum(1 for v in est_votes if v == f_high)
        votes_174 += n_high
        votes_87 += 3 - n_high
        rows.append((fr, ac[fr], gold[fr], ratio, hps, cep, n_high))
        print(f"{fr:5d} | {ac[fr]:6.1f} {gold[fr]:6.1f} | {ratio:10.3f}  "
              f"{hps:7.1f}  {cep:9.1f}   ({n_high}/3 for high)")

    if not rows:
        print("no octave-disagreement frames in range")
        return
    total = votes_174 + votes_87
    print(f"\nvotes: high-octave {votes_174}/{total}, "
          f"low-octave {votes_87}/{total}")
    med_ratio = float(np.median([r[3] for r in rows]))
    if med_ratio < 0.5:
        verdict = ("no real subharmonic energy -> high octave (pyworld) "
                   "is physically correct")
    else:
        verdict = "genuine subharmonic energy -> low octave is defensible"
    print(f"median odd/even harmonic ratio at the low candidate: "
          f"{med_ratio:.3f} ({verdict})")


if __name__ == "__main__":
    main()
