"""Audio DSP layer tests: STFT/mel vs independent NumPy oracles, iSTFT
round-trip, resampler properties, and DIO F0 vs the golden pyworld outputs
checked into the reference's dataset/ (SURVEY.md section 4 test strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ns2vc_tpu.audio.mel import (
    MelSpectrogram, hann_window, istft, mel_filterbank, stft,
)
from ns2vc_tpu.audio.resample import Resampler, resample
from ns2vc_tpu.audio import f0 as f0mod


def _stft_oracle(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Direct framing + FFT oracle for center=True reflect-padded STFT
    (torch.stft semantics used by reference preprocess.py:50-59)."""
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    win = hann_window(n_fft).astype(np.float64)
    n_frames = 1 + len(x) // hop
    frames = np.stack([xp[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return np.fft.rfft(frames * win, axis=-1)


class TestSTFT:
    def test_matches_direct_framing(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(4096).astype(np.float32)
        got = np.asarray(stft(jnp.asarray(x), jnp.asarray(hann_window(1024))))
        want = _stft_oracle(x.astype(np.float64), 1024, 256)
        assert got.shape == want.shape == (17, 513)
        np.testing.assert_allclose(got, want.astype(np.complex64), atol=2e-3)

    def test_batched(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 2048)).astype(np.float32)
        got = np.asarray(stft(jnp.asarray(x), jnp.asarray(hann_window(1024))))
        assert got.shape == (3, 9, 513)
        single = np.asarray(stft(jnp.asarray(x[1]), jnp.asarray(hann_window(1024))))
        np.testing.assert_allclose(got[1], single, atol=1e-5)

    def test_non_divisible_hop_gather_path(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(3000).astype(np.float32)
        got = np.asarray(stft(jnp.asarray(x), jnp.asarray(hann_window(512)),
                              n_fft=512, hop=300, win_length=512))
        pad = 256
        xp = np.pad(x.astype(np.float64), (pad, pad), mode="reflect")
        win = hann_window(512).astype(np.float64)
        frames = np.stack([xp[i * 300 : i * 300 + 512] for i in range(1 + 3000 // 300)])
        want = np.fft.rfft(frames * win, axis=-1)
        np.testing.assert_allclose(got, want.astype(np.complex64), atol=2e-3)


class TestMel:
    def test_filterbank_properties(self):
        fb = mel_filterbank(513, 100, 24000)
        assert fb.shape == (513, 100)
        assert fb.min() >= 0
        # triangles must each have unit-ish peak and tile the spectrum
        assert (fb.max(axis=0) > 0).all()
        # HTK scale: first filter peak near mel bin of ~... just check ordering
        peaks = fb.argmax(axis=0)
        assert (np.diff(peaks) >= 0).all()

    def test_filterbank_triangle_math(self):
        """Cross-check a filter value against the closed-form triangle."""
        fb = mel_filterbank(513, 100, 24000)
        all_freqs = np.linspace(0, 12000, 513)
        m_pts = np.linspace(0.0, 2595 * np.log10(1 + 12000 / 700), 102)
        f_pts = 700 * (10 ** (m_pts / 2595) - 1)
        m = 50
        for k in [100, 200, 300]:
            f = all_freqs[k]
            left, center, right = f_pts[m], f_pts[m + 1], f_pts[m + 2]
            if left <= f <= center:
                want = (f - left) / (center - left)
            elif center < f <= right:
                want = (right - f) / (right - center)
            else:
                want = 0.0
            np.testing.assert_allclose(fb[k, m], want, atol=1e-5)

    def test_log_mel_of_sine_peaks_at_right_mel(self):
        sr, freq = 24000, 440.0
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        mel = MelSpectrogram()(jnp.asarray(x))
        assert mel.shape == (100, 1 + sr // 256)
        frame = np.asarray(mel)[:, mel.shape[1] // 2]
        peak_mel = frame.argmax()
        # expected mel bin: mel channels spaced in HTK mel between 0..12k
        m_pts = np.linspace(0.0, 2595 * np.log10(1 + 12000 / 700), 102)
        centers = 700 * (10 ** (m_pts[1:-1] / 2595) - 1)
        assert abs(centers[peak_mel] - freq) < 80.0

    def test_log_clip_floor(self):
        x = jnp.zeros(2048, jnp.float32)
        mel = MelSpectrogram()(x)
        np.testing.assert_allclose(np.asarray(mel), np.log(1e-7), atol=1e-4)


class TestISTFT:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(8192).astype(np.float32)
        w = jnp.asarray(hann_window(1024))
        spec = stft(jnp.asarray(x), w)
        y = np.asarray(istft(spec, w, length=8192))
        assert y.shape == (8192,)
        # edges are imperfect (window envelope), interior must be exact
        np.testing.assert_allclose(y[1024:-1024], x[1024:-1024], atol=1e-4)

    def test_batched_roundtrip(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 4096)).astype(np.float32)
        w = jnp.asarray(hann_window(1024))
        y = np.asarray(istft(stft(jnp.asarray(x), w), w, length=4096))
        np.testing.assert_allclose(y[:, 1024:-1024], x[:, 1024:-1024], atol=1e-4)


class TestResample:
    def test_length_formula(self):
        x = jnp.zeros(58330, jnp.float32)
        y = resample(x, 44100, 24000)
        assert y.shape == (int(np.ceil(58330 * 24000 / 44100)),)

    def test_sine_preserved(self):
        sr_in, sr_out, freq = 44100, 24000, 440.0
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
        t2 = np.arange(len(y)) / sr_out
        want = np.sin(2 * np.pi * freq * t2)
        err = np.abs(y[200:-200] - want[200:-200]).max()
        assert err < 5e-3, err

    def test_upsample_then_down_identity(self):
        rng = np.random.default_rng(5)
        # band-limit the input (16k -> 6k -> 16k) so the 16k<->24k round
        # trip is near-lossless
        x = rng.standard_normal(16000).astype(np.float32)
        x = np.asarray(resample(resample(jnp.asarray(x), 16000, 6000), 6000, 16000))
        up = resample(jnp.asarray(x), 16000, 24000)
        down = np.asarray(resample(up, 24000, 16000))
        n = min(len(down), len(x))
        np.testing.assert_allclose(down[500:n-500], x[500:n-500], atol=2e-2)

    def test_batched(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal((2, 4410)).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x), 44100, 24000))
        y0 = np.asarray(resample(jnp.asarray(x[0]), 44100, 24000))
        assert y.shape == (2, 2400)
        np.testing.assert_allclose(y[0], y0, atol=1e-6)

    def test_numpy_twin_matches_device_path(self):
        """resample_np (used by fork-safe data workers) applies the same
        polyphase kernel as the XLA path."""
        from ns2vc_tpu.audio.resample import resample_np

        rng = np.random.default_rng(7)
        x = rng.standard_normal(48000).astype(np.float32)
        for pair in [(44100, 24000), (24000, 16000), (22050, 24000)]:
            a = np.asarray(resample(jnp.asarray(x), *pair))
            b = resample_np(x, *pair)
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=2e-2)  # XLA matmuls may
            # run at reduced precision on this image; 7e-7 at 'highest'


class TestF0Utils:
    def test_interpolate_f0_interior_gap(self):
        f0 = np.array([0, 100, 0, 0, 0, 200, 300, 0, 0], dtype=np.float64)
        out, uv = f0mod.interpolate_f0(f0)
        np.testing.assert_allclose(uv, [0, 1, 0, 0, 0, 1, 1, 0, 0])
        # leading gap -> first voiced value
        assert out[0] == 100
        # interior gap: reference reaches the next voiced value one frame
        # early: fill[k] = prev + (next-prev)*(k-start+1)/(next-start)
        np.testing.assert_allclose(out[2:5], [100 + 100 / 3, 100 + 200 / 3, 200.0],
                                   rtol=1e-6)
        # trailing gap -> hold last voiced value
        np.testing.assert_allclose(out[7:], [300, 300])

    def test_interpolate_f0_gap_ending_at_final_frame(self):
        # quirk: a gap whose next voiced frame is the final frame is held
        f0 = np.array([100, 0, 0, 200], dtype=np.float64)
        out, _ = f0mod.interpolate_f0(f0)
        np.testing.assert_allclose(out, [100, 100, 100, 200])

    def test_interpolate_all_unvoiced(self):
        out, uv = f0mod.interpolate_f0(np.zeros(5))
        np.testing.assert_allclose(out, 0)
        np.testing.assert_allclose(uv, 0)

    def test_resize_f0(self):
        x = np.array([100.0, 0.0, 200.0, 300.0])
        out = f0mod.resize_f0(x, 8)
        assert out.shape == (8,)
        assert not np.isnan(out).any()
        # voiced endpoints preserved
        assert out[0] == 100.0

    def test_f0_to_coarse_range(self):
        f0 = np.array([0.0, 50.0, 440.0, 1100.0, 2000.0])
        c = f0mod.f0_to_coarse(f0)
        assert c.min() >= 1 and c.max() <= 255
        assert c[0] == 1 and c[1] == 1
        assert c[3] == 255 and c[4] == 255

    def test_normalize_f0(self):
        f0 = np.array([[[100.0, 200.0, 0.0, 300.0]]])
        uv = np.array([[1.0, 1.0, 0.0, 1.0]])
        out = f0mod.normalize_f0(f0, uv, random_scale=False)
        np.testing.assert_allclose(out[0, 0], [-100, 0, -200, 100])


class TestDIOGolden:
    """Validate the from-scratch DIO+StoneMask against the pyworld outputs
    checked into the reference repo (dataset/*/.f0.npy were produced at
    24 kHz with hop 320; 99 frames for 1.32 s)."""

    @pytest.fixture(scope="class")
    def golden(self, reference_dir):
        f0_1 = np.load(reference_dir / "dataset/1/1.wav.f0.npy")
        f0_2 = np.load(reference_dir / "dataset/2/2.wav.f0.npy")
        return f0_1, f0_2

    def _run(self, reference_dir, name):
        from ns2vc_tpu.utils.wavio import read_wav

        wav, sr = read_wav(str(reference_dir / f"dataset/{name}/{name}.wav"))
        wav24 = np.asarray(resample(jnp.asarray(wav), sr, 24000))
        return f0mod.compute_f0_dio(wav24, sampling_rate=24000, hop_length=320)

    @pytest.mark.parametrize("name,idx", [("1", 0), ("2", 1)])
    def test_against_pyworld_golden(self, reference_dir, golden, name, idx):
        got = self._run(reference_dir, name)
        want = golden[idx]
        assert got.shape == want.shape
        v_want = want > 0
        v_got = got > 0
        agreement = (v_want == v_got).mean()
        assert agreement > 0.95, f"voicing agreement {agreement:.2f}"
        both = v_want & v_got
        assert both.sum() > 10
        rmse = np.sqrt(np.mean((got[both] - want[both]) ** 2))
        assert rmse < 5.0, f"voiced RMSE {rmse:.1f} Hz"
        medabs = np.median(np.abs(got[both] - want[both]))
        assert medabs < 0.5, f"voiced median abs err {medabs:.2f} Hz"


class TestSTFTTorchParity:
    """torch.stft is the exact primitive beneath the reference's
    torchaudio.MelSpectrogram (preprocess.py:50-59); our STFT must match it
    bit-closely (center=True, reflect pad, periodic hann, onesided)."""

    def test_matches_torch_stft(self):
        torch = pytest.importorskip("torch")
        t = torch.Generator().manual_seed(0)
        x = torch.randn(4096, generator=t)
        win = torch.hann_window(1024)
        want = torch.stft(x, n_fft=1024, hop_length=256, win_length=1024,
                          window=win, center=True, pad_mode="reflect",
                          return_complex=True, onesided=True).numpy().T
        got = np.asarray(stft(jnp.asarray(x.numpy()),
                              jnp.asarray(hann_window(1024))))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3)
        # relative error of magnitudes is what the mel sees
        rel = (np.abs(np.abs(got) - np.abs(want))
               / np.maximum(np.abs(want), 1e-3)).max()
        assert rel < 1e-3, rel

    def test_window_matches_torch(self):
        torch = pytest.importorskip("torch")
        np.testing.assert_allclose(hann_window(1024),
                                   torch.hann_window(1024).numpy(),
                                   rtol=0, atol=5e-7)
