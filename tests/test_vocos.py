"""Vocos vocoder tests: iSTFT-head math vs a NumPy oracle, decode shape
semantics ('same' padding: out = T * hop), and state-dict conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ns2vc_tpu.audio.mel import hann_window
from ns2vc_tpu.models.vocos import Vocos, convert_vocos_state_dict


def _istft_same_oracle(spec: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Direct numpy port of the 'same'-padded OLA used by vocos's ISTFT."""
    t = spec.shape[0]
    win = hann_window(n_fft).astype(np.float64)
    frames = np.fft.irfft(spec, n=n_fft, axis=-1) * win
    out_len = (t - 1) * hop + n_fft
    y = np.zeros(out_len)
    env = np.zeros(out_len)
    for i in range(t):
        y[i * hop : i * hop + n_fft] += frames[i]
        env[i * hop : i * hop + n_fft] += win * win
    y = y / np.maximum(env, 1e-11)
    pad = (n_fft - hop) // 2
    return y[pad:-pad]


class TestISTFTHead:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        t, n_fft, hop, dim = 12, 64, 16, 8
        from ns2vc_tpu.models.vocos import ISTFTHead

        head = ISTFTHead(dim=dim, n_fft=n_fft, hop_length=hop)
        x = rng.standard_normal((1, t, dim)).astype(np.float32)
        params = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(head.apply(params, jnp.asarray(x)))[0]

        # reproduce from the head's own linear output
        kernel = np.asarray(params["params"]["out"]["kernel"])
        bias = np.asarray(params["params"]["out"]["bias"])
        h = x[0] @ kernel + bias
        mag, phase = np.split(h, 2, axis=-1)
        mag = np.clip(np.exp(mag), None, 1e2)
        spec = mag * (np.cos(phase) + 1j * np.sin(phase))
        want = _istft_same_oracle(spec, n_fft, hop)
        assert got.shape == (t * hop,)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestVocos:
    def test_decode_shape_and_batch(self):
        v = Vocos(dim=32, intermediate_dim=48, num_layers=2, n_fft=64,
                  hop_length=16, input_channels=10)
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 20))
        params = v.init(jax.random.PRNGKey(1), mel)
        wav = v.apply(params, mel)
        assert wav.shape == (2, 20 * 16)
        # channels-last input accepted too
        wav2 = v.apply(params, jnp.swapaxes(mel, 1, 2))
        np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-6)

    def test_converter_shapes(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        dim, inter, n_layers, n_mels, n_fft = 16, 24, 2, 10, 64
        sd = {
            "backbone.embed.weight": torch.randn(dim, n_mels, 7),
            "backbone.embed.bias": torch.randn(dim),
            "backbone.norm.weight": torch.randn(dim),
            "backbone.norm.bias": torch.randn(dim),
            "backbone.final_layer_norm.weight": torch.randn(dim),
            "backbone.final_layer_norm.bias": torch.randn(dim),
            "head.out.weight": torch.randn(n_fft + 2, dim),
            "head.out.bias": torch.randn(n_fft + 2),
        }
        for i in range(n_layers):
            p = f"backbone.convnext.{i}"
            sd.update({
                f"{p}.dwconv.weight": torch.randn(dim, 1, 7),
                f"{p}.dwconv.bias": torch.randn(dim),
                f"{p}.norm.weight": torch.randn(dim),
                f"{p}.norm.bias": torch.randn(dim),
                f"{p}.pwconv1.weight": torch.randn(inter, dim),
                f"{p}.pwconv1.bias": torch.randn(inter),
                f"{p}.pwconv2.weight": torch.randn(dim, inter),
                f"{p}.pwconv2.bias": torch.randn(dim),
                f"{p}.gamma": torch.randn(dim),
            })
        params = {"params": convert_vocos_state_dict(sd)}
        v = Vocos(dim=dim, intermediate_dim=inter, num_layers=n_layers,
                  n_fft=n_fft, hop_length=16, input_channels=n_mels)
        mel = jnp.zeros((1, n_mels, 8))
        wav = v.apply(params, mel)
        assert wav.shape == (1, 8 * 16)
        assert np.isfinite(np.asarray(wav)).all()

        # non-parameter buffers of the real charactr/vocos checkpoint
        # are tolerated; anything else raises (VERDICT round-2 #9)
        sd["feature_extractor.mel_spec.spectrogram.window"] = torch.ones(64)
        sd["head.istft.window"] = torch.ones(64)
        convert_vocos_state_dict(sd)
        sd["backbone.convnext.0.renamed.weight"] = torch.randn(2)
        with pytest.raises(ValueError, match="not consumed"):
            convert_vocos_state_dict(sd)
