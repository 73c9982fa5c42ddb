"""Inference stack tests: Svc feature pipeline and end-to-end clip
conversion with tiny random-weight models (no external checkpoints)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ns2vc_tpu.config import (
    Config, DiffusionEncoderConfig, EncoderConfig, TrainConfig,
)
from ns2vc_tpu.infer.cli import crossfade_concat
from ns2vc_tpu.infer.svc import RealTimeVC, Svc, _bucket
from ns2vc_tpu.models.diffusion import NaturalSpeech2
from ns2vc_tpu.models.vocos import Vocos


def tiny_cfg():
    return Config(
        phoneme_encoder=EncoderConfig(n_layers=1),
        prompt_encoder=EncoderConfig(in_channels=100, n_layers=1),
        diffusion_encoder=DiffusionEncoderConfig(
            block_out_channels=(16, 24, 32, 40)),
        train=TrainConfig(),
    )


@pytest.fixture(scope="module")
def svc(reference_dir):
    from ns2vc_tpu.features.contentvec import ContentVec

    cfg = tiny_cfg()
    rng = jax.random.PRNGKey(0)
    model = NaturalSpeech2(cfg)
    batch = {
        "c": jnp.zeros((1, 16, 256)), "refer": jnp.zeros((1, 16, 100)),
        "spec": jnp.zeros((1, 16, 100)), "lengths": jnp.array([16]),
        "refer_lengths": jnp.array([16]),
    }
    params = model.init(rng, batch, rng)

    cv = ContentVec(dim=64, heads=4, ffn_dim=128, num_layers=1,
                    output_layer=1, final_dim=256)
    cv_params = cv.init(rng, jnp.zeros((1, 16000)))

    vocos = Vocos(dim=32, intermediate_dim=48, num_layers=1)
    v_params = vocos.init(rng, jnp.zeros((1, 100, 8)))

    s = Svc(config=tiny_cfg(), params=params, contentvec_ckpt="",
            contentvec_params=cv_params, vocos_params=v_params)
    # swap in the tiny contentvec/vocos modules matching the params
    s.contentvec = cv
    s.vocos = vocos
    return s


class TestBucket:
    def test_rounding(self):
        assert _bucket(1) == 64
        assert _bucket(64) == 64
        assert _bucket(65) == 128


class TestSvc:
    def test_compute_features(self, svc, reference_dir):
        from ns2vc_tpu.utils.wavio import read_wav

        wav, sr = read_wav(str(reference_dir / "dataset/1/1.wav"))
        c, f0, uv, wav24 = svc.compute_features(wav, sr, tran=2)
        assert c.shape[1] == 256
        assert c.shape[0] == f0.shape[0] == uv.shape[0]
        # transpose applied: +2 semitones scales f0 by 2^(2/12)
        c0, f00, _, _ = svc.compute_features(wav, sr, tran=0)
        voiced = (f00 > 0) & (f0 > 0)
        np.testing.assert_allclose(f0[voiced] / f00[voiced],
                                   2 ** (2 / 12), rtol=1e-5)

    def test_infer_from_features(self, svc):
        rng = np.random.default_rng(0)
        c = rng.standard_normal((40, 256)).astype(np.float32)
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        wav = svc.infer_from_features(c, refer, sampling_timesteps=4)
        assert wav.shape == (40 * 256,)
        assert np.isfinite(wav).all()

    def test_slice_inference(self, svc, reference_dir, tmp_path):
        out = svc.slice_inference(
            str(reference_dir / "dataset/1/1.wav"),
            str(reference_dir / "dataset/2/2.wav"),
            sampling_timesteps=4)
        assert out.ndim == 1 and len(out) > 0
        assert np.isfinite(out).all()

    def test_realtime_vc_crossfades(self, svc, reference_dir):
        from ns2vc_tpu.utils.wavio import read_wav

        wav, sr = read_wav(str(reference_dir / "dataset/2/2.wav"))
        refer_mel = svc.compute_refer_mel(wav, sr)
        rt = RealTimeVC(svc, chunk_seconds=0.5, crossfade_seconds=0.02)
        n = sr // 2
        out1 = rt.process(wav[:n], sr, refer_mel, sampling_timesteps=4)
        out2 = rt.process(wav[n : 2 * n], sr, refer_mel, sampling_timesteps=4)
        assert np.isfinite(out1).all() and np.isfinite(out2).all()


class TestCrossfade:
    def test_concat(self):
        a = np.ones(100, np.float32)
        b = np.zeros(100, np.float32)
        out = crossfade_concat([a, b], 20)
        assert len(out) == 180
        assert out[0] == 1 and out[-1] == 0
        seg = out[80:100]
        assert (np.diff(seg) <= 0).all()  # monotonic fade

    def test_empty_and_single(self):
        assert len(crossfade_concat([], 10)) == 0
        a = np.ones(5, np.float32)
        np.testing.assert_array_equal(crossfade_concat([a], 10), a)


class TestInferBatch:
    def test_batched_matches_lengths(self, svc):
        rng = np.random.default_rng(1)
        clips = [rng.standard_normal((t, 256)).astype(np.float32)
                 for t in (40, 25, 60)]
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        outs = svc.infer_batch(clips, refer, sampling_timesteps=4)
        assert [len(o) for o in outs] == [40 * 256, 25 * 256, 60 * 256]
        for o in outs:
            assert np.isfinite(o).all()

    def test_empty(self, svc):
        assert svc.infer_batch([], np.zeros((10, 100), np.float32)) == []


class TestCLIParser:
    def test_defaults_match_reference_flags(self):
        """Flag set mirrors reference infer.py:17-56."""
        from ns2vc_tpu.infer.cli import build_parser

        args = build_parser().parse_args(
            ["-m", "ckpt", "-n", "a.wav", "-r", "b.wav"])
        assert args.trans == [0]
        assert args.slice_db == -40
        assert args.pad_seconds == 0.5
        assert args.clip == 0
        assert args.linear_gradient == 0
        assert args.sample_method == "unipc"
        assert args.sampling_timesteps == 30
        assert args.wav_format == "wav"
        assert args.compute_dtype == "bfloat16"
