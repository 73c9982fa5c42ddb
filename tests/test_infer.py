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


@pytest.mark.slow
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

    def test_slice_inference_forced_clip_batched(self, svc, reference_dir):
        """clip_seconds forces sub-clip splitting; the round-5 batched
        pass must stage the sub-clips, convert them through grouped
        infer_batch dispatches, and crossfade-reassemble to ~the
        resampled input length."""
        from ns2vc_tpu.utils.wavio import read_wav

        path = str(reference_dir / "dataset/1/1.wav")
        wav, sr = read_wav(path)
        out = svc.slice_inference(
            path, str(reference_dir / "dataset/2/2.wav"),
            sampling_timesteps=4, clip_seconds=0.4, lg_seconds=0.05)
        assert out.ndim == 1 and np.isfinite(out).all()
        expected = int(np.ceil(len(wav) / sr * svc.target_sample))
        assert abs(len(out) - expected) <= 0.02 * expected

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


@pytest.mark.slow
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

    def test_pcm16_output_matches_quantized_float(self, svc):
        """output='pcm16' quantizes ON DEVICE (halving D2H bytes for the
        serving pipeline); results must equal round(float*32767) of the
        float path exactly (same seed => same mel/wav pre-quantization)."""
        rng = np.random.default_rng(2)
        clips = [rng.standard_normal((40, 256)).astype(np.float32)]
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        f = svc.infer_batch(clips, refer, sampling_timesteps=4, seed=3)
        q = svc.infer_batch(clips, refer, sampling_timesteps=4, seed=3,
                            output="pcm16")
        assert q[0].dtype == np.int16 and q[0].shape == f[0].shape
        expect = np.clip(np.round(f[0].astype(np.float64) * 32767.0),
                         -32768, 32767).astype(np.int16)
        # quantize-after-readback vs quantize-on-device may differ by one
        # LSB at exact .5 boundaries; require exactness elsewhere
        assert np.max(np.abs(q[0].astype(np.int32)
                             - expect.astype(np.int32))) <= 1
        assert np.mean(q[0] != expect) < 1e-3

    def test_infer_batch_async_finish(self, svc):
        """infer_batch_async returns a deferred readback whose result
        matches the synchronous path bit-for-bit."""
        rng = np.random.default_rng(3)
        clips = [rng.standard_normal((t, 256)).astype(np.float32)
                 for t in (40, 25)]
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        finish = svc.infer_batch_async(clips, refer, sampling_timesteps=4,
                                       seed=1)
        sync = svc.infer_batch(clips, refer, sampling_timesteps=4, seed=1)
        outs = finish()
        assert len(outs) == 2
        for a, b in zip(outs, sync):
            np.testing.assert_array_equal(a, b)

    def test_bf16_wire_upload_is_bit_identical(self):
        """Under bf16 compute, Svc uploads the conditioning pre-cast to
        bf16 (half the H2D bytes). generate_mel casts f32 inputs to the
        compute dtype at first use, so pre-cast-on-host must produce the
        SAME mel bit-for-bit."""
        import ml_dtypes

        from ns2vc_tpu.models.diffusion import generate_mel

        cfg = tiny_cfg()
        rng = jax.random.PRNGKey(0)
        model = NaturalSpeech2(cfg)
        batch = {
            "c": jnp.zeros((1, 16, 256)), "refer": jnp.zeros((1, 16, 100)),
            "spec": jnp.zeros((1, 16, 100)), "lengths": jnp.array([16]),
            "refer_lengths": jnp.array([16]),
        }
        params = model.init(rng, batch, rng)
        r = np.random.default_rng(7)
        c = r.standard_normal((1, 32, 256)).astype(np.float32)
        refer = r.standard_normal((1, 24, 100)).astype(np.float32)
        args = (jnp.asarray([32]), jnp.asarray([24]), jax.random.PRNGKey(3))

        def run(c_in, r_in):
            return np.asarray(generate_mel(
                model, params, jnp.asarray(c_in), jnp.asarray(r_in), *args,
                method="ddim", steps=3, compute_dtype=jnp.bfloat16))

        a = run(c, refer)
        b = run(c.astype(ml_dtypes.bfloat16), refer.astype(ml_dtypes.bfloat16))
        np.testing.assert_array_equal(a, b)

    def test_refer_cache_reuses_device_upload(self, svc):
        """refer_cache_key keeps the padded refer device-resident across
        dispatches of the same geometry (and distinct keys/geometries get
        distinct entries); results are unchanged."""
        rng = np.random.default_rng(4)
        clips = [rng.standard_normal((40, 256)).astype(np.float32)]
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        key = object()
        base = svc.infer_batch(clips, refer, sampling_timesteps=4, seed=5)
        svc._refer_cache.clear()
        f1 = svc.infer_batch_async(clips, refer, sampling_timesteps=4,
                                   seed=5, refer_cache_key=key)
        assert len(svc._refer_cache) == 1
        (entry1,) = svc._refer_cache.values()
        f2 = svc.infer_batch_async(clips, refer, sampling_timesteps=4,
                                   seed=5, refer_cache_key=key)
        assert len(svc._refer_cache) == 1
        (entry2,) = svc._refer_cache.values()
        assert entry1 is entry2  # same device buffer, no re-upload
        np.testing.assert_array_equal(f1()[0], base[0])
        np.testing.assert_array_equal(f2()[0], base[0])

    def test_invalid_output_rejected(self, svc):
        with pytest.raises(ValueError, match="output"):
            svc.infer_batch([np.zeros((8, 256), np.float32)],
                            np.zeros((10, 100), np.float32),
                            output="pcm24")


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
        # optional flags (reference infer.py:31-53)
        assert args.auto_predict_f0 is False
        assert args.f0_mean_pooling is False
        assert args.f0_filter_threshold == 0.05
        assert args.linear_gradient_retain == 0.75
        # EMA deployment default: on, with the --no_ema escape hatch
        assert args.no_ema is False
        assert build_parser().parse_args(
            ["-m", "ckpt", "-n", "a", "-r", "b", "--no_ema"]).no_ema is True

    def test_short_flags(self):
        from ns2vc_tpu.infer.cli import build_parser

        args = build_parser().parse_args(
            ["-m", "ckpt", "-n", "a", "-r", "b", "-a", "-fmp",
             "-ft", "0.1", "-lgr", "0.5", "-cl", "3", "-lg", "0.2",
             "-sd", "-30", "-p", "0.4", "-wf", "flac"])
        assert args.auto_predict_f0 and args.f0_mean_pooling
        assert args.f0_filter_threshold == 0.1
        assert args.linear_gradient_retain == 0.5
        assert args.clip == 3 and args.linear_gradient == 0.2
        assert args.slice_db == -30 and args.pad_seconds == 0.4
        assert args.wav_format == "flac"


@pytest.mark.slow
class TestOnlineF0Paths:
    def test_f0_filter_raises_on_silence(self, svc):
        from ns2vc_tpu.infer.svc import F0FilterException

        silence = np.zeros(24000, np.float32)
        with pytest.raises(F0FilterException):
            svc.compute_f0(silence, f0_filter=True)

    def test_ac_pitch_is_the_default(self, svc):
        """The online default tracks the reference's parselmouth path
        (infer_tool.py:152): a 220 Hz tone must come back at 220 Hz from
        the AC tracker (DIO-with-stonemask would too, but the AC path is
        exercised directly here via compute_f0)."""
        t = np.arange(24000 * 2) / 24000
        wav = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        f0, uv = svc.compute_f0(wav)
        voiced = f0[f0 > 0]
        assert len(voiced) > 50
        np.testing.assert_allclose(np.median(voiced), 220, rtol=0.02)

    def test_fmp_crepe_path(self, svc):
        """-fmp routes through the CREPE estimator (reference
        utils.py:82-94); with tiny random weights we check the plumbing:
        shapes, voicing mask, and the cr_threshold filter."""
        from ns2vc_tpu.features.crepe import Crepe

        rng = jax.random.PRNGKey(0)
        crepe = Crepe(model="tiny")
        svc.crepe = crepe
        svc.crepe_params = crepe.init(rng, jnp.zeros((4, 1024)))
        t = np.arange(24000) / 24000
        wav = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        f0, uv = svc.compute_f0(wav, f0_mean_pooling=True, cr_threshold=0.0)
        assert f0.shape == uv.shape == (len(wav) // svc.hop_size,)
        assert np.isfinite(f0).all()
        assert set(np.unique(uv)).issubset({0.0, 1.0})
        # threshold 1.0 gates everything unvoiced (sigmoid probs < 1)
        f0_gated, _ = svc.compute_f0(wav, f0_mean_pooling=True,
                                     cr_threshold=1.0)
        assert float(np.sum(f0_gated)) == 0.0


@pytest.mark.slow
class TestF0Conditioning:
    """f0/uv reach the sampler for f0_predictor-enabled checkpoints
    (reference passes them at model.py:605-608; round-1 Svc dropped them)."""

    @pytest.fixture(scope="class")
    def svc_f0(self):
        import dataclasses

        from ns2vc_tpu.config import F0PredictorConfig
        from ns2vc_tpu.models.vocos import Vocos

        cfg = dataclasses.replace(
            tiny_cfg(),
            f0_predictor=F0PredictorConfig(enabled=True, attention_layers=1))
        rng = jax.random.PRNGKey(0)
        model = NaturalSpeech2(cfg)
        batch = {
            "c": jnp.zeros((1, 16, 256)), "refer": jnp.zeros((1, 16, 100)),
            "spec": jnp.zeros((1, 16, 100)),
            "f0": jnp.full((1, 16), 200.0), "uv": jnp.ones((1, 16)),
            "lengths": jnp.array([16]), "refer_lengths": jnp.array([16]),
        }
        params = model.init(rng, batch, rng)
        vocos = Vocos(dim=32, intermediate_dim=48, num_layers=1)
        v_params = vocos.init(rng, jnp.zeros((1, 100, 8)))
        s = Svc(config=cfg, params=params, contentvec_ckpt="",
                vocos_params=v_params)
        s.vocos = vocos
        return s

    def test_f0_changes_output(self, svc_f0):
        rng = np.random.default_rng(0)
        c = rng.standard_normal((40, 256)).astype(np.float32)
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        f0 = np.full(40, 200.0, np.float32)
        uv = np.ones(40, np.float32)
        wav_with = svc_f0.infer_from_features(
            c, refer, sampling_timesteps=4, f0=f0, uv=uv,
            auto_predict_f0=False)
        wav_double = svc_f0.infer_from_features(
            c, refer, sampling_timesteps=4, f0=f0 * 4, uv=uv,
            auto_predict_f0=False)
        assert wav_with.shape == wav_double.shape == (40 * 256,)
        assert not np.allclose(wav_with, wav_double)

    def test_infer_batch_of_1_matches_single_clip(self, svc_f0):
        """infer_batch forwards f0/uv like the single-clip path (VERDICT
        round-2 #5; the reference passes f0 on every path,
        model.py:605-608): a batch of one must reproduce the single-clip
        output bit-for-bit at the same bucket."""
        rng = np.random.default_rng(6)
        c = rng.standard_normal((40, 256)).astype(np.float32)
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        f0 = np.full(40, 180.0, np.float32)
        uv = np.ones(40, np.float32)
        single = svc_f0.infer_from_features(
            c, refer, sampling_timesteps=4, f0=f0, uv=uv)
        batched = svc_f0.infer_batch(
            [c], refer, sampling_timesteps=4, f0s=[f0], uvs=[uv])
        np.testing.assert_array_equal(batched[0], single)
        # and f0 actually conditions the batched path
        batched_2x = svc_f0.infer_batch(
            [c], refer, sampling_timesteps=4, f0s=[f0 * 4], uvs=[uv])
        assert not np.allclose(batched_2x[0], batched[0])

    def test_realtime_vc_forwards_f0_controls(self, svc_f0, monkeypatch):
        """RealTimeVC.process exposes auto_predict_f0 and forwards f0/uv
        (VERDICT round-2 #5)."""
        seen = {}
        real = svc_f0.infer_from_features

        def spy(c, refer_mel, *a, **kw):
            seen.update(kw)
            return real(c, refer_mel, *a, **kw)

        monkeypatch.setattr(svc_f0, "infer_from_features", spy)
        monkeypatch.setattr(
            svc_f0, "compute_features",
            lambda wav, sr, tran=0, **kw: (
                np.zeros((40, 256), np.float32),
                np.full(40, 170.0, np.float32),
                np.ones(40, np.float32), None))
        rt = RealTimeVC(svc_f0, chunk_seconds=0.5, crossfade_seconds=0.02)
        refer = np.zeros((30, 100), np.float32)
        rt.process(np.zeros(12000, np.float32), 24000, refer,
                   sampling_timesteps=4, auto_predict_f0=True)
        assert seen["auto_predict_f0"] is True
        assert seen["f0"] is not None and seen["uv"] is not None

    def test_missing_f0_on_enabled_checkpoint_raises(self, svc_f0):
        """An f0_predictor.enabled checkpoint must not silently synthesize
        without F0 conditioning (the reference passes f0 on every path,
        model.py:605-608) — even auto_predict_f0 needs the source contour
        for the predictor input."""
        rng = np.random.default_rng(9)
        c = rng.standard_normal((40, 256)).astype(np.float32)
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        with pytest.raises(ValueError, match="f0_predictor.enabled"):
            svc_f0.infer_from_features(c, refer, sampling_timesteps=4)
        with pytest.raises(ValueError, match="f0_predictor.enabled"):
            svc_f0.infer_from_features(c, refer, sampling_timesteps=4,
                                       auto_predict_f0=True)
        with pytest.raises(ValueError, match="f0_predictor.enabled"):
            svc_f0.infer_batch([c], refer, sampling_timesteps=4)

    def test_auto_predict_f0_differs(self, svc_f0):
        rng = np.random.default_rng(1)
        c = rng.standard_normal((40, 256)).astype(np.float32)
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        f0 = np.full(40, 150.0, np.float32)
        uv = np.ones(40, np.float32)
        a = svc_f0.infer_from_features(c, refer, sampling_timesteps=4,
                                       f0=f0, uv=uv, auto_predict_f0=False)
        b = svc_f0.infer_from_features(c, refer, sampling_timesteps=4,
                                       f0=f0, uv=uv, auto_predict_f0=True)
        assert not np.allclose(a, b)


@pytest.mark.slow
class TestCompiledInferPath:
    def test_no_retrace_at_same_bucket(self, svc):
        """The whole encode+sample+vocode program is one jit; repeat calls
        at the same shape bucket must not retrace (VERDICT round-1 #2)."""
        rng = np.random.default_rng(2)
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        c = rng.standard_normal((40, 256)).astype(np.float32)
        svc.infer_from_features(c, refer, sampling_timesteps=4)
        fn = svc._infer_cache[("unipc", 4, 2, False, False, True, "float32")]
        baseline = fn._cache_size()
        for t in (50, 60):  # same 64-frame bucket -> no retrace
            c = rng.standard_normal((t, 256)).astype(np.float32)
            svc.infer_from_features(c, refer, sampling_timesteps=4)
        assert fn._cache_size() == baseline

    def test_distinct_configs_get_distinct_programs(self, svc):
        rng = np.random.default_rng(3)
        c = rng.standard_normal((40, 256)).astype(np.float32)
        refer = rng.standard_normal((30, 100)).astype(np.float32)
        svc.infer_from_features(c, refer, sample_method="ddim",
                                sampling_timesteps=4)
        assert ("ddim", 4, 2, False, False, True,
                "float32") in svc._infer_cache


class TestCrossfadeRetain:
    def test_lgr_reconstructs_overlapping_signal(self):
        """With clips overlapping by cross_len, retain<1 discards the
        overlap flanks and blends the middle (reference infer.py:87-90,
        133-139) — identical overlapping content must reconstruct
        exactly."""
        x = np.random.default_rng(4).standard_normal(300).astype(np.float32)
        a, b = x[:200], x[160:]
        out = crossfade_concat([a, b], 40, retain=0.75)
        assert out.shape == x.shape
        np.testing.assert_allclose(out, x, rtol=1e-6)

    def test_retain_one_matches_plain_crossfade(self):
        x = np.random.default_rng(5).standard_normal(200).astype(np.float32)
        a, b = x[:120], x[100:]
        out = crossfade_concat([a, b], 20, retain=1.0)
        assert out.shape == x.shape
        np.testing.assert_allclose(out, x, rtol=1e-6)
