"""Diffusion core tests: full-model parity vs the reference NaturalSpeech2
(conditioning + denoiser through the weight converter), training-loss
behavior, and the compiled sampling path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ns2vc_tpu.config import Config, EncoderConfig, DiffusionEncoderConfig, TrainConfig
from ns2vc_tpu.models.diffusion import NaturalSpeech2, generate_mel
from ns2vc_tpu.ops.masking import sequence_mask
from ns2vc_tpu.utils import convert_reference as cvt
from tests.ref_oracle import load_reference


def small_config():
    return Config(
        phoneme_encoder=EncoderConfig(in_channels=256, hidden_channels=256,
                                      out_channels=256, n_layers=1),
        prompt_encoder=EncoderConfig(in_channels=100, hidden_channels=256,
                                     out_channels=256, n_layers=1),
        train=TrainConfig(timesteps=1000),
    )


REF_CFG = {
    "train": {"timesteps": 1000, "sampling_timesteps": 1000},
    "phoneme_encoder": {"in_channels": 256, "hidden_channels": 256,
                        "out_channels": 256, "n_layers": 1, "p_dropout": 0.2},
    "prompt_encoder": {"in_channels": 100, "hidden_channels": 256,
                       "out_channels": 256, "n_layers": 1, "p_dropout": 0.2},
    "f0_predictor": {},
    "diffusion_encoder": {"in_channels": 100, "out_channels": 100,
                          "hidden_channels": 256, "n_heads": 8,
                          "p_dropout": 0.2},
}


class TestFullModelParity:
    @pytest.fixture(scope="class")
    def pair(self, reference_dir):
        model_mod, _ = load_reference()
        torch.manual_seed(0)
        ref = model_mod.NaturalSpeech2(REF_CFG).eval()
        params = {"params": cvt.natural_speech2(ref.state_dict(),
                                                n_encoder_layers=1)}
        mine = NaturalSpeech2(small_config())
        return ref, mine, params

    def test_conditioning_and_denoiser_match(self, pair):
        ref, mine, params = pair
        b, t, tp = 2, 24, 16
        torch.manual_seed(1)
        c = torch.randn(b, 256, t)
        refer = torch.randn(b, 100, tp)
        lengths = torch.tensor([24, 17])
        refer_lengths = torch.tensor([16, 9])
        data = (c, refer, 0, 0, 0, lengths, refer_lengths, 0)
        with torch.no_grad():
            content_ref, prompt_ref = ref.pre_model.infer(data)  # (T, B, C)
            x = torch.randn(b, 100, t)
            tstep = torch.tensor([5, 900], dtype=torch.long)
            out_ref = ref.diff_model(
                x, (content_ref, prompt_ref, lengths, refer_lengths),
                tstep).numpy()

        c_mask = sequence_mask(jnp.array([24, 17]), t)
        refer_mask = sequence_mask(jnp.array([16, 9]), tp)
        content, prompt = mine.apply(
            params, jnp.asarray(c.numpy().transpose(0, 2, 1)),
            jnp.asarray(refer.numpy().transpose(0, 2, 1)),
            c_mask, refer_mask, method=NaturalSpeech2.encode)
        np.testing.assert_allclose(
            np.asarray(content).transpose(1, 0, 2),
            content_ref.numpy(), atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(prompt).transpose(1, 0, 2),
            prompt_ref.numpy(), atol=3e-5)

        out = mine.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                         content, prompt, refer_mask,
                         jnp.array([5.0, 900.0]),
                         method=NaturalSpeech2.denoise)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1),
                                   out_ref, atol=1e-3)


@pytest.mark.slow
class TestTraining:
    def test_loss_and_overfit_step(self):
        import optax

        cfg = small_config()
        model = NaturalSpeech2(cfg)
        rng = jax.random.PRNGKey(0)
        b, t, tp = 2, 16, 16
        batch = {
            "c": jax.random.normal(rng, (b, t, 256)),
            "refer": jax.random.normal(rng, (b, tp, 100)),
            "spec": jax.random.normal(rng, (b, t, 100)),
            "lengths": jnp.array([16, 12]),
            "refer_lengths": jnp.array([16, 10]),
        }
        params = model.init(rng, batch, rng)
        opt = optax.adamw(1e-3, b1=0.9, b2=0.99)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                loss, aux = model.apply(p, batch, rng, deterministic=True)
                return loss, aux
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state2 = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        losses = []
        for i in range(8):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(42))  # fixed t/noise
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses

    def test_loss_ignores_padded_target(self):
        """x_start and noise are masked (reference model.py:711-716)."""
        cfg = small_config()
        model = NaturalSpeech2(cfg)
        rng = jax.random.PRNGKey(1)
        b, t = 1, 16
        base = {
            "c": jnp.ones((b, t, 256)),
            "refer": jnp.ones((b, 16, 100)),
            "spec": jnp.ones((b, t, 100)),
            "lengths": jnp.array([10]),
            "refer_lengths": jnp.array([16]),
        }
        params = model.init(rng, base, rng)
        loss1, _ = model.apply(params, base, jax.random.PRNGKey(7),
                               deterministic=True)
        # perturb only padded frames of the target
        spec2 = base["spec"].at[:, 10:, :].set(99.0)
        loss2, _ = model.apply(params, {**base, "spec": spec2},
                               jax.random.PRNGKey(7), deterministic=True)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


@pytest.mark.slow
class TestGenerate:
    @pytest.mark.parametrize("method,steps", [("unipc", 6), ("ddim", 8),
                                              ("dpmsolver", 6)])
    def test_generate_mel_shapes(self, method, steps):
        cfg = small_config()
        model = NaturalSpeech2(cfg)
        rng = jax.random.PRNGKey(0)
        b, t, tp = 1, 16, 12
        c = jax.random.normal(rng, (b, t, 256))
        refer = jax.random.normal(rng, (b, tp, 100))
        batch = {"c": c, "refer": refer, "spec": jnp.zeros((b, t, 100)),
                 "lengths": jnp.array([t]), "refer_lengths": jnp.array([tp])}
        params = model.init(rng, batch, rng)
        mel = generate_mel(model, params, c, refer, jnp.array([t]),
                           jnp.array([tp]), rng, method=method, steps=steps)
        assert mel.shape == (b, t, 100)
        assert np.isfinite(np.asarray(mel)).all()

    def test_postdiv_attention_matches_default(self, monkeypatch):
        """NS2VC_ATTN_IMPL=postdiv must leave the whole sampled mel within
        fp tolerance of the default attention path (the env knob reroutes
        every multihead_attention call site — encoders + UNet self/cross)."""
        cfg = small_config()
        model = NaturalSpeech2(cfg)
        rng = jax.random.PRNGKey(0)
        b, t, tp = 1, 16, 12
        c = jax.random.normal(rng, (b, t, 256))
        refer = jax.random.normal(rng, (b, tp, 100))
        batch = {"c": c, "refer": refer, "spec": jnp.zeros((b, t, 100)),
                 "lengths": jnp.array([t]), "refer_lengths": jnp.array([tp])}
        params = model.init(rng, batch, rng)
        args = (model, params, c, refer, jnp.array([t]), jnp.array([tp]),
                rng)
        monkeypatch.delenv("NS2VC_ATTN_IMPL", raising=False)
        ref = np.asarray(generate_mel(*args, method="unipc", steps=6))
        monkeypatch.setenv("NS2VC_ATTN_IMPL", "postdiv")
        got = np.asarray(generate_mel(*args, method="unipc", steps=6))
        np.testing.assert_allclose(got, ref, atol=5e-4)
        assert np.max(np.abs(got - ref)) > 0  # the knob actually rerouted

    def test_bf16_tanh_gelu_within_bf16_rounding(self, monkeypatch):
        """The bf16 sampling path uses tanh gelu by default (models/
        unet.py::GEGLUFeedForward dtype dispatch). The swap must not
        perturb the sampled mel beyond what bf16 rounding itself costs:
        |bf16-default − f32| stays within 2x of |bf16-erf − f32|."""
        cfg = small_config()
        model = NaturalSpeech2(cfg)
        rng = jax.random.PRNGKey(0)
        b, t, tp = 1, 16, 12
        c = jax.random.normal(rng, (b, t, 256))
        refer = jax.random.normal(rng, (b, tp, 100))
        batch = {"c": c, "refer": refer, "spec": jnp.zeros((b, t, 100)),
                 "lengths": jnp.array([t]), "refer_lengths": jnp.array([tp])}
        params = model.init(rng, batch, rng)
        args = (model, params, c, refer, jnp.array([t]), jnp.array([tp]),
                rng)
        monkeypatch.delenv("NS2VC_GELU", raising=False)
        mel_f32 = np.asarray(generate_mel(*args, method="unipc", steps=6))
        mel_bf_tanh = np.asarray(generate_mel(
            *args, method="unipc", steps=6, compute_dtype=jnp.bfloat16))
        monkeypatch.setenv("NS2VC_GELU", "erf")
        mel_bf_erf = np.asarray(generate_mel(
            *args, method="unipc", steps=6, compute_dtype=jnp.bfloat16))
        # dispatch actually switched forms in bf16
        assert np.max(np.abs(mel_bf_tanh - mel_bf_erf)) > 0
        err_tanh = np.max(np.abs(mel_bf_tanh - mel_f32))
        err_erf = np.max(np.abs(mel_bf_erf - mel_f32))
        assert err_tanh <= 2.0 * err_erf + 1e-3, (err_tanh, err_erf)


@pytest.mark.slow
class TestF0PredictorPath:
    def test_enabled_f0_loss_and_params(self):
        import dataclasses

        import optax

        from ns2vc_tpu.config import F0PredictorConfig

        cfg = small_config()
        cfg = dataclasses.replace(cfg, f0_predictor=F0PredictorConfig(
            enabled=True, attention_layers=1))
        model = NaturalSpeech2(cfg)
        rng = jax.random.PRNGKey(0)
        b, t = 2, 16
        batch = {
            "c": jax.random.normal(rng, (b, t, 256)),
            "refer": jax.random.normal(rng, (b, t, 100)),
            "spec": jax.random.normal(rng, (b, t, 100)),
            "f0": jnp.abs(jax.random.normal(rng, (b, t))) * 100 + 100,
            "uv": jnp.ones((b, t)),
            "lengths": jnp.array([16, 12]),
            "refer_lengths": jnp.array([16, 10]),
        }
        params = model.init(rng, batch, rng)
        names = jax.tree_util.tree_leaves_with_path(params)
        keys = {jax.tree_util.keystr(p) for p, _ in names}
        assert any("f0_predictor" in k for k in keys)
        assert any("f0_emb" in k for k in keys)

        loss, aux = model.apply(params, batch, jax.random.PRNGKey(1),
                                deterministic=True)
        assert float(aux["loss_f0"]) > 0
        assert np.isfinite(float(loss))

        # generation with provided f0 (auto_predict_f0=False)
        mel = generate_mel(model, params, batch["c"], batch["refer"],
                           batch["lengths"], batch["refer_lengths"],
                           jax.random.PRNGKey(2), method="ddim", steps=4,
                           f0=batch["f0"], uv=batch["uv"],
                           auto_predict_f0=False)
        assert mel.shape == (b, t, 100)
        # and with predicted f0
        mel2 = generate_mel(model, params, batch["c"], batch["refer"],
                            batch["lengths"], batch["refer_lengths"],
                            jax.random.PRNGKey(2), method="ddim", steps=4,
                            f0=batch["f0"], uv=batch["uv"],
                            auto_predict_f0=True)
        assert np.isfinite(np.asarray(mel2)).all()
        assert not np.allclose(np.asarray(mel), np.asarray(mel2))


class TestFullConfigMigration:
    def test_reference_default_config_state_dict_converts(self, reference_dir):
        """Full-size (6-layer) reference checkpoint conversion: every
        converted tensor must match our model's init shapes exactly — the
        Trainer.load_torch / infer.py -m model-N.pt migration contract."""
        model_mod, _ = load_reference()
        ref_cfg = {**REF_CFG,
                   "phoneme_encoder": {**REF_CFG["phoneme_encoder"],
                                       "n_layers": 6},
                   "prompt_encoder": {**REF_CFG["prompt_encoder"],
                                      "n_layers": 6}}
        torch.manual_seed(0)
        ref = model_mod.NaturalSpeech2(ref_cfg)
        converted = cvt.natural_speech2(ref.state_dict(), n_encoder_layers=6)

        mine = NaturalSpeech2(Config())
        rng = jax.random.PRNGKey(0)
        batch = {
            "c": jnp.zeros((1, 16, 256)), "refer": jnp.zeros((1, 16, 100)),
            "spec": jnp.zeros((1, 16, 100)), "lengths": jnp.array([16]),
            "refer_lengths": jnp.array([16]),
        }
        abstract = jax.eval_shape(lambda r: mine.init(r, batch, r), rng)

        want = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(abstract["params"])}
        got = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_leaves_with_path(converted)}
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert not missing, f"missing {len(missing)}: {missing[:5]}"
        assert not extra, f"extra {len(extra)}: {extra[:5]}"
        mismatched = [k for k in want if want[k] != got[k]]
        assert not mismatched, mismatched[:5]

    def test_converter_rejects_unconsumed_keys(self, reference_dir):
        """Upstream key-layout drift fails loudly instead of silently
        dropping weights (VERDICT round-2 #9). The real reference state
        dict (with its schedule buffers) passes; one renamed key raises."""
        model_mod, _ = load_reference()
        ref_cfg = {**REF_CFG,
                   "phoneme_encoder": {**REF_CFG["phoneme_encoder"],
                                       "n_layers": 6},
                   "prompt_encoder": {**REF_CFG["prompt_encoder"],
                                      "n_layers": 6}}
        torch.manual_seed(0)
        sd = dict(model_mod.NaturalSpeech2(ref_cfg).state_dict())
        sd["diff_model.unet.renamed_module.weight"] = torch.zeros(2)
        with pytest.raises(ValueError, match="not consumed"):
            cvt.natural_speech2(sd, n_encoder_layers=6)
