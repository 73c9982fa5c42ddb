"""Utility subsystem tests: model mixing, partial restore, config,
profiling helpers, CREPE architecture + converter."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ns2vc_tpu.config import Config, load_config, save_config
from ns2vc_tpu.utils.checkpoints import (
    latest_checkpoint_path, mix_models, partial_restore,
)


def make_tiny_crepe_sd(seed: int = 0) -> dict:
    """Deterministic tiny-CREPE torch-layout state dict from PCG64 —
    shared by the committed-golden generator (scripts/make_crepe_golden.py)
    and the CREPE oracle tests, so the golden file only needs to store the
    expected activations, not 2 MB of weights."""
    from ns2vc_tpu.features.crepe import TINY_FILTERS

    rng = np.random.default_rng(seed)
    sd = {}
    in_ch = 1
    for i, ch in enumerate(TINY_FILTERS):
        k = 512 if i == 0 else 64
        p = f"conv{i + 1}"
        sd[f"{p}.weight"] = (0.05 * rng.standard_normal(
            (ch, in_ch, k, 1))).astype(np.float32)
        sd[f"{p}.bias"] = (0.05 * rng.standard_normal(ch)).astype(np.float32)
        sd[f"{p}_BN.weight"] = (1 + 0.1 * rng.standard_normal(ch)).astype(
            np.float32)
        sd[f"{p}_BN.bias"] = (0.1 * rng.standard_normal(ch)).astype(
            np.float32)
        sd[f"{p}_BN.running_mean"] = (0.1 * rng.standard_normal(ch)).astype(
            np.float32)
        sd[f"{p}_BN.running_var"] = (0.5 + rng.random(ch)).astype(np.float32)
        in_ch = ch
    sd["classifier.weight"] = (0.05 * rng.standard_normal(
        (360, TINY_FILTERS[-1] * 4))).astype(np.float32)
    sd["classifier.bias"] = (0.05 * rng.standard_normal(360)).astype(
        np.float32)
    return sd


def torch_crepe_oracle(sd_np: dict, frames: np.ndarray) -> np.ndarray:
    """The single torch reference forward for CREPE (Kim et al. 2018):
    pad -> conv -> relu -> BN(eval) -> maxpool(2,1) x6, time-major
    flatten, sigmoid classifier. Shared by test_torch_oracle_parity and
    scripts/make_crepe_golden.py so the committed golden and the live
    parity test can never validate two silently different oracles."""
    import torch
    import torch.nn.functional as F

    from ns2vc_tpu.features.crepe import TINY_FILTERS

    with torch.no_grad():
        x = torch.from_numpy(frames)[:, None, :, None]  # (N,1,1024,1)
        for i in range(len(TINY_FILTERS)):
            p = f"conv{i + 1}"
            x = F.pad(x, (0, 0, 254, 254) if i == 0 else (0, 0, 31, 32))
            x = F.conv2d(x, torch.from_numpy(sd_np[f"{p}.weight"]),
                         torch.from_numpy(sd_np[f"{p}.bias"]),
                         (4, 1) if i == 0 else (1, 1))
            x = F.relu(x)
            x = F.batch_norm(
                x, torch.from_numpy(sd_np[f"{p}_BN.running_mean"]),
                torch.from_numpy(sd_np[f"{p}_BN.running_var"]),
                torch.from_numpy(sd_np[f"{p}_BN.weight"]),
                torch.from_numpy(sd_np[f"{p}_BN.bias"]),
                training=False, eps=1e-5)
            x = F.max_pool2d(x, (2, 1), (2, 1))
        x = x.permute(0, 2, 1, 3).reshape(x.shape[0], -1)
        return torch.sigmoid(F.linear(
            x, torch.from_numpy(sd_np["classifier.weight"]),
            torch.from_numpy(sd_np["classifier.bias"]))).numpy()


class TestMixModels:
    def test_weighted_mix(self):
        a = {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}
        b = {"w": jnp.full((2, 2), 3.0), "b": jnp.ones(2)}
        out = mix_models([a, b], [0.25, 0.75])
        np.testing.assert_allclose(np.asarray(out["w"]), 2.5)
        np.testing.assert_allclose(np.asarray(out["b"]), 0.75)


class TestPartialRestore:
    def test_shape_tolerant(self):
        target = {"a": jnp.zeros((2, 2)), "b": jnp.zeros(3), "c": jnp.zeros(1)}
        restored = {"a": jnp.ones((2, 2)), "b": jnp.ones(4)}  # b mismatched
        out = partial_restore(target, restored, verbose=False)
        np.testing.assert_allclose(np.asarray(out["a"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["b"]), 0.0)  # kept
        np.testing.assert_allclose(np.asarray(out["c"]), 0.0)  # missing kept


class TestLatestCheckpoint:
    def test_lookup(self, tmp_path):
        for n in [3, 11, 7]:
            os.makedirs(tmp_path / str(n))
        assert latest_checkpoint_path(str(tmp_path)).endswith("11")
        assert latest_checkpoint_path(str(tmp_path / "missing")) is None


class TestConfig:
    def test_roundtrip_reference_layout(self, tmp_path, reference_dir):
        cfg = load_config(str(reference_dir / "config.json"))
        assert cfg.train.train_batch_size == 32
        assert cfg.train.timesteps == 1000
        assert cfg.data.sampling_rate == 24000
        assert cfg.phoneme_encoder.n_layers == 6
        assert cfg.prompt_encoder.in_channels == 100
        assert cfg.f0_predictor.attention_layers == 10
        p = tmp_path / "cfg.json"
        save_config(cfg, str(p))
        cfg2 = load_config(str(p))
        assert cfg2 == cfg

    def test_unknown_keys_ignored(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text('{"train": {"train_lr": 0.5, "bogus": 1}, "extra": {}}')
        cfg = load_config(str(p))
        assert cfg.train.train_lr == 0.5


class TestProfiling:
    def test_env_window_parse(self, monkeypatch):
        from ns2vc_tpu.utils.profiling import profile_window_from_env

        monkeypatch.setenv("NS2VC_PROFILE_AT", "100:5")
        assert profile_window_from_env() == (100, 5)
        monkeypatch.setenv("NS2VC_PROFILE_AT", "junk")
        assert profile_window_from_env() is None
        monkeypatch.delenv("NS2VC_PROFILE_AT")
        assert profile_window_from_env() is None

    def test_trace_context(self, tmp_path):
        from ns2vc_tpu.utils.profiling import annotate, trace

        with trace(str(tmp_path)):
            with annotate("test_region"):
                jnp.ones(4).block_until_ready()
        # a trace directory should have been produced
        assert any(tmp_path.iterdir())


class TestCrepe:
    def test_forward_shape(self):
        from ns2vc_tpu.features.crepe import Crepe, PITCH_BINS, WINDOW

        model = Crepe(model="tiny")
        frames = jnp.zeros((3, WINDOW))
        variables = model.init(jax.random.PRNGKey(0), frames)
        probs = model.apply(variables, frames)
        assert probs.shape == (3, PITCH_BINS)
        assert (np.asarray(probs) >= 0).all() and (np.asarray(probs) <= 1).all()

    def test_decode_weighted(self):
        from ns2vc_tpu.features.crepe import (
            bins_to_cents, cents_to_frequency, decode_weighted,
        )

        probs = np.zeros((1, 360), np.float32)
        probs[0, 180] = 1.0
        f0, per = decode_weighted(jnp.asarray(probs))
        want = float(cents_to_frequency(bins_to_cents(jnp.array(180.0))))
        np.testing.assert_allclose(float(f0[0]), want, rtol=1e-5)
        assert float(per[0]) == 1.0

    def test_converter(self):
        torch = pytest.importorskip("torch")
        from ns2vc_tpu.features.crepe import (
            Crepe, TINY_FILTERS, WINDOW, convert_torchcrepe,
        )

        torch.manual_seed(0)
        sd = {}
        in_ch = 1
        for i, ch in enumerate(TINY_FILTERS):
            k = 512 if i == 0 else 64
            sd[f"conv{i+1}.weight"] = torch.randn(ch, in_ch, k, 1)
            sd[f"conv{i+1}.bias"] = torch.randn(ch)
            sd[f"conv{i+1}_BN.weight"] = torch.randn(ch)
            sd[f"conv{i+1}_BN.bias"] = torch.randn(ch)
            sd[f"conv{i+1}_BN.running_mean"] = torch.randn(ch)
            sd[f"conv{i+1}_BN.running_var"] = torch.rand(ch) + 0.5
            in_ch = ch
        sd["classifier.weight"] = torch.randn(360, 2048 // 8)
        sd["classifier.bias"] = torch.randn(360)
        variables = convert_torchcrepe(sd, model="tiny")
        probs = Crepe(model="tiny").apply(variables, jnp.zeros((2, WINDOW)))
        assert probs.shape == (2, 360)
        assert np.isfinite(np.asarray(probs)).all()

    def test_converter_rejects_unconsumed_keys(self):
        """Source-layout drift fails loudly (VERDICT round-2 #9)."""
        from ns2vc_tpu.features.crepe import convert_torchcrepe

        sd = make_tiny_crepe_sd()
        sd["conv1_BN.num_batches_tracked"] = np.int64(7)  # legit buffer
        convert_torchcrepe(sd, model="tiny")
        sd["conv7.weight"] = np.zeros(3, np.float32)  # drifted layout
        with pytest.raises(ValueError, match="not consumed"):
            convert_torchcrepe(sd, model="tiny")

    def test_torch_oracle_parity(self):
        """torch_crepe_oracle (the independent torch implementation of the
        published CREPE architecture, Kim et al. 2018) as the numeric
        oracle for the JAX model + converter. torchcrepe itself (and its
        weights) are not installable in this image (reference
        utils.py:82-94), so cross-implementation agreement + the committed
        golden below stand in for real-weight goldens (VERDICT round-2
        #10)."""
        pytest.importorskip("torch")
        from ns2vc_tpu.features.crepe import Crepe, convert_torchcrepe

        sd_np = make_tiny_crepe_sd()
        frames = np.random.default_rng(1).standard_normal(
            (4, 1024)).astype(np.float32)
        want = torch_crepe_oracle(sd_np, frames)

        got = np.asarray(Crepe(model="tiny").apply(
            convert_torchcrepe(sd_np, model="tiny"), jnp.asarray(frames)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_committed_golden(self):
        """Tiny-CREPE probs vs committed golden activations
        (tests/goldens/crepe_tiny_golden.npz, generated once by the torch
        oracle above; scripts/make_crepe_golden.py regenerates). Guards
        against the two live implementations drifting together."""
        from ns2vc_tpu.features.crepe import Crepe, convert_torchcrepe

        path = os.path.join(os.path.dirname(__file__), "goldens",
                            "crepe_tiny_golden.npz")
        golden = np.load(path)
        sd_np = make_tiny_crepe_sd(int(golden["weight_seed"]))
        frames = np.random.default_rng(
            int(golden["input_seed"])).standard_normal(
            (4, 1024)).astype(np.float32)
        got = np.asarray(Crepe(model="tiny").apply(
            convert_torchcrepe(sd_np, model="tiny"), jnp.asarray(frames)))
        np.testing.assert_allclose(got, golden["probs"], atol=5e-5,
                                   rtol=1e-3)


class TestProfileSummaryCategorize:
    """scripts/profile_summary.py::categorize — classification rules for
    xplane HLO op strings, with samples lifted from real v5e traces. The
    reference has no profiling tooling at all (SURVEY §5); two rounds of
    misattribution bugs (operand-text matching, dot-in-fusion hiding under
    "elementwise") motivate pinning the rules."""

    @pytest.fixture(scope="class")
    def categorize(self):
        import importlib.util

        path = os.path.join(os.path.dirname(__file__), os.pardir,
                            "scripts", "profile_summary.py")
        spec = importlib.util.spec_from_file_location("ps_mod", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.categorize

    def test_attention_probs_fusion(self, categorize):
        name = ("%fusion.18743 = (f32[16,8,400]{2,1,0:T(8,128)S(1)}, "
                "f32[16,8,400,400]{2,3,1,0:T(8,128)S(1)}) fusion("
                "bf16[16,8,400,16]{2,3,1,0:T(8,128)(2,1)S(1)} %bitcast.7020)")
        assert categorize(name) == "attention fusions (4-D)"

    def test_dot_output_fusion_weight_operand(self, categorize):
        # the UNet FF family: GEGLU -> down-proj dot -> residual adds
        name = ("%add_add_fusion.134 = bf16[16,200,256]{2,1,0:T(8,128)(2,1)"
                "S(1)} fusion(bf16[16,200,256]{2,1,0} %gte.21269, "
                "bf16[16,200,2048]{2,1,0} %convolution_add_fusion.552, "
                "bf16[256]{0:T(256)} %copy-done.1851, "
                "bf16[1024,256]{1,0:T(8,128)(2,1)} %copy-done.193)")
        assert categorize(name) == "dot output-fusions"

    def test_weight_grad_fusion_rank2_output(self, categorize):
        name = ("%fusion.900 = bf16[1024,256]{1,0:T(8,128)(2,1)} fusion("
                "bf16[32,272,256]{2,0,1} %gte.1, bf16[32,272,1024]{2,0,1} "
                "%gte.2)")
        assert categorize(name) == "dot output-fusions"

    def test_film_broadcast_stays_elementwise(self, categorize):
        # (B, C) time-embedding FiLM operand is an activation, not a weight
        name = ("%broadcast_multiply_fusion.7 = bf16[16,400,512]{2,1,0} "
                "fusion(bf16[16,512]{1,0} %gte.3, bf16[16,400,512]{2,1,0} "
                "%gte.4)")
        assert categorize(name) == "elementwise fusions"

    def test_norm_stat_reduce(self, categorize):
        name = ("%convert_reduce_fusion.5 = (f32[16,8]{1,0:T(8,128)}, "
                "f32[16,8]{1,0:T(8,128)}) fusion(bf16[16,400,128]{2,1,0} "
                "%gte.9)")
        assert categorize(name) == "norm-stat reduce fusions"

    def test_defining_op_not_operand_text(self, categorize):
        # regression for the round-3 fix: a fusion CONSUMING a copy-done
        # or convolution operand is not itself a copy/conv
        name = ("%multiply_subtract_fusion.2 = bf16[16,400,128]{2,1,0} "
                "fusion(bf16[16,400,128]{2,1,0} %copy-done.77, "
                "bf16[16,400,128]{2,1,0} %convolution.8)")
        assert categorize(name) == "elementwise fusions"

    def test_leaf_categories(self, categorize):
        assert categorize(
            "%convolution_add_fusion.543 = bf16[16,100,3072]{2,1,0} "
            "fusion(bf16[3072]{0} %p0)") == "convolution"
        assert categorize("%copy-done.3 = bf16[16,400,128]{1,2,0} "
                          "copy-done(%copy-start.3)") == "async copies"
        assert categorize("%dot.5 = f32[400,400]{1,0} dot(%a, %b)"
                          ) == "dot (matmul)"
        assert categorize(
            "%custom-call.2 = bf16[8,8,512,32]{3,2,1,0} custom-call(%q), "
            "custom_call_target=\"tpu_custom_call\"") == "pallas kernels"
