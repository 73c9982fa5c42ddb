"""UNet1D parity vs the reference diffusers-fork UNet (random weights ->
converter -> forward match), plus gradient/shape sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ns2vc_tpu.models.unet import UNet1DConditionModel, get_timestep_embedding
from ns2vc_tpu.ops.masking import sequence_mask
from ns2vc_tpu.utils import convert_reference as cvt
from tests.ref_oracle import load_reference_unet


SMALL = dict(in_channels=12, out_channels=5, block_out_channels=(16, 24, 32, 40),
             norm_num_groups=8, cross_attention_dim=20, attention_head_dim=4)


def _ref_unet(reference_dir, **kw):
    RefUNet, _ = load_reference_unet()
    torch.manual_seed(0)
    cfg = dict(SMALL, addition_embed_type="text",
               resnet_time_scale_shift="scale_shift",
               addition_embed_type_num_heads=4)
    cfg.update(kw)
    return RefUNet(**cfg).eval()


def _mine_like(ref_cfg=SMALL):
    return UNet1DConditionModel(
        in_channels=ref_cfg["in_channels"],
        out_channels=ref_cfg["out_channels"],
        block_out_channels=ref_cfg["block_out_channels"],
        norm_num_groups=ref_cfg["norm_num_groups"],
        cross_attention_dim=ref_cfg["cross_attention_dim"],
        num_attention_heads=ref_cfg["attention_head_dim"],
        addition_embed_heads=4,
    )


class TestTimestepEmbedding:
    def test_matches_reference(self, reference_dir):
        _, embeddings = load_reference_unet()
        t = torch.tensor([0.0, 1.0, 500.5, 999.0])
        want = embeddings.get_timestep_embedding(
            t, 128, flip_sin_to_cos=True, downscale_freq_shift=0.0).numpy()
        got = np.asarray(get_timestep_embedding(jnp.asarray(t.numpy()), 128))
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestUNetParity:
    @pytest.fixture(scope="class")
    def pair(self, reference_dir):
        ref = _ref_unet(reference_dir)
        params = {"params": cvt.unet_condition(ref.state_dict())}
        return ref, _mine_like(), params

    def test_forward_matches(self, pair):
        ref, mine, params = pair
        b, t, tp = 2, 32, 11
        torch.manual_seed(1)
        sample = torch.randn(b, SMALL["in_channels"], t)
        timesteps = torch.tensor([3, 777], dtype=torch.long)
        ehs = torch.randn(b, tp, SMALL["cross_attention_dim"])
        mask = torch.ones(b, tp, dtype=torch.bool)
        mask[1, 6:] = False
        with torch.no_grad():
            want = ref(sample, timesteps, ehs,
                       encoder_attention_mask=mask).sample.numpy()
        got = mine.apply(
            params, jnp.asarray(sample.numpy().transpose(0, 2, 1)),
            jnp.asarray(timesteps.numpy()), jnp.asarray(ehs.numpy()),
            encoder_attention_mask=jnp.asarray(mask.numpy()))
        got = np.asarray(got).transpose(0, 2, 1)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-4)

    def test_fractional_timesteps_match(self, pair):
        """Samplers drive the UNet with continuous t (reference
        sampler/dpm_solver.py:262-268)."""
        ref, mine, params = pair
        b, t, tp = 1, 16, 7
        torch.manual_seed(2)
        sample = torch.randn(b, SMALL["in_channels"], t)
        timesteps = torch.tensor([123.456])
        ehs = torch.randn(b, tp, SMALL["cross_attention_dim"])
        with torch.no_grad():
            want = ref(sample, timesteps, ehs).sample.numpy()
        got = mine.apply(params, jnp.asarray(sample.numpy().transpose(0, 2, 1)),
                         jnp.asarray(timesteps.numpy()), jnp.asarray(ehs.numpy()))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   atol=5e-4)


@pytest.mark.slow
class TestUNetTraining:
    def test_grads_flow_everywhere(self):
        mine = UNet1DConditionModel(**{k: v for k, v in SMALL.items()
                                       if k != "attention_head_dim"},
                                    num_attention_heads=4, addition_embed_heads=4)
        rng = jax.random.PRNGKey(0)
        b, t, tp = 2, 16, 9
        # random inputs: constant inputs give exactly-zero LayerNorm-scale
        # gradients (normalized value is 0), a false "dead param" signal
        sample = jax.random.normal(rng, (b, t, SMALL["in_channels"]))
        ehs = jax.random.normal(jax.random.fold_in(rng, 1),
                                (b, tp, SMALL["cross_attention_dim"]))
        mask = sequence_mask(jnp.array([9, 5]), tp)
        params = mine.init(rng, sample, jnp.array([1, 2]), ehs, mask)

        def loss(p):
            out = mine.apply(p, sample, jnp.array([1, 2]), ehs, mask)
            return jnp.mean(out ** 2)

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        zero = [jax.tree_util.keystr(k) for k, g in flat
                if float(jnp.abs(g).max()) == 0.0]
        assert not zero, f"dead params: {zero[:8]}"

    def test_remat_matches(self):
        kw = {k: v for k, v in SMALL.items() if k != "attention_head_dim"}
        plain = UNet1DConditionModel(**kw, num_attention_heads=4,
                                     addition_embed_heads=4)
        remat = UNet1DConditionModel(**kw, num_attention_heads=4,
                                     addition_embed_heads=4, remat=True)
        rng = jax.random.PRNGKey(1)
        sample = jax.random.normal(rng, (1, 16, SMALL["in_channels"]))
        ehs = jax.random.normal(rng, (1, 5, SMALL["cross_attention_dim"]))
        params = plain.init(rng, sample, jnp.array([5]), ehs)
        a = plain.apply(params, sample, jnp.array([5]), ehs)
        b = remat.apply(params, sample, jnp.array([5]), ehs)
        # atol 5e-6: remat and plain legally fuse the (fused-QKV) matmuls
        # differently; f32 drift at the 1e-6 level is reassociation, not
        # a remat bug
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    def test_remat_policy_dots_matches(self):
        """remat_policy='dots' (save matmul outputs, skip their backward
        recompute) must be numerics-neutral vs plain, forward and grad."""
        kw = {k: v for k, v in SMALL.items() if k != "attention_head_dim"}
        plain = UNet1DConditionModel(**kw, num_attention_heads=4,
                                     addition_embed_heads=4)
        dots = UNet1DConditionModel(**kw, num_attention_heads=4,
                                    addition_embed_heads=4, remat=True,
                                    remat_policy="dots")
        rng = jax.random.PRNGKey(1)
        sample = jax.random.normal(rng, (1, 16, SMALL["in_channels"]))
        ehs = jax.random.normal(rng, (1, 5, SMALL["cross_attention_dim"]))
        params = plain.init(rng, sample, jnp.array([5]), ehs)

        def loss(m):
            return lambda p: jnp.mean(
                m.apply(p, sample, jnp.array([5]), ehs) ** 2)

        la, ga = jax.value_and_grad(loss(plain))(params)
        lb, gb = jax.value_and_grad(loss(dots))(params)
        np.testing.assert_allclose(float(la), float(lb), atol=5e-6)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)


class TestDualTransformer:
    def test_matches_reference(self, reference_dir):
        import sys
        if str(reference_dir) not in sys.path:
            sys.path.insert(0, str(reference_dir))
        from unet1d.dual_transformer_1d import DualTransformer2DModel

        from ns2vc_tpu.models.unet import DualTransformer1D

        ch, heads, head_dim, cross = 16, 4, 4, 20
        lens = (6, 10)
        torch.manual_seed(3)
        ref = DualTransformer2DModel(
            num_attention_heads=heads, attention_head_dim=head_dim,
            in_channels=ch, norm_num_groups=8,
            cross_attention_dim=cross).eval()
        ref.condition_lengths = list(lens)

        mine = DualTransformer1D(ch, heads, cross, norm_num_groups=8,
                                 condition_lengths=lens)
        params = {"params": cvt.dual_transformer_1d(
            {k: v for k, v in ref.state_dict().items()}, "")}

        b, t = 2, 12
        rng = np.random.default_rng(0)
        x = rng.standard_normal((b, t, ch)).astype(np.float32)
        ctx = rng.standard_normal((b, sum(lens), cross)).astype(np.float32)

        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(ctx), return_dict=False)[0]
        got = mine.apply(params, jnp.asarray(x), jnp.asarray(ctx))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 1), atol=2e-5)


class TestGeluKnob:
    """The GEGLU gelu form is dtype-dispatched (models/unet.py::
    GEGLUFeedForward): exact erf in float32 (the parity dtype), tanh
    approximation in bfloat16 (below bf16 resolution, +21% measured
    end-to-end synthesis); NS2VC_GELU={erf,tanh} forces either."""

    def _ff(self):
        from ns2vc_tpu.models.unet import GEGLUFeedForward

        ff = GEGLUFeedForward(dim=32)
        rng = np.random.default_rng(0)
        x32 = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
        params = ff.init(jax.random.PRNGKey(0), x32)
        return ff, params, x32

    def test_f32_default_is_exact_erf(self, monkeypatch):
        ff, params, x32 = self._ff()
        monkeypatch.delenv("NS2VC_GELU", raising=False)
        default = np.asarray(ff.apply(params, x32))
        monkeypatch.setenv("NS2VC_GELU", "erf")
        erf = np.asarray(ff.apply(params, x32))
        np.testing.assert_array_equal(default, erf)
        # and the forced tanh path actually differs in f32
        monkeypatch.setenv("NS2VC_GELU", "tanh")
        tanh = np.asarray(ff.apply(params, x32))
        assert np.max(np.abs(tanh - default)) > 0
        np.testing.assert_allclose(tanh, default, atol=2e-2)

    def test_bf16_default_is_tanh_within_resolution(self, monkeypatch):
        from ns2vc_tpu.utils.precision import cast_floating

        ff, params, x32 = self._ff()
        pbf = cast_floating(params, jnp.bfloat16)
        xbf = x32.astype(jnp.bfloat16)
        monkeypatch.delenv("NS2VC_GELU", raising=False)
        default = np.asarray(ff.apply(pbf, xbf), np.float32)
        monkeypatch.setenv("NS2VC_GELU", "tanh")
        tanh = np.asarray(ff.apply(pbf, xbf), np.float32)
        np.testing.assert_array_equal(default, tanh)
        # vs the forced-erf bf16 path: rounding-scale difference only
        monkeypatch.setenv("NS2VC_GELU", "erf")
        erf = np.asarray(ff.apply(pbf, xbf), np.float32)
        np.testing.assert_allclose(default, erf, atol=3e-2)
