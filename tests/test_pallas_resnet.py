"""Fused GN/FiLM+SiLU+conv Pallas epilogue vs the XLA composite
(interpret mode on CPU; the on-chip perf comparison lives in
scripts/bench_resnet_fusion.py)."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ns2vc_tpu.ops.pallas_resnet import affine_silu_conv1d, gn_silu_conv1d


def _xla_chain(x, gamma, beta, w, bias, groups=8, eps=1e-5,
               film=None):
    h = nn.GroupNorm(num_groups=groups, epsilon=eps,
                     use_bias=True, use_scale=True).apply(
        {"params": {"scale": gamma, "bias": beta}}, x)
    if film is not None:
        s, sh = film
        h = h * (1 + s[:, None, :]) + sh[:, None, :]
    h = nn.silu(h)
    return nn.Conv(w.shape[-1], (3,), padding="SAME").apply(
        {"params": {"kernel": w, "bias": bias}}, h)


class TestFusedResnetEpilogue:
    def _case(self, b, t, c, co, seed=0):
        r = np.random.default_rng(seed)
        x = r.standard_normal((b, t, c)).astype(np.float32)
        gamma = (1 + 0.1 * r.standard_normal(c)).astype(np.float32)
        beta = (0.1 * r.standard_normal(c)).astype(np.float32)
        w = (r.standard_normal((3, c, co)) / np.sqrt(3 * c)).astype(
            np.float32)
        bias = (0.1 * r.standard_normal(co)).astype(np.float32)
        return x, gamma, beta, w, bias

    def test_affine_silu_conv_matches_xla(self):
        b, t, c, co = 2, 40, 128, 128
        x, gamma, beta, w, bias = self._case(b, t, c, co)
        r = np.random.default_rng(1)
        a = (1 + 0.1 * r.standard_normal((b, c))).astype(np.float32)
        off = (0.1 * r.standard_normal((b, c))).astype(np.float32)
        h = x * a[:, None, :] + off[:, None, :]
        want = nn.Conv(co, (3,), padding="SAME").apply(
            {"params": {"kernel": w, "bias": bias}}, nn.silu(h))
        got = affine_silu_conv1d(jnp.asarray(x), jnp.asarray(a),
                                 jnp.asarray(off), jnp.asarray(w),
                                 jnp.asarray(bias), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_gn_silu_conv_matches_xla(self):
        for (b, t, c, co) in [(2, 50, 128, 256), (1, 37, 256, 128)]:
            x, gamma, beta, w, bias = self._case(b, t, c, co, seed=c)
            want = _xla_chain(jnp.asarray(x), jnp.asarray(gamma),
                              jnp.asarray(beta), jnp.asarray(w),
                              jnp.asarray(bias))
            got = gn_silu_conv1d(jnp.asarray(x), jnp.asarray(gamma),
                                 jnp.asarray(beta), jnp.asarray(w),
                                 jnp.asarray(bias), interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-5, rtol=1e-4,
                                       err_msg=str((b, t, c, co)))

    def test_film_fold(self):
        b, t, c, co = 2, 24, 128, 128
        x, gamma, beta, w, bias = self._case(b, t, c, co, seed=7)
        r = np.random.default_rng(8)
        s = (0.2 * r.standard_normal((b, c))).astype(np.float32)
        sh = (0.2 * r.standard_normal((b, c))).astype(np.float32)
        want = _xla_chain(jnp.asarray(x), jnp.asarray(gamma),
                          jnp.asarray(beta), jnp.asarray(w),
                          jnp.asarray(bias),
                          film=(jnp.asarray(s), jnp.asarray(sh)))
        got = gn_silu_conv1d(jnp.asarray(x), jnp.asarray(gamma),
                             jnp.asarray(beta), jnp.asarray(w),
                             jnp.asarray(bias),
                             film_scale=jnp.asarray(s),
                             film_shift=jnp.asarray(sh), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_padded_time_edges(self):
        """T not a multiple of 8: padded tail must not leak into the last
        valid frame through the k=3 halo."""
        b, t, c, co = 1, 13, 128, 128
        x, gamma, beta, w, bias = self._case(b, t, c, co, seed=3)
        want = _xla_chain(jnp.asarray(x), jnp.asarray(gamma),
                          jnp.asarray(beta), jnp.asarray(w),
                          jnp.asarray(bias))
        got = gn_silu_conv1d(jnp.asarray(x), jnp.asarray(gamma),
                             jnp.asarray(beta), jnp.asarray(w),
                             jnp.asarray(bias), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)


class TestFusedResnetBlockIntegration:
    def test_fused_block_matches_unfused(self, monkeypatch):
        """ResnetBlock1D's fused Pallas path (level-0 gate) must match the
        plain flax path with the SAME parameter tree."""
        from ns2vc_tpu.models import unet as unet_mod

        block = unet_mod.ResnetBlock1D(out_channels=128)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((2, 40, 128)), jnp.float32)
        temb = jnp.asarray(r.standard_normal((2, 64)), jnp.float32)

        monkeypatch.setattr(unet_mod, "_use_fused_resnet",
                            lambda *a: False)
        params = block.init(jax.random.PRNGKey(0), x, temb)
        want = block.apply(params, x, temb)

        monkeypatch.setattr(unet_mod, "_use_fused_resnet",
                            lambda *a: True)
        params_f = block.init(jax.random.PRNGKey(0), x, temb)
        # identical tree: fused path declares the same params
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_f)
        got = block.apply(params, x, temb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)
