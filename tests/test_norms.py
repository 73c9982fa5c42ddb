"""ops/norms.py: the chanstats GroupNorm must be a drop-in for
nn.GroupNorm — identical math, identical param tree — so the
NS2VC_GN_IMPL=chanstats perf experiment cannot change model output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ns2vc_tpu.ops.norms import (ChanStatsGroupNorm, group_norm_chanstats,
                                 make_group_norm)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 2e-2)])
def test_chanstats_matches_flax(dtype, tol):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 56, 256)) * 3 + 1.0, dtype)
    scale = jnp.asarray(rng.standard_normal(256) * 0.5 + 1.0, dtype)
    bias = jnp.asarray(rng.standard_normal(256) * 0.2, dtype)
    ref = nn.GroupNorm(num_groups=8, epsilon=1e-5).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    got = group_norm_chanstats(x, scale, bias, groups=8, eps=1e-5)
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=tol, rtol=tol)


def test_param_tree_identical():
    x = jnp.zeros((2, 16, 64))
    p_flax = nn.GroupNorm(num_groups=8).init(jax.random.PRNGKey(0), x)
    p_chan = ChanStatsGroupNorm(num_groups=8).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_flax) == \
        jax.tree_util.tree_structure(p_chan)
    assert all(a.shape == b.shape for a, b in zip(
        jax.tree_util.tree_leaves(p_flax), jax.tree_util.tree_leaves(p_chan)))


def test_env_dispatch(monkeypatch):
    monkeypatch.delenv("NS2VC_GN_IMPL", raising=False)
    assert isinstance(make_group_norm(8), nn.GroupNorm)
    monkeypatch.setenv("NS2VC_GN_IMPL", "chanstats")
    assert isinstance(make_group_norm(8), ChanStatsGroupNorm)


def test_unet_output_unchanged(monkeypatch):
    """The full UNet produces the same output under both impls."""
    from ns2vc_tpu.models.unet import UNet1DConditionModel

    model = UNet1DConditionModel(
        in_channels=20, out_channels=20, block_out_channels=(16, 24, 32, 40),
        cross_attention_dim=24, num_attention_heads=4,
        addition_embed_heads=4)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 32, 20))
    t = jnp.array([3.0, 7.0])
    ehs = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 24))
    mask = jnp.ones((2, 12), bool)

    monkeypatch.delenv("NS2VC_GN_IMPL", raising=False)
    params = model.init(rng, sample, t, ehs, mask)
    ref = model.apply(params, sample, t, ehs, mask)
    monkeypatch.setenv("NS2VC_GN_IMPL", "chanstats")
    got = model.apply(params, sample, t, ehs, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
