"""Encoder op registry: all 15 ops run; weight-normed conv layer parity
vs the reference EncConvLayer (its weight_norm(conv, dim=2) fork)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ns2vc_tpu.models.encoders import WNConvResidual
from ns2vc_tpu.models.op_registry import (
    EncGausSALayer, EncLocalSALayer, EncLSTMLayer, OPERATIONS_ENCODER,
)
from ns2vc_tpu.ops.masking import sequence_mask
from ns2vc_tpu.utils.convert_reference import _np, layer_norm
from tests.ref_oracle import load_reference


class TestRegistry:
    @pytest.mark.slow
    def test_all_ops_run(self):
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 60, 32))
        mask = sequence_mask(jnp.array([60, 40]), 60)
        for op_id, ctor in OPERATIONS_ENCODER.items():
            layer = ctor(32, 0.1)
            params = layer.init(rng, x, mask)
            out = layer.apply(params, x, mask)
            assert out.shape == x.shape, op_id
            assert np.isfinite(np.asarray(out)).all(), op_id


class TestWNConvParity:
    def test_matches_reference_enc_conv_layer(self, reference_dir):
        model_mod, operations = load_reference()
        torch.manual_seed(0)
        c, k, t, b = 32, 5, 24, 2
        ref = model_mod.EncConvLayer(c, k, dropout=0.0).eval()
        x = torch.randn(t, b, c)
        pad = torch.zeros(b, t, dtype=torch.bool)
        pad[1, 17:] = True
        with torch.no_grad():
            want = ref(x, encoder_padding_mask=pad).numpy()

        sd = {f"m.{kk}": v for kk, v in ref.state_dict().items()}
        g = _np(sd["m.conv.parametrizations.weight.original0"])  # (1,1,C)
        v = _np(sd["m.conv.parametrizations.weight.original1"])  # (K,Ci,Co)
        params = {"params": {
            "layer_norm": layer_norm(sd, "m.layer_norm"),
            "conv_v": v,
            "conv_g": g.reshape(-1),
            "conv_b": _np(sd["m.conv.bias"]),
        }}
        mine = WNConvResidual(c, k, dropout=0.0)
        mask = sequence_mask(jnp.array([24, 17]), t)
        got = mine.apply(params, jnp.asarray(x.numpy().transpose(1, 0, 2)),
                         mask)
        np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want,
                                   atol=2e-5)


class TestLayerBehaviors:
    def test_gaussian_bias_localizes(self):
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, 64, 16))
        mask = sequence_mask(jnp.array([64]), 64)
        plain = EncGausSALayer(16, 1, dropout=0.0, gaus_bias=False)
        gaus = EncGausSALayer(16, 1, dropout=0.0, gaus_bias=True, gaus_tao=1.0)
        p1 = plain.init(rng, x, mask)
        # same projections, add tao
        p2 = {"params": dict(p1["params"])}
        p2["params"]["tao"] = jnp.ones((1,))
        o1 = plain.apply(p1, x, mask)
        o2 = gaus.apply(p2, x, mask)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_local_attention_is_banded(self):
        """Perturbing a key far outside the chunk band must not change the
        output at position 0 (band: keys [s-50, s+101))."""
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (1, 160, 16))
        mask = sequence_mask(jnp.array([160]), 160)
        layer = EncLocalSALayer(16, 2, dropout=0.0)
        params = layer.init(rng, x, mask)
        o1 = layer.apply(params, x, mask)
        x2 = x.at[0, 155].add(10.0)  # far beyond block 0's key range [0,101)
        o2 = layer.apply(params, x2, mask)
        np.testing.assert_allclose(np.asarray(o1)[0, 0], np.asarray(o2)[0, 0],
                                   atol=1e-5)

    def test_lstm_is_bidirectional(self):
        """Changing a later frame must affect a nearby earlier frame's
        output (LSTM influence decays over distance — randomly initialized
        gates squash long-range signals below float tolerance, so probe a
        2-frame gap)."""
        rng = jax.random.PRNGKey(2)
        x = jax.random.normal(rng, (1, 32, 16))
        mask = sequence_mask(jnp.array([32]), 32)
        layer = EncLSTMLayer(16, dropout=0.0)
        params = layer.init(rng, x, mask)
        o1 = layer.apply(params, x, mask)
        x2 = x.at[0, 10].add(100.0)
        o2 = layer.apply(params, x2, mask)
        d = np.abs(np.asarray(o1) - np.asarray(o2))[0]
        assert d[9].max() > 1e-7, d[9].max()    # backward direction
        assert d[11].max() > 1e-7, d[11].max()  # forward direction
