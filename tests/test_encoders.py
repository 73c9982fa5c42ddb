"""Numeric parity tests: JAX encoders vs the reference PyTorch modules
(random weights -> weight converter -> forward comparison)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ns2vc_tpu.models.encoders import (
    EncSALayer, PhoneEncoder, PromptEncoder, TextTimeEmbedding,
)
from ns2vc_tpu.ops.masking import sequence_mask
from ns2vc_tpu.utils import convert_reference as cvt
from tests.ref_oracle import load_reference, load_reference_unet


@pytest.fixture(scope="module")
def ref(reference_dir):
    return load_reference()


def _lengths_mask(lengths, t):
    return sequence_mask(jnp.asarray(lengths), t)


class TestEncSALayerParity:
    def test_forward_matches_reference(self, ref):
        _, operations = ref
        torch.manual_seed(0)
        c, heads, t, b = 64, 8, 40, 3
        layer = operations.OPERATIONS_ENCODER[8](c, 0.2).eval()

        x = torch.randn(t, b, c)
        lengths = [40, 33, 17]
        pad_mask = torch.zeros(b, t, dtype=torch.bool)
        for i, l in enumerate(lengths):
            pad_mask[i, l:] = True
        with torch.no_grad():
            want = layer(x, encoder_padding_mask=pad_mask).numpy()

        sd = {f"l.op.{k}": v for k, v in layer.state_dict().items()}
        params = {"params": cvt.enc_sa_layer(sd, "l", 9)}

        mine = EncSALayer(c, heads, 9, 0.2)
        got = mine.apply(params, jnp.asarray(x.numpy().transpose(1, 0, 2)),
                         _lengths_mask(lengths, t))
        got = np.asarray(got).transpose(1, 0, 2)
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPhonePromptEncoderParity:
    def test_phone_encoder(self, ref):
        model, _ = ref
        torch.manual_seed(1)
        enc = model.PhoneEncoder(in_channels=256, hidden_channels=256,
                                 out_channels=256, n_layers=2,
                                 p_dropout=0.2).eval()
        b, t = 2, 36
        x = torch.randn(b, 256, t)
        g = torch.randn(b, 100, 1)
        lengths = torch.tensor([36, 25])
        with torch.no_grad():
            want = enc(x, lengths, g).numpy()  # (T, B, C)

        params = {"params": cvt.phone_encoder(enc.state_dict(), "", n_layers=2)}
        mine = PhoneEncoder(n_layers=2)
        got = mine.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                         _lengths_mask([36, 25], t),
                         jnp.asarray(g.numpy()[:, :, 0]))
        np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want,
                                   atol=2e-5)

    def test_prompt_encoder(self, ref):
        model, _ = ref
        torch.manual_seed(2)
        enc = model.PromptEncoder(in_channels=100, hidden_channels=256,
                                  out_channels=256, n_layers=2,
                                  p_dropout=0.2).eval()
        b, t = 2, 28
        x = torch.randn(b, 100, t)
        lengths = torch.tensor([28, 15])
        with torch.no_grad():
            want = enc(x, lengths).numpy()

        params = {"params": cvt.prompt_encoder(enc.state_dict(), "", n_layers=2)}
        mine = PromptEncoder(n_layers=2)
        got = mine.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                         _lengths_mask([28, 15], t))
        np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want,
                                   atol=2e-5)


class TestTextTimeEmbeddingParity:
    def test_ref_pooling(self, reference_dir):
        _, embeddings = load_reference_unet()
        torch.manual_seed(3)
        tte = embeddings.TextTimeEmbedding(100, 100, 1).eval()
        x = torch.randn(2, 37, 100)
        with torch.no_grad():
            want = tte(x).numpy()
        params = {"params": cvt.text_time_embedding(
            {f"m.{k}": v for k, v in tte.state_dict().items()}, "m")}
        mine = TextTimeEmbedding(100, 100, 1)
        got = mine.apply(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_unet_add_embedding_shape(self, reference_dir):
        _, embeddings = load_reference_unet()
        torch.manual_seed(4)
        tte = embeddings.TextTimeEmbedding(256, 512, 64).eval()
        x = torch.randn(2, 21, 256)
        with torch.no_grad():
            want = tte(x).numpy()
        params = {"params": cvt.text_time_embedding(
            {f"m.{k}": v for k, v in tte.state_dict().items()}, "m")}
        got = TextTimeEmbedding(256, 512, 64).apply(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestConvFFNStreaming:
    """ConvFFN's LEFT/causal mode + streaming step (reference
    NewTransformerFFNLayer, operations.py:725-781)."""

    def test_streaming_matches_left_padded(self):
        from ns2vc_tpu.models.encoders import ConvFFN

        ffn = ConvFFN(channels=16, kernel_size=9, padding="LEFT")
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 12, 16))
        params = ffn.init(rng, x)
        full = ffn.apply(params, x)

        buf = ffn.init_buffer(2)
        outs = []
        for t in range(x.shape[1]):
            y, buf = ffn.apply(params, x[:, t:t + 1], buf,
                               method=ConvFFN.step)
            outs.append(y)
        np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=1)),
                                   np.asarray(full), atol=1e-5)

    def test_new_ffn_parity_full_and_incremental(self, ref):
        from ns2vc_tpu.models.encoders import ConvFFN

        _, operations = ref
        torch.manual_seed(7)
        c, k, t, b = 24, 9, 14, 2
        layer = operations.NewTransformerFFNLayer(
            c, 4 * c, padding="LEFT", kernel_size=k).eval()
        x = torch.randn(t, b, c)
        with torch.no_grad():
            want_full = layer(x).numpy()                     # (T, B, C)
            inc = {}
            want_steps = [layer(x[i:i + 1], incremental_state=inc).numpy()
                          for i in range(t)]

        sd = {f"m.{kk}": v for kk, v in layer.state_dict().items()}
        params = {"params": cvt.new_conv_ffn(sd, "m")}
        ffn = ConvFFN(channels=c, kernel_size=k, padding="LEFT")
        xj = jnp.asarray(x.numpy().transpose(1, 0, 2))       # (B, T, C)
        got_full = np.asarray(ffn.apply(params, xj)).transpose(1, 0, 2)
        np.testing.assert_allclose(got_full, want_full, atol=2e-5)

        buf = ffn.init_buffer(b)
        for i in range(t):
            y, buf = ffn.apply(params, xj[:, i:i + 1], buf,
                               method=ConvFFN.step)
            np.testing.assert_allclose(
                np.asarray(y).transpose(1, 0, 2), want_steps[i], atol=2e-5)
