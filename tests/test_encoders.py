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
