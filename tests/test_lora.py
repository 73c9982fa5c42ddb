"""LoRA adapter tests: zero-init identity, delta effect, trainability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ns2vc_tpu.config import Config, DiffusionEncoderConfig, EncoderConfig
from ns2vc_tpu.models.diffusion import NaturalSpeech2
from ns2vc_tpu.models.lora import apply_lora, count_lora_params, init_lora


def _tiny():
    cfg = Config(
        phoneme_encoder=EncoderConfig(n_layers=1),
        prompt_encoder=EncoderConfig(in_channels=100, n_layers=1),
        diffusion_encoder=DiffusionEncoderConfig(
            block_out_channels=(16, 24, 32, 40)),
    )
    model = NaturalSpeech2(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "c": jax.random.normal(rng, (1, 16, 256)),
        "refer": jax.random.normal(rng, (1, 16, 100)),
        "spec": jax.random.normal(rng, (1, 16, 100)),
        "lengths": jnp.array([16]), "refer_lengths": jnp.array([16]),
    }
    params = model.init(rng, batch, rng)
    return model, params, batch, rng


class TestLoRA:
    def test_zero_init_is_identity(self):
        model, params, batch, rng = _tiny()
        lora = init_lora(rng, params, rank=2)
        assert count_lora_params(lora) > 0
        merged = apply_lora(params, lora)
        l1, _ = model.apply(params, batch, jax.random.PRNGKey(1),
                            deterministic=True)
        l2, _ = model.apply(merged, batch, jax.random.PRNGKey(1),
                            deterministic=True)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def test_targets_only_attention(self):
        _, params, _, rng = _tiny()
        lora = init_lora(rng, params, rank=2)
        assert all(any(t in k for t in ("to_q", "to_k", "to_v", "to_out_0"))
                   for k in lora)

    @pytest.mark.slow
    def test_gradients_flow_through_lora_only(self):
        model, params, batch, rng = _tiny()
        lora = init_lora(rng, params, rank=2)

        def loss_fn(lora_tree):
            merged = apply_lora(params, lora_tree)
            loss, _ = model.apply(merged, batch, jax.random.PRNGKey(2),
                                  deterministic=True)
            return loss

        grads = jax.grad(loss_fn)(lora)
        # up matrices receive gradient (down @ grad_up path)
        g_up = [np.abs(np.asarray(v["up"])).max() for v in grads.values()]
        assert max(g_up) > 0
