"""Pallas flash-attention correctness vs the XLA attention core
(interpreter mode on CPU; the compiled path runs on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ns2vc_tpu.ops.attention import scaled_dot_product_attention
from ns2vc_tpu.ops.pallas_attention import flash_attention


def _case(b, h, tq, tk, d, lengths, seed=0):
    rng = jax.random.PRNGKey(seed)
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, h, tq, d))
    k = jax.random.normal(ks[1], (b, h, tk, d))
    v = jax.random.normal(ks[2], (b, h, tk, d))
    bias = None
    if lengths is not None:
        keymask = jnp.arange(tk)[None, :] < jnp.asarray(lengths)[:, None]
        bias = (1 - keymask.astype(jnp.float32)) * -10000.0
    return q, k, v, bias


class TestFlashAttention:
    @pytest.mark.parametrize("tq,tk,lengths", [
        (128, 128, None),          # exact blocks, no mask
        (100, 150, [150, 90]),     # ragged + key padding
        (37, 260, [260, 11]),      # small q, multiple k blocks
    ])
    def test_matches_xla(self, tq, tk, lengths):
        b, h, d = 2, 4, 64
        q, k, v, bias = _case(b, h, tq, tk, d, lengths)
        want = scaled_dot_product_attention(
            q, k, v, bias=None if bias is None else bias[:, None, None, :])
        got = flash_attention(q, k, v, bias=bias, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_bf16_inputs(self):
        b, h, d = 1, 2, 32
        q, k, v, bias = _case(b, h, 64, 64, d, [64])
        got = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                              v.astype(jnp.bfloat16), bias=bias,
                              interpret=True)
        assert got.dtype == jnp.bfloat16
        want = scaled_dot_product_attention(q, k, v,
                                            bias=bias[:, None, None, :])
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=0.03)

    def test_fully_masked_batch_rows_are_finite(self):
        b, h, d = 2, 2, 32
        q, k, v, _ = _case(b, h, 32, 64, d, None)
        bias = jnp.full((b, 64), -1e30, jnp.float32)  # everything masked
        got = flash_attention(q, k, v, bias=bias, interpret=True)
        assert np.isfinite(np.asarray(got)).all()
