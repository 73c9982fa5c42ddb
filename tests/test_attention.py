"""Attention core tests: streaming KV-cache equivalence with full
attention (the reference's fairseq incremental_state capability,
operations.py:432-503) and the attn_impl dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ns2vc_tpu.ops.attention import (
    init_kv_cache, merge_heads, multihead_attention,
    scaled_dot_product_attention, split_heads, streaming_attention,
)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    b, t, c = 2, 24, 32
    return tuple(jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
                 for _ in range(3))


class TestStreamingKVCache:
    HEADS = 4

    def _causal_full(self, q, k, v):
        t = q.shape[1]
        mask = jnp.tril(jnp.ones((t, t)))
        bias = jnp.where(mask > 0, 0.0, -1e4)[None, None]
        return multihead_attention(q, k, v, self.HEADS, bias=bias)

    def test_stepwise_matches_causal_full(self, qkv):
        """Feeding one step at a time through the cache must reproduce
        causal full attention exactly (the incremental-decode contract)."""
        q, k, v = qkv
        b, t, c = q.shape
        want = np.asarray(self._causal_full(q, k, v))
        cache = init_kv_cache(b, self.HEADS, c // self.HEADS, capacity=t)
        outs = []
        for i in range(t):
            out, cache = streaming_attention(
                q[:, i : i + 1], k[:, i : i + 1], v[:, i : i + 1],
                cache, self.HEADS)
            outs.append(out)
        got = np.asarray(jnp.concatenate(outs, axis=1))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_chunked_matches_causal_block(self, qkv):
        """Chunk streaming (S>1): each chunk attends to all cached + its
        own positions (block-causal)."""
        q, k, v = qkv
        b, t, c = q.shape
        cache = init_kv_cache(b, self.HEADS, c // self.HEADS, capacity=t)
        s = 8
        outs = []
        for i in range(0, t, s):
            out, cache = streaming_attention(
                q[:, i : i + s], k[:, i : i + s], v[:, i : i + s],
                cache, self.HEADS)
            outs.append(out)
        got = np.asarray(jnp.concatenate(outs, axis=1))
        # oracle: block-causal full attention
        blk = jnp.repeat(jnp.arange(t) // s, 1)
        mask = blk[:, None] >= blk[None, :]
        bias = jnp.where(mask, 0.0, -1e4)[None, None]
        want = np.asarray(multihead_attention(q, k, v, self.HEADS,
                                              bias=bias))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_static_kv_mode(self, qkv):
        """Encoder-decoder static_kv: K/V cached once, later queries reuse
        them without recompute (reference operations.py:437-440)."""
        q, k, v = qkv
        b, t, c = q.shape
        cache = init_kv_cache(b, self.HEADS, c // self.HEADS, capacity=t)
        _, cache = streaming_attention(q[:, :1], k, v, cache, self.HEADS)
        out, cache2 = streaming_attention(q, None, None, cache, self.HEADS,
                                          static_kv=True)
        want = np.asarray(multihead_attention(q, k, v, self.HEADS))
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
        assert int(cache2["idx"]) == int(cache["idx"])  # unchanged

    def test_scan_carry(self, qkv):
        """The cache is a plain pytree — streaming under lax.scan."""
        q, k, v = qkv
        b, t, c = q.shape
        cache = init_kv_cache(b, self.HEADS, c // self.HEADS, capacity=t)

        def body(cache, xs):
            qi, ki, vi = xs
            out, cache = streaming_attention(qi[:, None], ki[:, None],
                                             vi[:, None], cache, self.HEADS)
            return cache, out[:, 0]

        xs = tuple(jnp.swapaxes(x, 0, 1) for x in (q, k, v))
        _, outs = jax.lax.scan(body, cache, xs)
        got = np.asarray(jnp.swapaxes(outs, 0, 1))
        want = np.asarray(self._causal_full(q, k, v))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestAttnImplDispatch:
    def test_pallas_matches_xla(self, qkv):
        q, k, v = qkv
        b, t, _ = q.shape
        lengths = jnp.array([t, t // 2])
        bias = jnp.where(jnp.arange(t)[None] < lengths[:, None],
                         0.0, -1e4)[:, None, None, :]
        ref = np.asarray(multihead_attention(q, k, v, 4, bias=bias))
        got = np.asarray(multihead_attention(q, k, v, 4, bias=bias,
                                             attn_impl="pallas"))
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_postdiv_matches_xla(self, qkv):
        """sdpa_postdiv only reorders the normalization around the PV dot;
        in f32 it must agree with the softmax path to fp tolerance, with
        and without a padding bias."""
        q, k, v = qkv
        b, t, _ = q.shape
        lengths = jnp.array([t, t // 2])
        bias = jnp.where(jnp.arange(t)[None] < lengths[:, None],
                         0.0, -1e4)[:, None, None, :]
        for bi in (None, bias):
            ref = np.asarray(multihead_attention(q, k, v, 4, bias=bi))
            got = np.asarray(multihead_attention(q, k, v, 4, bias=bi,
                                                 attn_impl="postdiv"))
            np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_blocked_matches_xla(self, qkv):
        """sdpa_blocked (online-softmax scan over key blocks) must match
        the one-shot softmax path, including when Tk is not a multiple of
        the block size (padded keys masked via the running-max bias)."""
        q, k, v = qkv
        b, t, _ = q.shape
        lengths = jnp.array([t, t // 2])
        bias = jnp.where(jnp.arange(t)[None] < lengths[:, None],
                         0.0, -1e4)[:, None, None, :]
        for bi in (None, bias):
            ref = np.asarray(multihead_attention(q, k, v, 4, bias=bi))
            for blk in (8, 7, t, 4 * t):  # exact, ragged, single, over
                import os
                os.environ["NS2VC_BLOCK_K"] = str(blk)
                try:
                    got = np.asarray(multihead_attention(
                        q, k, v, 4, bias=bi, attn_impl="blocked"))
                finally:
                    del os.environ["NS2VC_BLOCK_K"]
                np.testing.assert_allclose(got, ref, atol=1e-5,
                                           err_msg=f"block_k={blk}")

    def test_blocked_under_jit(self, qkv):
        q, k, v = qkv
        ref = np.asarray(multihead_attention(q, k, v, 4))
        fn = jax.jit(lambda a, b_, c: multihead_attention(
            a, b_, c, 4, attn_impl="blocked"))
        np.testing.assert_allclose(np.asarray(fn(q, k, v)), ref, atol=1e-5)

    def test_postdiv_bf16_rounding_only(self, qkv):
        """In bf16 the postdiv path rounds the unnormalized probs instead
        of the normalized ones — the result must stay within a few bf16
        ulps of the softmax path."""
        q, k, v = (x.astype(jnp.bfloat16) for x in qkv)
        ref = np.asarray(multihead_attention(q, k, v, 4)
                         .astype(jnp.float32))
        got = np.asarray(multihead_attention(q, k, v, 4,
                                             attn_impl="postdiv")
                         .astype(jnp.float32))
        np.testing.assert_allclose(got, ref, atol=3e-2)
