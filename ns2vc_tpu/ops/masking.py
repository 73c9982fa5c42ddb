"""Sequence masking utilities (reference modules/commons.py:149-153).

All models in this framework use (B, T, C) layout with boolean validity
masks (True = valid frame). Attention mask bias follows the reference's
-10000 convention (unet_1d_condition.py:807-818)."""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool, True where t < length."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool keep-mask -> additive attention bias (0 keep, -1e4 drop)."""
    return (1.0 - mask.astype(dtype)) * -10000.0


def apply_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero padded frames: x (B, T, C) * mask (B, T)."""
    return x * mask.astype(x.dtype)[..., None]
