"""LoRA adapters for fine-tuning.

The reference plumbs LoRA-compatible conv/linear layers through its
diffusers fork (unet1d/lora.py:21-123 `LoRACompatibleConv`/
`LoRACompatibleLinear`, rank-4 default) without ever enabling them. This
module provides the working equivalent: low-rank deltas merged into
existing kernels functionally — no model-code changes, fully jit/pjit
compatible.

Usage:
    lora = init_lora(rng, params, rank=4, targets=("to_q", "to_k",
                                                   "to_v", "to_out_0"))
    merged = apply_lora(params, lora, scale=1.0)   # inside the train step
    # train `lora` only (tiny pytree), keep `params` frozen

TPU notes: merging computes kernel + (A @ B) * scale per target — a few
rank-k outer products, fused by XLA into the parameter stream; the base
params stay frozen so the optimizer state is the LoRA tree only.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _is_target(path, targets: Sequence[str]) -> bool:
    keys = [getattr(p, "key", str(p)) for p in path]
    return (len(keys) >= 2 and keys[-1] == "kernel"
            and any(t in keys[-2] for t in targets))


def init_lora(rng: jax.Array, params, rank: int = 4,
              targets: Sequence[str] = ("to_q", "to_k", "to_v", "to_out_0")):
    """Build a LoRA tree: for each targeted 2D kernel (in, out), down
    (in, rank) ~ N(0, 1/rank) and up (rank, out) zeros (standard LoRA
    init: the delta starts at zero)."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora = {}
    for i, (path, leaf) in enumerate(flat):
        if not _is_target(path, targets) or getattr(leaf, "ndim", 0) != 2:
            continue
        key = jax.tree_util.keystr(path)
        d_in, d_out = leaf.shape
        k1 = jax.random.fold_in(rng, i)
        lora[key] = {
            "down": jax.random.normal(k1, (d_in, rank),
                                      leaf.dtype) / jnp.sqrt(rank),
            "up": jnp.zeros((rank, d_out), leaf.dtype),
        }
    return lora


def apply_lora(params, lora: dict, scale: float = 1.0):
    """Merge LoRA deltas into a copy of params:
    kernel' = kernel + scale * down @ up (reference unet1d/lora.py:96-123
    adds the same product in its forward)."""
    def leaf(path, x):
        key = jax.tree_util.keystr(path)
        if key in lora:
            ab = lora[key]
            return x + scale * (ab["down"] @ ab["up"]).astype(x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(leaf, params)


def count_lora_params(lora: dict) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
