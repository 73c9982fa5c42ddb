"""Checkpoint utilities beyond the orbax manager in train/trainer.py.

Parity targets from the reference:
- `mix_models`: weight-space model mixing/averaging (utils.py:499-510);
- `partial_restore`: shape-tolerant restore that keeps the target's value
  when a saved tensor's shape mismatches (utils.py:247-277);
- `latest_checkpoint_path`: newest-by-step lookup (utils.py:323-328);
- checkpoint GC is handled by orbax `max_to_keep` (reference
  clean_checkpoints, utils.py:292-310).
"""

from __future__ import annotations

import os
import re
from typing import Sequence

import jax
import numpy as np


def mix_models(param_trees: Sequence, ratios: Sequence[float]):
    """Weight-space mix: sum_i ratios[i] * params_i (reference mix_model,
    utils.py:499-510, which averages with equal ratios)."""
    assert len(param_trees) == len(ratios) and param_trees
    ratios = np.asarray(ratios, np.float32)

    def mix(*leaves):
        out = leaves[0] * ratios[0]
        for leaf, r in zip(leaves[1:], ratios[1:]):
            out = out + leaf * r
        return out

    return jax.tree.map(mix, *param_trees)


def partial_restore(target, restored, verbose: bool = True):
    """Overlay `restored` onto `target`, keeping target leaves whose shapes
    mismatch (reference load_checkpoint's tolerant loop, utils.py:258-270).
    Both are pytrees with the same structure or `restored` may be a subset
    expressed as a flat {path: array} dict."""
    t_leaves = jax.tree_util.tree_leaves_with_path(target)
    if isinstance(restored, dict) and restored and all(
            isinstance(k, str) and k.startswith("[") for k in restored):
        r_map = restored  # already a flat {keystr: array} map
    else:
        r_map = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(restored)}

    out = {}
    kept = 0
    for path, value in t_leaves:
        key = jax.tree_util.keystr(path)
        new = r_map.get(key)
        if new is not None and np.shape(new) == np.shape(value):
            out[key] = new
        else:
            if new is not None and verbose:
                print(f"partial_restore: shape mismatch at {key}: "
                      f"{np.shape(new)} vs {np.shape(value)}, keeping target")
            elif new is None and verbose:
                print(f"partial_restore: missing {key}, keeping target")
            out[key] = value
            kept += 1

    leaves = [out[jax.tree_util.keystr(p)] for p, _ in t_leaves]
    treedef = jax.tree_util.tree_structure(target)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint_path(dir_path: str, regex: str = r"model-(\d+)") -> str | None:
    """Highest-step checkpoint path under dir_path (reference
    utils.py:323-328; also matches orbax's step-numbered dirs)."""
    best_step, best = -1, None
    if not os.path.isdir(dir_path):
        return None
    for name in os.listdir(dir_path):
        m = re.match(regex, name) or re.fullmatch(r"(\d+)", name)
        if m:
            step = int(m.group(1))
            if step > best_step:
                best_step, best = step, os.path.join(dir_path, name)
    return best
