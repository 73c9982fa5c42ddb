"""Device mesh + sharding rules.

The reference's entire distributed story is DDP data parallelism via HF
Accelerate (reference model.py:756-757, 779, 802). The TPU-native
equivalent needs no communication layer at all: we lay out a
('data', 'model') `jax.sharding.Mesh`, annotate the batch with
P('data', ...) and parameters with replicated-or-tensor-sharded specs, and
XLA GSPMD inserts the all-reduces/all-gathers over ICI.

Tensor parallelism (model axis > 1) shards the wide feature dimensions of
large kernels (column-parallel on the output features); GSPMD propagates
the layouts and places the collectives. At NS2VC's ~60M-parameter scale
this is a scale-out option, not a requirement — the default mesh is pure
data parallel.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(model_parallel_size: int = 1, devices=None,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel_size == 0, (n, model_parallel_size)
    shape = (n // model_parallel_size, model_parallel_size)
    return Mesh(np.asarray(devices).reshape(shape), (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading batch axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def shard_batch(batch: dict, mesh: Mesh, data_axis: str = "data") -> dict:
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


# parameter tensor-sharding heuristic: column-parallel on any kernel whose
# output-features axis is wide and divisible by the model axis size.
_MIN_SHARD_FEATURES = 256


def _spec_for(path: tuple, shape: tuple, model_size: int,
              model_axis: str) -> P:
    if model_size <= 1 or not shape:
        return P()
    name = jax.tree_util.keystr(path)
    is_kernel = name.endswith("['kernel']") or name.endswith("['weight_v']")
    if (is_kernel and shape[-1] % model_size == 0
            and shape[-1] >= _MIN_SHARD_FEATURES):
        return P(*([None] * (len(shape) - 1) + [model_axis]))
    return P()


def param_shardings(params: Any, mesh: Mesh,
                    model_axis: str = "model") -> Any:
    """Per-leaf NamedShardings: replicated by default; wide kernels sharded
    column-parallel over the model axis when it exists."""
    model_size = mesh.shape[model_axis] if model_axis in mesh.axis_names else 1

    def leaf(path, x):
        return NamedSharding(mesh, _spec_for(path, getattr(x, "shape", ()),
                                             model_size, model_axis))

    return jax.tree_util.tree_map_with_path(leaf, params)
