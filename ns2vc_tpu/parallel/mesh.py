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

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host initialization, env-gated (VERDICT round-2 #8).

    The reference trains multi-node via `accelerate launch`
    (reference README.md:60-64); the JAX equivalent is one
    `jax.distributed.initialize` per host before any backend use, after
    which `jax.devices()` is the GLOBAL device list, `make_mesh` lays the
    ('data','model') mesh over all hosts, and the loader's
    `jax.process_index()` sharding becomes active.

    Gating (must be set before the first jax device access):
    - `NS2VC_COORDINATOR=host:port` + `NS2VC_NUM_PROCESSES` +
      `NS2VC_PROCESS_ID`: explicit cluster (works on CPU too — the
      2-process smoke test in tests/test_parallel.py runs exactly this);
    - `NS2VC_DISTRIBUTED=1`: TPU-pod metadata autodetection
      (`jax.distributed.initialize()` with no args).

    Returns True when distributed mode was initialized.
    """
    coord = os.environ.get("NS2VC_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["NS2VC_NUM_PROCESSES"]),
            process_id=int(os.environ["NS2VC_PROCESS_ID"]))
        return True
    if os.environ.get("NS2VC_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        return True
    return False


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


def host_barrier(name: str, timeout_ms: int = 3_600_000) -> None:
    """Cross-process barrier through the coordination service — NO device
    collectives, so it is safe at points where communicator contexts are
    not yet established. Used to align hosts around per-host-compiled
    programs: XLA's CPU gloo transport initializes each communicator with
    a ~30 s key-value timeout, so if host A dispatches a freshly-compiled
    collective program while host B is still compiling it (persistent-
    cache asymmetry, host load), the context init times out and the run
    dies. Compiling first and meeting here (generous timeout) closes that
    window. No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def put_local_batch(local, mesh: Mesh, data_axis: str = "data"):
    """Host-local batch (array or pytree) -> batch-sharded global array(s).

    Single-process: a plain async device_put. Multi-process: each host
    contributes its own loader shard as a contiguous slice of the global
    batch axis (global B = local B x process_count on the pure-DP mesh) —
    the jax.make_array_from_process_local_data path, which is the
    TPU-native replacement for Accelerate's DDP per-process batches
    (reference model.py:779)."""
    sharding = batch_sharding(mesh, data_axis)
    if jax.process_count() == 1:
        put = lambda x: jax.device_put(x, sharding)  # noqa: E731
    else:
        put = lambda x: jax.make_array_from_process_local_data(  # noqa: E731
            sharding, np.asarray(x))
    return jax.tree.map(put, local)


# -- packed host-to-device batch transfer -----------------------------------
#
# One device_put of a single (B, total_bytes) uint8 buffer instead of one
# RPC per batch field: per-transfer latency dominates on high-latency
# hosts (this dev environment's tunnel measures ~230 ms for ~8 MB split
# across 6 arrays). Sharding over the data axis is preserved because
# packing is per-example (axis 0 stays B). The unpack runs inside the
# jitted train step (bitcast + reshape — free layout ops).


def make_batch_packer(batch: dict):
    """Returns (pack(host_batch) -> (B, N) uint8 array, spec) where spec
    is a tuple of (key, dtype_str, trailing_shape, offset, nbytes) rows
    describing the packed layout of one example."""
    spec = []
    offset = 0
    for key in sorted(batch):
        x = batch[key]
        nbytes = int(np.prod(x.shape[1:], dtype=np.int64)) * x.dtype.itemsize
        spec.append((key, str(x.dtype), tuple(x.shape[1:]), offset, nbytes))
        offset += nbytes

    total = offset

    def pack(host_batch: dict) -> np.ndarray:
        # Layout drift fails loudly: a batch field missing from the spec
        # would KeyError below anyway, but a field ADDED to the collator
        # after the spec was built would otherwise be silently dropped
        # from training (the jitted step unpacks only spec rows).
        spec_keys = {key for key, *_ in spec}
        if set(host_batch) != spec_keys:
            raise ValueError(
                f"packed-batch layout drift: batch fields "
                f"{sorted(host_batch)} != spec fields {sorted(spec_keys)}; "
                f"rebuild the packer with make_batch_packer(batch)")
        b = next(iter(host_batch.values())).shape[0]
        out = np.empty((b, total), np.uint8)
        for key, _, _, off, nbytes in spec:
            x = np.ascontiguousarray(host_batch[key])
            out[:, off:off + nbytes] = x.reshape(b, -1).view(np.uint8)
        return out

    return pack, tuple(spec)


def unpack_batch(packed, spec) -> dict:
    """In-jit inverse of make_batch_packer's pack: (B, N) uint8 -> dict."""
    import jax.numpy as jnp

    b = packed.shape[0]
    out = {}
    for key, dtype_str, shape, off, nbytes in spec:
        dtype = jnp.dtype(dtype_str)
        raw = jax.lax.slice_in_dim(packed, off, off + nbytes, axis=1)
        w = dtype.itemsize
        vals = jax.lax.bitcast_convert_type(
            raw.reshape(b, nbytes // w, w), dtype)
        out[key] = vals.reshape((b,) + shape)
    return out


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
