"""Root-cause tool for the train-step persistent-cache miss (VERDICT #4a).

Round-2 observation (CLAUDE.md): the donated+sharded jitted train step is
never served from the persistent compile cache across processes — the
entry exists on disk but the lookup misses, i.e. the cache KEY differs
between processes. This script compiles the real Trainer step on a tiny
synthetic dataset and logs jax's per-component cache-key hashes
(jax._src.cache_key DEBUG logging hashes each key ingredient:
computation, compile_options, accelerator_config, custom_hook...).

Run it twice and diff the '[cache-key]' lines — the first differing
component is the culprit.

    JAX_PLATFORMS=cpu python scripts/debug_train_cache.py > /tmp/k1.log 2>&1
    JAX_PLATFORMS=cpu python scripts/debug_train_cache.py > /tmp/k2.log 2>&1
    diff <(grep cache-key-ingredient /tmp/k1.log) \
         <(grep cache-key-ingredient /tmp/k2.log)
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ns2vc_cache_debug")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_explain_cache_misses", True)

# surface each cache-key ingredient hash
logging.basicConfig(stream=sys.stderr, level=logging.DEBUG)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)
for name in list(logging.root.manager.loggerDict):
    if "cache" not in name and not name.startswith("jax._src.compiler"):
        logging.getLogger(name).setLevel(logging.WARNING)


def main():
    import numpy as np

    from bench_training import synth_dataset  # noqa: E402 (same dir)
    from ns2vc_tpu.config import (
        Config, DataConfig, DiffusionEncoderConfig, EncoderConfig,
        TrainConfig,
    )
    from ns2vc_tpu.train.trainer import Trainer

    root = "/tmp/ns2vc_cache_debug_data"
    if not os.path.exists(os.path.join(root, "0")):
        synth_dataset(root, n=8)

    cfg = Config(
        train=TrainConfig(train_batch_size=2, max_content_frames=64,
                          max_refer_frames=48, num_workers=0, remat=False,
                          train_num_steps=1),
        data=DataConfig(training_files=root, val_files=root),
        phoneme_encoder=EncoderConfig(n_layers=1),
        prompt_encoder=EncoderConfig(in_channels=100, n_layers=1),
        diffusion_encoder=DiffusionEncoderConfig(
            block_out_channels=(16, 24, 32, 40)),
    )
    tr = Trainer(cfg, logs_folder="/tmp/ns2vc_cache_debug_logs")
    batch = next(tr.dl)
    from ns2vc_tpu.parallel.mesh import batch_sharding

    dev = jax.device_put(batch, batch_sharding(tr.mesh)) \
        if tr._pack is not None else batch
    with tr.mesh:
        state, m = tr._step_fn(tr.state, dev, tr.rng)
    print("loss:", float(m["loss"]))


if __name__ == "__main__":
    main()
