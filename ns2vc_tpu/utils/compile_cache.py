"""Persistent XLA compile cache wiring for every user entry point.

On this TPU stack a cold compile of the full sampler program goes through
a remote compile service and takes ~15-20 minutes; the persistent cache
brings the second process to first-clip in seconds. bench.py proved the
setting works for the jitted synthesize program; this helper gives
train.py / infer.py / preprocess.py / the infer CLI the same behavior
(VERDICT round-2 #4b) instead of only the benchmark having it.

The reference has no analogue (torch eager pays no compile), so this is
pure TPU-operational surface.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 2.0) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    $NS2VC_CACHE, else ~/.cache/ns2vc_tpu/jax_cache). Idempotent; safe to
    call from every entry point before the first jit. A cache dir already
    configured (by conftest, bench.py, or the user) is left alone."""
    import jax

    current = jax.config.jax_compilation_cache_dir
    if path is None and current:
        return current
    path = (path or os.environ.get("NS2VC_CACHE")
            or os.path.join(os.path.expanduser("~"), ".cache", "ns2vc_tpu",
                            "jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
