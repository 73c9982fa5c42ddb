"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-world substitute for a fake-backend story (SURVEY.md section 4):
multi-chip sharding tests run on 8 virtual CPU devices via
--xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import jax
import pytest

# the environment may have imported jax at interpreter boot (sitecustomize)
# with JAX_PLATFORMS already latched; force the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# this image's XLA defaults to low (bf16-like) matmul precision even on CPU;
# parity tests need exact fp32 matmuls
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the UNet/sampler compiles dominate suite
# wall-clock. Loading entries prints noisy-but-benign cpu_aot_loader
# warnings ("+prefer-no-gather ... not supported") — those are XLA
# pseudo-features absent from the host feature-detection list, not real
# ISA mismatches (verified: locally-compiled entries warn identically).
jax.config.update("jax_compilation_cache_dir", "/tmp/ns2vc_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def sample_wav(reference_dir):
    from ns2vc_tpu.utils.wavio import read_wav

    wav, sr = read_wav(str(reference_dir / "dataset/1/1.wav"))
    return wav, sr
