"""Test environment: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, so this lives at
the very top of conftest (pytest imports conftest before test modules).
"""

import os
import sys

# Force CPU regardless of the ambient platform: this environment's jax plugin
# overrides the JAX_PLATFORMS env var with "axon,cpu", so the env var alone is
# NOT enough — the config must be updated after import, before backend init.
# MPOT_TEST_TPU=1 opts out, for the TPU-hardware kernel tests
# (tests/test_kernels_tpu.py) which need the real chip's PRNG.
_want_tpu = os.environ.get("MPOT_TEST_TPU") == "1"
if not _want_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if not _want_tpu:
    jax.config.update("jax_platforms", "cpu")
# This JAX build defaults f32 matmuls to low (bf16-like) precision; parity
# tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: model train-step compiles dominate test time
# on CPU; cache them across test processes/runs.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import multimodal_path_omic_tpu` works without install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
