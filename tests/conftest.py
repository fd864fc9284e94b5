"""Test environment: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, so this lives at
the very top of conftest (pytest imports conftest before test modules).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import multimodal_path_omic_tpu` works without install.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
