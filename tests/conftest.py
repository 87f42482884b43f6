"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes, so this lives at import time
of conftest (pytest imports conftest before test modules import jax).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
