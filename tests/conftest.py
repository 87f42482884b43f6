"""Test configuration: run on a virtual 8-device CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (the real TPU chip) and a
sitecustomize imports jax at interpreter startup — before conftest — so env
vars are too late; use jax.config (read at backend init, which has not
happened yet) instead.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

if os.environ.get("SAD_TPU_TEST_ON_CHIP", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
