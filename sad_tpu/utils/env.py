"""Environment introspection (ref: detectron/lib/utils/env.py)."""

from __future__ import annotations

import os
from typing import Dict


def get_runtime_info() -> Dict[str, str]:
    import jax

    info = {
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device_count": str(jax.device_count()),
        "devices": ", ".join(str(d) for d in jax.devices()),
    }
    try:
        import flax

        info["flax_version"] = flax.__version__
    except ImportError:
        pass
    return info


def get_native_kernels_lib() -> str:
    """Path of the compiled host-kernels library (the dyndep analogue of
    lib/utils/env.py get_detectron_ops_lib)."""
    from sad_tpu import native

    lib = native._get_lib()
    return native._SO if lib is not None else "(numpy fallback)"
