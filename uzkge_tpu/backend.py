"""Backend/runtime configuration.

Import-for-effect module: sets up the persistent XLA compilation cache (the
limb-arithmetic kernels produce large fused graphs whose first compile is
expensive — cache hits make subsequent runs instant) and exposes small
helpers for device/platform introspection.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "UZKGE_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/uzkge_tpu_xla")
)
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


def platform() -> str:
    return jax.devices()[0].platform


def is_tpu() -> bool:
    return platform() == "tpu"
