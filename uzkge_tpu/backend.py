"""Backend/runtime configuration.

Import-for-effect module: sets up the persistent XLA compilation cache (the
limb-arithmetic kernels produce large fused graphs whose first compile is
expensive — cache hits make subsequent runs instant) and exposes small
helpers for device/platform introspection.
"""

import hashlib
import os
import platform as _platform

import jax


def _machine_key() -> str:
    """Per-(backend, host-CPU) cache key.  XLA:CPU AOT entries embed the
    compile machine's feature set; reusing a cache written on a different
    host CPU forces noisy reload failures + recompiles (seen when the TPU
    host's CPU cache was replayed on the multichip-dryrun machine)."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        model = next((l for l in lines if l.startswith("model name")), "")
        # include the feature flags: XLA:CPU AOT entries embed the exact
        # feature set, and hypervisors expose different flags for the same
        # model string (observed: a poisoned cache logging "+prefer-no-
        # scatter is not supported" and recompiling on every load)
        flags = next((l for l in lines if l.startswith("flags")), "")
    except OSError:
        model = flags = ""
    raw = f"{jax.default_backend()}|{_platform.machine()}|{model.strip()}|{flags.strip()}"
    return f"{jax.default_backend()}-{hashlib.sha256(raw.encode()).hexdigest()[:8]}"


_CACHE_DIR = os.environ.get(
    "UZKGE_TPU_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~/.cache/uzkge_tpu_xla"), _machine_key()),
)
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


def platform() -> str:
    return jax.devices()[0].platform


def is_tpu() -> bool:
    return platform() == "tpu"
