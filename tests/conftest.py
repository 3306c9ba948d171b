import os
import sys

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# compile and execute without TPU hardware (bench/production runs on TPU).
#
# NOTE: in the axon environment, jax is pre-imported by sitecustomize with the
# 'axon' (remote TPU) platform forced, so JAX_PLATFORMS in the environment is
# ineffective — we must override via jax.config after import.  Set
# UZKGE_TPU_TESTS_ON_TPU=1 to run the suite against the real chip instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

if not os.environ.get("UZKGE_TPU_TESTS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import uzkge_tpu.backend  # noqa: E402,F401  (persistent compile cache)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
