"""Multi-chip sharding correctness on the virtual CPU mesh (the driver's
dryrun_multichip path).  Heavy-gated: compiles the sharded MSM/NTT kernels."""

import os

import pytest

heavy = pytest.mark.skipif(
    not os.environ.get("UZKGE_HEAVY_TESTS"),
    reason="sharded kernel compiles; opt in with UZKGE_HEAVY_TESTS=1",
)


@heavy
@pytest.mark.slow
def test_dryrun_multichip_8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (set XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    from uzkge_tpu.parallel.sharded import dryrun_multichip

    assert dryrun_multichip(8)


@heavy
@pytest.mark.slow
def test_dryrun_multichip_2():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from uzkge_tpu.parallel.sharded import dryrun_multichip

    assert dryrun_multichip(2)
