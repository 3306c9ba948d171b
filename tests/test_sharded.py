"""Multi-chip sharding correctness on the virtual CPU mesh (the driver's
dryrun_multichip path).  Runs un-gated in the default suite: the sharded
kernels compile as a handful of one-group-add scans."""

import pytest


def test_dryrun_multichip_8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (set XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    from uzkge_tpu.parallel.sharded import dryrun_multichip

    assert dryrun_multichip(8)


def test_dryrun_multichip_2():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from uzkge_tpu.parallel.sharded import dryrun_multichip

    assert dryrun_multichip(2)


def test_mesh_routed_prove():
    """Full 1-card shuffle proof with UZKGE_MESH=1 routing every commit
    through the sharded MSM (the dryrun's opt-in mesh-prove stage).  Heavy:
    the cold with_shuffle XLA:CPU compile takes minutes, so it is gated out
    of both the default suite and the driver's timed dryrun."""
    import os

    import jax

    if not os.environ.get("UZKGE_HEAVY_TESTS") and not os.environ.get(
        "UZKGE_TPU_TESTS_ON_TPU"
    ):
        pytest.skip("cold with_shuffle compile; run with UZKGE_HEAVY_TESTS=1")
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    import random

    from uzkge_tpu.parallel.sharded import _dryrun_prove_on_mesh

    prev = os.environ.get("UZKGE_MESH")
    os.environ["UZKGE_MESH"] = "1"
    try:
        _dryrun_prove_on_mesh(random.Random(1234))
    finally:
        if prev is None:
            os.environ.pop("UZKGE_MESH", None)
        else:
            os.environ["UZKGE_MESH"] = prev


def test_sharded_ntt_matches_domain():
    """Four-step all_to_all NTT vs the single-device domain at a size with
    n2 > devices (exercises the chunked exchange), incl. inverse + coset."""
    import random

    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from uzkge_tpu.constants.bn254 import R_MOD
    from uzkge_tpu.ff.jax_field import fr_ctx
    from uzkge_tpu.ntt.ntt import get_domain
    from uzkge_tpu.parallel.sharded import ShardedNTT, make_mesh

    mesh = make_mesh(4)
    n = 64
    sntt = ShardedNTT(n, mesh)
    dom = get_domain(n)
    rng = random.Random(5)
    dev = fr_ctx.to_mont_limbs([rng.randrange(R_MOD) for _ in range(n)])
    assert fr_ctx.from_mont_limbs(sntt.fft(dev)) == fr_ctx.from_mont_limbs(dom.fft(dev))
    assert fr_ctx.from_mont_limbs(sntt.ifft(dev)) == fr_ctx.from_mont_limbs(dom.ifft(dev))
    assert fr_ctx.from_mont_limbs(sntt.coset_fft(dev, 9)) == fr_ctx.from_mont_limbs(
        dom.coset_fft(dev, 9)
    )
