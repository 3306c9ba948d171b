"""Real-hardware runs of the fixed-base MSM Pallas kernel pipeline
(_scan_leaf_kernel, _bases_kernel, _mult_chunk_kernel, _inv_kernel in
msm/fixed_base.py) at an SRS-tier size with full 254-bit scalars.

Gated on UZKGE_TPU_TESTS_ON_TPU=1 (the interpreter is too slow to run the
whole pipeline on CPU — see tests/test_pallas_kernels.py for the
interpret-mode coverage of the core CIOS kernel).
"""

import os
import random

import pytest

on_tpu = pytest.mark.skipif(
    not os.environ.get("UZKGE_TPU_TESTS_ON_TPU"),
    reason="real-TPU kernel test (UZKGE_TPU_TESTS_ON_TPU=1)",
)


@on_tpu
def test_fixed_base_srs_tier_254bit():
    import jax

    assert jax.default_backend() == "tpu"
    from uzkge_tpu.constants.bn254 import R_MOD
    from uzkge_tpu.curve.bn254 import g1_mul, G1_GEN
    from uzkge_tpu.msm.fixed_base import FixedBaseTable
    from uzkge_tpu.msm.msm import host_msm

    rng = random.Random(99)
    n = 4096
    pts = [g1_mul(G1_GEN, rng.randrange(1, R_MOD)) for _ in range(64)]
    pts = pts * (n // 64)  # SRS-tier row count, cheap host setup
    tbl = FixedBaseTable(pts, c=8)
    rows = [[rng.randrange(R_MOD) for _ in range(n)] for _ in range(2)]
    got = tbl.msm_ints(rows)
    # oracle on a full row: host Pippenger over all 4096 points
    assert got[0] == host_msm(pts, rows[0])
    assert got[1] == host_msm(pts, rows[1])


@on_tpu
def test_lagrange_commit_tpu_vs_host_oracle():
    """Production KZG commit path (fixed-base table over the embedded
    Lagrange basis) on the real chip vs the host oracle on a sparse row."""
    import jax

    assert jax.default_backend() == "tpu"
    from uzkge_tpu.constants.bn254 import R_MOD
    from uzkge_tpu.curve.bn254 import g1_msm
    from uzkge_tpu.ff.jax_field import fr_ctx, L
    from uzkge_tpu.gen_params import load_srs

    rng = random.Random(7)
    n = 4096
    kzg = load_srs(n)
    k = 512
    row = [rng.randrange(R_MOD) for _ in range(k)] + [0] * (n - k)
    got = kzg.commit_evals_batch(fr_ctx.to_mont_limbs(row).reshape(1, n, L))[0]
    assert got == g1_msm(kzg._lagrange_points[:k], row[:k])


@on_tpu
def test_pallas_ntt_tpu_vs_host_oracle():
    """Production Pallas NTT (ntt/pallas_ntt.py routes all n >= 4096 TPU
    domains) at the prover's witness-domain size: fft vs an exact host
    Horner oracle at spot points, plus a bit-exact ifft round-trip and a
    coset round-trip (the fused pre/post ladders).  Reference semantics:
    ark-poly Radix2EvaluationDomain
    (uzkge/src/poly_commit/field_polynomial.rs:552-607)."""
    import jax
    import numpy as np

    assert jax.default_backend() == "tpu"
    from uzkge_tpu.constants.bn254 import R_MOD
    from uzkge_tpu.ff.jax_field import fr_ctx
    from uzkge_tpu.ntt.ntt import get_domain

    rng = random.Random(31)
    n = 16384
    dom = get_domain(n)
    assert dom._pallas, "TPU domains at n>=4096 must route to the Pallas NTT"
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    x = fr_ctx.to_mont_limbs(vals)

    got = fr_ctx.from_mont_limbs(np.asarray(dom.fft(x)))
    w = dom.elements()
    for j in (0, 1, 4097, n - 1):
        exp = 0
        for c in reversed(vals):
            exp = (exp * w[j] + c) % R_MOD
        assert got[j] == exp, f"fft mismatch at {j}"

    back = np.asarray(dom.ifft(dom.fft(x)))
    assert fr_ctx.from_mont_limbs(back) == vals

    k = 5
    cback = np.asarray(dom.coset_ifft(dom.coset_fft(x, k), k))
    assert fr_ctx.from_mont_limbs(cback) == vals
