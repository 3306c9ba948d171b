"""Coverage for the ACTUAL Pallas TPU kernel bodies.

The default suite forces the CPU backend, where `use_pallas()` normally
dispatches to the vfield fallback — so without these tests the Pallas kernel
code (ff/pallas_rows.RowCtx CIOS chain, ff/pallas_field block specs) would
only ever run on real hardware.  `UZKGE_PALLAS=interpret` (set here per-test
via monkeypatch) routes every `pallas_call` through the Pallas interpreter:
the same kernel bodies, refs and block specs execute on CPU.

The interpreter is slow, so the default-suite test covers the core CIOS
multiply chain (`pmul` — the kernel every other Pallas kernel builds on) at
full 254-bit operands.  The whole fixed-base MSM kernel pipeline
(_scan_leaf/_bases/_mult_chunk/_inv) runs on real hardware via
tests/test_tpu_kernels.py (UZKGE_TPU_TESTS_ON_TPU=1) and tools/bench_fb.py.
"""

import random

import pytest

from uzkge_tpu.constants.bn254 import R_MOD, Q_MOD


@pytest.fixture
def interpret_pallas(monkeypatch):
    # interpret_mode() snapshots UZKGE_PALLAS at import (jitted callers bake
    # the flag into traces), so tests flip the snapshot, not the env var
    from uzkge_tpu.ff import pallas_field

    monkeypatch.setattr(pallas_field, "_INTERPRET", True)
    assert pallas_field.use_pallas() and pallas_field.interpret_mode()
    yield


def test_pmul_kernel_interpret_fr_fq(interpret_pallas):
    """RowCtx.mul (the VMEM CIOS chain) through the interpreter: exact vs
    python ints for both fields, full-width operands incl. edge values."""
    from uzkge_tpu.ff.pallas_field import pmul_fr, pmul_fq
    from uzkge_tpu.ff.jax_field import fr_ctx, fq_ctx
    from uzkge_tpu.ff.vfield import v_from_h, h_from_v

    rng = random.Random(5)
    for pmulf, ctx, p in ((pmul_fr, fr_ctx, R_MOD), (pmul_fq, fq_ctx, Q_MOD)):
        a = [rng.randrange(p) for _ in range(60)] + [0, 1, p - 1, p - 2]
        b = [rng.randrange(p) for _ in range(60)] + [p - 1, 0, p - 1, 1]
        av = v_from_h(ctx.to_mont_limbs(a))
        bv = v_from_h(ctx.to_mont_limbs(b))
        got = ctx.from_mont_limbs(h_from_v(pmulf(av, bv)))
        assert got == [x * y % p for x, y in zip(a, b)]
