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


def _mini_pallas_call(kernel, out_shape, grid, in_specs, out_specs,
                      compiler_params=None):
    """Eager grid interpreter for the pallas_call patterns pallas_ntt uses:
    runs the REAL kernel bodies on numpy block views (XLA:CPU compiles of
    the jitted/interpret forms take minutes even at n=16 — the kernel body
    itself is plain jnp and runs eagerly in seconds)."""
    import itertools

    import numpy as np

    single = not isinstance(out_shape, (tuple, list))
    oshapes = [out_shape] if single else list(out_shape)
    ospecs = [out_specs] if single else list(out_specs)

    def call(*args):
        outs = [np.zeros(s.shape, np.asarray([], dtype=s.dtype).dtype) for s in oshapes]
        for idx in itertools.product(*(range(g) for g in grid)):
            refs = []
            for spec, a in zip(in_specs, args):
                start = [b * s for b, s in zip(spec.index_map(*idx), spec.block_shape)]
                sl = tuple(slice(st, st + bs) for st, bs in zip(start, spec.block_shape))
                refs.append(np.asarray(a)[sl])
            orefs = []
            for spec, o in zip(ospecs, outs):
                start = [b * s for b, s in zip(spec.index_map(*idx), spec.block_shape)]
                sl = tuple(slice(st, st + bs) for st, bs in zip(start, spec.block_shape))
                orefs.append(o[sl])  # numpy view: kernel writes go through
            kernel(*refs, *orefs)
        import jax.numpy as jnp

        res = [jnp.asarray(o) for o in outs]
        return res[0] if single else tuple(res)

    return call


def test_pallas_ntt_kernel_roundtrip(interpret_pallas, monkeypatch):
    """The production Pallas NTT (ntt/pallas_ntt.py) with its REAL kernel
    bodies, plans, block specs and fused ladders, executed eagerly through
    a mini grid interpreter: fft vs an exact host Horner oracle, ifft /
    coset round-trips, and the batch path.  n=16 with SMAX patched to 8
    exercises the recursive split (16 = 8 x 2) and the inter-factor T
    ladder; production shapes run on hardware via tests/test_tpu_kernels.py.
    Reference semantics: ark-poly Radix2EvaluationDomain
    (uzkge/src/poly_commit/field_polynomial.rs:552-607)."""
    import numpy as np

    from uzkge_tpu.ff.jax_field import fr_ctx
    from uzkge_tpu.ntt import ntt as nttmod
    from uzkge_tpu.ntt import pallas_ntt as pnttmod

    monkeypatch.setattr(nttmod, "PALLAS_MIN_N", 16)
    monkeypatch.setattr(pnttmod, "SMAX", 8)
    monkeypatch.setattr(pnttmod, "pallas_call", _mini_pallas_call)
    # bypass the jit wrappers (they would trace the mini interpreter's
    # python loop); NTTDomain only needs _pj_fwd/_pj_inv to be callable
    import jax as _jax

    monkeypatch.setattr(_jax, "jit", lambda f, **kw: f)
    n = 16
    dom = nttmod.NTTDomain(n)
    assert dom._pallas, "pallas path must be active under interpret mode"
    assert "S2" in dom._pplan_fwd, "n=16/SMAX=8 must exercise the recursive split"

    rng = random.Random(11)
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    x = fr_ctx.to_mont_limbs(vals)

    ev = fr_ctx.from_mont_limbs(np.asarray(dom.fft(x)))
    w = dom._pows_int
    for j in range(n):  # exact host Horner oracle, every point
        exp = 0
        for c in reversed(vals):
            exp = (exp * w[j] + c) % R_MOD
        assert ev[j] == exp, f"fft mismatch at {j}"

    # ifft round-trips bit-exactly (covers the fused n_inv post ladder)
    back = np.asarray(dom.ifft(dom.fft(x)))
    assert fr_ctx.from_mont_limbs(back) == vals

    # coset round-trip (covers the fused k^j pre / n_inv*k^-j post ladders)
    k = 5
    cback = np.asarray(dom.coset_ifft(dom.coset_fft(x, k), k))
    assert fr_ctx.from_mont_limbs(cback) == vals

    # batch path shares the kernel path with the single call
    import jax.numpy as jnp

    xb = jnp.stack([jnp.asarray(x)] * 2)
    evb = np.asarray(dom.fft_batch(xb))
    ev1 = np.asarray(dom.fft(x))
    assert (evb[0] == ev1).all() and (evb[1] == ev1).all()
