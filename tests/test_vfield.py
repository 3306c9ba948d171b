"""Vertical-layout field kernels: exact parity with python ints and with the
horizontal MontCtx kernels."""

import random

import numpy as np
import jax.numpy as jnp

from uzkge_tpu.constants.bn254 import R_MOD, Q_MOD
from uzkge_tpu.ff.jax_field import fr_ctx, fq_ctx, L
from uzkge_tpu.ff.vfield import vfr, vfq, v_from_h, h_from_v

rng = random.Random(1234)


def _rand(n, p):
    return [rng.randrange(p) for _ in range(n)]


def _to_v(ctx, vals):
    return v_from_h(ctx.h.to_mont_limbs(vals))


def _from_v(ctx, arr):
    out = ctx.h.from_mont_limbs(h_from_v(arr))
    return out if isinstance(out, list) else [out]


def test_mul_add_sub_neg_exact():
    for ctx, p in ((vfr, R_MOD), (vfq, Q_MOD)):
        a = _rand(64, p) + [0, 1, p - 1, p - 2]
        b = _rand(64, p) + [p - 1, 0, p - 1, 1]
        av, bv = _to_v(ctx, a), _to_v(ctx, b)
        assert _from_v(ctx, ctx.mul(av, bv)) == [(x * y) % p for x, y in zip(a, b)]
        assert _from_v(ctx, ctx.add(av, bv)) == [(x + y) % p for x, y in zip(a, b)]
        assert _from_v(ctx, ctx.sub(av, bv)) == [(x - y) % p for x, y in zip(a, b)]
        assert _from_v(ctx, ctx.neg(av)) == [(-x) % p for x in a]


def test_matches_horizontal():
    a = _rand(33, R_MOD)
    b = _rand(33, R_MOD)
    ah, bh = fr_ctx.to_mont_limbs(a), fr_ctx.to_mont_limbs(b)
    hv = fr_ctx.mul(ah, bh)
    vv = h_from_v(vfr.mul(v_from_h(ah), v_from_h(bh)))
    assert np.array_equal(np.asarray(hv), np.asarray(vv))


def test_batch_inv():
    a = _rand(37, R_MOD)
    inv = vfr.batch_inv(_to_v(vfr, a))
    assert _from_v(vfr, inv) == [pow(x, R_MOD - 2, R_MOD) for x in a]
    # with zeros mapped to inv(1)
    a2 = [5, 0, 7, 0]
    inv2 = vfr.batch_inv(_to_v(vfr, a2), zero_to_one=True)
    exp = [pow(x if x else 1, R_MOD - 2, R_MOD) for x in a2]
    assert _from_v(vfr, inv2) == exp


def test_mul_const_pow_select():
    a = _rand(9, R_MOD)
    av = _to_v(vfr, a)
    assert _from_v(vfr, vfr.mul_const(av, 12345)) == [x * 12345 % R_MOD for x in a]
    assert _from_v(vfr, vfr.pow_const(av, 5)) == [pow(x, 5, R_MOD) for x in a]
    cond = jnp.asarray(np.array([i % 2 == 0 for i in range(9)]))
    sel = vfr.select(cond, av, vfr.neg(av))
    assert _from_v(vfr, sel) == [x if i % 2 == 0 else (-x) % R_MOD for i, x in enumerate(a)]


def test_broadcasting_batch_dims():
    # (L, 4, 8) x (L, 1, 8)
    a = _rand(32, R_MOD)
    b = _rand(8, R_MOD)
    av = _to_v(vfr, a).reshape(L, 4, 8)
    bv = _to_v(vfr, b).reshape(L, 1, 8)
    out = vfr.mul(av, bv)
    got = _from_v(vfr, out.reshape(L, 32))
    exp = [a[i] * b[i % 8] % R_MOD for i in range(32)]
    assert got == exp
