"""JAX Montgomery limb kernels vs the python-int field layer."""

import random

import jax

from uzkge_tpu.constants.bn254 import R_MOD
from uzkge_tpu.ff.jax_field import fr_ctx


def test_mont_ops_match_python():
    random.seed(1)
    ctx = fr_ctx
    xs = [0, 1, R_MOD - 1, R_MOD - 2] + [random.randrange(R_MOD) for _ in range(28)]
    ys = [1, R_MOD - 1, 2, R_MOD // 2] + [random.randrange(R_MOD) for _ in range(28)]
    a = ctx.to_mont_limbs(xs)
    b = ctx.to_mont_limbs(ys)
    assert ctx.from_mont_limbs(jax.jit(ctx.add)(a, b)) == [(x + y) % R_MOD for x, y in zip(xs, ys)]
    assert ctx.from_mont_limbs(jax.jit(ctx.sub)(a, b)) == [(x - y) % R_MOD for x, y in zip(xs, ys)]
    assert ctx.from_mont_limbs(jax.jit(ctx.mul)(a, b)) == [x * y % R_MOD for x, y in zip(xs, ys)]
    assert ctx.from_mont_limbs(jax.jit(ctx.neg)(a)) == [(-x) % R_MOD for x in xs]


def test_fermat_inv():
    random.seed(2)
    ctx = fr_ctx
    xs = [random.randrange(1, R_MOD) for _ in range(8)]
    a = ctx.to_mont_limbs(xs)
    assert ctx.from_mont_limbs(jax.jit(ctx.inv)(a)) == [pow(x, R_MOD - 2, R_MOD) for x in xs]
