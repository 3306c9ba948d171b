"""Array-form lazy-domain field arithmetic (ff/afield) vs python ints.

AField runs mod-2p (lazy) arithmetic: every op's result must be < 2p and
congruent to the exact value mod p; normalize() gives the canonical form.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from uzkge_tpu.ff.afield import afq, afq_c, afr
from uzkge_tpu.ff.jax_field import L

rng = random.Random(11)
N = 64


def _to_v(vals):
    blob = b"".join(v.to_bytes(32, "little") for v in vals)
    arr = np.frombuffer(blob, dtype="<u2").reshape(-1, L).astype(np.uint32)
    return jnp.moveaxis(jnp.asarray(arr), -1, 0)


def _from_v(a):
    arr = np.moveaxis(np.asarray(a), 0, -1).astype("<u2")
    return [int.from_bytes(arr[i].tobytes(), "little") for i in range(arr.shape[0])]


@pytest.mark.parametrize("f", [afq, afq_c, afr], ids=["afq", "afq_c", "afr"])
def test_afield_ops(f):
    p = f.p
    xs = [rng.randrange(2 * p) for _ in range(N)]
    ys = [rng.randrange(2 * p) for _ in range(N)]
    xv, yv = _to_v(xs), _to_v(ys)
    rinv = pow(1 << 256, -1, p)

    m = _from_v(f.mul(xv, yv))
    assert all(v < 2 * p and v % p == a * b * rinv % p for v, a, b in zip(m, xs, ys))
    a_ = _from_v(f.add(xv, yv))
    assert all(v < 2 * p and v % p == (a + b) % p for v, a, b in zip(a_, xs, ys))
    s_ = _from_v(f.sub(xv, yv))
    assert all(v < 2 * p and v % p == (a - b) % p for v, a, b in zip(s_, xs, ys))
    n_ = _from_v(f.neg(xv))
    assert all(v < 2 * p and v % p == -a % p for v, a in zip(n_, xs))
    assert _from_v(f.neg(jnp.zeros_like(xv)))[0] == 0
    ms = _from_v(f.mul_small(xv, 9))
    assert all(v < 2 * p and v % p == a * 9 % p for v, a in zip(ms, xs))
    nor = _from_v(f.normalize(xv))
    assert all(v == a % p for v, a in zip(nor, xs))
    iz = np.asarray(f.is_zero(_to_v([0, p, 1, 2 * p - 1])))
    assert bool(iz[0]) and bool(iz[1]) and not iz[2] and not iz[3]
