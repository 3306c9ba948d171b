"""NTT vs naive DFT, coset round trips (reference FFT semantics:
uzkge/src/poly_commit/field_polynomial.rs tests, SURVEY.md section 4)."""

import random

from uzkge_tpu.constants.bn254 import R_MOD
from uzkge_tpu.ff.jax_field import fr_ctx
from uzkge_tpu.ntt.ntt import get_domain


def _naive_dft(coefs, points):
    out = []
    for x in points:
        acc, xp = 0, 1
        for c in coefs:
            acc = (acc + c * xp) % R_MOD
            xp = xp * x % R_MOD
        out.append(acc)
    return out


def test_fft_matches_naive_dft():
    random.seed(3)
    n = 32
    dom = get_domain(n)
    coefs = [random.randrange(R_MOD) for _ in range(n)]
    a = fr_ctx.to_mont_limbs(coefs)
    got = fr_ctx.from_mont_limbs(dom.fft(a))
    pts = dom.elements()
    assert got == _naive_dft(coefs, pts)
    assert fr_ctx.from_mont_limbs(dom.ifft(dom.fft(a))) == coefs


def test_coset_fft_roundtrip():
    random.seed(4)
    n = 32
    k = 31415
    dom = get_domain(n)
    coefs = [random.randrange(R_MOD) for _ in range(n // 2)]  # shorter poly padded
    a = fr_ctx.to_mont_limbs(coefs)
    ev = dom.coset_fft(a, k)
    pts = [k * w % R_MOD for w in dom.elements()]
    assert fr_ctx.from_mont_limbs(ev) == _naive_dft(coefs, pts)
    back = fr_ctx.from_mont_limbs(dom.coset_ifft(ev, k))
    assert back == coefs + [0] * (n - len(coefs))
