"""Fixed-base Pallas MSM vs the host Pippenger oracle (small sizes so the
interpret-mode Pallas kernels stay fast on CPU)."""

import random

import pytest

from uzkge_tpu.curve.bn254 import g1_mul, g1_add
from uzkge_tpu.msm.msm import host_msm
from uzkge_tpu.msm.fixed_base import FixedBaseTable

G = (1, 2)
rng = random.Random(77)


def _points(n):
    return [g1_mul(G, rng.randrange(1, 1 << 60)) for _ in range(n)]


@pytest.mark.parametrize("n,c,bits", [(128, 8, 14), (32, 4, 30)])
def test_fixed_base_matches_host(n, c, bits):
    pts = _points(n)
    tbl = FixedBaseTable(pts, c=c, bits=bits)
    rows = [[rng.randrange(1 << bits) for _ in range(n)] for _ in range(2)]
    got = tbl.msm_ints(rows)
    exp = [host_msm(pts, row) for row in rows]
    assert got == exp


def test_fixed_base_edge_scalars():
    n, c, bits = 128, 8, 14
    pts = _points(n)
    tbl = FixedBaseTable(pts, c=c, bits=bits)
    top = (1 << bits) - 1
    rows = [
        [0] * n,                                    # all zero -> identity
        [0, 1, top] + [0] * (n - 3),                # sparse
        [128, 255, 256, 129] + [top] * (n - 4),     # digit boundary values
    ]
    got = tbl.msm_ints(rows)
    exp = [host_msm(pts, row) for row in rows]
    assert got == exp


def test_fixed_base_single_batch():
    n, c, bits = 128, 8, 14
    pts = _points(n)
    tbl = FixedBaseTable(pts, c=c, bits=bits)
    row = [rng.randrange(1 << bits) for _ in range(n)]
    assert tbl.msm_ints([row]) == [host_msm(pts, row)]
