"""Curve-layer tests: BabyJubjub vs the reference's preprocessed tables,
BN254 G1 arithmetic, pairing bilinearity."""

import random

import pytest

from uzkge_tpu.constants.bn254 import R_MOD, EDWARDS_D
from uzkge_tpu.constants import bjj_generators as BG
from uzkge_tpu.curve import babyjubjub as bjj
from uzkge_tpu.curve.bn254 import (
    G1_GEN,
    G2_GEN,
    g1_add,
    g1_mul,
    g1_neg,
    g1_msm,
    g2_mul,
)


def test_bjj_generator_tables_rederive():
    """The extracted window tables must equal {1,2,3,4} * 16^i * G — i.e. they
    are re-derivable curve data (reference uzkge/src/shuffle/remark.rs:39-60)."""
    g = bjj.GENERATOR
    assert bjj.is_on_curve(g)
    for i in range(0, 84, 17):  # spot-check rows
        base = bjj.mul(g, pow(16, i, bjj.ORDER))
        seg = base
        for j in range(4):
            assert BG.GENERATORS_X[i][j] == seg[0]
            assert BG.GENERATORS_Y[i][j] == seg[1]
            assert BG.GENERATORS_DXY[i][j] == seg[0] * seg[1] % R_MOD * EDWARDS_D % R_MOD
            seg = bjj.add(seg, base)


def test_bjj_group_law():
    random.seed(5)
    k1, k2 = random.randrange(bjj.ORDER), random.randrange(bjj.ORDER)
    p1, p2 = bjj.mul(bjj.GENERATOR, k1), bjj.mul(bjj.GENERATOR, k2)
    assert bjj.add(p1, p2) == bjj.mul(bjj.GENERATOR, (k1 + k2) % bjj.ORDER)
    assert bjj.add(p1, bjj.neg(p1)) == bjj.IDENTITY
    assert bjj.mul(bjj.GENERATOR, bjj.ORDER) == bjj.IDENTITY


def test_g1_group_law():
    random.seed(6)
    k1, k2 = random.randrange(R_MOD), random.randrange(R_MOD)
    p1, p2 = g1_mul(G1_GEN, k1), g1_mul(G1_GEN, k2)
    assert g1_add(p1, p2) == g1_mul(G1_GEN, (k1 + k2) % R_MOD)
    assert g1_add(p1, g1_neg(p1)) is None
    assert g1_msm([p1, p2], [2, 3]) == g1_mul(G1_GEN, (2 * k1 + 3 * k2) % R_MOD)


@pytest.mark.slow
def test_pairing_bilinearity():
    from uzkge_tpu.pcs.pairing import pairing, multi_pairing_is_one

    assert pairing(G2_GEN, g1_mul(G1_GEN, 2)) == pairing(g2_mul(G2_GEN, 2), G1_GEN)
    assert multi_pairing_is_one([(G1_GEN, G2_GEN), (g1_neg(G1_GEN), G2_GEN)])
    assert not multi_pairing_is_one([(G1_GEN, G2_GEN), (G1_GEN, G2_GEN)])
