"""Game-flow primitives: keygen, mask/verify_mask, reveal/verify_reveal,
unmask, Chaum-Pedersen variants, card mapping (reference
shuffle/src/tests.rs game flow, minus the PLONK shuffle proof which is
covered by the e2e/parity tests)."""

import random

from uzkge_tpu.curve import babyjubjub as bjj
from uzkge_tpu.shuffle import app
from uzkge_tpu.shuffle.sdk import index_to_point, point_to_index, point_to_hex, hex_to_point
from uzkge_tpu.crypto.chaum_pedersen import cp_prove0, cp_verify0


def test_mask_reveal_unmask_roundtrip():
    rng = random.Random(21)
    players = [app.Keypair.generate(rng) for _ in range(4)]
    joint = app.aggregate_keys([p.public for p in players])

    card = index_to_point(17)
    masked, mask_proof = app.mask(rng, joint, card, rng.randrange(1, bjj.ORDER))
    assert app.verify_mask(joint, card, masked, mask_proof)

    shares = []
    for p in players:
        share, proof = app.reveal(rng, p, masked)
        assert app.verify_reveal(p.public, masked, share, proof)
        shares.append(share)
    assert app.unmask(masked, shares) == card
    assert point_to_index(card) == 17


def test_mask_proof_rejects_wrong_card():
    rng = random.Random(22)
    kp = app.Keypair.generate(rng)
    card = index_to_point(3)
    masked, proof = app.mask(rng, kp.public, card, rng.randrange(1, bjj.ORDER))
    wrong = index_to_point(4)
    assert not app.verify_mask(kp.public, wrong, masked, proof)


def test_cp_anemoi_variant():
    rng = random.Random(23)
    w = rng.randrange(1, bjj.ORDER)
    g = bjj.GENERATOR
    h = bjj.mul(bjj.GENERATOR, 777)
    c1, c2 = bjj.mul(g, w), bjj.mul(h, w)
    proof = cp_prove0(rng, g, h, w, c1, c2)
    assert cp_verify0(g, h, c1, c2, proof)
    bad = bjj.mul(g, w + 1)
    assert not cp_verify0(g, h, bad, c2, proof)


def test_card_map_points_on_curve():
    for i in (0, 13, 26, 39, 53):
        pt = index_to_point(i)
        assert bjj.is_on_curve(pt)
        assert point_to_index(pt) == i


def test_point_hex_roundtrip():
    pt = bjj.mul(bjj.GENERATOR, 123456)
    assert hex_to_point(point_to_hex(pt)) == pt
