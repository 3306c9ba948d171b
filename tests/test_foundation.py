"""Foundation tests: keccak, transcript, chacha, field, serialization.

Mirrors the reference's deterministic unit-test strategy (SURVEY.md section 4):
fixed vectors plus cross-checks against the embedded reference artifacts.
"""

import os
import random

import pytest

from uzkge_tpu.constants.bn254 import R_MOD, Q_MOD
from uzkge_tpu.ff.field import Fr, Fq
from uzkge_tpu.hash.keccak import keccak256
from uzkge_tpu.utils.transcript import Transcript
from uzkge_tpu.utils.chacha import ChaCha20Rng, choose_ks
from uzkge_tpu.utils import serialize as ser

from .conftest import REFERENCE_DIR, reference_available


def test_keccak_vectors():
    assert keccak256(b"").hex() == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak256(b"abc").hex() == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    # multi-block input
    assert keccak256(b"a" * 200).hex() == keccak256(b"a" * 100 + b"a" * 100).hex()


def test_transcript_state_machine():
    t = Transcript(b"Test")
    # "Test" is left-padded into one 32-byte slot
    assert len(t.state) == 32 and t.state[-4:] == b"Test"
    t.append_u64(52)
    assert len(t.state) == 64
    c = t.get_challenge(R_MOD)
    # state resets to the challenge bytes
    assert bytes(t.state) == c.to_bytes(32, "big")
    assert 0 <= c < R_MOD


def test_chacha_keystream():
    r = ChaCha20Rng(b"\x00" * 32)
    assert r.next_u32() == 0xADE0B876  # RFC7539-style zero-key block 0 word 0


def test_field_basics():
    random.seed(0)
    for F in (Fr, Fq):
        a, b = random.randrange(F.p), random.randrange(F.p)
        assert F.mul(F.inv(a), a) == 1
        assert F.add(a, F.neg(a)) == 0
        xs = [random.randrange(1, F.p) for _ in range(17)]
        assert F.batch_inv(xs) == [F.inv(x) for x in xs]
    # root of unity
    w = Fr.root_of_unity(1 << 14)
    assert pow(w, 1 << 14, Fr.p) == 1 and pow(w, 1 << 13, Fr.p) != 1


def test_ark_codecs_roundtrip():
    from uzkge_tpu.curve.bn254 import G1_GEN, g1_mul

    p = g1_mul(G1_GEN, 1234567)
    assert ser.ark_g1_uncompressed_read(ser.ark_g1_uncompressed_write(p)) == p
    assert ser.ark_g1_compressed_read(ser.ark_g1_compressed_write(p)) == p
    q = g1_mul(G1_GEN, 7654321)
    assert ser.ark_g1_compressed_read(ser.ark_g1_compressed_write(q)) == q
    assert ser.ark_g1_compressed_read(ser.ark_g1_compressed_write(None)) is None
    assert ser.g1_from_uncompress_be(ser.point_to_uncompress_be(p)) == p


@pytest.mark.skipif(not reference_available(), reason="reference artifacts not mounted")
def test_choose_ks_matches_reference_vk():
    vk52 = open(os.path.join(REFERENCE_DIR, "shuffle/parameters/vk-specific-52.bin"), "rb").read()
    vk = ser.parse_verifier_params_specific(vk52)["vk"]
    assert vk["k"] == choose_ks(R_MOD)
    assert vk["cs_size"] == 16384
    assert len(vk["public_vars_constraint_indices"]) == 52 * 8


@pytest.mark.skipif(not reference_available(), reason="reference artifacts not mounted")
def test_srs_parses_and_is_consistent():
    from uzkge_tpu.curve.bn254 import G1_GEN, g1_is_on_curve, g2_is_on_curve

    srs = open(os.path.join(REFERENCE_DIR, "uzkge/parameters/srs-padding.bin"), "rb").read()
    g1, g2 = ser.load_srs_unchecked(srs)
    assert len(g1) == 2060 and len(g2) == 2
    assert g1[0] == G1_GEN
    assert all(g1_is_on_curve(p) for p in g1[:8])
    assert g2_is_on_curve(g2[0]) and g2_is_on_curve(g2[1])
    padded, _ = ser.load_srs_params(4096, srs)
    assert padded[4096] is not None and padded[2051] is None
