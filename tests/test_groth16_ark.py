"""Groth16 reveal interop with the reference deployment.

The reference proves RevealCircuit (shuffle/src/reveal_with_snark.rs:85-133)
with the embedded ark proving key and verifies on-chain via the deployed
Groth16Verifier.sol.  These tests check that OUR synthesis replays ark's gate
layout exactly (structural fingerprint vs the pk) and that our proofs are
accepted by the UNCHANGED deployed contract executed in-process.
"""

import random

import pytest

from uzkge_tpu.curve import babyjubjub as bjj
from uzkge_tpu.groth16.ark_pk import load_reference_groth16_pk
from uzkge_tpu.groth16.ark_r1cs import synthesize_reveal


def _vectors(seed=11):
    rng = random.Random(seed)
    sk = rng.randrange(1, bjj.ORDER)
    pk_pt = bjj.mul(bjj.GENERATOR, sk)
    e1 = bjj.mul(bjj.GENERATOR, rng.randrange(1, bjj.ORDER))
    reveal = bjj.mul(e1, sk)
    return rng, sk, pk_pt, e1, reveal


def test_pk_parses_and_matches_deployed_vk():
    """The embedded pk's vk equals the constants in Groth16Verifier.sol
    (alpha/IC checked against the committed contract source)."""
    pk = load_reference_groth16_pk()
    assert (pk.num_instance, pk.num_witness, pk.domain_size) == (7, 4862, 8192)
    assert pk.vk.alpha_g1 == (
        9657238070900747270850134127207342063836775896456755772687970865046315915955,
        2697735170765775544622437761582108993463590773433588253802052918158451426029,
    )
    assert pk.vk.gamma_abc_g1[6] == (
        9803040101469704962298932749319797860811607510512239319797967436639389900637,
        16572130389315163624107961593078497076502659722535756008507313249749451057401,
    )
    assert len(pk.a_query) == len(pk.b_g1_query) == len(pk.b_g2_query) == 4869


def test_synthesis_structural_fingerprint():
    """Our replay of ark-r1cs-std 0.4's synthesis produces exactly the QAP
    shape the embedded pk was generated for."""
    _, sk, pk_pt, e1, reveal = _vectors()
    cs = synthesize_reveal(sk, e1, reveal, pk_pt)
    pk = load_reference_groth16_pk()
    assert cs.num_instance == pk.num_instance == 7
    assert cs.num_witness == pk.num_witness == 4862
    assert len(cs.rows) + cs.num_instance <= pk.domain_size
    # every row satisfied by the assignment
    from uzkge_tpu.constants.bn254 import R_MOD

    z = cs.assignment()
    a, b, c = cs.matrices()
    for ra, rb, rc in zip(a, b, c):
        va = sum(cf * z[col] for col, cf in ra.items()) % R_MOD
        vb = sum(cf * z[col] for col, cf in rb.items()) % R_MOD
        vc = sum(cf * z[col] for col, cf in rc.items()) % R_MOD
        assert va * vb % R_MOD == vc


def test_reveal_proof_accepted_by_deployed_contract():
    """sdk reveal_card_with_snark -> proof bytes -> the unchanged
    Groth16Verifier.sol executed in-process: accepted, and rejected when the
    reveal point is tampered (mirrors contracts test reveal.js:63-90)."""
    from uzkge_tpu.evm.verifier_vm import Groth16VerifierVM
    from uzkge_tpu.shuffle import sdk
    from uzkge_tpu.shuffle.app import Keypair, mask, aggregate_keys

    rng, _, _, _, _ = _vectors()
    kp = Keypair.generate(rng)
    apk = aggregate_keys([kp.public])
    card = bjj.mul(bjj.GENERATOR, 17)
    masked, _proof = mask(rng, apk, card, rng.randrange(1, bjj.ORDER))

    out = sdk.reveal_card_with_snark(
        sdk.scalar_to_hex(kp.secret), sdk.masked_card_serialize(masked)
    )
    reveal_pt = sdk.hex_to_point(out["card"])
    proof8 = [sdk.hex_to_scalar(w) for w in out["snark_proof"]]
    pi6 = [masked.e1[0], masked.e1[1], reveal_pt[0], reveal_pt[1],
           kp.public[0], kp.public[1]]

    vm = Groth16VerifierVM()
    assert vm.verify_proof(proof8, pi6) is True

    bad = list(pi6)
    bad[2] = (bad[2] + 1) % bjj.P
    assert vm.verify_proof(proof8, bad) is False


def test_reveal_onchain_host_pairing_roundtrip():
    """prove_reveal_onchain/verify_reveal_onchain host path, plus wrong-pk
    rejection."""
    from uzkge_tpu.groth16.reveal import prove_reveal_onchain, verify_reveal_onchain

    rng, sk, pk_pt, e1, _ = _vectors(23)
    reveal_pt, proof = prove_reveal_onchain(sk, e1, rng=rng)
    assert reveal_pt == bjj.mul(e1, sk)
    assert verify_reveal_onchain(e1, reveal_pt, pk_pt, proof) is True
    other = bjj.mul(bjj.GENERATOR, 999)
    assert verify_reveal_onchain(e1, reveal_pt, other, proof) is False
