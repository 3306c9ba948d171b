"""Full application end-to-end tests at real circuit sizes (BASELINE
configs 2-4).  Heavy: real-size MSM/FFT — run on TPU
(UZKGE_TPU_TESTS_ON_TPU=1) or opt in with UZKGE_HEAVY_TESTS=1."""

import os
import random

import pytest

heavy = pytest.mark.skipif(
    not os.environ.get("UZKGE_HEAVY_TESTS") and not os.environ.get("UZKGE_TPU_TESTS_ON_TPU"),
    reason="real-circuit-size proving; run on TPU or with UZKGE_HEAVY_TESTS=1",
)


@heavy
@pytest.mark.slow
def test_20_card_shuffle_proof_under_regenerated_vk():
    """20-card deck: mask -> shuffle prove -> verify, with the verifying key
    regenerated from scratch (proven byte-identical to the deployed
    VerifierKey_20.sol by test_reference_parity) and the joint-pk refresh
    flow (BASELINE config 2)."""
    from uzkge_tpu.curve import babyjubjub as bjj
    from uzkge_tpu.shuffle import app
    from uzkge_tpu.shuffle.sdk import index_to_point
    from uzkge_tpu.plonk.indexer import refresh_prover_params_public_key
    from uzkge_tpu.plonk.proof_io import proof_to_bytes_be, proof_from_bytes_be

    rng = random.Random(77)
    players = [app.Keypair.generate(rng) for _ in range(2)]
    joint = app.aggregate_keys([p.public for p in players])

    pp, cs, kzg = app.gen_shuffle_prover_params(20)
    refresh_prover_params_public_key(pp, cs, kzg, joint)

    deck = []
    for i in range(20):
        masked, proof = app.mask(rng, joint, index_to_point(i), rng.randrange(1, bjj.ORDER))
        assert app.verify_mask(joint, index_to_point(i), masked, proof)
        deck.append(masked)

    proof, outputs = app.prove_shuffle(rng, joint, deck, pp, kzg)
    blob = proof_to_bytes_be(proof)
    assert len(blob) == 1632  # on-chain layout (indexer.rs:592-624)
    proof2 = proof_from_bytes_be(blob)
    assert app.verify_shuffle(pp.verifier_params, kzg, deck, outputs, proof2)

    # wrong output deck must fail
    bad = list(outputs)
    bad[0], bad[1] = bad[1], bad[0]
    assert not app.verify_shuffle(pp.verifier_params, kzg, deck, bad, proof2)

    # unmask round trip: every output card decrypts to some input card
    for out_ct in outputs[:3]:
        shares = [bjj.mul(out_ct.e1, p.secret) for p in players]
        pt = app.unmask(out_ct, shares)
        from uzkge_tpu.shuffle.sdk import point_to_index

        assert 0 <= point_to_index(pt) < 20


@heavy
@pytest.mark.slow
def test_52_card_shuffle_proof_under_embedded_vk():
    """52-card deck against the UNCHANGED embedded verifier key
    (vk-specific-52.bin == deployed VerifierKey_52.sol): the strongest
    offline statement of on-chain acceptance (BASELINE config 3)."""
    from uzkge_tpu.curve import babyjubjub as bjj
    from uzkge_tpu.shuffle import app
    from uzkge_tpu.shuffle.sdk import index_to_point
    from uzkge_tpu.plonk.indexer import refresh_prover_params_public_key

    rng = random.Random(78)
    players = [app.Keypair.generate(rng) for _ in range(4)]
    joint = app.aggregate_keys([p.public for p in players])

    pp, cs, kzg = app.gen_shuffle_prover_params(52)  # embedded reference vk
    refresh_prover_params_public_key(pp, cs, kzg, joint)

    deck = []
    for i in range(52):
        masked, _ = app.mask(rng, joint, index_to_point(i), rng.randrange(1, bjj.ORDER))
        deck.append(masked)

    proof, outputs = app.prove_shuffle(rng, joint, deck, pp, kzg)
    assert app.verify_shuffle(pp.verifier_params, kzg, deck, outputs, proof)


@heavy
@pytest.mark.slow
def test_matchmaking_proof():
    """N=50 matchmaking proof under the embedded (non-shuffle) verifier key
    (BASELINE config 4)."""
    from uzkge_tpu.matchmaking import app as mm
    from uzkge_tpu.constants.bn254 import R_MOD
    from uzkge_tpu.hash.anemoi import eval_variable_length_hash

    rng = random.Random(79)
    inputs = list(range(1, 51))
    seed = rng.randrange(R_MOD)
    random_number = rng.randrange(R_MOD)
    pp, cs, kzg = mm.gen_matchmaking_prover_params()
    proof, outputs = mm.prove_matchmaking(rng, inputs, seed, random_number, pp, kzg)
    commitment = eval_variable_length_hash([seed])
    assert sorted(outputs) == inputs  # it is a permutation
    assert mm.verify_matchmaking(pp.verifier_params, kzg, inputs, outputs, commitment,
                                 random_number, proof)
