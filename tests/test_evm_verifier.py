"""EVM-semantics execution of the UNCHANGED Solidity verifier against proof
bytes (BASELINE configs 2-3 acceptance oracle).

Closes the loop from both ends:
  1. the REFERENCE Rust prover's hardcoded proof vectors from
     contracts/solidity/test/plonk_20.js / plonk_52.js replay through our
     Yul interpreter + the committed contracts -> validates the interpreter;
  2. OUR prover's proof bytes replay through the same interpreter+contracts
     -> validates the prover on-chain-compatibility (heavy, real-size run).
Both assert accept AND reject-on-tamper.
"""

import os
import re

import pytest

from .conftest import REFERENCE_DIR, reference_available

TESTS_JS = os.path.join(REFERENCE_DIR, "contracts/solidity/test")

heavy = pytest.mark.skipif(
    not os.environ.get("UZKGE_HEAVY_TESTS") and not os.environ.get("UZKGE_TPU_TESTS_ON_TPU"),
    reason="real-circuit-size proving; run on TPU or with UZKGE_HEAVY_TESTS=1",
)


def _load_js_vectors(n_cards: int):
    """proof bytes, deck1, deck2, pkc from the reference hardhat test."""
    with open(os.path.join(TESTS_JS, f"plonk_{n_cards}.js")) as f:
        src = f.read()
    proof = bytes.fromhex(re.search(r'const proof = "0x([0-9a-fA-F]+)"', src).group(1))

    def arr(name):
        m = re.search(rf"const {name} =\s*\[(.*?)\];", src, re.DOTALL)
        return [int(h, 16) for h in re.findall(r'"0x([0-9a-fA-F]+)"', m.group(1))]

    return proof, arr("deck1"), arr("deck2"), arr("pkc")


@pytest.mark.skipif(not reference_available(), reason="reference checkout not present")
@pytest.mark.parametrize("n_cards", [20, 52])
def test_evm_accepts_reference_proof_vector(n_cards):
    from uzkge_tpu.evm.verifier_vm import ShuffleVerifierVM

    proof, deck1, deck2, pkc = _load_js_vectors(n_cards)
    assert len(proof) == 0x660
    vm = ShuffleVerifierVM(n_cards)
    assert vm.verify_shuffle(proof, deck1 + deck2, pkc) is True


@pytest.mark.skipif(not reference_available(), reason="reference checkout not present")
def test_evm_rejects_tampered_vector():
    from uzkge_tpu.evm.verifier_vm import ShuffleVerifierVM

    proof, deck1, deck2, pkc = _load_js_vectors(20)
    vm = ShuffleVerifierVM(20)
    bad = bytearray(proof)
    bad[0x390] ^= 1  # perturb an evaluation word
    assert vm.verify_shuffle(bytes(bad), deck1 + deck2, pkc) is False
    # swapped output deck must also fail
    swapped = deck2[8:16] + deck2[:8] + deck2[16:]
    assert vm.verify_shuffle(proof, deck1 + swapped, pkc) is False


@pytest.mark.skipif(not reference_available(), reason="reference checkout not present")
def test_evm_groth16_reveal_vector():
    """The deployed snarkjs Groth16 reveal verifier
    (Groth16Verifier.sol:50) executed on the reference's
    reveal-with-snark vector (reveal.js:63-90)."""
    from uzkge_tpu.evm.verifier_vm import Groth16VerifierVM

    with open(os.path.join(TESTS_JS, "reveal.js")) as f:
        src = f.read()
    m = re.search(r"verifyRevealWithSnark\(\s*\[(.*?)\],\s*\[(.*?)\]", src, re.DOTALL)
    pi = [int(x.strip().strip('"'), 10) for x in re.findall(r'"(\d+)"', m.group(1))]
    proof = [int(x.strip().strip('"'), 10) for x in re.findall(r'"(\d+)"', m.group(2))]
    assert len(pi) == 6 and len(proof) == 8
    vm = Groth16VerifierVM()
    assert vm.verify_proof(proof, pi) is True
    bad = list(proof)
    bad[0] += 1
    assert vm.verify_proof(bad, pi) is False


@pytest.mark.skipif(not reference_available(), reason="reference checkout not present")
@heavy
@pytest.mark.slow
def test_evm_accepts_our_20_card_proof():
    """OUR 20-card proof bytes through the unchanged Solidity verifier
    (the reference's acceptance strategy, plonk_20.js:1-225)."""
    import random

    from uzkge_tpu.curve import babyjubjub as bjj
    from uzkge_tpu.evm.verifier_vm import ShuffleVerifierVM, pkc_words
    from uzkge_tpu.plonk.indexer import refresh_prover_params_public_key
    from uzkge_tpu.plonk.proof_io import proof_to_bytes_be
    from uzkge_tpu.shuffle import app
    from uzkge_tpu.shuffle.sdk import index_to_point

    rng = random.Random(99)
    players = [app.Keypair.generate(rng) for _ in range(2)]
    joint = app.aggregate_keys([p.public for p in players])
    pp, cs, kzg = app.gen_shuffle_prover_params(20)
    cms = refresh_prover_params_public_key(pp, cs, kzg, joint)

    deck = []
    for i in range(20):
        masked, _ = app.mask(rng, joint, index_to_point(i), rng.randrange(1, bjj.ORDER))
        deck.append(masked)
    proof, outputs = app.prove_shuffle(rng, joint, deck, pp, kzg)
    assert app.verify_shuffle(pp.verifier_params, kzg, deck, outputs, proof)

    pi = []
    for c in deck:
        pi += c.flatten()
    for c in outputs:
        pi += c.flatten()
    blob = proof_to_bytes_be(proof)

    vm = ShuffleVerifierVM(20)
    assert vm.verify_shuffle(blob, pi, pkc_words(cms)) is True
    bad = bytearray(blob)
    bad[0x390] ^= 1
    assert vm.verify_shuffle(bytes(bad), pi, pkc_words(cms)) is False


@pytest.mark.skipif(not reference_available(), reason="reference checkout not present")
@heavy
@pytest.mark.slow
def test_evm_accepts_our_52_card_proof():
    """OUR 52-card proof bytes through the unchanged ShuffleVerifier +
    VerifierKey_52 stack — BASELINE config 3's literal acceptance check
    (reference strategy: plonk_52.js).  Uses the disk-cached proving key
    when present (utils/params_cache — same apk derivation as bench.py)."""
    import random

    from uzkge_tpu.curve import babyjubjub as bjj
    from uzkge_tpu.evm.verifier_vm import ShuffleVerifierVM, pkc_words
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.plonk.indexer import ProverParams, refresh_prover_params_public_key
    from uzkge_tpu.plonk.proof_io import proof_to_bytes_be
    from uzkge_tpu.shuffle import app
    from uzkge_tpu.shuffle.sdk import index_to_point
    from uzkge_tpu.utils.params_cache import load_pp, save_pp, shuffle_pp_cache_path

    rng = random.Random(7)
    players = [app.Keypair.generate(rng) for _ in range(4)]
    joint = app.aggregate_keys([p.public for p in players])

    cache_path = shuffle_pp_cache_path(52, joint)
    pp = load_pp(cache_path, ProverParams)
    if pp is not None:
        kzg = load_srs(pp.n)  # SRS size from the cached params' own domain
    else:
        pp, cs, kzg = app.gen_shuffle_prover_params(52)
        refresh_prover_params_public_key(pp, cs, kzg, joint)
        save_pp(cache_path, pp)
    cms = pp.verifier_params.cm_shuffle_public_key_vec

    deck = []
    for i in range(52):
        masked, _ = app.mask(rng, joint, index_to_point(i), rng.randrange(1, bjj.ORDER))
        deck.append(masked)
    proof, outputs = app.prove_shuffle(rng, joint, deck, pp, kzg)
    assert app.verify_shuffle(pp.verifier_params, kzg, deck, outputs, proof)

    pi = []
    for c in deck:
        pi += c.flatten()
    for c in outputs:
        pi += c.flatten()
    blob = proof_to_bytes_be(proof)
    assert len(blob) == 0x660

    vm = ShuffleVerifierVM(52)
    assert vm.verify_shuffle(blob, pi, pkc_words(cms)) is True
    bad = bytearray(blob)
    bad[0x390] ^= 1
    assert vm.verify_shuffle(bytes(bad), pi, pkc_words(cms)) is False
