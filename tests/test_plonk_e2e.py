"""End-to-end TurboPLONK prove/verify on small circuits with a dev SRS.

Mirrors the reference prover doc-test (prover.rs:28-75) and extends it with
an Anemoi-gadget circuit (BASELINE config 1 shape) and a mini-shuffle."""

import random

import pytest

from uzkge_tpu.constants.bn254 import R_MOD
from uzkge_tpu.plonk.cs import TurboCS
import uzkge_tpu.plonk.gadgets  # noqa: F401  (attach gadget methods)
from uzkge_tpu.plonk.indexer import indexer
from uzkge_tpu.plonk.prover import prover
from uzkge_tpu.plonk.verifier import verifier
from uzkge_tpu.pcs.kzg import KZG
from uzkge_tpu.utils.transcript import Transcript


def _prove_and_verify(cs, witness, with_shuffle, label=b"Test", tamper=False):
    n = cs.size
    kzg = KZG.setup_insecure(2 * n + 10, tau=987654321987654321, domain_n=n)
    pp = indexer(cs, kzg, with_shuffle=with_shuffle)
    rng = random.Random(99)
    transcript = Transcript(label)
    proof = prover(rng, transcript, kzg, cs, pp, witness)

    online = [witness[i] for i in cs.public_vars_witness_indices]
    if tamper:
        online = list(online)
        online[0] = (online[0] + 1) % R_MOD
    t2 = Transcript(label)
    return verifier(t2, kzg, pp.verifier_params, online, proof)


@pytest.mark.slow
def test_add_gate_proof_no_shuffle():
    cs = TurboCS()
    v1 = cs.new_variable(1)
    v2 = cs.new_variable(2)
    v3 = cs.new_variable(3)
    cs.insert_add_gate(v1, v2, v3)
    cs.pad(min_size=64)
    witness = cs.get_and_clear_witness()
    assert _prove_and_verify(cs, witness, with_shuffle=False)


@pytest.mark.slow
def test_add_gate_proof_shuffle_shape():
    """Same circuit proven under the shuffle-extended protocol shape
    (w_sel commitments present but zero)."""
    cs = TurboCS()
    v1 = cs.new_variable(1)
    v2 = cs.new_variable(2)
    v3 = cs.new_variable(3)
    cs.insert_add_gate(v1, v2, v3)
    cs.prepare_pi_variable(v3)
    cs.pad(min_size=64)
    witness = cs.get_and_clear_witness()
    assert _prove_and_verify(cs, witness, with_shuffle=True)


@pytest.mark.slow
def test_anemoi_circuit_proof():
    """Anemoi-hash gadget proof — BASELINE config 1 shape."""
    from uzkge_tpu.hash.anemoi import eval_variable_length_hash_with_trace

    trace = eval_variable_length_hash_with_trace([1, 2, 3, 4])
    cs = TurboCS()
    cs.load_anemoi_parameters()
    vs = [cs.new_variable(v) for v in (1, 2, 3, 4)]
    out = cs.new_variable(trace.output)
    cs.anemoi_variable_length_hash(trace, vs, out)
    cs.prepare_pi_variable(out)
    cs.pad(min_size=64)
    witness = cs.get_and_clear_witness()
    cs.verify_witness(witness, [trace.output])
    assert _prove_and_verify(cs, witness, with_shuffle=False)


@pytest.mark.slow
def test_tampered_public_input_rejected():
    cs = TurboCS()
    v1 = cs.new_variable(5)
    v2 = cs.new_variable(6)
    v3 = cs.new_variable(11)
    cs.insert_add_gate(v1, v2, v3)
    cs.prepare_pi_variable(v3)
    cs.pad(min_size=64)
    witness = cs.get_and_clear_witness()
    assert not _prove_and_verify(cs, witness, with_shuffle=False, tamper=True)
