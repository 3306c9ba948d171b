"""zshuffle application: circuit building, proving, verification, keygen,
mask/reveal/unmask.

Mirrors shuffle/src/{build_cs.rs, keygen.rs, mask.rs, reveal.rs} with the
prover running on TPU.
"""

import random as _random
from typing import List, Optional, Tuple

from ..constants.bn254 import R_MOD
from ..curve import babyjubjub as bjj
from ..plonk.cs import TurboCS
from ..plonk import gadgets as _gadgets  # noqa: F401  (method attachment)
from ..plonk.indexer import indexer, refresh_prover_params_public_key, ProverParams
from ..plonk.prover import prover
from ..plonk.verifier import verifier
from ..utils.transcript import Transcript
from ..crypto.chaum_pedersen import ChaumPedersenDLProof, cp_prove, cp_verify
from .primitives import Ciphertext, Permutation, sample_random_scalar_bits, eval_remark_with_trace

PLONK_PROOF_TRANSCRIPT = b"Plonk shuffle Proof"


# ------------------------------------------------------------------- keygen


class Keypair:
    """(keygen.rs:11-26)"""

    def __init__(self, secret: int):
        self.secret = secret % bjj.ORDER
        self.public = bjj.mul(bjj.GENERATOR, self.secret)

    @staticmethod
    def generate(rng: _random.Random) -> "Keypair":
        return Keypair(rng.randrange(1, bjj.ORDER))


def aggregate_keys(keys: List[Tuple[int, int]]):
    acc = bjj.IDENTITY
    for k in keys:
        acc = bjj.add(acc, k)
    return acc


# ------------------------------------------------------------- mask / reveal


def mask(rng, shared_key, card, r: int):
    """ElGamal mask + Chaum-Pedersen proof (mask.rs:13-35)."""
    e1 = bjj.mul(bjj.GENERATOR, r)
    e2 = bjj.add(card, bjj.mul(shared_key, r))
    ce2 = bjj.add(e2, bjj.neg(card))
    transcript = Transcript(b"Masking")
    proof = cp_prove(rng, bjj.GENERATOR, shared_key, transcript, r, e1, ce2)
    return Ciphertext(e1, e2), proof


def verify_mask(shared_key, card, masked: Ciphertext, proof) -> bool:
    ce2 = bjj.add(masked.e2, bjj.neg(card))
    transcript = Transcript(b"Masking")
    return cp_verify(bjj.GENERATOR, shared_key, transcript, masked.e1, ce2, proof)


def reveal(rng, keypair: Keypair, masked: Ciphertext):
    """Partial decryption share + CP proof (reveal.rs:18-41)."""
    share = bjj.mul(masked.e1, keypair.secret)
    transcript = Transcript(b"Revealing")
    proof = cp_prove(rng, masked.e1, bjj.GENERATOR, transcript, keypair.secret, share, keypair.public)
    return share, proof


def verify_reveal(pk, masked: Ciphertext, reveal_card, proof) -> bool:
    transcript = Transcript(b"Revealing")
    return cp_verify(masked.e1, bjj.GENERATOR, transcript, reveal_card, pk, proof)


def reveal0(rng, keypair: Keypair, masked: Ciphertext):
    """zk-friendly (Anemoi-challenge) reveal (reveal.rs:44-60)."""
    from ..crypto.chaum_pedersen import cp_prove0

    share = bjj.mul(masked.e1, keypair.secret)
    proof = cp_prove0(rng, masked.e1, bjj.GENERATOR, keypair.secret, share, keypair.public)
    return share, proof


def verify_reveal0(pk, masked: Ciphertext, reveal_card, proof) -> bool:
    """(reveal.rs:78-90)"""
    from ..crypto.chaum_pedersen import cp_verify0

    return cp_verify0(masked.e1, bjj.GENERATOR, reveal_card, pk, proof)


def unmask(masked: Ciphertext, reveal_cards: List):
    """e2 - sum(shares) (reveal.rs:93-97)."""
    agg = bjj.IDENTITY
    for r in reveal_cards:
        agg = bjj.add(agg, r)
    return bjj.add(masked.e2, bjj.neg(agg))


# ------------------------------------------------------------------ circuit


def build_cs(rng, aggregate_public_key, input_cards: List[Ciphertext]):
    """(build_cs.rs:26-55)"""
    n = len(input_cards)
    cs = TurboCS()
    cs.load_shuffle_remark_parameters(aggregate_public_key)

    remark_card_vars = []
    for card in input_cards:
        bits = sample_random_scalar_bits(rng)
        trace, _ = eval_remark_with_trace(card, bits, aggregate_public_key)
        input_var = cs.new_card_variable(card)
        cs.prepare_pi_card_variable(input_var)
        output_var = cs.eval_card_remark(trace, input_var)
        remark_card_vars.append(output_var)

    permutation = Permutation.rand(rng, n)
    shuffled = cs.shuffle_card(remark_card_vars, permutation)
    for cv in shuffled:
        cs.prepare_pi_card_variable(cv)
    cs.pad()
    return cs, shuffled


def gen_shuffle_prover_params(n_cards: int, use_embedded_vk: bool = True) -> Tuple[ProverParams, TurboCS, object]:
    """(shuffle/src/gen_params/params.rs:29-54)  Returns (pp, cs, kzg)."""
    from ..gen_params import load_srs, load_shuffle_verifier_params

    rng = _random.Random(0)
    apk = bjj.mul(bjj.GENERATOR, rng.randrange(1, bjj.ORDER))
    cards = [Ciphertext.rand(rng) for _ in range(n_cards)]
    cs, _ = build_cs(rng, apk, cards)
    kzg = load_srs(cs.size)
    vk = None
    if use_embedded_vk and n_cards in (48, 52, 54):
        vk = load_shuffle_verifier_params(n_cards)
    pp = indexer(cs, kzg, verifier_params=vk, with_shuffle=True)
    return pp, cs, kzg


def prove_shuffle(rng, aggregate_public_key, input_cards: List[Ciphertext],
                  pp: ProverParams, kzg) -> Tuple[dict, List[Ciphertext]]:
    """(build_cs.rs:57-97)"""
    from ..utils.stagetimer import stage

    n = len(input_cards)
    with stage("r0_build_cs"):
        cs, output_vars = build_cs(rng, aggregate_public_key, input_cards)
        witness = cs.get_and_clear_witness()

    transcript = Transcript(PLONK_PROOF_TRANSCRIPT)
    transcript.append_u64(n)
    proof = prover(rng, transcript, kzg, cs, pp, witness)

    outputs = []
    for ov in output_vars:
        vals = [witness[v] for v in ov.as_list()]
        e2 = (vals[0], vals[1])
        e1 = (vals[2], vals[3])
        outputs.append(Ciphertext(e1, e2))
    return proof, outputs


def verify_shuffle(vk, kzg, input_cards: List[Ciphertext], output_cards: List[Ciphertext],
                   proof: dict) -> bool:
    """(build_cs.rs:99-129)"""
    transcript = Transcript(PLONK_PROOF_TRANSCRIPT)
    transcript.append_u64(len(input_cards))
    online_inputs = []
    for c in input_cards:
        online_inputs += c.flatten()
    for c in output_cards:
        online_inputs += c.flatten()
    return verifier(transcript, kzg, vk, online_inputs, proof)
