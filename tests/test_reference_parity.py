"""Bit-exactness against the reference's committed artifacts.

These tests are the acceptance chain for EVM compatibility without running
Rust or an EVM (SURVEY.md section 7 exits):

  1. our verifier accepts the Rust prover's hardcoded proof from
     contracts/solidity/test/plonk_20.js -> transcript, challenge derivation,
     linearization, and pairing all match the reference;
  2. our indexer regenerates the 20-card verifier key byte-identically to the
     generated VerifierKey_20.sol constants -> circuit layout, sigma
     encoding, FFT, MSM, and SRS handling all match.
"""

import os
import re

import pytest

from uzkge_tpu.constants.bn254 import R_MOD, Q_MOD
from .conftest import REFERENCE_DIR, reference_available

SOL_DIR = os.path.join(REFERENCE_DIR, "contracts/solidity/contracts/shuffle")
TEST_DIR = os.path.join(REFERENCE_DIR, "contracts/solidity/test")


def _parse_js_vectors(name):
    text = open(os.path.join(TEST_DIR, name)).read()
    proof_hex = re.search(r'const proof = "0x([0-9a-fA-F]+)"', text).group(1)

    def arr(var):
        block = re.search(rf"const {var} = \[(.*?)\];", text, re.S).group(1)
        return [int(h, 16) for h in re.findall(r'"0x([0-9a-fA-F]+)"', block)]

    return bytes.fromhex(proof_hex), arr("deck1"), arr("deck2"), arr("pkc")


def _parse_vk_sol(n):
    """VerifierKey_N.sol mstore table -> list of 32-byte words in offset order,
    plus the Extra1 (lagrange constants) and Extra2 arrays."""
    text = open(os.path.join(SOL_DIR, f"VerifierKey_{n}.sol")).read()
    words = {}
    for off, val in re.findall(r"mstore\(add\(vk, (0x[0-9a-fA-F]+)\), (0x[0-9a-fA-F]+|\d+)\)", text):
        words[int(off, 16)] = int(val, 16) if val.startswith("0x") else int(val)
    vk_words = [words[k] for k in sorted(words)]
    extras = []
    for e in (1, 2):
        etext = open(os.path.join(SOL_DIR, f"VerifierKeyExtra{e}_{n}.sol")).read()
        vals = [int(v, 16) for _, v in sorted(
            ((int(i), v) for i, v in re.findall(r"\[(\d+)\] = (0x[0-9a-fA-F]+);", etext)),
        )]
        extras.append(vals)
    return vk_words, extras[0], extras[1]


def _vk_words_to_fields(words):
    """Map the word table to named vk fields per the PlonkVerifier memory map
    (PlonkVerifier.sol:83-180): 32 points (9 q, 5 s, qb, 4 prk, q_ecc,
    12 gen — the 12 pk slots are loaded from calldata, not the vk) then
    anemoi g, g_inv, k0-4, edwards_a, root, cs_size."""
    pts = []
    for i in range(0, 32 * 2, 2):
        pts.append((words[i], words[i + 1]))
    scal = words[64:]
    return {
        "cm_q_vec": pts[0:9],
        "cm_s_vec": pts[9:14],
        "cm_qb": pts[14],
        "cm_prk_vec": pts[15:19],
        "cm_q_ecc": pts[19],
        "cm_shuffle_generator_vec": pts[20:32],
        "anemoi_generator": scal[0],
        "anemoi_generator_inv": scal[1],
        "k": scal[2:7],
        "edwards_a": scal[7],
        "root": scal[8],
        "cs_size": scal[9],
    }


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.slow
def test_rust_proof_accepted_by_our_verifier():
    """Replay the Rust prover's 20-card proof through our verifier."""
    from uzkge_tpu.plonk.proof_io import proof_from_bytes_be
    from uzkge_tpu.plonk.indexer import VerifierParams
    from uzkge_tpu.plonk.verifier import verifier
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.utils.transcript import Transcript

    proof_bytes, deck1, deck2, pkc = _parse_js_vectors("plonk_20.js")
    proof = proof_from_bytes_be(proof_bytes)
    # Extra1 = omega^{constraint_index} per PI; Extra2 = Lagrange constants
    vk_words, root_powers, lagrange_constants = _parse_vk_sol(20)
    f = _vk_words_to_fields(vk_words)
    pkc_points = [(pkc[i], pkc[i + 1]) for i in range(0, 24, 2)]
    # recover integer constraint indices from the root powers
    pow_to_idx = {}
    x = 1
    for i in range(f["cs_size"]):
        pow_to_idx[x] = i
        x = x * f["root"] % R_MOD
    constraint_indices = [pow_to_idx[v] for v in root_powers]

    vk = VerifierParams(
        cm_q_vec=f["cm_q_vec"],
        cm_s_vec=f["cm_s_vec"],
        cm_qb=f["cm_qb"],
        cm_prk_vec=f["cm_prk_vec"],
        anemoi_generator=f["anemoi_generator"],
        anemoi_generator_inv=f["anemoi_generator_inv"],
        k=f["k"],
        cs_size=f["cs_size"],
        public_vars_constraint_indices=constraint_indices,
        lagrange_constants=lagrange_constants,
        with_shuffle=True,
        cm_q_ecc=f["cm_q_ecc"],
        cm_shuffle_generator_vec=f["cm_shuffle_generator_vec"],
        cm_shuffle_public_key_vec=pkc_points,
        edwards_a=f["edwards_a"],
    )
    kzg = load_srs(4096)
    transcript = Transcript(b"Plonk shuffle Proof")
    transcript.append_u64(20)
    public_inputs = deck1 + deck2
    assert verifier(transcript, kzg, vk, public_inputs, proof)

    # negative control: tamper one public input
    bad = list(public_inputs)
    bad[0] = (bad[0] + 1) % R_MOD
    t2 = Transcript(b"Plonk shuffle Proof")
    t2.append_u64(20)
    assert not verifier(t2, kzg, vk, bad, proof)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.skipif(
    not os.environ.get("UZKGE_HEAVY_TESTS") and not os.environ.get("UZKGE_TPU_TESTS_ON_TPU"),
    reason="real-circuit-size MSM/FFT; run on TPU or with UZKGE_HEAVY_TESTS=1",
)
@pytest.mark.slow
def test_vk20_regenerated_byte_exactly():
    """Regenerate the full 20-card verifying key and compare every
    commitment/constant with the generated Solidity vk."""
    import random
    from uzkge_tpu.curve import babyjubjub as bjj
    from uzkge_tpu.shuffle.app import build_cs
    from uzkge_tpu.shuffle.primitives import Ciphertext
    from uzkge_tpu.plonk.indexer import indexer
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.ff.field import Fr

    vk_words, root_powers, lagrange_constants = _parse_vk_sol(20)
    f = _vk_words_to_fields(vk_words)

    rng = random.Random(7)
    apk = bjj.mul(bjj.GENERATOR, rng.randrange(1, bjj.ORDER))
    cards = [Ciphertext.rand(rng) for _ in range(20)]
    cs, _ = build_cs(rng, apk, cards)
    assert cs.size == f["cs_size"], (cs.size, f["cs_size"])
    assert Fr.root_of_unity(cs.size) == f["root"]

    kzg = load_srs(cs.size)
    pp = indexer(cs, kzg, with_shuffle=True)
    vk = pp.verifier_params

    assert vk.k == f["k"]
    assert vk.edwards_a == f["edwards_a"]
    assert root_powers == [pow(f["root"], ci, R_MOD) for ci in vk.public_vars_constraint_indices]
    assert vk.lagrange_constants == lagrange_constants
    assert vk.cm_q_vec == f["cm_q_vec"]
    assert vk.cm_s_vec == f["cm_s_vec"]
    assert vk.cm_qb == f["cm_qb"]
    assert vk.cm_prk_vec == f["cm_prk_vec"]
    assert vk.cm_q_ecc == f["cm_q_ecc"]
    assert vk.cm_shuffle_generator_vec == f["cm_shuffle_generator_vec"]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_vk52_commitments_match_embedded_bin():
    """The embedded vk-specific-52.bin equals what our gen_params loads."""
    from uzkge_tpu.gen_params import load_shuffle_verifier_params

    vk = load_shuffle_verifier_params(52)
    assert vk.cs_size == 16384
    assert len(vk.cm_q_vec) == 9 and len(vk.cm_shuffle_generator_vec) == 12
    assert len(vk.public_vars_constraint_indices) == 416


def test_matchmaking_embedded_vk_is_stale_and_detected():
    """The reference repo's committed matchmaking vk
    (matchmaking/parameters/vk-specific.bin) predates uzkge's 9-selector
    TurboCS: it carries 8 selector commitments while N_SELECTORS = 9
    (turbo/mod.rs:23), so proofs from the current circuit cannot verify
    against it (the prover linearizes 9 q polynomials, helpers.rs:1048).
    Our loader must detect this and raise, triggering the same
    regenerate fallback the reference API uses
    (matchmaking/src/gen_params/params.rs:44-48).  The file's
    circuit-level fields still match our build_cs exactly."""
    import pytest as _pytest

    from uzkge_tpu.errors import MissingVerifierParamsError
    from uzkge_tpu.gen_params import _read, load_matchmaking_verifier_params
    from uzkge_tpu.matchmaking.app import build_cs
    from uzkge_tpu.plonk.cs import N_SELECTORS
    from uzkge_tpu.utils import serialize as ser

    parsed = ser.parse_verifier_params_specific(
        _read("vk-specific-matchmaking.bin"), with_shuffle=False
    )
    vk = parsed["vk"]
    assert len(vk["cm_q_vec"]) == 8 != N_SELECTORS  # the staleness itself
    with _pytest.raises(MissingVerifierParamsError):
        load_matchmaking_verifier_params()

    # circuit-level parity with the embedded file's shared fields
    import random

    from uzkge_tpu.constants.bn254 import R_MOD

    rng = random.Random(5)
    cs, _ = build_cs(
        [rng.randrange(R_MOD) for _ in range(50)],
        rng.randrange(R_MOD),
        rng.randrange(R_MOD),
    )
    assert cs.size == vk["cs_size"] == 8192
    assert list(cs.public_vars_constraint_indices) == list(
        vk["public_vars_constraint_indices"]
    )
    assert cs.anemoi_generator == vk["anemoi_generator"]
    assert cs.anemoi_generator_inv == vk["anemoi_generator_inv"]
