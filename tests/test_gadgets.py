"""Gadget-level tests via the verify_witness self-check interpreter,
mirroring the reference's gadget test strategy (SURVEY.md section 4)."""

import random
from uzkge_tpu.plonk.cs import TurboCS
import uzkge_tpu.plonk.gadgets  # attach methods
from uzkge_tpu.hash.anemoi import eval_variable_length_hash_with_trace, eval_stream_cipher_with_trace
from uzkge_tpu.shuffle.primitives import Ciphertext, sample_random_scalar_bits, eval_remark_with_trace, Permutation
from uzkge_tpu.curve import babyjubjub as bjj



def test_anemoi_vlh_gadget():
    trace = eval_variable_length_hash_with_trace([1,2,3,4])
    cs = TurboCS(); cs.load_anemoi_parameters()
    vs = [cs.new_variable(v) for v in (1,2,3,4)]
    out = cs.new_variable(trace.output)
    cs.anemoi_variable_length_hash(trace, vs, out)
    w = cs.get_and_clear_witness()
    cs.verify_witness(w, [])
    print('anemoi VLH gadget OK, size', cs.size)




def test_anemoi_stream_cipher_gadget():
    for output_len in range(1, 8):
        for input_len in (3, 4):
            inp = list(range(1, input_len+1))
            trace = eval_stream_cipher_with_trace(inp, output_len)
            cs = TurboCS(); cs.load_anemoi_parameters()
            ivars = [cs.new_variable(i) for i in inp]
            ovars = [cs.new_variable(o) for o in trace.output]
            cs.anemoi_stream_cipher(trace, ivars, ovars)
            w = cs.get_and_clear_witness()
            cs.verify_witness(w, [])
    print('anemoi stream cipher gadget OK')




def test_remark_gadget():
    rng = random.Random(11)
    sk = rng.randrange(bjj.ORDER); pk = bjj.mul(bjj.GENERATOR, sk)
    m = bjj.mul(bjj.GENERATOR, 777)
    ct = Ciphertext.encrypt(m, pk, rng.randrange(bjj.ORDER))
    bits = sample_random_scalar_bits(rng)
    trace, out_ct = eval_remark_with_trace(ct, bits, pk)
    cs = TurboCS()
    cs.load_shuffle_remark_parameters(pk)
    input_vars = cs.new_card_variable(ct)
    output_vars = cs.eval_card_remark(trace, input_vars)
    cs.prepare_pi_card_variable(output_vars)
    w = cs.get_and_clear_witness()
    cs.verify_witness(w, trace.output)
    print('remark gadget OK, size', cs.size)




def test_ecc_add_gadget():
    cs = TurboCS()
    p1 = bjj.GENERATOR
    p2 = bjj.add(p1, p1)
    p3 = bjj.add(p1, p2)
    v1 = cs.new_point_variable(p1); v2 = cs.new_point_variable(p2); v3 = cs.new_point_variable(p3)
    cs.insert_ecc_add_gate(v1, v1, v2)
    cs.insert_ecc_add_gate(v1, v2, v3)
    w = cs.get_and_clear_witness()
    cs.verify_witness(w, [])
    print('ecc add OK')

    cs = TurboCS()
    scalar = 123456789123456789 % bjj.ORDER
    sv = cs.new_variable(scalar)
    pv = cs.const_base_scalar_mul(bjj.GENERATOR, sv, 64)
    w = cs.get_and_clear_witness()
    cs.verify_witness(w, [])
    exp = bjj.mul(bjj.GENERATOR, scalar)
    assert (w[pv.x], w[pv.y]) == exp
    print('const base scalar mul OK, size', cs.size)

    cs = TurboCS()
    sv = cs.new_variable(scalar)
    bv = cs.new_point_variable(bjj.GENERATOR)
    pv = cs.nonconst_base_scalar_mul(bv, bjj.GENERATOR, sv, 64)
    w = cs.get_and_clear_witness()
    cs.verify_witness(w, [])
    assert (w[pv.x], w[pv.y]) == exp
    print('nonconst base scalar mul OK, size', cs.size)




def test_shuffle_card_gadget():
    n = 4
    rng = random.Random(12)
    cards = [Ciphertext.rand(rng) for _ in range(n)]
    cs = TurboCS()
    cvars = [cs.new_card_variable(c) for c in cards]
    perm = Permutation.rand(rng, n)
    out_vars = cs.shuffle_card(cvars, perm)
    w = cs.get_and_clear_witness()
    cs.verify_witness(w, [])
    # check semantic: output row i = sum_j perm[i][j] * card_j
    for i, ov in enumerate(out_vars):
        j = perm.matrix[i].index(1)
        assert [w[v] for v in ov.as_list()] == cards[j].flatten()
    print('shuffle_card gadget OK, size', cs.size)



def test_matchmaking_circuit_verify_witness():
    """Fisher-Yates matchmaking gadget at small N via verify_witness
    (reference matchmaking.rs:21-230 semantics)."""
    import random
    from uzkge_tpu.matchmaking.app import build_cs
    from uzkge_tpu.constants.bn254 import R_MOD
    from uzkge_tpu.hash.anemoi import eval_variable_length_hash

    rng = random.Random(9)
    inputs = [11, 22, 33, 44, 55]
    seed = rng.randrange(R_MOD)
    rn = rng.randrange(R_MOD)
    cs, out_vars = build_cs(inputs, seed, rn, n=5)
    w = cs.get_and_clear_witness()
    outputs = [w[v] for v in out_vars]
    assert sorted(outputs) == sorted(inputs)
    online = inputs + outputs + [rn, eval_variable_length_hash([seed])]
    cs.verify_witness(w, online)
