"""Auxiliary subsystem tests: dangling-witness detector, structured errors,
gen-params CLI byte-exactness (SURVEY.md section 5 / section 2.1 rows
'gen-params CLI' and 'Debug-feature witness hygiene')."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from uzkge_tpu.errors import DanglingWitnessError, UzkgeError
from uzkge_tpu.gen_params import _read
from uzkge_tpu.plonk.cs import TurboCS
from uzkge_tpu.utils import serialize as ser


def test_dangling_witness_detector():
    cs = TurboCS(debug=True)
    a = cs.new_variable(3)
    b = cs.new_variable(4)
    cs.mul(a, b)
    cs.pad()  # all variables wired -> no error

    cs2 = TurboCS(debug=True)
    cs2.new_variable(7)  # allocated, never constrained
    with pytest.raises(DanglingWitnessError) as e:
        cs2.pad()
    assert e.value.variables == [2]
    assert isinstance(e.value, UzkgeError)


def test_dangling_detector_off_by_default():
    cs = TurboCS()
    cs.new_variable(7)
    cs.pad()  # non-debug build: no hygiene check, like the reference


def test_gen_vk_common_byte_exact():
    from gen_params_cli import gen_vk_common

    assert gen_vk_common(_read("srs-padding.bin")) == _read("vk-common.bin")


def test_cut_srs_reproduces_committed_padding():
    from gen_params_cli import cut_srs

    pad = _read("srs-padding.bin")
    g1, g2 = ser.load_srs_unchecked(pad)
    # synthesize a "full" SRS carrying the real powers at the slice positions
    full = [g1[0]] * 16387
    full[0:2051] = g1[0:2051]
    full[4096:4099] = g1[2051:2054]
    full[8192:8195] = g1[2054:2057]
    full[16384:16387] = g1[2057:2060]
    assert cut_srs(ser.srs_to_unchecked_bytes(full, g2)) == pad
    # idempotent on already-cut input
    assert cut_srs(pad) == pad


def test_srs_unchecked_roundtrip():
    pad = _read("srs-padding.bin")
    g1, g2 = ser.load_srs_unchecked(pad)
    assert ser.srs_to_unchecked_bytes(g1, g2) == pad
