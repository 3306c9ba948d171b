#!/usr/bin/env python3
"""Extract protocol constants from the reference implementation into Python data
modules.

These are *interoperability-required protocol constants* (hash round keys,
precomputed curve-point tables, card encodings) — numeric data, not code.  They
are extracted mechanically from the reference Rust sources:

  - Anemoi-Jive254 round keys / MDS:  uzkge/src/anemoi/bn254/mod.rs
  - BabyJubjub windowed generator tables: uzkge/src/shuffle/babyjubjub.rs
  - Card index <-> point map: shuffle/src/card_maps.rs

Run from the repo root:  python tools/extract_constants.py
"""

import re
import sys
from pathlib import Path

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "uzkge_tpu" / "constants"

MONTFP = re.compile(r'MontFp!\(\s*"(-?\d+)"\s*\)', re.S)
HEXSTR = re.compile(r'"0x([0-9a-fA-F]+)"')

R_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def montfps(text):
    return [int(m) % R_MOD for m in MONTFP.findall(text)]


def section(text, start_marker, end_marker=None):
    i = text.index(start_marker)
    j = text.index(end_marker, i) if end_marker else len(text)
    return text[i:j]


def chunk(vals, k):
    assert len(vals) % k == 0
    return [vals[i : i + k] for i in range(0, len(vals), k)]


def fmt_nested(vals):
    return repr(vals).replace("], [", "],\n    [")


def extract_anemoi():
    text = (REF / "uzkge/src/anemoi/bn254/mod.rs").read_text()
    gen = montfps(section(text, "const GENERATOR:", "const GENERATOR_INV"))[0]
    gen_inv = montfps(section(text, "const GENERATOR_INV:", "const GENERATOR_SQUARE_PLUS_ONE"))[0]
    rkx = chunk(montfps(section(text, "const ROUND_KEYS_X:", "const ROUND_KEYS_Y")), 2)
    rky = chunk(montfps(section(text, "const ROUND_KEYS_Y:", "const PREPROCESSED_ROUND_KEYS_X")), 2)
    prkx = chunk(
        montfps(section(text, "const PREPROCESSED_ROUND_KEYS_X:", "const PREPROCESSED_ROUND_KEYS_Y")), 2
    )
    prky = chunk(montfps(section(text, "const PREPROCESSED_ROUND_KEYS_Y:", "const MDS_MATRIX")), 2)
    mds = chunk(montfps(section(text, "const MDS_MATRIX:", "fn get_alpha_inv")), 2)
    assert len(rkx) == len(rky) == len(prkx) == len(prky) == 14, (len(rkx), len(rky), len(prkx), len(prky))
    assert len(mds) == 2
    out = OUT / "anemoi_constants.py"
    out.write_text(
        '"""Anemoi-Jive254 protocol constants.\n\n'
        "Extracted from the reference (uzkge/src/anemoi/bn254/mod.rs) by\n"
        "tools/extract_constants.py.  These are interoperability-required hash\n"
        'constants (like SHA-2 round constants), all elements of BN254 Fr.\n"""\n\n'
        "N_ANEMOI_ROUNDS = 14\n"
        "ALPHA = 5\n"
        f"GENERATOR = {gen}\n"
        f"GENERATOR_INV = {gen_inv}\n"
        f"MDS_MATRIX = {fmt_nested(mds)}\n\n"
        f"ROUND_KEYS_X = {fmt_nested(rkx)}\n\n"
        f"ROUND_KEYS_Y = {fmt_nested(rky)}\n\n"
        f"PREPROCESSED_ROUND_KEYS_X = {fmt_nested(prkx)}\n\n"
        f"PREPROCESSED_ROUND_KEYS_Y = {fmt_nested(prky)}\n"
    )
    print(f"wrote {out}")


def extract_babyjubjub():
    text = (REF / "uzkge/src/shuffle/babyjubjub.rs").read_text()
    gx = chunk(montfps(section(text, "fn get_preprocessed_generators_x", "fn get_preprocessed_generators_y")), 4)
    gy = chunk(montfps(section(text, "fn get_preprocessed_generators_y", "fn get_preprocessed_generators_dxy")), 4)
    gdxy = chunk(montfps(section(text, "fn get_preprocessed_generators_dxy")), 4)
    assert len(gx) == len(gy) == len(gdxy) == 84, (len(gx), len(gy), len(gdxy))
    out = OUT / "bjj_generators.py"
    out.write_text(
        '"""Preprocessed BabyJubjub generator window tables for the shuffle remark.\n\n'
        "Extracted from the reference (uzkge/src/shuffle/babyjubjub.rs) by\n"
        "tools/extract_constants.py.  Row i holds the affine x / y / d*x*y values\n"
        "of {1,2,3,4} * 16^i * G for the 84-iteration base-16 signed-window walk.\n"
        'These are pure curve data, re-derivable from the generator (see tests).\n"""\n\n'
        f"NUM_ITERATIONS = 84\n"
        f"GENERATORS_X = {fmt_nested(gx)}\n\n"
        f"GENERATORS_Y = {fmt_nested(gy)}\n\n"
        f"GENERATORS_DXY = {fmt_nested(gdxy)}\n"
    )
    print(f"wrote {out}")


def extract_card_maps():
    text = (REF / "shuffle/src/card_maps.rs").read_text()
    cards = [int(h, 16) for h in HEXSTR.findall(text)]
    assert len(cards) == 54
    out = OUT / "card_maps.py"
    out.write_text(
        '"""54-card deck encoding: BabyJubjub y-coordinates, one per card.\n\n'
        "Extracted from the reference (shuffle/src/card_maps.rs) by\n"
        'tools/extract_constants.py.  Pure protocol data.\n"""\n\n'
        f"CARD_MAPS = {repr(cards).replace(', ', ',\n    ')}\n"
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    extract_anemoi()
    extract_babyjubjub()
    extract_card_maps()
    print("done", file=sys.stderr)
