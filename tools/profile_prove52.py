#!/usr/bin/env python3
"""Stage breakdown of the 52-card shuffle proof on the current backend.

Loads the disk-cached proving key (utils/params_cache), runs prove_shuffle
warmup + timed iterations, prints the per-stage wall-clock collected by
utils/stagetimer.  This is the measurement tool behind bench.py's
stage_breakdown field.
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import uzkge_tpu.backend  # noqa: F401
import jax


def main():
    from uzkge_tpu.shuffle.app import (
        gen_shuffle_prover_params, prove_shuffle, verify_shuffle, Keypair,
        aggregate_keys, mask,
    )
    from uzkge_tpu.curve import babyjubjub as bjj
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.shuffle.sdk import index_to_point
    from uzkge_tpu.plonk.indexer import ProverParams, refresh_prover_params_public_key
    from uzkge_tpu.utils.params_cache import load_pp, save_pp, shuffle_pp_cache_path
    from uzkge_tpu.utils import stagetimer

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = random.Random(7)
    keys = [Keypair.generate(rng) for _ in range(4)]
    apk = aggregate_keys([k.public for k in keys])

    cache_path = shuffle_pp_cache_path(52, apk)
    t0 = time.time()
    pp = load_pp(cache_path, ProverParams)
    if pp is not None:
        kzg = load_srs(16384)
        print(f"params (disk cache): {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        pp, cs, kzg = gen_shuffle_prover_params(52)
        refresh_prover_params_public_key(pp, cs, kzg, apk)
        save_pp(cache_path, pp)
        print(f"params (fresh): {time.time()-t0:.1f}s", file=sys.stderr)

    cards = [index_to_point(i) for i in range(52)]
    deck = [mask(rng, apk, c, rng.randrange(1, bjj.ORDER))[0] for c in cards]

    t0 = time.time()
    tab = kzg.lagrange_fb_table()
    print(f"fb table build: {time.time()-t0:.1f}s", file=sys.stderr)

    stagetimer.reset()
    t0 = time.time()
    proof, outputs = prove_shuffle(rng, apk, deck, pp, kzg)
    print(f"warmup (compile): {time.time()-t0:.1f}s", file=sys.stderr)
    print("warmup stages:", json.dumps(stagetimer.snapshot(), indent=1), file=sys.stderr)

    iters = int(os.environ.get("ITERS", "2"))
    best = None
    for _ in range(iters):
        stagetimer.reset()
        t0 = time.time()
        proof, outputs = prove_shuffle(rng, apk, deck, pp, kzg)
        dt = time.time() - t0
        snap = stagetimer.snapshot()
        if best is None or dt < best[0]:
            best = (dt, snap)
        print(f"iter: {dt:.2f}s", file=sys.stderr)

    ok = verify_shuffle(pp.verifier_params, kzg, deck, outputs, proof)
    print(f"verify={ok}", file=sys.stderr)
    lat, snap = best
    unacct = lat - sum(snap.values())
    snap["unaccounted"] = round(unacct, 4)
    print(json.dumps({"prove52_s": round(lat, 3), "stage_breakdown": snap}))


if __name__ == "__main__":
    main()
