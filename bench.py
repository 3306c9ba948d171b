#!/usr/bin/env python3
"""Per-chip benchmark.  Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: MSM throughput (points/s) over the embedded n=16384
Lagrange SRS through the production KZG commit path (fixed-base
signed-window Pallas kernels, msm/fixed_base.py) — the prover's dominant
kernel.  Extra fields in the same JSON object: 52-card shuffle proof
latency (proof verified), NTT butterflies/s.

vs_baseline is measured against a single-socket CPU arkworks MSM at
~2.0e6 points/s (typical rayon-parallel VariableBaseMSM on a modern
16-core socket for 2^14 points; the reference publishes no numbers —
BASELINE.md).  The NTT baseline is measured live: native/hostmath.c's
single-core radix-2 Montgomery NTT at the same size, scaled by 16 cores
(documented upper bound for one socket — ark-poly's parallel FFT scales
sublinearly).

Stage timings/details go to stderr; stages degrade independently (a failed
stage reports null for its field instead of killing the headline).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import uzkge_tpu.backend  # noqa: F401

CPU_BASELINE_MSM_PPS = 2.0e6
T_START = time.time()
BUDGET_S = float(os.environ.get("UZKGE_BENCH_BUDGET", "1100"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def elapsed():
    return time.time() - T_START


def bench_msm(n=16384, batch=8, iters=3):
    """Headline: points/s through KZG.commit_evals_batch (the path every
    prover commitment takes), including host affine extraction."""
    import random
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.ff.jax_field import fr_ctx, L
    from uzkge_tpu.constants.bn254 import R_MOD

    kzg = load_srs(n)
    rng = random.Random(42)
    flat = [rng.randrange(R_MOD) for _ in range(batch * n)]
    sc = fr_ctx.to_mont_limbs(flat).reshape(batch, n, L)

    t0 = time.time()
    tab = kzg.lagrange_fb_table()
    log(f"msm fixed-base table build (n={n}, c={tab.c}): {time.time()-t0:.1f}s "
        f"({tab.table.shape[0]} rows, {tab.table.nbytes/1e9:.2f} GB)")

    t0 = time.time()
    out = kzg.commit_evals_batch(sc)
    log(f"msm compile+first: {time.time()-t0:.1f}s")

    times = []
    for _ in range(iters):
        t0 = time.time()
        out = kzg.commit_evals_batch(sc)
        times.append(time.time() - t0)
    t = min(times)
    pps = batch * n / t

    # spot-check one commitment against the host oracle on a small prefix
    # (packed into the same (batch, n, L) shape as the timed calls so no
    # second XLA compile is triggered)
    from uzkge_tpu.curve.bn254 import g1_msm
    k = 256
    small = flat[:k] + [0] * (n - k)
    probe = fr_ctx.to_mont_limbs(small * batch).reshape(batch, n, L)
    got = kzg.commit_evals_batch(probe)[0]
    want = g1_msm(kzg._lagrange_points[:k], small[:k])
    assert got == want, "MSM mismatch vs host oracle"
    log(f"msm n={n} batch={batch}: {t*1e3:.1f} ms -> {pps:,.0f} points/s (oracle ok)")
    return pps


def bench_ntt_cpu(n=131072):
    """Single-core C NTT (native/hostmath.c) -> per-socket baseline."""
    from uzkge_tpu import native_host as nh

    t, bf = nh.ntt_radix2_mont_bench(n)
    core = bf / t
    log(f"ntt cpu single-core n={n}: {t*1e3:.1f} ms -> {core/1e6:.1f} M bf/s "
        f"(x16 socket baseline: {core*16/1e6:.0f} M bf/s)")
    return core * 16


def bench_prove_52(iters=2):
    """52-card shuffle proof wall-clock (the BASELINE north star), steady
    state after one warmup, proof verified.  The refreshed proving key is a
    deterministic function of (n_cards, apk, embedded SRS) and is persisted
    on disk after the first build (utils/params_cache) — the same params-
    persistence the reference ships as its parameters/ artifacts."""
    import random
    from uzkge_tpu.shuffle.app import (
        gen_shuffle_prover_params, prove_shuffle, verify_shuffle, Keypair,
        aggregate_keys, mask,
    )
    from uzkge_tpu.curve import babyjubjub as bjj
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.shuffle.sdk import index_to_point
    from uzkge_tpu.plonk.indexer import ProverParams, refresh_prover_params_public_key
    from uzkge_tpu.utils.params_cache import load_pp, save_pp, shuffle_pp_cache_path

    rng = random.Random(7)
    keys = [Keypair.generate(rng) for _ in range(4)]
    apk = aggregate_keys([k.public for k in keys])

    cache_path = shuffle_pp_cache_path(52, apk)
    t0 = time.time()
    pp = load_pp(cache_path, ProverParams)
    if pp is not None:
        kzg = load_srs(pp.n)  # SRS size from the cached params' own domain
        log(f"prove52 params (disk cache): {time.time()-t0:.1f}s")
    else:
        pp, cs, kzg = gen_shuffle_prover_params(52)
        log(f"prove52 params (indexer): {time.time()-t0:.1f}s")
        t0 = time.time()
        refresh_prover_params_public_key(pp, cs, kzg, apk)
        log(f"prove52 pk refresh: {time.time()-t0:.1f}s")
        try:
            save_pp(cache_path, pp)
            log("prove52 params cached to disk")
        except Exception as e:  # cache is best-effort
            log(f"prove52 params cache save failed: {e!r}")
    cards = [index_to_point(i) for i in range(52)]
    deck = [mask(rng, apk, c, rng.randrange(1, bjj.ORDER))[0] for c in cards]

    t0 = time.time()
    proof, outputs = prove_shuffle(rng, apk, deck, pp, kzg)
    log(f"prove52 warmup (compile): {time.time()-t0:.1f}s")

    from uzkge_tpu.utils import stagetimer

    times = []
    best_stages = None
    for _ in range(iters):
        stagetimer.reset()
        t0 = time.time()
        proof, outputs = prove_shuffle(rng, apk, deck, pp, kzg)
        dt = time.time() - t0
        if not times or dt < min(times):
            best_stages = stagetimer.snapshot()
            best_stages["unaccounted"] = round(dt - sum(best_stages.values()), 3)
        times.append(dt)
    lat = min(times)
    ok = verify_shuffle(pp.verifier_params, kzg, deck, outputs, proof)
    log(f"prove52 latency: {lat:.2f}s (best of {iters}), verify={ok}")
    log(f"prove52 stages: {json.dumps(best_stages)}")
    assert ok, "52-card proof failed verification"
    return lat, best_stages


def bench_ntt(n=131072, batch=4, iters=3):
    import math
    import random
    from uzkge_tpu.ntt.ntt import get_domain
    from uzkge_tpu.ff.jax_field import fr_ctx, L
    from uzkge_tpu.constants.bn254 import R_MOD

    dom = get_domain(n)
    rng = random.Random(1)
    data = fr_ctx.to_mont_limbs([rng.randrange(R_MOD) for _ in range(batch * n)]).reshape(
        batch, n, L
    )
    t0 = time.time()
    out = dom.fft_batch(data)
    jax.block_until_ready(out)
    log(f"ntt compile+first: {time.time()-t0:.2f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = dom.fft_batch(data)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    t = min(times)
    bfs = batch * (n // 2) * int(math.log2(n)) / t
    # correctness oracle: the first row's evaluations at 4 domain points vs
    # an exact host Horner (a wrong-answer NTT must not publish a rate)
    import numpy as np

    got = fr_ctx.from_mont_limbs(np.asarray(out[0]))
    row = fr_ctx.from_mont_limbs(np.asarray(data[0]))
    w = dom.elements()
    for j in (0, 1, n // 2 + 3, n - 1):
        exp = 0
        for c in reversed(row):
            exp = (exp * w[j] + c) % R_MOD
        assert got[j] == exp, f"NTT mismatch vs host Horner at {j}"
    log(f"ntt n={n} batch={batch}: {t*1e3:.1f} ms -> {bfs:,.0f} butterflies/s (oracle ok)")
    return bfs


def _stage(name, fn, budget_frac):
    if elapsed() > BUDGET_S * budget_frac:
        log(f"{name}: skipped (elapsed {elapsed():.0f}s > budget)")
        return None
    try:
        return fn()
    except Exception as e:
        log(f"{name} failed: {e!r}")
        return None


def main():
    platform = jax.devices()[0].platform
    log(f"platform: {platform}, devices: {jax.devices()}")
    pps = _stage("msm", bench_msm, 1.0)
    ntt_bfs = _stage("ntt", bench_ntt, 0.9)
    ntt_cpu = _stage("ntt_cpu", bench_ntt_cpu, 0.9)
    prove = _stage("prove52", bench_prove_52, 0.55)
    lat, stages = prove if prove else (None, None)
    print(
        json.dumps(
            {
                "metric": "msm_points_per_sec_16384_per_chip",
                "value": round(pps) if pps else 0,
                "unit": "points/s",
                "vs_baseline": round(pps / CPU_BASELINE_MSM_PPS, 3) if pps else 0,
                "proof_latency_s_52cards": round(lat, 3) if lat else None,
                "ntt_butterflies_per_sec": round(ntt_bfs) if ntt_bfs else None,
                "ntt_cpu_socket_baseline": round(ntt_cpu) if ntt_cpu else None,
                "ntt_vs_baseline": round(ntt_bfs / ntt_cpu, 3) if (ntt_bfs and ntt_cpu) else None,
                "stage_breakdown": stages,
            }
        )
    )


if __name__ == "__main__":
    main()
