#!/usr/bin/env python3
"""Per-chip kernel benchmark.  Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: Pippenger MSM throughput (points/s) over the embedded
n=16384 Lagrange SRS — the prover's dominant kernel.  Secondary numbers
(NTT butterflies/s, quotient-kernel eval rate) go to stderr.

vs_baseline is measured against a single-socket CPU arkworks MSM at
~2.0e6 points/s (typical rayon-parallel VariableBaseMSM on a modern
16-core socket for 2^14 points; the reference publishes no numbers —
BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import uzkge_tpu.backend  # noqa: F401

CPU_BASELINE_MSM_PPS = 2.0e6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_msm(n=16384, batch=8, iters=3):
    import random
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.msm.msm import MSMBases, _msm_device
    from uzkge_tpu.ff.jax_field import fr_ctx, L
    from uzkge_tpu.constants.bn254 import R_MOD

    kzg = load_srs(n)
    bases = MSMBases(kzg._lagrange_points, chunks=64)
    rng = random.Random(42)
    rows = [[rng.randrange(R_MOD) for _ in range(n)] for _ in range(batch)]
    flat = [s for row in rows for s in row]
    sc = fr_ctx.to_mont_limbs(flat).reshape(batch, n, L)

    t0 = time.time()
    out = _msm_device(bases.x, bases.y, sc, bases.chunks)
    jax.block_until_ready(out)
    log(f"msm compile+first: {time.time()-t0:.2f}s")

    times = []
    for _ in range(iters):
        t0 = time.time()
        out = _msm_device(bases.x, bases.y, sc, bases.chunks)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    t = min(times)
    pps = batch * n / t
    log(f"msm n={n} batch={batch}: {t*1e3:.1f} ms -> {pps:,.0f} points/s")
    return pps


def bench_ntt(n=131072, batch=4, iters=3):
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
    import math

    bfs = batch * (n // 2) * int(math.log2(n)) / t
    log(f"ntt n={n} batch={batch}: {t*1e3:.1f} ms -> {bfs:,.0f} butterflies/s")
    return bfs


def main():
    platform = jax.devices()[0].platform
    log(f"platform: {platform}, devices: {jax.devices()}")
    try:
        ntt_bfs = bench_ntt()
    except Exception as e:  # keep the headline metric alive
        log(f"ntt bench failed: {e!r}")
        ntt_bfs = None
    pps = bench_msm()
    print(
        json.dumps(
            {
                "metric": "msm_points_per_sec_16384_per_chip",
                "value": round(pps),
                "unit": "points/s",
                "vs_baseline": round(pps / CPU_BASELINE_MSM_PPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
