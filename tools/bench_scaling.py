#!/usr/bin/env python3
"""Proof-batch / sharded-kernel scaling measurements (BASELINE config 5).

Usage: python tools/bench_scaling.py [--devices 8] [--proofs 8]

Runs on the virtual CPU mesh (xla_force_host_platform_device_count) when no
multi-chip TPU is attached, which validates the dp/pts sharding end-to-end
and measures the *overhead* of the multi-device path; it cannot demonstrate
wall-clock speedup (all virtual devices share the host cores).  On a real
TPU pod slice the same code paths ride ICI.  Results + analysis: SCALING.md.

Measures:
  1. prove_shuffle_batch: P independent small proofs round-robined across
     devices (parallel/batch.py) vs the same P proofs on one device.
  2. sharded_msm_batch: one commit-MSM call with the proof axis sharded
     across the mesh vs single-device msm_chain.
  3. ShardedNTT four-step vs single-device domain at n = 2^14.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--devices", type=int, default=8)
ap.add_argument("--proofs", type=int, default=8)
ap.add_argument("--msm-n", type=int, default=1024)
ap.add_argument("--stages", default="prover,msm,ntt",
                help="comma list: prover,msm,ntt (the 8-thread prover "
                     "compile can exhaust XLA:CPU JIT memory on small hosts)")
ap.add_argument("--ntt-n", type=int, default=16384)
args = ap.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

import jax  # noqa: E402

# Force the virtual CPU mesh BEFORE any backend query initializes the
# (possibly single-chip) TPU platform.  Opt into real chips explicitly.
if not os.environ.get("UZKGE_SCALING_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import random  # noqa: E402

import uzkge_tpu.backend  # noqa: E402,F401
from uzkge_tpu.constants.bn254 import R_MOD  # noqa: E402
from uzkge_tpu.ff.jax_field import fr_ctx, fq_ctx, L  # noqa: E402

print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}", flush=True)


def timeit(fn, iters=3):
    fn()  # warm/compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


# ---- 1. proof-batch prover ------------------------------------------------
def bench_prover_batch():
    import jax.numpy as jnp

    from uzkge_tpu.pcs.kzg import KZG
    from uzkge_tpu.plonk.cs import TurboCS
    import uzkge_tpu.plonk.gadgets  # noqa: F401
    from uzkge_tpu.plonk.indexer import indexer
    from uzkge_tpu.plonk.prover import prover
    from uzkge_tpu.utils.transcript import Transcript

    # small-but-real TurboPLONK proof (the per-proof host pipeline is the
    # same as a 52-card proof; only the domain is smaller)
    cs = TurboCS()
    v1 = cs.new_variable(1)
    v2 = cs.new_variable(2)
    v3 = cs.new_variable(3)
    cs.insert_add_gate(v1, v2, v3)
    cs.pad(min_size=64)
    witness = cs.get_and_clear_witness()
    kzg = KZG.setup_insecure(2 * cs.size + 10, tau=987654321, domain_n=cs.size)
    pp = indexer(cs, kzg, with_shuffle=False)

    def prove_one(seed):
        rng = random.Random(seed)
        return prover(rng, Transcript(b"scale"), kzg, cs, pp, witness)

    P = args.proofs
    t1 = timeit(lambda: [prove_one(i) for i in range(P)], iters=2)

    from concurrent.futures import ThreadPoolExecutor

    from uzkge_tpu.parallel.batch import _pp_for_device

    devs = jax.devices()

    def prove_on(i):
        dev = devs[i % len(devs)]
        with jax.default_device(dev):
            pp_d = _pp_for_device(pp, dev)
            rng = random.Random(i)
            return prover(rng, Transcript(b"scale"), kzg, cs, pp_d, witness)

    def batch_run():
        with ThreadPoolExecutor(max_workers=len(devs)) as ex:
            return list(ex.map(prove_on, range(P)))

    tN = timeit(batch_run, iters=2)
    print(f"prover-batch P={P}: 1-dev {t1:.2f}s ({P/t1:.2f} proofs/s), "
          f"{len(devs)}-dev {tN:.2f}s ({P/tN:.2f} proofs/s), "
          f"speedup {t1/tN:.2f}x", flush=True)
    return {"P": P, "t_1dev": t1, "t_ndev": tN, "speedup": t1 / tN}


# ---- 2. dp-sharded MSM ----------------------------------------------------
def bench_msm_batch():
    import jax.numpy as jnp

    from uzkge_tpu.curve.bn254 import G1_GEN, g1_mul
    from uzkge_tpu.msm.fixed_base import msm_chain
    from uzkge_tpu.parallel.sharded import make_mesh, sharded_msm_batch

    rng = random.Random(3)
    n, P = args.msm_n, args.proofs
    pts = [g1_mul(G1_GEN, rng.randrange(1, R_MOD)) for _ in range(64)] * (n // 64)
    x_v = jnp.moveaxis(fq_ctx.to_mont_limbs([p[0] for p in pts]).reshape(n, L), -1, 0)
    y_v = jnp.moveaxis(fq_ctx.to_mont_limbs([p[1] for p in pts]).reshape(n, L), -1, 0)
    sc = fr_ctx.to_mont_limbs(
        [rng.randrange(R_MOD) for _ in range(P * n)]
    ).reshape(P, n, L)

    single = jax.jit(lambda s: msm_chain(x_v, y_v, s))
    t1 = timeit(lambda: jax.block_until_ready(single(sc)))
    mesh = make_mesh()
    tN = timeit(lambda: jax.block_until_ready(sharded_msm_batch(mesh, x_v, y_v, sc)))
    print(f"msm-batch n={n} P={P}: 1-dev {t1*1e3:.0f}ms, "
          f"{mesh.devices.size}-dev(dp) {tN*1e3:.0f}ms, speedup {t1/tN:.2f}x",
          flush=True)
    return {"n": n, "P": P, "t_1dev": t1, "t_ndev": tN, "speedup": t1 / tN}


# ---- 3. four-step sharded NTT --------------------------------------------
def bench_ntt():
    from uzkge_tpu.ntt.ntt import get_domain
    from uzkge_tpu.parallel.sharded import ShardedNTT, make_mesh

    rng = random.Random(4)
    n = args.ntt_n
    data = fr_ctx.to_mont_limbs([rng.randrange(R_MOD) for _ in range(n)])
    dom = get_domain(n)
    t1 = timeit(lambda: jax.block_until_ready(dom.fft(data)))
    sntt = ShardedNTT(n, make_mesh())
    tN = timeit(lambda: jax.block_until_ready(sntt.fft(data)))
    print(f"ntt n={n}: 1-dev {t1*1e3:.0f}ms, four-step {tN*1e3:.0f}ms, "
          f"speedup {t1/tN:.2f}x", flush=True)
    return {"n": n, "t_1dev": t1, "t_ndev": tN, "speedup": t1 / tN}


if __name__ == "__main__":
    import json

    stages = set(args.stages.split(","))
    out = {
        "devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }
    if "prover" in stages:
        out["prover_batch"] = bench_prover_batch()
    if "msm" in stages:
        out["msm_batch"] = bench_msm_batch()
    if "ntt" in stages:
        out["ntt_four_step"] = bench_ntt()
    print(json.dumps(out))
