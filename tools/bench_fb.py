#!/usr/bin/env python3
"""Microbench of the fixed-base MSM table kernels (msm/fixed_base.py).

Usage: python tools/bench_fb.py [n] [batch] [c]

Works for any power-of-two n: uses the embedded Lagrange basis when one
exists for n (4096/8192/16384), otherwise falls back to the contiguous SRS
power prefix (padded SRS has ~2051 powers) or, beyond that, multiples of the
generator.  Reports both the device-kernel rate (tab._msm_jit, excludes host
affine extraction) and the end-to-end public `msm_mont` rate; the full first
row is checked against the host Pippenger oracle (slow at n=16384 — pass a
smaller n for a quick check).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import uzkge_tpu.backend  # noqa
print("platform:", jax.default_backend(), flush=True)

import random
from uzkge_tpu.gen_params import load_srs
from uzkge_tpu.msm.fixed_base import FixedBaseTable
from uzkge_tpu.ff.jax_field import fr_ctx, L
from uzkge_tpu.constants.bn254 import R_MOD
from uzkge_tpu.pcs.kzg import _fb_window

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
c = int(sys.argv[3]) if len(sys.argv) > 3 else _fb_window(n)

kzg = load_srs(n if n in (4096, 8192, 16384) else 4096)
pts = getattr(kzg, "_lagrange_points", None)
if pts is not None and len(pts) >= n:
    pts = pts[:n]
else:
    pts = kzg.g1_powers[: kzg.max_contig]
    if len(pts) < n:  # extend with generator multiples for bench purposes
        from uzkge_tpu.curve.bn254 import G1_GEN, g1_mul

        pts = list(pts) + [g1_mul(G1_GEN, 3 + i) for i in range(n - len(pts))]
    pts = pts[:n]
    print(f"(no Lagrange bin for n={n}; using SRS powers/generator multiples)", flush=True)

t0 = time.time()
tab = FixedBaseTable(pts, c=c)
jax.block_until_ready(tab.table)
print(f"table build n={n} c={c}: {time.time()-t0:.1f}s, rows={tab.table.shape} "
      f"({tab.table.nbytes/1e9:.2f} GB)", flush=True)

rng = random.Random(42)
rows = [[rng.randrange(R_MOD) for _ in range(n)] for _ in range(batch)]
sc = fr_ctx.to_mont_limbs([s for r in rows for s in r]).reshape(batch, n, L)

t0 = time.time()
out = tab._msm_jit(tab.table, sc)
jax.block_until_ready(out)
print(f"msm compile+first: {time.time()-t0:.2f}s", flush=True)
for _ in range(3):
    t0 = time.time()
    out = tab._msm_jit(tab.table, sc)
    jax.block_until_ready(out)
    t = time.time() - t0
    print(f"msm(kernel-only) n={n} batch={batch}: {t*1e3:.1f} ms "
          f"-> {batch*n/t:,.0f} points/s", flush=True)
for _ in range(2):
    t0 = time.time()
    res_all = tab.msm_mont(sc)
    t = time.time() - t0
    print(f"msm(end-to-end)  n={n} batch={batch}: {t*1e3:.1f} ms "
          f"-> {batch*n/t:,.0f} points/s", flush=True)

# correctness: full first row vs the host Pippenger oracle (O(n) host work)
from uzkge_tpu.msm.msm import host_msm
exp = host_msm(pts, rows[0])
print("match:", res_all[0] == exp, flush=True)
