#!/usr/bin/env python3
"""Quick TPU microbench of the fixed-base MSM (tools/, not shipped in bench.py yet)."""
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

kzg = load_srs(n)
pts = kzg._lagrange_points[:n]
t0 = time.time()
tab = FixedBaseTable(pts)
jax.block_until_ready(tab.table)
print(f"table build n={n}: {time.time()-t0:.1f}s, rows={tab.table.shape}", flush=True)

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
    print(f"msm n={n} batch={batch}: {t*1e3:.1f} ms -> {batch*n/t:,.0f} points/s", flush=True)

# correctness spot check vs host pippenger on small prefix
from uzkge_tpu.msm.msm import host_msm
res = tab.msm_mont(sc[:1])
exp = host_msm(pts, rows[0])
print("match:", res[0] == exp, flush=True)
