"""Per-pass profile of the Pallas NTT (VERDICT r4 task 4: find the 8.6x gap
between the measured 34.6 ms n=2^17 batch-4 NTT and its ~4 ms mul-rate
ceiling).

Runs the recursion EAGERLY with a timing wrapper around every _direct_pass,
so each Pallas pass and the XLA glue (transposes/reshapes) are timed
separately on the real chip.  Also measures the raw in-kernel Montgomery mul
rate and a bare XLA transpose at the inter-pass shape for reference.

Run on the chip:  python tools/profile_ntt.py [n] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import uzkge_tpu.backend  # noqa: F401
from uzkge_tpu.ff.jax_field import L, fr_ctx
from uzkge_tpu.constants.bn254 import R_MOD
import uzkge_tpu.ntt.pallas_ntt as pntt


def t(fn, *a):
    for x in a:
        jax.block_until_ready(x)
    t0 = time.time()
    r = fn(*a)
    jax.block_until_ready(r)
    return r, time.time() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("backend:", jax.default_backend())
    import random

    rng = random.Random(3)
    from uzkge_tpu.ntt.ntt import get_domain

    dom = get_domain(n)
    data = fr_ctx.to_mont_limbs([rng.randrange(R_MOD) for _ in range(B * n)]).reshape(
        B, n, L
    )

    # steady-state full jitted call (the bench number)
    out = jax.block_until_ready(dom.fft_batch(data))
    times = []
    for _ in range(5):
        t0 = time.time()
        out = jax.block_until_ready(dom.fft_batch(data))
        times.append(time.time() - t0)
    total = min(times)
    import math

    bfs = B * (n // 2) * int(math.log2(n)) / total
    print(f"jitted fft_batch: {total*1e3:.2f} ms  ({bfs/1e6:.1f}M bf/s)")

    # ---- per-pass breakdown: capture each _direct_pass call's (args, plan)
    # during one traced run, then time each AS ITS OWN JIT, steady state
    # (the naive eager form recompiles the pallas_call every invocation —
    # a fresh functools.partial defeats the jit cache — and times compiles).
    xv = jnp.moveaxis(data, -1, 0)  # (L, B, n)
    plan = dom._pplan_fwd
    pre = None
    post = None

    calls = []
    orig = pntt._direct_pass

    def capture(x, plan_, pre_, post_, const_):
        calls.append((x, plan_, pre_, post_, const_))
        return orig(x, plan_, pre_, post_, const_)

    pntt._direct_pass = capture
    try:
        r = jax.block_until_ready(
            pntt.fft_mid(xv[:, :, :, None], plan, pre=pre, post=post)
        )
    finally:
        pntt._direct_pass = orig

    pass_sum = 0.0
    for x, plan_, pre_, post_, const_ in calls:
        fn = jax.jit(
            lambda v, p=plan_, pr=pre_, po=post_, c=const_: orig(v, p, pr, po, c)
        )
        jax.block_until_ready(fn(x))  # compile
        best = min(t(fn, x)[1] for _ in range(3))
        lads = (pre_ is not None) + (post_ is not None)
        print(f"  direct S={plan_['S']:5d} in={str(x.shape):22s} ladders={lads}"
              f"  {best*1e3:7.2f} ms")
        pass_sum += best
    print(f"passes total: {pass_sum*1e3:.2f} ms of {total*1e3:.2f} ms jitted "
          f"-> glue (transposes/reshapes): {(total-pass_sum)*1e3:.2f} ms")

    # ---- bare XLA transpose at the top inter-pass shape
    if "S2" in plan:
        S2, S1 = plan["S2"], plan["S1"]
        a = r.reshape(L, B, S2, S1, 1)
        tr = jax.jit(lambda v: jnp.swapaxes(v, 2, 3).reshape(L, B, S1, S2))
        jax.block_until_ready(tr(a))
        t0 = time.time()
        for _ in range(5):
            jax.block_until_ready(tr(a))
        print(f"bare jitted top transpose ({S2}x{S1}): {(time.time()-t0)/5*1e3:.2f} ms")

    # ---- raw in-kernel mul rate at the same footprint
    from uzkge_tpu.ff.pallas_rows import rfr
    from uzkge_tpu.ff.pallas_field import pallas_call
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    REP = 17  # ~ the muls/element of one full NTT (log2(n)/2)
    G = 512

    def mulchain_kernel(x_ref, o_ref):
        x = [x_ref[i] for i in range(L)]
        y = x
        for _ in range(REP):
            y = rfr.mul(y, x)
        for i in range(L):
            o_ref[i] = y[i]

    tot = B * n
    spec = pl.BlockSpec((L, G), lambda i: (0, i), memory_space=pltpu.VMEM)
    mc = jax.jit(
        lambda v: pallas_call(
            mulchain_kernel,
            out_shape=jax.ShapeDtypeStruct((L, tot), jnp.uint32),
            grid=(tot // G,),
            in_specs=[spec],
            out_specs=spec,
        )(v)
    )
    flat = xv.reshape(L, tot)
    jax.block_until_ready(mc(flat))
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(mc(flat))
    dt = (time.time() - t0) / 3
    print(f"raw mul rate: {REP*tot/dt/1e9:.2f}e9 muls/s  "
          f"({dt*1e3:.2f} ms for {REP}x{tot} muls)")


if __name__ == "__main__":
    main()
