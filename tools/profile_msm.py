"""Per-stage profile of the batch-affine fixed-base MSM (VERDICT r5 task 5:
write down the muls/point budget and find where the measured time goes).

Replays FixedBaseMSM._msm_affine_impl stage by stage, eagerly, with
block_until_ready timers: recode, select, each affine level, each fold8
round, the non-8-power tail, and the host extract.  Run on the chip:

    python tools/profile_msm.py [n] [P] [c]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import uzkge_tpu.backend  # noqa: F401
from uzkge_tpu.ff.jax_field import L, fr_ctx
from uzkge_tpu.constants.bn254 import R_MOD


def t(fn, *a):
    for x in a:
        jax.block_until_ready(x)
    t0 = time.time()
    r = fn(*a)
    jax.block_until_ready(r)
    return r, time.time() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print("backend:", jax.default_backend())
    import functools
    import random

    import uzkge_tpu.msm.fixed_base as fb
    from uzkge_tpu.curve.bn254 import G1_GEN, g1_mul

    rng = random.Random(1)
    pts = [g1_mul(G1_GEN, rng.randrange(1, R_MOD)) for _ in range(64)]
    # replicate to n points (profiling only cares about shapes, not values)
    pts = (pts * ((n + 63) // 64))[:n]
    t0 = time.time()
    msm = fb.FixedBaseTable(pts, c=c)
    print(f"table build: {time.time()-t0:.1f}s  (W={msm.W} D={msm.D} "
          f"K={msm.W*n} table={msm.table.nbytes/2**30:.2f} GiB)")

    scal = fr_ctx.to_mont_limbs(
        [rng.randrange(R_MOD) for _ in range(P * n)]
    ).reshape(P, n, L)

    # steady-state jitted whole-pipeline number first
    jax.block_until_ready(msm._msm_jit(msm.table, scal))
    times = []
    for _ in range(5):
        _, dt = t(lambda: msm._msm_jit(msm.table, scal))
        times.append(dt)
    total = min(times)
    print(f"jitted pipeline: {total*1e3:.2f} ms -> {P*n/total:,.0f} points/s")

    # ---- eager stage breakdown (second run of each stage = steady state)
    K = msm.W * n
    D = msm.D

    def stage(name, fn, *a):
        fn(*a)  # warm (compile)
        r, dt = t(fn, *a)
        print(f"  {name:28s} {dt*1e3:8.2f} ms")
        return r

    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from uzkge_tpu.ff.pallas_field import pallas_call

    digits = stage(
        "recode digits",
        jax.jit(functools.partial(fb._scalars_to_digits, c=c, bits=msm.bits)),
        scal,
    )
    d_t = jnp.moveaxis(digits, -1, 1).reshape(P, K).astype(jnp.int32)

    TK = min(128, K)

    def select(table, d_t):
        return pallas_call(
            functools.partial(fb._select_kernel, P, D),
            out_shape=(
                jax.ShapeDtypeStruct((L, P, K), jnp.uint32),
                jax.ShapeDtypeStruct((L, P, K), jnp.uint32),
                jax.ShapeDtypeStruct((P, K), jnp.uint32),
            ),
            grid=(K // TK,),
            in_specs=[
                pl.BlockSpec((D, 32, TK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, TK), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((L, P, TK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, P, TK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, TK), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
        )(table, d_t)

    x, y, inf = stage("select (table stream)", jax.jit(select), msm.table, d_t)

    Kc = K
    lvl = 0
    while Kc > fb.TAIL_M and lvl < fb.AFFINE_LEVELS:
        x, y, inf = stage(f"affine level {lvl} (K={Kc})", jax.jit(fb._affine_level), x, y, inf)
        Kc //= 2
        lvl += 1
    X, Y, Z = stage("to_projective", jax.jit(fb._to_projective), x, y, inf)
    while Kc % 8 == 0 and Kc // 8 >= fb.TAIL_M:
        X, Y, Z = stage(f"fold8 (K={Kc})", jax.jit(fb._fold8), X, Y, Z)
        Kc //= 8
    while Kc > fb.TAIL_M:
        from uzkge_tpu.ff.afield import afq_c

        h = Kc // 2

        def tailadd(X, Y, Z, h=h):
            A = (X[:, :, :h], Y[:, :, :h], Z[:, :, :h])
            B = (X[:, :, h:], Y[:, :, h:], Z[:, :, h:])
            return fb.padd_g(afq_c, A, B)

        X, Y, Z = stage(f"tail padd (K={Kc})", jax.jit(tailadd), X, Y, Z)
        Kc = h
    Xf = X.reshape(L, P * Kc)
    Yf = Y.reshape(L, P * Kc)
    Zf = Z.reshape(L, P * Kc)
    t0 = time.time()
    fb._extract_host(Xf, Yf, Zf, P)
    print(f"  {'host extract':28s} {(time.time()-t0)*1e3:8.2f} ms  (Kc={Kc})")


if __name__ == "__main__":
    main()
