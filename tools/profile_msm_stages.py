#!/usr/bin/env python3
"""Per-stage timing of the batch-affine fixed-base MSM at production shape."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import uzkge_tpu.backend  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp


def t_read(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import random
    from uzkge_tpu.gen_params import load_srs
    from uzkge_tpu.ff.jax_field import fr_ctx, L
    from uzkge_tpu.constants.bn254 import R_MOD
    from uzkge_tpu.msm import fixed_base as fb
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from uzkge_tpu.ff.pallas_field import pallas_call

    n, P = 16384, 8
    kzg = load_srs(n)
    t0 = time.time()
    tab = kzg.lagrange_fb_table()
    print(f"table build: {time.time()-t0:.1f}s c={tab.c}", flush=True)
    W, D, K = tab.W, tab.D, tab.W * n

    rng = random.Random(42)
    flat = [rng.randrange(R_MOD) for _ in range(P * n)]
    sc = fr_ctx.to_mont_limbs(flat).reshape(P, n, L)

    # --- full path
    t = t_read(lambda: tab._msm_jit(tab.table, sc))
    print(f"full msm jit: {t*1e3:.1f} ms", flush=True)

    # --- digits only
    dig_jit = jax.jit(lambda s: jnp.moveaxis(
        fb._scalars_to_digits(s, tab.c, tab.bits), -1, 1).reshape(P, K).astype(jnp.int32))
    t = t_read(dig_jit, sc)
    print(f"digits: {t*1e3:.1f} ms", flush=True)
    d_t = dig_jit(sc)

    # --- select only
    TK = 128

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

    sel_jit = jax.jit(select)
    t = t_read(sel_jit, tab.table, d_t)
    print(f"select: {t*1e3:.1f} ms ({tab.table.nbytes/1e9:.2f} GB table)", flush=True)
    x, y, inf = sel_jit(tab.table, d_t)

    # --- one affine level at level-0 size
    lj = jax.jit(fb._affine_level)
    t = t_read(lj, x, y, inf)
    print(f"level0 (C={P*K//2}): {t*1e3:.1f} ms", flush=True)

    # --- batch inversion alone at level-0 size
    C = P * K // 2
    den = x.reshape(L, P * K)[:, :C]
    inv_jit = jax.jit(fb.pbatch_inv_fq_fast)
    t = t_read(inv_jit, den)
    print(f"pbatch_inv_fast (C={C}): {t*1e3:.1f} ms", flush=True)

    # --- all levels + tail (everything after select)
    def rest(x, y, inf):
        Kc = x.shape[2]
        while Kc > fb.TAIL:
            x, y, inf = fb._affine_level(x, y, inf)
            Kc //= 2
        per = Kc
        S = fb._pick_S(per)
        J = per // S
        d_plane = jnp.where(inf == 0, 1, 0).astype(jnp.int32)
        d_lay = jnp.moveaxis(fb._to_scan_layout(d_plane, S), 1, 0).reshape(S, P * J)
        gx = jnp.moveaxis(fb._to_scan_layout(x, S), 2, 1).reshape(L, S, P * J)
        gy = jnp.moveaxis(fb._to_scan_layout(y, S), 2, 1).reshape(L, S, P * J)
        return fb._reduce_leaves(gx, gy, d_lay, S, P, J)

    rj = jax.jit(rest)
    t = t_read(rj, x, y, inf)
    print(f"levels+tail: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
