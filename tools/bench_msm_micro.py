#!/usr/bin/env python3
"""MSM kernel microbenchmarks on the current backend.

Measures the building blocks that set the fixed-base MSM ceiling:
  * dispatch: per-call latency of a trivial jitted op (tunnel overhead)
  * mulstream: chained Montgomery muls in one Pallas kernel (VPU peak proxy)
  * leafreduce: the signed-digit leaf scan kernel (complete mixed adds)
    at the production shape, per interleave factor
  * select: the table-row selection variants at the c=4 production shape

Run on the TPU host: python tools/bench_msm_micro.py [stages...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import uzkge_tpu.backend  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_dispatch():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    print(f"dispatch: {(time.perf_counter()-t0)/n*1e6:.0f} us/call (pipelined x{n})")
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    print(f"dispatch: {min(ts)*1e6:.0f} us/call (synchronous)")


def bench_mulstream(G=1024, total=1048576, K=64):
    """Chained Montgomery muls in one Pallas kernel, three trace forms:
    rows   — list-of-16-limb-rows, fully unrolled (~1200 HLO/mul)
    arr    — (L, G) array form (afield), unrolled CIOS (~220 HLO/mul)
    arrc   — (L, G) array form (afield), fori_loop CIOS (~35 HLO/mul)

    NOTE on timing: with small totals the axon tunnel returns before the
    device finishes (block_until_ready is unreliable sub-ms); use >= 50 ms
    workloads and force a scalar readback."""
    from uzkge_tpu.ff.jax_field import L
    from uzkge_tpu.ff.pallas_rows import rfq
    from uzkge_tpu.ff.afield import afq, afq_c
    from uzkge_tpu.ff.pallas_field import pallas_call

    def kern_rows(x_ref, y_ref, o_ref):
        x = [x_ref[i, :] for i in range(L)]
        y = [y_ref[i, :] for i in range(L)]
        for _ in range(K):
            x = rfq.mul(x, y)
        for i in range(L):
            o_ref[i, :] = x[i]

    def make_arr_kern(f):
        def kern(x_ref, y_ref, o_ref):
            x = x_ref[:, :]
            y = y_ref[:, :]
            for _ in range(K):
                x = f.mul(x, y)
            o_ref[:, :] = x
        return kern

    spec = pl.BlockSpec((L, G), lambda i: (0, i), memory_space=pltpu.VMEM)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 16, (L, total), dtype=np.uint32))
    for name, kern in [("rows", kern_rows), ("arr", make_arr_kern(afq)),
                       ("arrc", make_arr_kern(afq_c))]:
        call = pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((L, total), jnp.uint32),
            grid=(total // G,), in_specs=[spec, spec], out_specs=spec)
        f = jax.jit(call)
        t0 = time.perf_counter()
        _ = np.asarray(f(x, x)[0, 0])
        comp = time.perf_counter() - t0
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(f(x, x)[0, 0])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"mulstream[{name}] K={K} total={total}: {t*1e3:.2f} ms -> "
              f"{K*total/t/1e9:.2f} G muls/s (compile {comp:.1f}s)")


def bench_leafreduce(P=8, n=16384, W=64, ils=(2, 4, 8, 16)):
    """Production c=4 shape: per = W*n leaves per MSM, P MSMs."""
    from uzkge_tpu.ff.jax_field import L
    from uzkge_tpu.msm import fixed_base as fb

    per = W * n
    S = fb._pick_S(per)
    J = per // S
    total = P * J
    rng = np.random.default_rng(1)
    gx = jnp.asarray(rng.integers(0, 1 << 16, (L, S, total), dtype=np.uint32))
    gy = jnp.asarray(rng.integers(0, 1 << 16, (L, S, total), dtype=np.uint32))
    d = jnp.asarray(rng.integers(-8, 9, (S, total), dtype=np.int32))
    for il in ils:
        fb.IL = il
        f = jax.jit(functools.partial(
            fb._scan_reduce_tpu, fb._scan_leaf_kernel, S))
        t0 = time.perf_counter()
        out = f((gx, gy), d=d)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t = timeit(lambda: f((gx, gy), d=d), iters=3, warmup=1)
        adds = S * total
        print(f"leafreduce IL={il} S={S} total={total}: {t*1e3:.1f} ms -> "
              f"{adds/t/1e6:.1f} M adds/s (compile {compile_s:.1f}s)")


def bench_select(P=8, n=16384, c=4):
    """Current streamed D-way select at the production shape vs a plain
    XLA gather of 64 B rows."""
    D = 1 << (c - 1)
    W = (254 + c - 1) // c
    per = W * n
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.integers(0, 1 << 16, (per * D, 32), dtype=np.uint16))
    mag = jnp.asarray(rng.integers(0, D + 1, (P, per), dtype=np.int32))

    def dway(table, mag):
        tabv = table.reshape(per, D, 32)
        rows = jnp.broadcast_to(tabv[:, 0, :][None], (P, per, 32))
        for dd in range(2, D + 1):
            rows = jnp.where((mag == dd)[..., None], tabv[None, :, dd - 1, :], rows)
        return rows

    f = jax.jit(dway)
    t = timeit(f, table, mag, iters=3, warmup=1)
    gb = table.nbytes * (D - 1) / 1e9
    print(f"select dway c={c} P={P}: {t*1e3:.1f} ms ({table.nbytes/1e9:.2f} GB table)")

    def gat(table, mag):
        idx = jnp.arange(per, dtype=jnp.int32)[None, :] * D + jnp.maximum(mag - 1, 0)
        return table[idx.reshape(-1)].reshape(P, per, 32)

    g = jax.jit(gat)
    t = timeit(g, table, mag, iters=3, warmup=1)
    print(f"select gather c={c} P={P}: {t*1e3:.1f} ms "
          f"({P*per*64/t/1e9:.1f} GB/s effective)")


def main():
    stages = sys.argv[1:] or ["dispatch", "mulstream", "leafreduce", "select"]
    print(f"devices: {jax.devices()}")
    for s in stages:
        globals()["bench_" + s]()


if __name__ == "__main__":
    main()
