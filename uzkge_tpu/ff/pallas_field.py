"""Pallas TPU wrappers for the row-level field kernels.

`pmul(ctx, a, b)` is a drop-in Montgomery multiply on vertical (L, *batch)
arrays that runs the whole CIOS chain VMEM-resident (pallas_rows.RowCtx.mul),
measured ~2.3e9 muls/s on one v5e chip vs ~3.5e7 for the whole-array XLA
form (whose fusion boundaries force HBM round trips).

On non-TPU platforms (the CPU test mesh) the same call dispatches to the
vfield whole-array kernels — identical math, XLA-compiled, no Pallas
interpreter overhead.  The larger fused kernels (the MSM
point-tree reduction in msm/fixed_base.py) follow the same TPU/CPU
dual-dispatch pattern through `use_pallas()`; the NTT core (ntt/stockham.py)
is gather-free whole-array vfield math and needs no Pallas form.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jax_field import L
from .pallas_rows import RowCtx, rfr, rfq


# Snapshot once at import: jitted callers bake the flag into their traces,
# so flipping the env var mid-process would give inconsistent dispatch
# between fresh and cached compilations.  Set UZKGE_PALLAS before importing
# uzkge_tpu (the test suite does, via conftest environment setup).
_INTERPRET = os.environ.get("UZKGE_PALLAS", "") == "interpret"


def interpret_mode() -> bool:
    """UZKGE_PALLAS=interpret runs the *actual* Pallas kernel bodies through
    the Pallas interpreter on any backend — slow, but it exercises the TPU
    kernel code (refs, block specs, in-kernel loops) in the CPU test suite
    instead of the vfield fallback.  Snapshot at import (see _INTERPRET)."""
    return _INTERPRET


def use_pallas() -> bool:
    return interpret_mode() or jax.default_backend() == "tpu"


def pallas_call(*args, **kwargs):
    """pl.pallas_call with the interpret flag injected (all kernel call
    sites route through this so UZKGE_PALLAS=interpret covers them)."""
    if interpret_mode():
        kwargs.setdefault("interpret", True)
    return pl.pallas_call(*args, **kwargs)


def _pad_lanes(x, n_pad):
    if x.shape[-1] == n_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - x.shape[-1])]
    return jnp.pad(x, pad)


def _pick_block(n: int, max_blk: int = 4096) -> int:
    blk = 256
    while blk < max_blk and blk < n:
        blk *= 2
    return blk


def _mul_kernel(ctx: RowCtx, a_ref, b_ref, o_ref):
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    out = ctx.mul(a, b)
    for i in range(L):
        o_ref[i, :] = out[i]


def _pmul_flat(ctx: RowCtx, a, b):
    n = a.shape[1]
    blk = _pick_block(n)
    n_pad = ((n + blk - 1) // blk) * blk
    a = _pad_lanes(a, n_pad)
    b = _pad_lanes(b, n_pad)
    out = pallas_call(
        functools.partial(_mul_kernel, ctx),
        out_shape=jax.ShapeDtypeStruct((L, n_pad), jnp.uint32),
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(a, b)
    return out[:, :n]


def _vctx(ctx: RowCtx):
    from .vfield import vfr, vfq

    return vfr if ctx.p == rfr.p else vfq


def pmul(ctx: RowCtx, a, b):
    """Montgomery mul on (L, *batch) uint32 arrays: VMEM-resident CIOS on
    TPU, vfield whole-array kernels elsewhere."""
    if not use_pallas():
        return _vctx(ctx).mul(a, b)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(L, -1)
    b = jnp.broadcast_to(b, shape).reshape(L, -1)
    return _pmul_flat(ctx, a, b).reshape(shape)


def pmul_fr(a, b):
    return pmul(rfr, a, b)


def pmul_fq(a, b):
    return pmul(rfq, a, b)
