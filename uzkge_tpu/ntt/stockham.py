"""Stockham autosort radix-2 NTT core — the gather-free butterfly.

The round-1 NTT (ntt.py history) walked a `lax.scan` over stages, each doing
THREE gathers per element (lo index, hi index, twiddle index).  Gathers are
the worst primitive for the TPU vector memory model and made the kernel both
slow (~19M butterflies/s) and slow to compile (~120 s Mosaic).  The Stockham
formulation removes every gather:

    stage t (l = 2^t, m = n/2^(t+1)), natural-order in/out across all stages:
      a = x[.., :n/2], b = x[.., n/2:]          # contiguous halves
      y[.., j, 0, :] = a[j] + b[j]              # (m, 2, l) interleave
      y[.., j, 1, :] = w^(j*l) * (a[j] - b[j])

so each stage is ONE field mul + add/sub on whole arrays plus a reshape
(slice/concat — layout ops XLA handles natively), with the per-stage twiddle
a (m, 1)-broadcast constant.  log2(n) stages unroll at trace time (shapes
differ per stage), keeping the graph a few thousand ops — seconds to
compile, not minutes.

Data rides the vertical limb layout (ff.vfield): (L, ..., n) uint32 with the
batch*n axes on the 128-wide lanes — measured ~10x the horizontal layout's
mul throughput.  Reference semantics unchanged: ark-poly
Radix2EvaluationDomain natural-order evaluations
(uzkge/src/poly_commit/field_polynomial.rs:552-607).
"""

from typing import List

import numpy as np
import jax.numpy as jnp

from ..ff.jax_field import L
from ..ff.vfield import vfr


def stage_twiddles(master_mont, n: int, inverse: bool) -> List:
    """Per-stage twiddle tables from the domain's master power table
    ((n, L) horizontal Montgomery): stage t needs w^(±j*2^t) for
    j < n/2^(t+1), shaped (L, m, 1) for broadcast over the l axis."""
    out = []
    m, l = n // 2, 1
    while m >= 1:
        idx = (np.arange(m) * l) % n
        if inverse:
            idx = (-idx) % n
        tw = jnp.moveaxis(master_mont[idx], -1, 0)  # (L, m)
        out.append(tw[:, :, None])  # (L, m, 1)
        m //= 2
        l *= 2
    return out


def stockham_fft_v(xv, tws: List, f=vfr):
    """(L, n) vertical Montgomery limbs -> (L, n) natural-order NTT.
    Leading batch axes between L and n are supported via broadcasting
    (e.g. (L, B, n)).  `tws` from stage_twiddles (matching direction)."""
    n = xv.shape[-1]
    lead = xv.shape[1:-1]
    m, l = n // 2, 1
    for t, tw in enumerate(tws):
        half = xv[..., : n // 2]
        a_b_sum = f.add(half, xv[..., n // 2 :])
        a_b_diff = f.sub(half, xv[..., n // 2 :])
        if m > 1:
            d = a_b_diff.reshape((L,) + lead + (m, l))
            twb = tw.reshape((L,) + (1,) * len(lead) + (m, 1))
            tvals = f.mul(d, twb).reshape((L,) + lead + (n // 2,))
        else:
            tvals = a_b_diff  # last stage twiddle is w^0 = 1
        s = a_b_sum.reshape((L,) + lead + (m, 1, l))
        tv = tvals.reshape((L,) + lead + (m, 1, l))
        xv = jnp.concatenate([s, tv], axis=-2).reshape((L,) + lead + (n,))
        m //= 2
        l *= 2
    return xv
