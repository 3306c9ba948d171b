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


def stage_twiddles_strided(master_mont, n: int, size: int, stride: int,
                           inverse: bool) -> List:
    """Twiddles for a length-`size` sub-FFT whose root is w^stride (w = the
    order-n master root): stage t needs (w^stride)^(j*2^t)."""
    out = []
    m, l = size // 2, 1
    while m >= 1:
        idx = (np.arange(m) * l * stride) % n
        if inverse:
            idx = (-idx) % n
        tw = jnp.moveaxis(master_mont[idx], -1, 0)  # (L, m)
        out.append(tw)
        m //= 2
        l *= 2
    return out


def _axis2_fft(xv, tws: List, f=vfr):
    """Stockham butterfly over axis -2 of (L, *lead, S, nl) — the lane axis
    (nl, large) rides along untouched, so no stage ever puts a small dim on
    the 128-lane axis (the failure mode of the flat last-axis form)."""
    S = xv.shape[-2]
    nl = xv.shape[-1]
    lead = xv.shape[1:-2]
    m, l = S // 2, 1
    for tw in tws:
        a = xv[..., : S // 2, :]
        b = xv[..., S // 2 :, :]
        s = f.add(a, b)
        d = f.sub(a, b)
        if m > 1:
            d5 = d.reshape((L,) + lead + (m, l, nl))
            twb = tw.reshape((L,) + (1,) * len(lead) + (m, 1, 1))
            tvals = f.mul(d5, twb).reshape((L,) + lead + (S // 2, nl))
        else:
            tvals = d
        s5 = s.reshape((L,) + lead + (m, 1, l, nl))
        t5 = tvals.reshape((L,) + lead + (m, 1, l, nl))
        xv = jnp.concatenate([s5, t5], axis=-3).reshape((L,) + lead + (S, nl))
        m //= 2
        l *= 2
    return xv


def fourstep_plan(master_mont, n: int, inverse: bool, n1: int = None):
    """Precomputed tables for the four-step factorization n = n1*n2:

        x[j1 + n1*j2]  --FFT_n2 over j2-->  * w^(j1*k2)  --transpose-->
        --FFT_n1 over j1-->  X[k2 + n2*k1]

    Both inner FFTs run over axis -2 with the other factor (>= 128 when
    possible) on the lane axis, so every intermediate keeps full 128-lane
    tiles — the flat radix-2 form's early stages put l in {1,2,4,...} on the
    lane axis, padding temporaries up to 128x (measured: an HBM OOM at the
    prover's 131072-point quotient domain)."""
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)  # n1 <= n2
    n2 = n // n1
    tws2 = stage_twiddles_strided(master_mont, n, n2, n1, inverse)
    tws1 = stage_twiddles_strided(master_mont, n, n1, n2, inverse)
    idx = (np.outer(np.arange(n2), np.arange(n1))) % n  # j1*k2
    if inverse:
        idx = (-idx) % n
    T1 = jnp.moveaxis(master_mont[idx.reshape(-1)], -1, 0).reshape(L, n2, n1)
    return {"n1": n1, "n2": n2, "tws1": tws1, "tws2": tws2, "T1": T1}


def fourstep_fft_v(xv, plan, f=vfr):
    """(L, *lead, n) vertical Montgomery limbs -> natural-order NTT via the
    four-step factorization (same semantics as stockham_fft_v)."""
    n1, n2 = plan["n1"], plan["n2"]
    lead = xv.shape[1:-1]
    ones = (1,) * len(lead)
    a = xv.reshape((L,) + lead + (n2, n1))  # [j2, j1] = x[j1 + n1*j2]
    a = _axis2_fft(a, plan["tws2"], f)  # FFT over j2 -> [k2, j1]
    a = f.mul(a, plan["T1"].reshape((L,) + ones + (n2, n1)))
    a = jnp.swapaxes(a, -1, -2)  # [j1, k2]
    a = _axis2_fft(a, plan["tws1"], f)  # FFT over j1 -> [k1, k2]
    return a.reshape((L,) + lead + (n1 * n2,))


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
