"""VMEM-resident Pallas NTT: recursive four-step with fused scale ladders.

The round-3 NTT ran the Stockham butterflies as whole-array XLA ops
(ntt/stockham.py); the CIOS multiply's fori_loop and the per-stage
concatenates force HBM materialization, capping it at ~64M butterflies/s.
This module runs every butterfly stage inside Pallas kernels where the full
multiply chain is VMEM-resident (~1.1e9 Montgomery muls/s measured on v5e).

Structure (same math as stockham.fourstep_fft_v, applied recursively):

    FFT_S over axis -2 of (L, OUT, S, IN), root w^stride:
      S <= SMAX: ONE Pallas pass — log2(S) unrolled Stockham stages in
        VMEM, block (L, 1, S, GN); per-stage twiddles are tiny (L, m)
        broadcast inputs.
      S > SMAX: split S = S2*S1 -> recurse over S2 (IN'=S1*IN), multiply
        by T[k2, j1] = w^(stride*j1*k2), transpose S1<->S2 (XLA), recurse
        over S1, flatten (k1, S2) -> natural order.

Fusions (each saves a full-array XLA Montgomery-mul pass at ~30M muls/s):
  * the inter-factor twiddle T rides as the *post ladder* of the left
    branch's final Pallas pass (expanded across IN lanes);
  * coset scales (k^j / n_inv * k^-j ladders) ride as pre/post ladders of
    the leftmost/rightmost direct passes — pre/post ladders are flat
    (L, n) arrays in input/output enumeration, which recursion preserves,
    so they thread through unchanged and reshape at the direct pass.

Reference semantics: ark-poly Radix2EvaluationDomain natural-order FFT
(uzkge/src/poly_commit/field_polynomial.rs:552-607).  Correctness coverage:
the default suite runs the real kernel bodies through an eager grid
interpreter against an exact host Horner oracle
(tests/test_pallas_kernels.py::test_pallas_ntt_kernel_roundtrip); hardware
runs are checked at production shape by
tests/test_tpu_kernels.py::test_pallas_ntt_tpu_vs_host_oracle and by the
spot oracle inside bench.py's NTT stage.
"""

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff.jax_field import L
from ..ff.pallas_rows import rfr
from ..ff.pallas_field import pallas_call
from .stockham import stage_twiddles_strided

SMAX = 256  # largest single-pass sub-FFT: block (L, 256, 128) = 2 MB


def build_plan(master_mont, n_total: int, size: int, stride: int, inverse: bool):
    """Plan tree for a size-`size` sub-FFT with root master^stride."""
    if size <= SMAX:
        tws = stage_twiddles_strided(master_mont, n_total, size, stride, inverse)
        # Flatten each stage's (L, m) table to (L, S/2) in butterfly-row
        # order (w[j] repeated l times): the kernel then multiplies flat
        # (S/2, GN) rows with a broadcast along lanes only — no minor-dim-1
        # VMEM buffers (those pad 1024x and blow the scoped-VMEM budget)
        # and no sublane<->lane shape casts.  Expanded to (L, S/2, GN) per
        # lane width lazily (_expand_tws).
        flat = []
        m, l = size // 2, 1
        for t in tws[:-1]:
            arr = np.asarray(t)  # (L, m)
            flat.append(jnp.asarray(np.repeat(arr, l, axis=1)))  # (L, S/2)
            m //= 2
            l *= 2
        return {"S": size, "tws": flat}
    # split so the recursion's pass lane-widths stay >= 128 where possible
    # (the stretch/roll interleave needs l*GN >= 128 for free reshapes);
    # min() keeps the split valid for small test sizes (SMAX is patched
    # down in the interpret-mode suite)
    S2 = 128 if size // 128 <= SMAX and size >= 16384 else min(64, size // 2)
    S1 = size // S2
    plan2 = build_plan(master_mont, n_total, S2, stride * S1, inverse)
    plan1 = build_plan(master_mont, n_total, S1, stride * S2, inverse)
    idx = (np.outer(np.arange(S2), np.arange(S1)) * stride) % n_total
    if inverse:
        idx = (-idx) % n_total
    T = jnp.moveaxis(master_mont[idx.reshape(-1)], -1, 0).reshape(L, S2, S1)
    return {"S": size, "S2": S2, "S1": S1, "plan2": plan2, "plan1": plan1, "T": T}


def _direct_kernel(S, nst, has_pre, has_post, const_limbs, *refs):
    """One in-VMEM Stockham pass over axis -2 of the (L, 1, S, GN) block."""
    f = rfr
    x_ref = refs[0]
    tws = refs[1 : 1 + nst]
    k = 1 + nst
    pre_ref = refs[k] if has_pre else None
    k += 1 if has_pre else 0
    post_ref = refs[k] if has_post else None
    k += 1 if has_post else 0
    o_ref = refs[k]

    x = [x_ref[i, 0] for i in range(L)]  # (S, GN)
    GN = x[0].shape[-1]
    if has_pre:
        x = f.mul(x, [pre_ref[i] for i in range(L)])
    m, l = S // 2, 1
    row = jax.lax.broadcasted_iota(jnp.int32, (S, GN), 0)
    for t in range(int(np.log2(S))):
        a = [r[: S // 2] for r in x]
        b = [r[S // 2 :] for r in x]
        s = f.add(a, b)
        d = f.sub(a, b)
        if m > 1:
            tv = f.mul(d, [tws[t][i] for i in range(L)])  # flat (S/2, GN)
        else:
            tv = d
        # Stockham interleave out[2jl + h*l + k] = (s, tv)[h][jl + k] via
        # block-stretch + roll + select — all full-width ops.  The naive
        # concat/reshape form emits sub-8-sublane shuffles at l < 8 and
        # measured 4x the butterfly compute.
        if l * GN >= 128:
            maskA = ((row // l) % 2) == 0

            def stretch(v):
                # duplicate each l-row block: concat along lanes then split
                # the minor dim back — a contiguous reinterpretation
                # (jnp.repeat's middle-axis insert is an unsupported Mosaic
                # shape cast; this needs l*GN >= 128 to keep minor dims
                # lane-aligned)
                vr = v.reshape(m, l * GN)
                return jnp.concatenate([vr, vr], axis=1).reshape(S, GN)

            x = [
                jnp.where(maskA, stretch(s[i]), pltpu.roll(stretch(tv[i]), l, axis=0))
                for i in range(L)
            ]
        else:  # narrow-lane fallback: sublane-granular concat interleave
            x = [
                jnp.concatenate(
                    [s[i].reshape(m, 1, l, GN), tv[i].reshape(m, 1, l, GN)], axis=1
                ).reshape(S, GN)
                for i in range(L)
            ]
        m //= 2
        l *= 2
    if has_post:
        x = f.mul(x, [post_ref[i] for i in range(L)])
    if const_limbs is not None:
        x = f.mul(x, [jnp.full_like(x[0], c) for c in const_limbs])
    for i in range(L):
        o_ref[i, 0] = x[i]


def _expand_tws(plan, GN: int):
    """(L, S/2) flat stage twiddles -> (L, S/2, GN) lane-broadcast tables,
    cached per lane width on the plan.  Built with numpy so the cached
    arrays are CONCRETE even when first touched inside a jit trace (a
    traced value cached across jits is a tracer leak)."""
    cache = plan.setdefault("_twexp", {})
    if GN not in cache:
        # keep numpy (never jnp) in cross-jit caches: jnp constants
        # materialize as tracers inside an active trace and leak
        cache[GN] = [
            np.ascontiguousarray(
                np.broadcast_to(np.asarray(t)[:, :, None], t.shape + (GN,))
            )
            for t in plan["tws"]
        ]
    return cache[GN]


def _direct_pass(x, plan, pre, post, const_limbs):
    """x: (L, OUT, S, IN) -> same shape, FFT over axis 2.
    pre/post: None or flat (L, S*IN) ladders (input/output enumeration)."""
    S = plan["S"]
    Lh, OUT, _, IN = x.shape
    GN = 128 if IN % 128 == 0 else IN
    nst = len(plan["tws"])
    twx = _expand_tws(plan, GN)
    tw_specs = [
        pl.BlockSpec((L, S // 2, GN), lambda o, g: (0, 0, 0), memory_space=pltpu.VMEM)
        for _ in twx
    ]
    args = [x] + twx
    in_specs = [
        pl.BlockSpec((L, 1, S, GN), lambda o, g: (0, o, 0, g), memory_space=pltpu.VMEM)
    ] + tw_specs
    lad_spec = pl.BlockSpec((L, S, GN), lambda o, g: (0, 0, g), memory_space=pltpu.VMEM)
    if pre is not None:
        args.append(pre.reshape(L, S, IN))
        in_specs.append(lad_spec)
    if post is not None:
        args.append(post.reshape(L, S, IN))
        in_specs.append(lad_spec)
    kern = functools.partial(
        _direct_kernel, S, nst, pre is not None, post is not None, const_limbs
    )
    return pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        grid=(OUT, IN // GN),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (L, 1, S, GN), lambda o, g: (0, o, 0, g), memory_space=pltpu.VMEM
        ),
        # the unrolled stage chain's live temporaries exceed the default
        # 16 MB scoped-VMEM budget; v5e has 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def _expand_T(plan, IN: int):
    """(L, S2, S1) inter-factor twiddle -> flat (L, S2*S1*IN) post ladder.
    numpy-built so cache entries stay concrete across jit traces."""
    cache = plan.setdefault("_Texp", {})
    if IN not in cache:
        T = np.asarray(plan["T"])
        cache[IN] = np.ascontiguousarray(
            np.broadcast_to(
                T[:, :, :, None], (L, T.shape[1], T.shape[2], IN)
            ).reshape(L, -1)
        )
    return cache[IN]


def fft_mid(x, plan, pre=None, post=None):
    """FFT over axis -2 of (L, OUT, S, IN) per `plan`; natural order.
    pre/post may be None: an absent ladder skips a full-array Montgomery
    mul inside the kernel (~2.1 ms per 2^19-element layer on a v5e) — the
    plain fft carries no ladders at all, so wiring all-ones ladders through
    it wasted two layers per call.  Each (S, GN) shape compiles at most
    three kernel variants in practice: (none,none) fft, (none,post)
    ifft/coset_ifft, (pre,none) coset_fft, plus (none,T) left branches."""
    if "tws" in plan:
        return _direct_pass(x, plan, pre, post, None)
    S2, S1 = plan["S2"], plan["S1"]
    Lh, OUT, S, IN = x.shape
    a = x.reshape(L, OUT, S2, S1 * IN)
    # left branch: outer pre rides down; T becomes its post ladder
    a = fft_mid(a, plan["plan2"], pre=pre, post=_expand_T(plan, IN))
    a = a.reshape(L, OUT, S2, S1, IN)
    a = jnp.swapaxes(a, 2, 3).reshape(L, OUT, S1, S2 * IN)
    # right branch: outer post rides down
    a = fft_mid(a, plan["plan1"], post=post)
    return a.reshape(L, OUT, S, IN)


def pallas_fft(xv, plan, pre, post):
    """xv: (L, B, n) vertical Montgomery limbs -> natural-order (i)NTT.
    pre/post: (L, n) scale ladders in input/output enumeration (all-ones
    Montgomery when unused — ladders are jit ARGUMENTS, so fft / coset_fft
    / ifft / coset_ifft all share the same compiled executables)."""
    Lh, B, n = xv.shape
    out = fft_mid(xv[:, :, :, None], plan, pre=pre, post=post)
    return out.reshape(L, B, n)
