"""Fixed-base MSM over BN254 G1 as Pallas scan-reduction kernels.

Round-1's variable-base Pippenger (msm.py) walked points with a 256-step
`lax.scan`, gathering/scattering a (P, W, K, 256, L) bucket tensor every
step — scatter-in-scan is the worst possible pattern for the TPU memory
model (measured 14.5k points/s).  This module replaces it for the case that
actually occurs in the prover: every production MSM (KZG commit over the
SRS Lagrange basis, kzg_poly_commitment.rs:290; t-chunk and opening commits
over the SRS powers) is over a FIXED base set.  TPU-first design:

  * trade HBM for compute: precompute d * 2^(c*w) * P_i for every window w
    and signed digit d in [1, 2^(c-1)] — c chosen per basis size by HBM
    budget (pcs.kzg._fb_window: c=8 up to n=4096 at ~1 GB, c=4 above at
    ~0.5 GB for n=16384), built on-device and reused for every proof;
  * an MSM is then: recode scalars to signed digits (branchless, on-device)
    -> one big row gather -> sum of n*W looked-up points via COMPLETE
    additions (Renes-Costello-Batina 2015/1060 Alg. 7/8: branch-free,
    identity-safe — what the VPU wants);
  * the summation runs as Pallas scan kernels: each grid block holds
    (S, G) leaves in VMEM and folds the S-axis into two interleaved running
    sums (two carries hide the add-chain latency), all CIOS multiplies
    VMEM-resident via ff.pallas_rows; a handful of rounds reduces millions
    of leaves to one point per MSM (~60M complete adds/s/chip measured);
  * kernel traces stay at ONE group-add (fori_loop over the S axis), so
    Mosaic compiles in tens of seconds and results are disk-cached;
  * no scatter, no sort, no bucket state; batching rides the lane axis,
    sharding splits it across the mesh (uzkge_tpu.parallel).

All group formulas are generic over the field-ops container (Pallas limb
rows on TPU, vfield whole arrays on CPU), so the CPU test suite exercises
identical math through lax.scan versions of the same reductions.

Digit recode never overflows the top window because 254 mod c <= c-2 for
c in {4, 8} (scalars < r < 2^254); d = 0 maps to the identity, absorbed
branch-free.
"""

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants.bn254 import Q_MOD, R_MOD
from ..ff.jax_field import L, fq_ctx, fr_ctx
from ..ff.pallas_rows import RowCtx, rfq, rfr
from ..ff.pallas_field import use_pallas, pmul, pallas_call


B3_INT = 9  # 3*b for BN254 G1 (y^2 = x^3 + 3)


# ------------------------------------------------- generic group formulas


def padd_g(f, P1, P2):
    """Complete projective addition, RCB Alg. 7 (a=0, b3=9)."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    mul, add, sub = f.mul, f.add, f.sub
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = add(X1, Y1)
    t4 = add(X2, Y2)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = add(Y1, Z1)
    X3 = add(Y2, Z2)
    t4 = mul(t4, X3)
    X3 = add(t1, t2)
    t4 = sub(t4, X3)
    X3 = add(X1, Z1)
    Y3 = add(X2, Z2)
    X3 = mul(X3, Y3)
    Y3 = add(t0, t2)
    Y3 = sub(X3, Y3)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = f.mul_small(t2, B3_INT)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = f.mul_small(Y3, B3_INT)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = sub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return X3, Y3, Z3


def madd_g(f, P1, A2):
    """Complete mixed addition (projective + affine), RCB Alg. 8 (a=0,
    b3=9).  P1 may be the identity; A2 must not be."""
    X1, Y1, Z1 = P1
    x2, y2 = A2
    mul, add, sub = f.mul, f.add, f.sub
    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = add(x2, y2)
    t4 = add(X1, Y1)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)
    t4 = mul(y2, Z1)
    t4 = add(t4, Y1)
    Y3 = mul(x2, Z1)
    Y3 = add(Y3, X1)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = f.mul_small(Z1, B3_INT)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = f.mul_small(Y3, B3_INT)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = sub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return X3, Y3, Z3


def _identity(f, like):
    zero = f.zero_like(like)
    return zero, f.one_mont_like(like), f.zero_like(like)


def _leaf_step(f, carry, x, y, d):
    """Fold one leaf column into the running sum.  Leaves are affine table
    entries with a signed digit: d < 0 negates y, d == 0 is the identity
    (computed with a garbage-but-valid row-0 point, then deselected)."""
    neg = d < 0
    inf = d == 0
    y = f.select(neg, f.neg(y), y)
    r = madd_g(f, carry, (x, y))
    return tuple(f.select(inf, c, v) for c, v in zip(carry, r))


def _proj_step(f, carry, X, Y, Z):
    return padd_g(f, carry, (X, Y, Z))


# ------------------------------------------------------------ TPU kernels


def _rows(ref):
    return [ref[i, :] for i in range(L)]


def _col(ref, s):
    """(L, S, G) ref -> limb rows of column s."""
    return [ref[i, pl.ds(s, 1), :][0] for i in range(L)]


def _store(ref, rows):
    for i in range(L):
        ref[i, :] = rows[i]


def _store3(refs, rows3):
    for ref, rows in zip(refs, rows3):
        _store(ref, rows)


def _tree_combine(f, accs):
    """Pairwise padd tree over a list of running sums."""
    while len(accs) > 1:
        nxt = [padd_g(f, accs[i], accs[i + 1]) for i in range(0, len(accs) - 1, 2)]
        if len(accs) % 2:
            nxt.append(accs[-1])
        accs = nxt
    return accs[0]


# Interleaved accumulator chains per scan kernel: each chain's adds are a
# serial dependency, so IL independent chains expose IL-way ILP to the VPU.
# NOTE: the unrolled rows-form mul makes the traced body ~15k HLO per madd,
# so IL > 2 multiplies an already-long Mosaic compile — raise only together
# with a compact-trace field form.
IL = 2


def _scan_leaf_kernel(S, x_ref, y_ref, d_ref, ox, oy, oz):
    """IL interleaved running sums over the S axis (hides the dependent
    add-chain latency), tree-combined at the end."""
    f = rfq
    il = min(IL, S)

    def step(carry, s):
        return _leaf_step(f, carry, _col(x_ref, s), _col(y_ref, s),
                          d_ref[pl.ds(s, 1), :][0])

    like = [x_ref[0, 0, :]]
    init = tuple(_identity(f, like) for _ in range(il))

    def body(t, accs):
        return tuple(step(a, il * t + i) for i, a in enumerate(accs))

    accs = jax.lax.fori_loop(0, S // il, body, init)
    _store3((ox, oy, oz), _tree_combine(f, list(accs)))


def _scan_proj_kernel(S, x_ref, y_ref, z_ref, ox, oy, oz):
    f = rfq
    il = min(IL, S)

    def step(carry, s):
        return _proj_step(f, carry, _col(x_ref, s), _col(y_ref, s), _col(z_ref, s))

    like = [x_ref[0, 0, :]]
    init = tuple(_identity(f, like) for _ in range(il))

    def body(t, accs):
        return tuple(step(a, il * t + i) for i, a in enumerate(accs))

    accs = jax.lax.fori_loop(0, S // il, body, init)
    _store3((ox, oy, oz), _tree_combine(f, list(accs)))


def _bases_kernel(W, c, x_ref, y_ref, ox, oy, oz):
    """Doubling chain: emit T = 2^(c*w) P at every w, one padd in trace."""
    f = rfq
    x, y = _rows(x_ref), _rows(y_ref)
    T = (x, y, f.one_mont_like(x))

    def store_w(w, T):
        for i in range(L):
            ox[i, pl.ds(w, 1), :] = T[0][i][None]
            oy[i, pl.ds(w, 1), :] = T[1][i][None]
            oz[i, pl.ds(w, 1), :] = T[2][i][None]

    def body(t, T):
        @pl.when(t % c == 0)
        def _():
            store_w(t // c, T)
        return padd_g(f, T, T)

    T = jax.lax.fori_loop(0, (W - 1) * c, body, T)
    store_w(W - 1, T)


def _mult_chunk_kernel(CH, tx_ref, ty_ref, tz_ref, bx_ref, by_ref,
                       ox, oy, oz, ftx, fty, ftz):
    """Multiple chain: emit T, then step T += B (complete mixed add), CH
    times; also outputs the advanced chain state (entry T = m*B emits
    multiples m..m+CH-1 and exits with (m+CH)*B)."""
    f = rfq
    B = (_rows(bx_ref), _rows(by_ref))
    T = (_rows(tx_ref), _rows(ty_ref), _rows(tz_ref))

    def body(j, T):
        for i in range(L):
            ox[i, pl.ds(j, 1), :] = T[0][i][None]
            oy[i, pl.ds(j, 1), :] = T[1][i][None]
            oz[i, pl.ds(j, 1), :] = T[2][i][None]
        return madd_g(f, T, B)

    T = jax.lax.fori_loop(0, CH, body, T)
    _store3((ftx, fty, ftz), T)


def _prod_kernel(S, a_ref, o_ref):
    f = rfq

    def body(s, carry):
        return f.mul(carry, _col(a_ref, s))

    _store(o_ref, jax.lax.fori_loop(1, S, body, _col(a_ref, 0)))


def _inv_kernel(S, a_ref, pinv_ref, o_ref):
    """Per-lane inverses given the inverse of each lane-group's product:
    forward prefix products staged into o_ref, then a backward sweep."""
    f = rfq

    def fwd(s, pref):
        pref = f.mul(pref, _col(a_ref, s))
        for i in range(L):
            o_ref[i, pl.ds(s, 1), :] = pref[i][None]
        return pref

    pref0 = _col(a_ref, 0)
    for i in range(L):
        o_ref[i, pl.ds(0, 1), :] = pref0[i][None]
    jax.lax.fori_loop(1, S, fwd, pref0)

    def bwd(t, pinv):
        s = S - 1 - t
        prev = _col(o_ref, s - 1)  # prefix_{s-1}, still intact
        inv_s = f.mul(pinv, prev)
        pinv = f.mul(pinv, _col(a_ref, s))
        for i in range(L):
            o_ref[i, pl.ds(s, 1), :] = inv_s[i][None]
        return pinv

    pinv = jax.lax.fori_loop(0, S - 1, bwd, _rows(pinv_ref))
    for i in range(L):
        o_ref[i, pl.ds(0, 1), :] = pinv[i][None]


# --- static-unrolled inversion kernels -----------------------------------
#
# The fori_loop forms above read columns with pl.ds dynamic slices, which
# Mosaic serves ~8x slower than static reads (measured: 64 ms for a
# 2M-element batch inversion whose mul count predicts ~9 ms).  These
# variants unroll a short scan axis (SU = 8) with static indices, store the
# forward prefixes, and consume them in the backward pass — 3 muls/element
# at the full measured mul rate.

SU = 8


def _sget(ref, s):
    return [ref[i, s, :] for i in range(L)]


def _sput(ref, s, rows):
    for i in range(L):
        ref[i, s, :] = rows[i]


def _prefix_kernel(a_ref, pref_ref, prod_ref):
    """(L, SU, G) -> running prefixes (L, SU, G) + group product (L, G)."""
    f = rfq
    acc = _sget(a_ref, 0)
    _sput(pref_ref, 0, acc)
    for s in range(1, SU):
        acc = f.mul(acc, _sget(a_ref, s))
        _sput(pref_ref, s, acc)
    _store(prod_ref, acc)


def _invback_kernel(a_ref, pref_ref, pinv_ref, o_ref):
    """Backward sweep: o_s = pinv * pref_{s-1}; pinv *= a_s."""
    f = rfq
    pinv = _rows(pinv_ref)
    for s in range(SU - 1, 0, -1):
        _sput(o_ref, s, f.mul(pinv, _sget(pref_ref, s - 1)))
        pinv = f.mul(pinv, _sget(a_ref, s))
    _sput(o_ref, 0, pinv)


def _fermat_bits_kernel(nbits, bits_ref, x_ref, o_ref):
    """x^e where e's bits (LSB first) arrive as a (1, nbits) i32 plane."""
    f = rfq

    def body(i, carry):
        acc, base = carry
        bit = bits_ref[0, i]
        nacc = f.mul(acc, base)
        acc = f.select(bit != 0, nacc, acc)
        base = f.mul(base, base)
        return acc, base

    one = rfq.one_mont_like(_rows(x_ref))
    acc, _ = jax.lax.fori_loop(0, nbits, body, (one, _rows(x_ref)))
    _store(o_ref, acc)


def _specSUG(G):
    return pl.BlockSpec((L, SU, G), lambda i: (0, 0, i), memory_space=pltpu.VMEM)


def pbatch_inv_fq_fast(a):
    """Batched Fq inversion of (L, N), N divisible by SU^k down to <= 4096:
    static-unrolled prefix/backward kernels + one Pallas Fermat at the root.
    Inversion groups are STRIDED ({t, t+N/SU, ...}) so the (L, SU, N/SU)
    scan layout is a free reshape, not a transpose — any partition into
    groups is valid for the product-tree trick."""
    from ..constants.bn254 import Q_MOD

    levels = []
    cur = a
    while cur.shape[1] > 4096 and cur.shape[1] % SU == 0:
        lay = cur.reshape(L, SU, cur.shape[1] // SU)
        total = cur.shape[1] // SU
        G = _pick_G(total)
        pref, prod = pallas_call(
            _prefix_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((L, SU, total), jnp.uint32),
                jax.ShapeDtypeStruct((L, total), jnp.uint32),
            ),
            grid=(total // G,),
            in_specs=[_specSUG(G)],
            out_specs=(_specSUG(G), _specG(G)),
        )(lay)
        levels.append((lay, pref))
        cur = prod
    # root Fermat inverse on (L, <=4096)
    nroot = cur.shape[1]
    e = Q_MOD - 2
    ebits = [(e >> i) & 1 for i in range(e.bit_length())]
    bits_arr = jnp.asarray(np.array(ebits, np.int32)[None, :])
    inv = pallas_call(
        functools.partial(_fermat_bits_kernel, len(ebits)),
        out_shape=jax.ShapeDtypeStruct((L, nroot), jnp.uint32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, len(ebits)), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, nroot), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, nroot), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(bits_arr, cur)
    for lay, pref in reversed(levels):
        total = lay.shape[2]
        G = _pick_G(total)
        out = pallas_call(
            _invback_kernel,
            out_shape=jax.ShapeDtypeStruct((L, SU, total), jnp.uint32),
            grid=(total // G,),
            in_specs=[_specSUG(G), _specSUG(G), _specG(G)],
            out_specs=_specSUG(G),
        )(lay, pref, inv)
        inv = out.reshape(L, SU * total)
    return inv


# -------------------------------------------------------- pallas plumbing


def _specSG(S, G):
    return pl.BlockSpec((L, S, G), lambda i: (0, 0, i), memory_space=pltpu.VMEM)


def _specG(G):
    return pl.BlockSpec((L, G), lambda i: (0, i), memory_space=pltpu.VMEM)


def _pick_G(total: int, cap: int = 1024) -> int:
    g = 1
    while g < cap and total % (g * 2) == 0:
        g *= 2
    return g if total % g == 0 and g >= 128 else total


def _scan_reduce_tpu(kernel_fn, S, arrays, d=None):
    """arrays: tuple of (L, S, total) inputs; optional (S, total) digit
    plane.  Returns tuple of (L, total) reduced outputs.  Block cap 1024:
    the L=9 sublane axis pads to 16 in Mosaic blocks, so G=2048 already
    needs 17.25 MB scoped VMEM against the 16 MB limit."""
    total = arrays[0].shape[2]
    G = _pick_G(total)
    grid = total // G
    in_specs = [_specSG(S, G)] * len(arrays)
    args = list(arrays)
    if d is not None:
        in_specs.append(pl.BlockSpec((S, G), lambda i: (0, i), memory_space=pltpu.VMEM))
        args.append(d)
    call = pallas_call(
        functools.partial(kernel_fn, S),
        out_shape=tuple(jax.ShapeDtypeStruct((L, total), jnp.uint32) for _ in range(3)),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(_specG(G) for _ in range(3)),
    )
    return call(*args)


def _to_scan_layout(x, S):
    """(..., N) -> (..., S, N//S): element (.., j*S+s) -> (.., s, j)."""
    n = x.shape[-1]
    return jnp.swapaxes(x.reshape(x.shape[:-1] + (n // S, S)), -1, -2)


# ----------------------------------------------------------- CPU variants


def _vfq():
    from ..ff.vfield import vfq

    return vfq


def _scan_reduce_cpu(step_fn, S, arrays, d=None, f=None):
    f = f or _vfq()
    xs = tuple(jnp.moveaxis(a, 1, 0) for a in arrays)  # (S, L, total)
    if d is not None:
        xs = xs + (d,)

    def body(carry, cols):
        return step_fn(f, carry, *cols), None

    init = _identity(f, arrays[0][:, 0, :])
    out, _ = jax.lax.scan(body, init, xs)
    return out


# --------------------------------------------------------- reduce dispatch


def _reduce_round(X, Y, Z, S, d=None, x_affine=False, f=None):
    """One reduction round: (L, N) -> (L, N/S).  Leaf rounds (x_affine)
    take gathered affine coords + digits already in scan layout.  `f`
    overrides the CPU-path field ctx (compact muls for compile-bound
    callers)."""
    if use_pallas():
        if x_affine:
            return _scan_reduce_tpu(_scan_leaf_kernel, S, (X, Y), d=d)
        return _scan_reduce_tpu(_scan_proj_kernel, S, (X, Y, Z))
    if x_affine:
        return _scan_reduce_cpu(_leaf_step, S, (X, Y), d=d, f=f)
    return _scan_reduce_cpu(_proj_step, S, (X, Y, Z), f=f)


def _pick_S(per: int, cap: int = 32) -> int:
    s = 1
    while s < cap and per % (s * 2) == 0 and per // (s * 2) >= 1:
        s *= 2
    return s


# ---------------------------------------------------------- batch inversion


def pbatch_inv_fq(a):
    """Batched Fq inversion of (L, N): Pallas prefix-product scans per lane
    group + one Fermat ladder at the root on TPU; vfield tree on CPU.
    Inputs must be nonzero; N arbitrary power-of-two-friendly size."""
    vfq = _vfq()
    n = a.shape[1]
    if not use_pallas() or n < 1024:
        return vfq.batch_inv(a)
    S = 32
    levels = []
    cur = a
    while cur.shape[1] >= 1024 and cur.shape[1] % S == 0:
        lay = _to_scan_layout(cur, S)
        levels.append(lay)
        G = _pick_G(cur.shape[1] // S)
        grid = (cur.shape[1] // S) // G
        cur = pallas_call(
            functools.partial(_prod_kernel, S),
            out_shape=jax.ShapeDtypeStruct((L, cur.shape[1] // S), jnp.uint32),
            grid=(grid,),
            in_specs=[_specSG(S, G)],
            out_specs=_specG(G),
        )(lay)
    inv = vfq.batch_inv(cur)
    for lay in reversed(levels):
        total = lay.shape[2]
        G = _pick_G(total)
        grid = total // G
        out = pallas_call(
            functools.partial(_inv_kernel, S),
            out_shape=jax.ShapeDtypeStruct((L, S, total), jnp.uint32),
            grid=(grid,),
            in_specs=[_specSG(S, G), _specG(G)],
            out_specs=_specSG(S, G),
        )(lay, inv)
        # undo scan layout: (L, S, N/S) -> (L, N)
        inv = jnp.swapaxes(out, -1, -2).reshape(L, S * total)
    return inv


# ------------------------------------------- batch-affine leaf reduction
#
# The complete-add scan costs ~11 Montgomery muls per folded leaf; measured
# VPU throughput is ~1.1e9 muls/s on a v5e, which caps it at ~80M leaf
# adds/s.  The affine pairwise-tree form costs 6 muls per add (3 for the
# add itself + 3 amortized for the shared batched inversion), phrased as
# log2 "level passes" over the whole leaf array:
#
#   level:  (x, y, inf) of N points  ->  N/2 pairwise sums
#     den      = x2 - x1           (one Pallas pass, emits degeneracy flags)
#     dinv     = batch_inv(den)    (scan-kernel product tree, one Fermat)
#     lambda   = (y2 - y1) * dinv
#     x3       = lambda^2 - x1 - x2
#     y3       = lambda*(x1 - x3) - y1   (one fused Pallas pass)
#
# Degenerate pairs: identity operands pass through via flags; x1 == x2
# (doubling or cancellation) cannot be *engineered* without knowing a
# discrete-log relation between SRS elements, and happens by chance with
# probability ~2^-254 per pair — the den kernel substitutes 1 so the batch
# inversion stays valid, flags the pair, and the (negligible, verifier-
# detectable) result is declared infinity.  The last TAIL points per MSM
# fall back to the complete-add scan kernels, which are exact.
#
# Selection feeds the tree without any gather: the table is stored
# VERTICALLY as (D, 32, K) uint16 — for each leaf-block, a where-chain over
# the D digit rows runs at full 128-lane width and leaves the selected rows
# already limb-major, so no in-kernel transpose and table HBM traffic is
# one stream per MSM batch.

TAIL = 512  # per-MSM leaf count handed to the complete-add scan (CPU path)
AFFINE_LEVELS = 3  # batch-affine tree depth on the TPU path (87.5% of adds)
# Per-MSM projective partial sums finished on host.  1 = fold all the way
# down on device: the r4 value of 16 left 16 points/MSM for the python
# finish, whose per-point Fermat inverses + affine adds cost ~100 ms/batch
# and dominated the whole MSM (device stages profile at ~1 ms total); the
# extra fold8/padd rounds on the tiny tails cost ~0.5 ms of device time.
TAIL_M = 1


def _select_kernel(P, D, tab_ref, dig_ref, x_ref, y_ref, inf_ref):
    """tab (D, 32, TK) u16; dig (P, TK) i32 -> x,y (L, P, TK) u32 (sign
    applied), inf (P, TK) u32.  The where-chain runs vectorized over the
    whole (P, 32, TK) accumulator — one big op per digit row instead of P
    small ones (per-op Mosaic overhead dominated the per-p form)."""
    f = rfq
    d = dig_ref[:, :]                       # (P, TK) i32
    mag = jnp.abs(d)
    tab0 = tab_ref[0, :, :]
    acc = jnp.broadcast_to(tab0[None], (P,) + tab0.shape)  # (P, 32, TK) u16
    for dd in range(2, D + 1):
        acc = jnp.where((mag == dd)[:, None, :], tab_ref[dd - 1, :, :][None], acc)
    acc32 = acc.astype(jnp.uint32)
    for p in range(P):
        x = [acc32[p, i, :] for i in range(L)]
        y = [acc32[p, L + i, :] for i in range(L)]
        y = f.select(d[p] < 0, f.neg(y), y)
        for i in range(L):
            x_ref[i, p, :] = x[i]
            y_ref[i, p, :] = y[i]
    inf_ref[:, :] = (mag == 0).astype(jnp.uint32)


def _pair_den_kernel(x1_ref, x2_ref, inf1_ref, inf2_ref, den_ref, flag_ref):
    """Halves-paired denominators: den = x2 - x1, nonzero-substituted;
    flags (P, G) bitpack: 1=inf1, 2=inf2, 4=degenerate-x.  All rows are
    (P, G)-shaped — the field ops vectorize over the P axis natively."""
    f = rfq
    x1 = [x1_ref[i] for i in range(L)]
    x2 = [x2_ref[i] for i in range(L)]
    den = f.sub(x2, x1)
    inf1 = inf1_ref[:, :] != 0
    inf2 = inf2_ref[:, :] != 0
    bad = f.is_zero(den) & ~inf1 & ~inf2
    sub = inf1 | inf2 | bad
    den = f.select(sub, f.one_mont_like(den), den)
    for i in range(L):
        den_ref[i, :, :] = den[i]
    flag_ref[:, :] = (
        inf1.astype(jnp.uint32)
        + 2 * inf2.astype(jnp.uint32)
        + 4 * bad.astype(jnp.uint32)
    )


def _pair_combine_kernel(x1_ref, x2_ref, y1_ref, y2_ref, dinv_ref, flag_ref,
                         ox, oy, oinf):
    """Affine pairwise add with flag-driven pass-through."""
    f = rfq
    x1 = [x1_ref[i] for i in range(L)]
    x2 = [x2_ref[i] for i in range(L)]
    y1 = [y1_ref[i] for i in range(L)]
    y2 = [y2_ref[i] for i in range(L)]
    dinv = [dinv_ref[i] for i in range(L)]
    fl = flag_ref[:, :]
    inf1 = (fl & 1) != 0
    inf2 = (fl & 2) != 0
    bad = (fl & 4) != 0

    lam = f.mul(f.sub(y2, y1), dinv)
    x3 = f.sub(f.sub(f.mul(lam, lam), x1), x2)
    y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)

    # pass-throughs: P1 + inf = P1, inf + P2 = P2
    xo = f.select(inf2, x1, f.select(inf1, x2, x3))
    yo = f.select(inf2, y1, f.select(inf1, y2, y3))
    info = (inf1 & inf2) | bad
    for i in range(L):
        ox[i, :, :] = xo[i]
        oy[i, :, :] = yo[i]
    oinf[:, :] = info.astype(jnp.uint32)


def _fold8_kernel(x_ref, y_ref, z_ref, ox, oy, oz):
    """Projective 8-to-1 pairwise tree: inputs (L, 8, P, G) with the fold
    axis on dim 1 (sublane-friendly halves), output (L, P, G).  Complete
    padd handles identities, so no flags are needed downstream of the
    affine levels.  Uses the array-form field (afield) for a compact trace
    (7 padds; the rows form would be ~100k HLO)."""
    from ..ff.afield import afq

    f = afq
    X = x_ref[:, :, :, :]
    Y = y_ref[:, :, :, :]
    Z = z_ref[:, :, :, :]
    w = 8
    while w > 1:
        h = w // 2
        A = (X[:, :h], Y[:, :h], Z[:, :h])
        B = (X[:, h : 2 * h], Y[:, h : 2 * h], Z[:, h : 2 * h])
        X, Y, Z = padd_g(f, A, B)
        w = h
    ox[:, :, :] = X[:, 0]
    oy[:, :, :] = Y[:, 0]
    oz[:, :, :] = Z[:, 0]


def _fold8(X, Y, Z):
    """(L, P, Kc) projective -> (L, P, Kc/8) via the in-kernel 8-tree."""
    Lh, P, Kc = X.shape
    C8 = Kc // 8
    # fold axis to dim 1: (L, P, C8, 8) -> (L, 8, P, C8)
    def lay(a):
        return jnp.moveaxis(a.reshape(L, P, C8, 8), 3, 1)

    G = _pick_G(C8, cap=256)  # (L, 8, P, G) x 3 inputs: keep VMEM modest
    spec_in = pl.BlockSpec((L, 8, P, G), lambda g: (0, 0, 0, g),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((L, P, G), lambda g: (0, 0, g), memory_space=pltpu.VMEM)
    return pallas_call(
        _fold8_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((L, P, C8), jnp.uint32) for _ in range(3)),
        grid=(C8 // G,),
        in_specs=[spec_in] * 3,
        out_specs=(spec_out,) * 3,
    )(lay(X), lay(Y), lay(Z))


def _to_projective(x, y, inf):
    """Affine + inf flags -> complete projective (identity = (0, 1, 0))."""
    one = jnp.asarray(
        np.array([int(m) for m in rfq.mont_one], np.uint32)[:, None, None]
    )
    isinf = (inf != 0)[None]
    X = jnp.where(isinf, jnp.uint32(0), x)
    Y = jnp.where(isinf, one, y)
    Z = jnp.where(isinf, jnp.uint32(0), jnp.broadcast_to(one, x.shape))
    return X, Y, Z


def _pair_den_small_kernel(H, x_ref, inf_ref, den_ref, flag_ref):
    """Single-block variant for levels too small to tile (H < 128):
    halves sliced in-kernel."""
    f = rfq
    x1 = [x_ref[i, :, :H] for i in range(L)]
    x2 = [x_ref[i, :, H:] for i in range(L)]
    den = f.sub(x2, x1)
    inf1 = inf_ref[:, :H] != 0
    inf2 = inf_ref[:, H:] != 0
    bad = f.is_zero(den) & ~inf1 & ~inf2
    den = f.select(inf1 | inf2 | bad, f.one_mont_like(den), den)
    for i in range(L):
        den_ref[i, :, :] = den[i]
    flag_ref[:, :] = (
        inf1.astype(jnp.uint32)
        + 2 * inf2.astype(jnp.uint32)
        + 4 * bad.astype(jnp.uint32)
    )


def _pair_combine_small_kernel(H, x_ref, y_ref, dinv_ref, flag_ref, ox, oy, oinf):
    f = rfq
    x1 = [x_ref[i, :, :H] for i in range(L)]
    x2 = [x_ref[i, :, H:] for i in range(L)]
    y1 = [y_ref[i, :, :H] for i in range(L)]
    y2 = [y_ref[i, :, H:] for i in range(L)]
    dinv = [dinv_ref[i] for i in range(L)]
    fl = flag_ref[:, :]
    inf1 = (fl & 1) != 0
    inf2 = (fl & 2) != 0
    bad = (fl & 4) != 0
    lam = f.mul(f.sub(y2, y1), dinv)
    x3 = f.sub(f.sub(f.mul(lam, lam), x1), x2)
    y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
    xo = f.select(inf2, x1, f.select(inf1, x2, x3))
    yo = f.select(inf2, y1, f.select(inf1, y2, y3))
    info = (inf1 & inf2) | bad
    for i in range(L):
        ox[i, :, :] = xo[i]
        oy[i, :, :] = yo[i]
    oinf[:, :] = info.astype(jnp.uint32)


def _affine_level_small(x, y, inf):
    Lh, P, Kc = x.shape
    H = Kc // 2
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    den, flags = pallas_call(
        functools.partial(_pair_den_small_kernel, H),
        out_shape=(
            jax.ShapeDtypeStruct((L, P, H), jnp.uint32),
            jax.ShapeDtypeStruct((P, H), jnp.uint32),
        ),
        in_specs=[full, full],
        out_specs=(full, full),
    )(x, inf)
    dinv = pbatch_inv_fq(den.reshape(L, P * H))
    return pallas_call(
        functools.partial(_pair_combine_small_kernel, H),
        out_shape=(
            jax.ShapeDtypeStruct((L, P, H), jnp.uint32),
            jax.ShapeDtypeStruct((L, P, H), jnp.uint32),
            jax.ShapeDtypeStruct((P, H), jnp.uint32),
        ),
        in_specs=[full, full, full, full],
        out_specs=(full, full, full),
    )(x, y, dinv.reshape(L, P, H), flags)


def _affine_level(x, y, inf):
    """One tree level pairing each MSM segment's first half with its second
    half (contiguous slices via block index maps — no relayout copies):
    (L, P, Kc), (P, Kc) -> (L, P, Kc/2), (P, Kc/2)."""
    Lh, P, Kc = x.shape
    H = Kc // 2
    if H % 128 != 0:
        return _affine_level_small(x, y, inf)
    G = _pick_G(H)
    grid = (H // G,)
    off = H // G  # block offset of the second half

    spec1 = pl.BlockSpec((L, P, G), lambda g: (0, 0, g), memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((L, P, G), lambda g, _o=off: (0, 0, g + _o),
                         memory_space=pltpu.VMEM)
    ispec1 = pl.BlockSpec((P, G), lambda g: (0, g), memory_space=pltpu.VMEM)
    ispec2 = pl.BlockSpec((P, G), lambda g, _o=off: (0, g + _o),
                          memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((L, P, G), lambda g: (0, 0, g), memory_space=pltpu.VMEM)
    oispec = pl.BlockSpec((P, G), lambda g: (0, g), memory_space=pltpu.VMEM)

    den, flags = pallas_call(
        _pair_den_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, P, H), jnp.uint32),
            jax.ShapeDtypeStruct((P, H), jnp.uint32),
        ),
        grid=grid,
        in_specs=[spec1, spec2, ispec1, ispec2],
        out_specs=(ospec, oispec),
    )(x, x, inf, inf)
    C = P * H
    den_flat = den.reshape(L, C)
    if use_pallas() and C > 4096 and C % SU == 0:
        dinv = pbatch_inv_fq_fast(den_flat)
    else:
        dinv = pbatch_inv_fq(den_flat)
    xo, yo, info = pallas_call(
        _pair_combine_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, P, H), jnp.uint32),
            jax.ShapeDtypeStruct((L, P, H), jnp.uint32),
            jax.ShapeDtypeStruct((P, H), jnp.uint32),
        ),
        grid=grid,
        in_specs=[spec1, spec2, spec1, spec2, ospec, oispec],
        out_specs=(ospec, ospec, oispec),
    )(x, x, y, y, dinv.reshape(L, P, H), flags)
    return xo, yo, info


# ------------------------------------------------------------ digit recode


def recode_digits(std_v, c: int, bits: int):
    """(L, ...) standard-form limbs -> (..., nd) int32 signed base-2^c
    digits, |d| <= 2^(c-1); branchless carry recode on device.
    Safe iff values < 2^bits and bits mod c <= c-2 (the top digit absorbs
    the final carry) — asserted."""
    assert 16 % c == 0 and bits % c <= c - 2
    nd = (bits + c - 1) // c
    per_limb = 16 // c
    half = 1 << (c - 1)
    full = 1 << c
    digits = []
    carry = jnp.zeros(std_v.shape[1:], jnp.uint32)
    for k in range(nd):
        raw = (std_v[k // per_limb] >> ((k % per_limb) * c)) & (full - 1)
        v = raw + carry
        ge = v > half
        d = jnp.where(ge, v.astype(jnp.int32) - full, v.astype(jnp.int32))
        carry = ge.astype(jnp.uint32)
        digits.append(d)
    return jnp.stack(digits, axis=-1)


# -------------------------------------------------------------- table build


def _mont_one_col():
    return jnp.asarray(np.array([int(m) for m in rfq.mont_one], np.uint32)[:, None])


def _build_bases(x_v, y_v, W: int, c: int):
    """(L, n) affine -> (L, W, n) affine window bases B_w = 2^(c*w) P."""
    n = x_v.shape[1]
    if use_pallas():
        G = _pick_G(n, cap=512)
        BX, BY, BZ = pallas_call(
            functools.partial(_bases_kernel, W, c),
            out_shape=tuple(jax.ShapeDtypeStruct((L, W, n), jnp.uint32) for _ in range(3)),
            grid=(n // G,),
            in_specs=[_specG(G)] * 2,
            out_specs=tuple(
                pl.BlockSpec((L, W, G), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
                for _ in range(3)
            ),
        )(x_v, y_v)
    else:
        f = _vfq()
        T0 = (x_v, y_v, f.one_mont_like(x_v))
        if W == 1:
            BX, BY, BZ = (v[:, None, :] for v in T0)
        else:
            def dbl(T, _):
                return padd_g(f, T, T), T

            Tf, emitted = jax.lax.scan(dbl, T0, None, length=(W - 1) * c)
            sel = tuple(e[::c] for e in emitted)  # (W-1, L, n) each
            BX, BY, BZ = (
                jnp.concatenate([jnp.moveaxis(e, 0, 1), fin[:, None, :]], axis=1)
                for e, fin in zip(sel, Tf)
            )
    BX, BY, BZ = (v.reshape(L, W * n) for v in (BX, BY, BZ))
    zinv = pbatch_inv_fq(BZ)
    return pmul(rfq, BX, zinv), pmul(rfq, BY, zinv)


def _build_chunk(TX, TY, TZ, bax, bay, CH: int):
    """Emit CH consecutive multiples (normalized, uint16-packed rows) and
    return the advanced chain state (one madd step ahead)."""
    n = TX.shape[1]
    if use_pallas():
        G = _pick_G(n, cap=512)
        outs = pallas_call(
            functools.partial(_mult_chunk_kernel, CH),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((L, CH, n), jnp.uint32)] * 3
                + [jax.ShapeDtypeStruct((L, n), jnp.uint32)] * 3
            ),
            grid=(n // G,),
            in_specs=[_specG(G)] * 5,
            out_specs=tuple(
                [pl.BlockSpec((L, CH, G), lambda i: (0, 0, i), memory_space=pltpu.VMEM)] * 3
                + [_specG(G)] * 3
            ),
        )(TX, TY, TZ, bax, bay)
        EX, EY, EZ, TX, TY, TZ = outs
    else:
        f = _vfq()

        def step(T, _):
            return madd_g(f, T, (bax, bay)), T

        (TX, TY, TZ), emitted = jax.lax.scan(step, (TX, TY, TZ), None, length=CH)
        EX, EY, EZ = (jnp.moveaxis(e, 0, 1) for e in emitted)  # (L, CH, n)
    EX, EY, EZ = (v.reshape(L, CH * n) for v in (EX, EY, EZ))
    zinv = pbatch_inv_fq(EZ)
    ex_a = pmul(rfq, EX, zinv)
    ey_a = pmul(rfq, EY, zinv)
    packed = jnp.concatenate(
        [jnp.moveaxis(ex_a, 0, -1), jnp.moveaxis(ey_a, 0, -1)], axis=-1
    ).astype(jnp.uint16)
    return TX, TY, TZ, packed


def _reduce_leaves(gx, gy, d_lay, S, P, J, f=None):
    """Reduce gathered affine leaves to one projective point per MSM row.

    gx, gy: (L, S, P*J) affine leaf coords in scan layout; d_lay: (S, P*J)
    signed digits (0 = identity).  Returns (X, Y, Z) each (L, P)."""
    X, Y, Z = _reduce_round(gx, gy, None, S, d=d_lay, x_affine=True, f=f)
    per = J
    while per > 1:
        S = _pick_S(per)
        Xl = jnp.moveaxis(_to_scan_layout(X.reshape(L, P, per), S), 2, 1)
        Yl = jnp.moveaxis(_to_scan_layout(Y.reshape(L, P, per), S), 2, 1)
        Zl = jnp.moveaxis(_to_scan_layout(Z.reshape(L, P, per), S), 2, 1)
        per = per // S
        X, Y, Z = _reduce_round(
            Xl.reshape(L, S, P * per), Yl.reshape(L, S, P * per),
            Zl.reshape(L, S, P * per), S, f=f,
        )
    return X, Y, Z


def _scalars_to_digits(scalars_mont, c: int, bits: int):
    """(P, n, L) Fr Montgomery -> (P, n, W) signed digits (on device)."""
    P = scalars_mont.shape[0]
    n = scalars_mont.shape[1]
    sv = jnp.moveaxis(scalars_mont, -1, 0).reshape(L, P * n)
    one_std = jnp.asarray(np.array([int(v) for v in rfr.one_std], np.uint32)[:, None])
    std = pmul(rfr, sv, jnp.broadcast_to(one_std, sv.shape)).reshape(L, P, n)
    return recode_digits(std, c, bits)


def msm_chain(x_v, y_v, scalars_mont, bits: int = 256):
    """Fixed-base MSM with the window 'table' built on the fly as a doubling
    chain (c = 2: chain entry 2w + |d| - 1 is |d| * 2^(2w) * P_i), so there
    is no persistent HBM table — the per-shard shape used by the sharded MSM
    (parallel/sharded.py), where each device sees a different point slice.
    Compiles as three tiny scans (one group-add each), unlike the retired
    scatter-in-scan Pippenger.

    x_v, y_v: (L, n) affine Fq Montgomery (n a power of two); scalars_mont:
    (P, n, L) Fr Montgomery.  Returns (X, Y, Z) projective sums, each (L, P).
    bits = 256 keeps the window count a power of two (layout-friendly; the
    top windows are all zero for Fr scalars < 2^254)."""
    c = 2
    n = x_v.shape[1]
    P = scalars_mont.shape[0]
    W = (bits + c - 1) // c  # 128
    from ..ff.vfield import vfq_c as f  # compact muls: this path is compile-bound

    # doubling chain 2^k P for k in [0, 2W): scan trace = ONE projective add
    T0 = (x_v, y_v, f.one_mont_like(x_v))

    def dbl(T, _):
        return padd_g(f, T, T), T

    Tf, emitted = jax.lax.scan(dbl, T0, None, length=2 * W - 1)
    CX, CY, CZ = (
        jnp.concatenate([jnp.moveaxis(e, 0, 1), fin[:, None, :]], axis=1).reshape(
            L, 2 * W * n
        )
        for e, fin in zip(emitted, Tf)
    )
    # normalize to affine: Fermat ladder as a scan (2-mul trace) — chain
    # points are never the identity (prime order), so Z != 0
    zinv = f.inv(CZ)
    ax = f.mul(CX, zinv)
    ay = f.mul(CY, zinv)

    digits = _scalars_to_digits(scalars_mont, c, bits)  # (P, n, W)
    d_t = jnp.moveaxis(digits, -1, 1).reshape(P, W * n)
    mag = jnp.abs(d_t)
    base_idx = (2 * jnp.arange(W, dtype=jnp.int32)[:, None] * n
                + jnp.arange(n, dtype=jnp.int32)[None, :]).reshape(1, W * n)
    idx = base_idx + jnp.maximum(mag - 1, 0) * n  # chain flat index (2w + |d|-1, i)

    per = W * n
    S = _pick_S(per)
    J = per // S
    d_lay = jnp.moveaxis(_to_scan_layout(d_t, S), 1, 0).reshape(S, P * J)
    idx_lay = jnp.moveaxis(_to_scan_layout(idx, S), 1, 0).reshape(S, P * J)
    gx = ax[:, idx_lay.reshape(-1)].reshape(L, S, P * J)
    gy = ay[:, idx_lay.reshape(-1)].reshape(L, S, P * J)
    return _reduce_leaves(gx, gy, d_lay, S, P, J, f=f)


class FixedBaseTable:
    """Device-resident signed-window multiple table for a fixed G1 base set.

    Table layout: row (w*n + i)*D + (d-1) holds (d * 2^(c*w) * P_i) as 32
    uint16-packed limbs (x||y), built entirely on device.  Leaf-major rows
    make the per-MSM gather address-monotonic (each leaf reads one 64 B row
    out of its own contiguous D-row block).

    `bits` bounds the scalars (default 254 covers Fr); tests use smaller
    values to keep window counts tiny.
    """

    def __init__(self, points: List, c: int = 8, bits: int = 254):
        from ..errors import ParameterError

        self.n = len(points)
        self.c = c
        self.bits = bits
        if 16 % c != 0 or bits % c > c - 2:
            raise ParameterError(
                f"window width c={c} must divide 16 with bits%c <= c-2 (bits={bits})"
            )
        self.W = (bits + c - 1) // c
        self.D = 1 << (c - 1)
        assert all(p is not None for p in points)
        self.points = list(points)
        n, W, D = self.n, self.W, self.D
        assert (W * n) & (W * n - 1) == 0 and W * n >= 32, \
            "W*n must be a power of two >= 32"

        xs = fq_ctx.to_mont_limbs([p[0] for p in points]).reshape(n, L)
        ys = fq_ctx.to_mont_limbs([p[1] for p in points]).reshape(n, L)
        x_v = jnp.moveaxis(xs, -1, 0)
        y_v = jnp.moveaxis(ys, -1, 0)

        bases_jit = jax.jit(functools.partial(_build_bases, W=W, c=c))
        bax, bay = bases_jit(x_v, y_v)

        CH = min(16, D)
        chunk_jit = jax.jit(functools.partial(_build_chunk, CH=CH))
        one = jnp.broadcast_to(_mont_one_col(), bax.shape)
        TX, TY, TZ = bax, bay, one
        K = W * n
        self.vertical = use_pallas()
        if self.vertical:
            # VERTICAL layout (D, 32, K) u16 for the where-chain select:
            # digit row d holds the 32 packed x||y limb-halves of
            # (d+1) * 2^(c*w) * P_i at lane k = w*n + i.  Assembled chunk
            # by chunk with buffer donation (no 2x table peak in HBM).
            buf = jnp.zeros((D, 32, K), jnp.uint16)
            place = jax.jit(
                lambda b, ch, d0: jax.lax.dynamic_update_slice(
                    b, ch.reshape(CH, K, 32).transpose(0, 2, 1), (d0, 0, 0)
                ),
                donate_argnums=0,
            )
            for i in range(D // CH):
                TX, TY, TZ, packed = chunk_jit(TX, TY, TZ, bax, bay)
                buf = place(buf, packed, jnp.int32(i * CH))
            self.table = buf
        else:
            chunks = []
            for _ in range(D // CH):
                TX, TY, TZ, packed = chunk_jit(TX, TY, TZ, bax, bay)
                chunks.append(packed)
            dmaj = jnp.concatenate(chunks, axis=0)  # (D*W*n, 32), d-major
            # leaf-major rows (leaf*D + (d-1)) for the CPU gather path
            self.table = jax.jit(
                lambda t: t.reshape(D, K, 32).transpose(1, 0, 2).reshape(D * K, 32)
            )(dmaj)
        self._msm_jit = jax.jit(
            self._msm_affine_impl if self.vertical else self._msm_impl
        )

    # ------------------------------------------------------------- querying

    def _msm_affine_impl(self, table, scalars_mont):
        """TPU path: gather-free vertical-table select + batch-affine
        pairwise tree + complete-add tail.  (P, n, L) -> (L, P) proj."""
        P = scalars_mont.shape[0]
        n, W, D = self.n, self.W, self.D
        K = W * n
        digits = _scalars_to_digits(scalars_mont, self.c, self.bits)  # (P, n, W)
        d_t = jnp.moveaxis(digits, -1, 1).reshape(P, K).astype(jnp.int32)

        TK = min(128, K)
        x, y, inf = pallas_call(
            functools.partial(_select_kernel, P, D),
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
        # 3 batch-affine levels cover 87.5% of the adds at 6 muls/add;
        # the rest folds through projective 8-trees (no inversions, no
        # flags, ~1/4 the kernel-compile count of affine all the way down),
        # and the last TAIL_M points per MSM are summed on host.
        Kc = K
        n_affine = 0
        while Kc > TAIL_M and n_affine < AFFINE_LEVELS:
            x, y, inf = _affine_level(x, y, inf)
            Kc //= 2
            n_affine += 1
        X, Y, Z = _to_projective(x, y, inf)
        while Kc % 8 == 0 and Kc // 8 >= TAIL_M:
            X, Y, Z = _fold8(X, Y, Z)
            Kc //= 8
        while Kc > TAIL_M:  # non-8-power remainders (c=4 production: Kc=32)
            # _fold8 outputs live in afield's lazy mod-2p domain; vfield
            # assumes canonical (< p) inputs, so the tail must stay in the
            # lazy-closed afield context (host extraction reduces mod p).
            from ..ff.afield import afq_c

            h = Kc // 2
            A = (X[:, :, :h], Y[:, :, :h], Z[:, :, :h])
            B = (X[:, :, h:], Y[:, :, h:], Z[:, :, h:])
            X, Y, Z = padd_g(afq_c, A, B)
            Kc = h
        return X.reshape(L, P * Kc), Y.reshape(L, P * Kc), Z.reshape(L, P * Kc)

    def _msm_impl(self, table, scalars_mont):
        """(P, n, L) Fr Montgomery -> (L, P) projective sums."""
        P = scalars_mont.shape[0]
        n, W = self.n, self.W
        digits = _scalars_to_digits(scalars_mont, self.c, self.bits)  # (P, n, W)
        d_t = jnp.moveaxis(digits, -1, 1).reshape(P, W * n)  # (P, W*n)

        per = W * n
        S = _pick_S(per)
        J = per // S
        d_lay = jnp.moveaxis(_to_scan_layout(d_t, S), 1, 0).reshape(S, P * J)
        # Row selection WITHOUT a gather: an XLA gather of 64 B rows runs at
        # ~2 GB/s on TPU (measured 296 ms for the 537 MB table) regardless
        # of address order.  Instead STREAM the whole leaf-major table once
        # and select each leaf's row with a D-way compare chain — a fused
        # elementwise pass at HBM streaming bandwidth.
        D = self.D
        mag = jnp.abs(d_t).astype(jnp.int32)  # (P, per)
        if use_pallas():
            tabv = table.reshape(per, D, 32)
            rows = jnp.broadcast_to(tabv[:, 0, :][None], (P, per, 32))
            for d in range(2, D + 1):
                rows = jnp.where((mag == d)[..., None], tabv[None, :, d - 1, :], rows)
        else:  # CPU: plain gathers are fast there, and D passes are not
            idx = jnp.arange(per, dtype=jnp.int32)[None, :] * D + jnp.maximum(mag - 1, 0)
            rows = table[idx.reshape(-1)].reshape(P, per, 32)
        rows = rows.astype(jnp.uint32)  # (P, per, 32)
        x = jnp.moveaxis(rows[..., :L], -1, 0).reshape(L, P, per)
        y = jnp.moveaxis(rows[..., L:], -1, 0).reshape(L, P, per)
        x = jnp.moveaxis(_to_scan_layout(x, S), 2, 1).reshape(L, S, P * J)
        y = jnp.moveaxis(_to_scan_layout(y, S), 2, 1).reshape(L, S, P * J)
        return _reduce_leaves(x, y, d_lay, S, P, J)

    def msm_mont(self, scalars_mont):
        """scalars_mont: (P, n, L) horizontal Fr Montgomery limbs.
        Returns a list of P host affine points (None = identity).
        On the TPU path every batch is padded/chunked to P = 8 (zero
        scalars -> identity): one fixed batch shape means ONE compiled
        kernel set — the padding costs ~2x device work on small rounds but
        saves ~15 min of cold Mosaic compiles.  Batches larger than 8 run
        as several P=8 calls: the per-level VMEM block budgets (the
        _pick_G caps in _affine_level/_fold8) are sized for P=8, and a
        single padded P=16 call exceeds Mosaic's scoped-VMEM stack (seen
        as a compile-time OOM on the r4 prover's 9-poly commit round)."""
        P = scalars_mont.shape[0]
        if self.vertical and P > 8:
            out = []
            for i in range(0, P, 8):
                out.extend(self.msm_mont(scalars_mont[i : i + 8]))
            return out
        Pb = 8 if (self.vertical and P <= 8) else 1 << max(P - 1, 0).bit_length()
        if Pb > P:
            scalars_mont = jnp.concatenate(
                [scalars_mont, jnp.zeros((Pb - P,) + scalars_mont.shape[1:], jnp.uint32)]
            )
        X, Y, Z = self._msm_jit(self.table, scalars_mont)
        return _extract_host(X, Y, Z, Pb)[:P]

    def msm_ints(self, rows: List[List[int]]):
        arr = fr_ctx.to_mont_limbs([s % R_MOD for row in rows for s in row]).reshape(
            len(rows), self.n, L
        )
        return self.msm_mont(arr)


def _extract_host(X, Y, Z, P: int):
    """(L, P*m) projective partial sums -> P host affine points.

    All Z inverses share ONE Fermat exponentiation via a Montgomery batch-
    inversion product tree: the per-point `pow(Z, q-2)` form cost ~0.9 ms
    per partial sum in python, which at the r4 TAIL_M=16 tail dominated the
    whole MSM (profiled: device stages ~1 ms, host extract >100 ms)."""
    from ..curve.bn254 import g1_add

    m = X.shape[1] // P
    flat = jnp.concatenate([X, Y, Z], axis=1)  # (L, 3*P*m)
    ints = fq_ctx.from_mont_limbs(jnp.moveaxis(flat, 0, -1))
    N = P * m
    zs = ints[2 * N :]
    # batch inversion of the nonzero Zs (one pow, 3 muls per element)
    nz = [z for z in zs if z != 0]
    inv_map = {}
    if nz:
        prefix = [1]
        for z in nz:
            prefix.append(prefix[-1] * z % Q_MOD)
        inv = pow(prefix[-1], Q_MOD - 2, Q_MOD)
        for idx in range(len(nz) - 1, -1, -1):
            inv_map[idx] = prefix[idx] * inv % Q_MOD
            inv = inv * nz[idx] % Q_MOD
    nz_at = {}
    pos = 0
    for k, z in enumerate(zs):
        if z != 0:
            nz_at[k] = pos
            pos += 1
    out = []
    for i in range(P):
        acc = None
        for j in range(m):
            k = i * m + j
            Xi, Yi, Zi = ints[k], ints[N + k], ints[2 * N + k]
            if Zi == 0:
                continue
            zi = inv_map[nz_at[k]]
            acc = g1_add(acc, (Xi * zi % Q_MOD, Yi * zi % Q_MOD))
        out.append(acc)
    return out
