"""Multi-scalar multiplication over BN254 G1 on TPU.

TPU-first Pippenger (reference counterpart: arkworks `VariableBaseMSM::msm`
called from `KZGCommitmentScheme::commit`, kzg_poly_commitment.rs:278-293):

  * window width c = 8 -> 32 windows per 256-bit scalar; digits are extracted
    on-device from the 16-bit limb representation (one limb = two digits);
  * bucket accumulation has no atomics on TPU, so points are split into K
    chunks; a `lax.scan` walks the chunks' points in lockstep, each step doing
    one gather + complete mixed addition + scatter per (window, chunk) lane —
    32*K parallel addition streams, n/K sequential steps;
  * chunk-partial buckets fold with a log2(K) tree of complete projective
    additions; per-window weighted bucket reduction is the classic running
    double-sum as a 255-step scan; the final 32-point window combine is tiny
    and runs on host;
  * addition formulas are the *complete* Renes-Costello-Batina formulas for
    a=0 short Weierstrass curves (Alg. 7/8 of eprint 2015/1060), so identity
    and doubling cases need no branches — branch-free is what the VPU wants;
  * an arbitrary leading batch axis vectorizes many MSMs over the same bases
    (the prover commits many polynomials per round — they all ride one scan).

Multi-chip sharding (points split across the mesh, bucket psum) lives in
uzkge_tpu.parallel.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants.bn254 import Q_MOD
from ..ff.jax_field import fq_ctx, fr_ctx, L
from ..curve.bn254 import g1_add, g1_mul

C_BITS = 8
N_WINDOWS = 32
N_BUCKETS = 1 << C_BITS

_B3 = fq_ctx.to_mont_limbs(9)  # 3*b with b=3


def _madd(ctx, X1, Y1, Z1, x2, y2):
    """Complete mixed addition (proj + affine), RCB Alg. 8, a=0, b3=9."""
    mul, add, sub = ctx.mul, ctx.add, ctx.sub
    b3 = jnp.broadcast_to(_B3, X1.shape)
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
    t2 = mul(b3, Z1)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
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


def _padd(ctx, X1, Y1, Z1, X2, Y2, Z2):
    """Complete projective addition, RCB Alg. 7, a=0, b3=9."""
    mul, add, sub = ctx.mul, ctx.add, ctx.sub
    b3 = jnp.broadcast_to(_B3, X1.shape)
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
    t2 = mul(b3, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
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


class MSMBases:
    """Fixed affine G1 bases resident on device (Fq Montgomery limbs)."""

    def __init__(self, points, chunks: int = None):
        assert all(p is not None for p in points), "identity base not supported"
        self.n = len(points)
        if chunks is None:
            # each chunk should hold >= 64 points: the bucket state is
            # chunks * 256 buckets per window, and folding it costs
            # chunks * 256 additions — oversplitting small inputs explodes
            # both memory and fold work
            chunks = max(1, self.n // 64)
        self.chunks = max(1, min(chunks, 32, self.n))
        while self.n % self.chunks:
            self.chunks -= 1
        xs = fq_ctx.to_mont_limbs([p[0] for p in points])
        ys = fq_ctx.to_mont_limbs([p[1] for p in points])
        self.x = xs.reshape(self.n, L)
        self.y = ys.reshape(self.n, L)
        self.points = list(points)


def _digits_from_std_limbs(std_limbs):
    """(..., n, L) standard-form 16-bit limbs -> (..., n, 32) uint8-sized
    digits as int32 (limb j -> digits 2j, 2j+1)."""
    lo = std_limbs & 0xFF
    hi = (std_limbs >> 8) & 0xFF
    d = jnp.stack([lo, hi], axis=-1)  # (..., n, L, 2)
    return d.reshape(*std_limbs.shape[:-1], 2 * L).astype(jnp.int32)


@partial(jax.jit, static_argnums=(3,))
def _msm_device(px, py, scalars_mont, chunks):
    """Core batched MSM.

    px, py: (n, L) affine base coords (Fq Montgomery limbs).
    scalars_mont: (P, n, L) Fr Montgomery limbs.
    Returns window sums as projective coords, shape (P, W, 3, L).
    """
    P, n, _ = scalars_mont.shape
    K = chunks
    Cn = n // K
    W = N_WINDOWS

    std = fr_ctx.from_mont(scalars_mont)  # standard-form limbs
    digits = _digits_from_std_limbs(std)  # (P, n, 32)
    # arrange: (C, P, W, K)
    dig = digits.reshape(P, K, Cn, W).transpose(2, 0, 3, 1)
    # points per step: (C, K, L)
    pxs = px.reshape(K, Cn, L).transpose(1, 0, 2)
    pys = py.reshape(K, Cn, L).transpose(1, 0, 2)

    zeros = jnp.zeros((P, W, K, N_BUCKETS, L), dtype=jnp.uint32)
    ones = jnp.zeros((P, W, K, N_BUCKETS, L), dtype=jnp.uint32)
    ones = ones.at[..., :].set(fq_ctx.mont_one_arr)
    BX, BY, BZ = zeros, ones, zeros  # projective identity (0 : 1 : 0)

    def gather(B, d):
        # B: (P, W, K, NB, L); d: (P, W, K) -> (P, W, K, L)
        de = d[..., None, None]
        de = jnp.broadcast_to(de, d.shape + (1, L))
        return jnp.take_along_axis(B, de, axis=3).squeeze(3)

    def scatter(B, d, v):
        de = d[..., None, None]
        de = jnp.broadcast_to(de, d.shape + (1, L))
        return jnp.put_along_axis(B, de, v[..., None, :], axis=3, inplace=False)

    def body(carry, xs):
        BX, BY, BZ = carry
        d, qx, qy = xs  # d: (P, W, K); qx/qy: (K, L)
        X1 = gather(BX, d)
        Y1 = gather(BY, d)
        Z1 = gather(BZ, d)
        x2 = jnp.broadcast_to(qx[None, None], X1.shape)
        y2 = jnp.broadcast_to(qy[None, None], Y1.shape)
        X3, Y3, Z3 = _madd(fq_ctx, X1, Y1, Z1, x2, y2)
        return (scatter(BX, d, X3), scatter(BY, d, Y3), scatter(BZ, d, Z3)), None

    (BX, BY, BZ), _ = jax.lax.scan(body, (BX, BY, BZ), (dig, pxs, pys))

    # fold the chunk axis first: tree of complete additions over bucket
    # arrays — total work P*W*B*(K-1), always cheaper than running the
    # 255-step weighted reduction with K riding along (510*K)
    k = K
    while k > 1:
        h = k // 2
        BX, BY, BZ = _padd(
            fq_ctx,
            BX[:, :, :h], BY[:, :, :h], BZ[:, :, :h],
            BX[:, :, h : 2 * h], BY[:, :, h : 2 * h], BZ[:, :, h : 2 * h],
        )
        k = h
    BX, BY, BZ = BX[:, :, 0], BY[:, :, 0], BZ[:, :, 0]  # (P, W, NB, L)

    # weighted bucket reduction: sum_{b=1..255} b * B_b via running double-sum
    idx = jnp.arange(N_BUCKETS - 1, 0, -1)
    xs = (BX[:, :, idx].transpose(2, 0, 1, 3),
          BY[:, :, idx].transpose(2, 0, 1, 3),
          BZ[:, :, idx].transpose(2, 0, 1, 3))
    accX = jnp.zeros((P, W, L), jnp.uint32)
    accY = jnp.broadcast_to(fq_ctx.mont_one_arr, (P, W, L))
    accZ = jnp.zeros((P, W, L), jnp.uint32)
    totX, totY, totZ = accX, accY, accZ

    def red_body(carry, xs):
        accX, accY, accZ, totX, totY, totZ = carry
        bx, by, bz = xs
        accX, accY, accZ = _padd(fq_ctx, accX, accY, accZ, bx, by, bz)
        totX, totY, totZ = _padd(fq_ctx, totX, totY, totZ, accX, accY, accZ)
        return (accX, accY, accZ, totX, totY, totZ), None

    (accX, accY, accZ, totX, totY, totZ), _ = jax.lax.scan(
        red_body, (accX, accY, accZ, totX, totY, totZ), xs
    )

    return jnp.stack([totX, totY, totZ], axis=2)  # (P, W, 3, L)


def _window_sums_to_points(wsums):
    """(P, W, 3, L) projective Montgomery coords -> list of host affine points
    per batch entry, combined over windows with the 2^8 ladder."""
    P, W = wsums.shape[0], wsums.shape[1]
    flat = wsums.reshape(P * W * 3, L)
    ints = fq_ctx.from_mont_limbs(flat)
    out = []
    q = Q_MOD
    for pi in range(P):
        win_pts = []
        for wi in range(W):
            base = (pi * W + wi) * 3
            X, Y, Z = ints[base], ints[base + 1], ints[base + 2]
            if Z == 0:
                win_pts.append(None)
            else:
                zinv = pow(Z, q - 2, q)
                win_pts.append((X * zinv % q, Y * zinv % q))
        # Horner over windows, high to low: acc = acc * 2^8 + win
        acc = None
        for wi in range(W - 1, -1, -1):
            if acc is not None:
                for _ in range(C_BITS):
                    acc = g1_add(acc, acc)
            acc = g1_add(acc, win_pts[wi]) if acc is not None else win_pts[wi]
        out.append(acc)
    return out


import os

# Below this point count a device launch is all compile/dispatch overhead
# (tiny Groth16 circuits, test fixtures); host Pippenger wins outright.
HOST_MSM_MAX = int(os.environ.get("UZKGE_MSM_HOST_MAX", "512"))


def host_msm(points, scalars, c: int = 8):
    """Host Pippenger over G1 affine points (python ints). Used for small
    inputs where a device kernel launch cannot amortize; same window/bucket
    scheme as the device kernel."""
    from ..constants.bn254 import R_MOD

    pairs = [(p, s % R_MOD) for p, s in zip(points, scalars) if p is not None and s % R_MOD]
    if not pairs:
        return None
    nwin = (254 + c - 1) // c
    acc = None
    for win in reversed(range(nwin)):
        if acc is not None:
            for _ in range(c):
                acc = g1_add(acc, acc)
        buckets = {}
        shift = win * c
        for p, s in pairs:
            d = (s >> shift) & ((1 << c) - 1)
            if d:
                buckets[d] = g1_add(buckets.get(d), p)
        running = None
        wsum = None
        for d in range(max(buckets.keys(), default=0), 0, -1):
            if d in buckets:
                running = g1_add(running, buckets[d])
            if running is not None:
                wsum = g1_add(wsum, running)
        acc = g1_add(acc, wsum)
    return acc


def msm(bases: MSMBases, scalars, batch_input: bool = False):
    """MSM over fixed bases.

    scalars: list of python ints (single MSM) or list of lists (batched MSMs
    over the same bases) or a device array (P, n, L) of Fr Montgomery limbs.
    Returns one host affine point, or a list for batched input.
    """
    if not isinstance(scalars, jnp.ndarray) and bases.n <= HOST_MSM_MAX:
        if scalars and isinstance(scalars[0], (list, tuple)):
            return [host_msm(bases.points, row) for row in scalars]
        pt = host_msm(bases.points, scalars)
        return pt if batch_input is False else [pt]
    if isinstance(scalars, jnp.ndarray):
        sc = scalars if scalars.ndim == 3 else scalars[None]
        single = scalars.ndim == 2
    else:
        if scalars and isinstance(scalars[0], (list, tuple)):
            rows = scalars
            single = False
        else:
            rows = [scalars]
            single = batch_input is False
        flat = [s for row in rows for s in row]
        arr = fr_ctx.to_mont_limbs(flat).reshape(len(rows), bases.n, L)
        sc = arr
    # bucket the batch axis (bounds compile variants, limits padding waste)
    Pb = sc.shape[0]
    Pb_padded = next(b for b in (1, 2, 4, 8, 12, 16, 20, 24, 32) if b >= Pb)
    if Pb_padded > Pb:
        sc = jnp.concatenate(
            [sc, jnp.zeros((Pb_padded - Pb, sc.shape[1], L), jnp.uint32)], axis=0
        )
    wsums = _msm_device(bases.x, bases.y, sc, bases.chunks)[:Pb]
    pts = _window_sums_to_points(np.asarray(jax.device_get(wsums)))
    return pts[0] if single else pts
