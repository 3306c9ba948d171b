"""Array-form Montgomery field arithmetic for INSIDE Pallas TPU kernels.

Why a third field form (after pallas_rows.RowCtx lists and vfield.VMontCtx):

  * RowCtx represents an element batch as a python list of 16 limb rows; a
    fully-unrolled CIOS multiply traces to ~1200 HLO ops.  A kernel with a
    few dozen inline muls (the MSM leaf reduction) becomes a 100k+-op trace
    and Mosaic compile times explode (observed: >30 min at interleave 8).
  * VMontCtx ops are array-form (limbs on axis 0) with ~15x smaller traces,
    but its constants are jnp arrays created at trace time — Pallas rejects
    captured non-scalar constants ("You should pass them as inputs").

AField is VMontCtx's array layout with kernel-safe constants: every constant
is synthesized inside the trace from python-int immediates (jnp.full +
concatenate), so kernels close over nothing.  Elements are (L, *batch)
uint32 arrays, limbs little-endian on axis 0.

It also runs arithmetic in the lazy **mod-2p domain**: CIOS with inputs
< 2p produces outputs < 2p (4p < 2^256 for both BN254 moduli), so the final
conditional subtract-p is dropped from mul, and add/sub reduce mod 2p with
one conditional subtract.  Representatives leave the kernel unnormalized;
host extraction (`MontCtx.from_mont_limbs`) reduces mod p, so nothing
observable changes.  `normalize()` gives the canonical < p form when a
kernel needs exact comparisons.

`mul(..., )` trace size is ~220 HLO (unrolled) or ~35 (compact fori_loop) —
pick per kernel via the `compact` constructor flag.

Reference semantics: ark-ff Montgomery backend (same R = 2^256 domain as
ff.jax_field.MontCtx; values match after reduction mod p).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .jax_field import L, BITS, MASK, MontCtx, int_to_limbs_np


def _imm_col(limbs, like_shape):
    """Python-int limbs -> (L,) + batch-shape constant built from scalar
    immediates only (Pallas-kernel safe).  Each limb row is a FULL-shape
    splat (jnp.full), not a (1,...,1) column left for broadcasting:
    Mosaic lowers a (L,1,..,1) -> (L,*batch) broadcast as one
    vector.broadcast over both the sublane and lane axes, which it does
    not implement ("Broadcast in both sublanes and lanes" — the round-4
    _fold8 compile failure).  Splat constants have no broadcast at all."""
    batch = tuple(like_shape[1:])
    rows = [jnp.full((1,) + batch, np.uint32(v), jnp.uint32) for v in limbs]
    return jnp.concatenate(rows, axis=0)


def _shift_up(x, d):
    pad = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


class AField:
    def __init__(self, hctx: MontCtx, compact: bool = False):
        self.h = hctx
        self.p = hctx.p
        self.compact = compact
        self.n0inv = np.uint32(hctx.n0inv)
        self.p_limbs = [int(x) for x in int_to_limbs_np(hctx.p)]
        self.p2_limbs = [int(x) for x in int_to_limbs_np(2 * hctx.p)]
        self.p2c_limbs = [int(MASK - x) for x in int_to_limbs_np(2 * hctx.p)]
        self.pc_limbs = [int(MASK - x) for x in int_to_limbs_np(hctx.p)]
        self.mont_one_limbs = [int(x) for x in int_to_limbs_np(hctx.r_mod)]

    # ------------------------------------------------------------ primitives

    @staticmethod
    def _ks_normalize(s):
        """Kogge-Stone carry resolution for lanes <= 2^17 - 1."""
        slo = s & MASK
        g = s >> BITS
        pr = (slo == MASK).astype(jnp.uint32)
        G, Pk = g, pr
        d = 1
        while d < L:
            G = G | (Pk & _shift_up(G, d))
            Pk = Pk & _shift_up(Pk, d)
            d *= 2
        return (slo + _shift_up(G, 1)) & MASK, G[L - 1]

    def _cond_sub(self, t, comp_limbs):
        """t - M if t >= M else t, with M given by its limb complement."""
        s = t + _imm_col(comp_limbs, t.shape)
        s = jnp.concatenate([s[0:1] + 1, s[1:]], axis=0)
        out, carry = self._ks_normalize(s)
        return jnp.where((carry == 1)[None], out, t)

    # ------------------------------------------------------------ public ops

    def add(self, a, b):
        out, _ = self._ks_normalize(a + b)  # < 4p < 2^256: no carry-out
        return self._cond_sub(out, self.p2c_limbs)

    def sub(self, a, b):
        """a - b mod 2p for a, b < 2p: a + (complement of b) + 1 + 2p."""
        s = a + ((MASK - b) & MASK) + _imm_col(self.p2_limbs, a.shape)
        # lanes <= 3*(2^16-1) < 2^18: KS handles <= 2^17-1, so fold once
        s = (s & MASK) + _shift_up(s >> BITS, 1)
        s = jnp.concatenate([s[0:1] + 1, s[1:]], axis=0)
        out, carry = self._ks_normalize(s)
        # carry-out of 2^256 == the (a >= b+...) wrap: discard (mod 2^256
        # arithmetic); result = a - b + 2p in [1, 4p) -> reduce once
        return self._cond_sub(out, self.p2c_limbs)

    def neg(self, a):
        """2p - a for a in [0, 2p), then one reduction; maps 0 to 0-ish (2p
        = 0 mod p, kept in-range by the conditional subtract)."""
        s = _imm_col(self.p2_limbs, a.shape) + ((MASK - a) & MASK)
        s = jnp.concatenate([s[0:1] + 1, s[1:]], axis=0)
        out, _ = self._ks_normalize(s)
        return self._cond_sub(out, self.p2c_limbs)

    def mul(self, a, b):
        """CIOS Montgomery mul, lazy domain: inputs < 2p -> output < 2p.
        (4p^2/R + p < 2p needs 4p < R = 2^256: true for BN254 Fq/Fr.)"""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        zrow = jnp.zeros((1,) + shape[1:], dtype=jnp.uint32)
        p_arr = _imm_col(self.p_limbs, shape)

        def step(t, bi):
            prod = a * bi
            t = t + jnp.concatenate([prod & MASK, zrow], axis=0) \
                  + jnp.concatenate([zrow, prod >> BITS], axis=0)
            m = ((t[0] & MASK) * self.n0inv) & MASK
            mp = p_arr * m
            t = t + jnp.concatenate([mp & MASK, zrow], axis=0) \
                  + jnp.concatenate([zrow, mp >> BITS], axis=0)
            carry0 = t[0] >> BITS
            return jnp.concatenate([(t[1] + carry0)[None], t[2:], zrow], axis=0)

        t = jnp.zeros((L + 1,) + shape[1:], dtype=jnp.uint32)
        if self.compact:
            t = jax.lax.fori_loop(
                0, L, lambda i, t: step(t, jax.lax.dynamic_index_in_dim(b, i, 0)), t
            )
        else:
            for i in range(L):
                t = step(t, b[i])
        t = t[:L]
        t = (t & MASK) + _shift_up(t >> BITS, 1)
        out, _ = self._ks_normalize(t)
        return out  # < 2p (lazy domain; no cond-sub-p)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        assert k >= 1
        result = None
        addend = a
        while k:
            if k & 1:
                result = addend if result is None else self.add(result, addend)
            k >>= 1
            if k:
                addend = self.add(addend, addend)
        return result

    def normalize(self, a):
        """Canonical representative < p (one extra conditional subtract)."""
        return self._cond_sub(a, self.pc_limbs)

    # ------------------------------------------------- container interface

    def select(self, cond, a, b):
        return jnp.where(cond[None], a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_mont_like(self, a):
        return jnp.broadcast_to(_imm_col(self.mont_one_limbs, a.shape), a.shape)

    def is_zero(self, a):
        """Zero test in the lazy domain: a in {0, p} (2p is reduced away by
        _cond_sub in add/sub/neg; mul output is < 2p and == 0 mod p only at
        0 or p)."""
        n = self.normalize(a)
        return jnp.all(n == 0, axis=0)

    def halve(self, a):
        h = a.shape[-1] // 2
        return a[..., :h], a[..., h:]


from .jax_field import fr_ctx, fq_ctx  # noqa: E402

afq = AField(fq_ctx)
afr = AField(fr_ctx)
afq_c = AField(fq_ctx, compact=True)
afr_c = AField(fr_ctx, compact=True)
