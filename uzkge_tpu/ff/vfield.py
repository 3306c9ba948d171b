"""Vertical-layout Montgomery field arithmetic for BN254 Fr/Fq on TPU.

The round-1 kernels (`jax_field.MontCtx`) store a field element as the
*minor-most* 16 limbs — shape (..., 16).  On TPU the minor dimension maps to
the 128-wide vector lanes, so that layout uses 16/128 lanes and wastes 8x of
the VPU (measured: ~30 Mmul/s).  This module keeps the same 16x16-bit
delayed-carry CIOS algorithm but flips the layout:

    field elements are (L, *batch) uint32 — limbs ride the SUBLANE axis,
    batch elements ride the 128-lane axis.

With a large batch the lanes are fully occupied and the 16 CIOS iterations
are unrolled (static row indexing, no dynamic_slice), which also removes the
fori_loop dispatch overhead.  Measured ~10x over the horizontal kernels.

Everything here is pure jnp and jit-friendly; these are the kernels under
the MSM tree (msm/fixed_base.py) and the Stockham NTT core (ntt/stockham.py).

Reference semantics: ark-ff 64-bit Montgomery backend (the reference uses it
via `Fr`/`Fq`, e.g. uzkge/src/plonk/helpers.rs); values match `MontCtx`
bit-for-bit (same R = 2^256 Montgomery domain), only the device layout
differs.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .jax_field import L, BITS, MASK, int_to_limbs_np, MontCtx


def v_from_h(x):
    """(..., L) horizontal limbs -> (L, ...) vertical."""
    return jnp.moveaxis(x, -1, 0)


def h_from_v(x):
    """(L, ...) vertical limbs -> (..., L) horizontal."""
    return jnp.moveaxis(x, 0, -1)


def _shift_up(x, d):
    """Shift rows toward higher limb index along axis 0 (zero fill)."""
    pad = jnp.zeros((d,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


class VMontCtx:
    """Montgomery context with vertical (limb-major) layout kernels.

    compact=True trades the unrolled CIOS (fast, but ~250 HLO ops per mul —
    graphs with ~100 inline muls take minutes to compile on XLA:CPU) for a
    lax.fori_loop over the 16 iterations (~15-op body): the variant for
    compile-time-critical paths like the sharded MSM/dryrun, where runtime
    is dominated by data movement anyway."""

    def __init__(self, hctx: MontCtx, compact: bool = False):
        self.h = hctx
        self.p = hctx.p
        self.compact = compact
        self.n0inv = np.uint32(hctx.n0inv)
        self._p_np = int_to_limbs_np(hctx.p)
        self._one_np = int_to_limbs_np(1)
        self._mont_one_np = int_to_limbs_np(hctx.r_mod)
        self._r2_np = int_to_limbs_np(hctx.r2)

    # -------------------------------------------------- constants (per rank)
    def _c(self, limbs_np, ndim):
        return jnp.asarray(limbs_np.reshape((L,) + (1,) * (ndim - 1)))

    def p_arr(self, ndim):
        return self._c(self._p_np, ndim)

    def mont_one(self, ndim):
        return self._c(self._mont_one_np, ndim)

    def one_std(self, ndim):
        return self._c(self._one_np, ndim)

    # ------------------------------------------------------------ primitives
    def _ks_normalize(self, s):
        """Kogge-Stone carry resolution for rows with lane values <= 2^17-1.
        Returns (16-bit rows, carry-out row)."""
        slo = s & MASK
        g = s >> BITS
        pr = (slo == MASK).astype(jnp.uint32)
        G, Pk = g, pr
        d = 1
        while d < L:
            G = G | (Pk & _shift_up(G, d))
            Pk = Pk & _shift_up(Pk, d)
            d *= 2
        cin = _shift_up(G, 1)
        return (slo + cin) & MASK, G[L - 1]

    def _cond_sub_p(self, t):
        comp = self._c(np.array([MASK - int(x) for x in self._p_np], dtype=np.uint32), t.ndim)
        s = t + comp
        s = s.at[0].add(1)
        out, carry = self._ks_normalize(s)
        return jnp.where((carry == 1)[None], out, t)

    # ------------------------------------------------------------ public ops
    def add(self, a, b):
        s = a + b
        out, _ = self._ks_normalize(s)
        return self._cond_sub_p(out)

    def sub(self, a, b):
        compb = (MASK - b) & MASK
        s = a + compb
        s = s.at[0].add(1)
        out, carry = self._ks_normalize(s)
        borrow = carry == 0
        s2 = out + jnp.where(borrow[None], self.p_arr(a.ndim), jnp.uint32(0))
        out2, _ = self._ks_normalize(s2)
        return out2

    def neg(self, a):
        compa = (MASK - a) & MASK
        s = self.p_arr(a.ndim) + compa
        s = s.at[0].add(1)
        out, _ = self._ks_normalize(s)
        is_zero = jnp.all(a == 0, axis=0, keepdims=True)
        return jnp.where(is_zero, jnp.zeros_like(out), out)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Delayed-carry CIOS Montgomery mul (unrolled, or a fori_loop when
        compact).  Same overflow analysis as jax_field.MontCtx.mul: uint32
        accumulator lanes grow by <= 4*(2^16-1) per iteration over 16
        iterations, staying < 2^22."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        zrow = jnp.zeros((1,) + shape[1:], dtype=jnp.uint32)
        p_arr = self.p_arr(a.ndim)

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
        return self._cond_sub_p(out)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for a small python int k via double-and-add in the field."""
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

    # container helpers shared with pallas_rows.RowCtx (generic EC formulas)
    def halve(self, a):
        h = a.shape[-1] // 2
        return a[..., :h], a[..., h:]

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_mont_like(self, a):
        return jnp.broadcast_to(self.mont_one(a.ndim), a.shape)

    def mul_const(self, a, value: int):
        """a * const (python int, converted to Montgomery at trace time)."""
        c = (value % self.p) * self.h.R % self.p
        return self.mul(a, self._c(int_to_limbs_np(c), a.ndim))

    def to_mont(self, a):
        return self.mul(a, self._c(self._r2_np, a.ndim))

    def from_mont(self, a):
        return self.mul(a, self._c(self._one_np, a.ndim))

    def select(self, cond, a, b):
        """cond: batch-shaped bool -> elementwise select of limb arrays."""
        return jnp.where(cond[None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def pow_const(self, a, e: int):
        """a^e for static python-int exponent, as a lax.scan over bits (tiny
        trace; used for the per-level Fermat inversion of batch_inv)."""
        if e == 0:
            return jnp.broadcast_to(self.mont_one(a.ndim), a.shape)
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.uint32)
        )

        def body(carry, bit):
            result, base = carry
            result = jnp.where((bit != 0)[None], self.mul(result, base), result)
            base = self.mul(base, base)
            return (result, base), None

        init = (jnp.broadcast_to(self.mont_one(a.ndim), a.shape), a)
        (result, _), _ = jax.lax.scan(body, init, bits)
        return result

    def inv(self, a):
        return self.pow_const(a, self.p - 2)

    def batch_inv(self, a, zero_to_one: bool = False):
        """Batched inversion over axis 1 of (L, N, *rest) via a product tree:
        N muls up, one Fermat inversion at the root, 2N muls down — ~3 muls
        per element (the reference's sequential batch_inversion,
        helpers.rs:208, is host-serial; this is the TPU shape of it).
        N is padded to a power of two with ones."""
        n = a.shape[1]
        if zero_to_one:
            a = self.select(self.is_zero(a), jnp.broadcast_to(self.mont_one(a.ndim), a.shape), a)
        n2 = 1 << max(n - 1, 0).bit_length()
        if n2 > n:
            pad = jnp.broadcast_to(self.mont_one(a.ndim), (L, n2 - n) + a.shape[2:])
            a_p = jnp.concatenate([a, pad], axis=1)
        else:
            a_p = a
        levels = []
        cur = a_p
        while cur.shape[1] > 1:
            levels.append(cur)
            cur = self.mul(cur[:, 0::2], cur[:, 1::2])
        inv = self.inv(cur)
        for lev in reversed(levels):
            left, right = lev[:, 0::2], lev[:, 1::2]
            inv_l = self.mul(inv, right)
            inv_r = self.mul(inv, left)
            inv = jnp.stack([inv_l, inv_r], axis=2).reshape(
                (L, lev.shape[1]) + lev.shape[2:]
            )
        return inv[:, :n]


from .jax_field import fr_ctx, fq_ctx  # noqa: E402

vfr = VMontCtx(fr_ctx)
vfq = VMontCtx(fq_ctx)
# compile-time-critical variants (sharded MSM, multichip dryrun)
vfr_c = VMontCtx(fr_ctx, compact=True)
vfq_c = VMontCtx(fq_ctx, compact=True)
