"""Limb-vectorized Montgomery arithmetic for BN254 Fr/Fq on TPU (JAX/XLA).

Design (TPU-first, not a port — the reference uses 64-bit Montgomery limbs in
Rust, ark-ff; TPUs have no 64-bit integer datapath):

  * a field element is 16 little-endian limbs of 16 bits stored as uint32,
    array shape (..., 16); the batch dimensions vectorize onto the VPU's
    8x128 lanes;
  * products of 16-bit limbs plus two 16-bit carries fit *exactly* in uint32
    ((B-1)^2 + 2(B-1) = B^2 - 1), so CIOS Montgomery multiplication runs
    carry-exact in native 32-bit integer ops with no emulation;
  * R = 2^256; device-resident data stays in the Montgomery domain, host
    conversion happens at orchestration boundaries only;
  * everything is shape-static and jit-friendly; batch inversion is done with
    prefix/suffix product scans + one Fermat inversion instead of the
    reference's sequential `batch_inversion` (helpers.rs:208).

All kernels are pure jnp so they fuse under XLA; Pallas variants of the
hottest fused pipelines live next to their consumers (ntt/msm/quotient).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

L = 16  # limbs
BITS = 16  # bits per limb
MASK = (1 << BITS) - 1
NBITS = L * BITS  # 256


def int_to_limbs_np(v: int) -> np.ndarray:
    return np.array([(v >> (BITS * i)) & MASK for i in range(L)], dtype=np.uint32)


def limbs_to_int(arr) -> int:
    a = np.asarray(arr, dtype=np.uint64)
    return sum(int(a[..., i] if a.ndim == 1 else a[i]) << (BITS * i) for i in range(L))


class MontCtx:
    """Montgomery context for one modulus; holds host + device constants and
    the jitted kernels."""

    def __init__(self, modulus: int):
        self.p = modulus
        self.R = 1 << NBITS
        self.r_mod = self.R % modulus
        self.r2 = self.R * self.R % modulus
        self.n0inv = (-pow(modulus, -1, 1 << BITS)) % (1 << BITS)
        self.p_limbs = tuple(int(x) for x in int_to_limbs_np(modulus))
        self.p_arr = jnp.asarray(int_to_limbs_np(modulus))
        self.r2_arr = jnp.asarray(int_to_limbs_np(self.r2))
        self.one_arr = jnp.asarray(int_to_limbs_np(1))
        self.mont_one_arr = jnp.asarray(int_to_limbs_np(self.r_mod))

    # ---------------- host <-> device conversion ----------------

    def to_mont_limbs(self, values) -> jnp.ndarray:
        """python ints (scalar or list of ints) -> Montgomery limb array.
        Vectorized via a bytes round-trip: ints -> 32-byte LE blobs -> uint16
        limb view."""
        scalar = isinstance(values, int)
        if scalar:
            values = [values]
        p, r = self.p, self.R
        blob = b"".join((v % p * r % p).to_bytes(32, "little") for v in values)
        arr = np.frombuffer(blob, dtype="<u2").reshape(-1, L).astype(np.uint32)
        out = jnp.asarray(arr)
        return out[0] if scalar else out

    def from_mont_bytes(self, arr) -> bytes:
        """Montgomery limb array -> concatenated 32-byte LE standard-form
        scalars, without materializing python ints (feeds native_host)."""
        if not hasattr(self, "_from_mont_jit"):
            self._from_mont_jit = jax.jit(self.from_mont)
        std = self._from_mont_jit(arr)
        a = np.asarray(jax.device_get(std)).astype("<u2")
        return a.tobytes()

    def to_mont_limbs_from_bytes(self, blob: bytes) -> jnp.ndarray:
        """Inverse of from_mont_bytes: packed LE scalars -> Montgomery limbs
        (conversion to the Montgomery domain happens on device)."""
        arr = np.frombuffer(blob, dtype="<u2").reshape(-1, L).astype(np.uint32)
        return self.to_mont(jnp.asarray(arr))

    def from_mont_limbs(self, arr):
        """Montgomery limb array -> python ints (flattened leading shape for
        ndim > 1, scalar for ndim == 1)."""
        a = np.asarray(jax.device_get(arr)).astype(np.uint16).reshape(-1, L)
        blob = a.astype("<u2").tobytes()
        rinv = pow(self.R, -1, self.p)
        out = [
            int.from_bytes(blob[i * 32 : (i + 1) * 32], "little") * rinv % self.p
            for i in range(a.shape[0])
        ]
        if np.asarray(arr).ndim == 1:
            return out[0]
        return out


    # ---------------- core limb helpers (traced) ----------------

    @staticmethod
    def _split(x):
        return [x[..., j] for j in range(L)]

    @staticmethod
    def _join(limbs):
        return jnp.stack(limbs, axis=-1)

    @staticmethod
    def _shift_up(x, d):
        """Shift lanes toward higher limb index by d (zero fill)."""
        pad = jnp.zeros(x.shape[:-1] + (d,), dtype=x.dtype)
        return jnp.concatenate([pad, x[..., :-d]], axis=-1)

    @classmethod
    def _ks_normalize(cls, s):
        """Kogge-Stone carry resolution for lanes with values <= 2^17 - 1.
        Returns (normalized 16-bit lanes, carry-out of the top lane).
        Log-depth vector form — sequential per-limb ripple chains make XLA
        compile time explode, this doesn't."""
        slo = s & MASK
        g = s >> BITS  # generate: 0/1
        p = (slo == MASK).astype(jnp.uint32)  # propagate
        G, Pk = g, p
        d = 1
        while d < L:
            G = G | (Pk & cls._shift_up(G, d))
            Pk = Pk & cls._shift_up(Pk, d)
            d *= 2
        cin = cls._shift_up(G, 1)
        out = (slo + cin) & MASK
        return out, G[..., L - 1]

    def _comp_p(self):
        return jnp.asarray(np.array([MASK - l for l in self.p_limbs], dtype=np.uint32))

    def _cond_sub_p(self, t):
        """t (list of lanes or array) -> t - p if t >= p else t."""
        if isinstance(t, list):
            t = self._join(t)
        comp = self._comp_p()
        s = t + comp
        s = s.at[..., 0].add(1)
        out, carry = self._ks_normalize(s)
        res = jnp.where((carry == 1)[..., None], out, t)
        return [res[..., j] for j in range(L)]

    # ---------------- public ops (jittable on (..., L) uint32) ----------------

    def add(self, a, b):
        s = a + b  # lanes <= 2^17 - 2
        out, _ = self._ks_normalize(s)  # carry-out impossible: a + b < 2p < 2^255
        return self._join(self._cond_sub_p(out))

    def sub(self, a, b):
        # a - b = a + ~b + 1 (limb complement); borrow if no carry-out
        compb = (MASK - b) & MASK
        s = a + compb
        s = s.at[..., 0].add(1)
        out, carry = self._ks_normalize(s)
        borrow = (carry == 0)
        s2 = out + jnp.where(borrow[..., None], self.p_arr, jnp.uint32(0))
        out2, _ = self._ks_normalize(s2)  # carry cancels the borrow
        return out2

    def neg(self, a):
        """-a mod p (maps 0 to 0)."""
        compa = (MASK - a) & MASK
        s = self.p_arr + compa
        s = s.at[..., 0].add(1)
        out, _ = self._ks_normalize(s)
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        return jnp.where(is_zero, jnp.zeros_like(out), out)

    def mul(self, a, b, unroll: bool = False):
        """Delayed-carry CIOS Montgomery multiplication: a*b*R^-1 mod p.

        Limb lanes are uint32 *accumulators* with weight 2^(16j); partial
        products are split lo/hi and accumulated without carry propagation
        (per-lane growth <= 16 iterations * 4 * 2^16 < 2^22, so no overflow),
        with a single carry normalization at the end.  The 16 outer CIOS
        iterations run as a lax.fori_loop by default so the traced graph is
        tiny (compile time matters: kernels contain hundreds of muls);
        `unroll=True` unrolls them for latency-critical standalone use."""
        p_arr = self.p_arr
        n0inv = np.uint32(self.n0inv)
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        zcol = jnp.zeros(shape[:-1] + (1,), dtype=jnp.uint32)

        def pad_r(x):  # weight-aligned into L+1 lanes (low part)
            return jnp.concatenate([x, zcol], axis=-1)

        def pad_l(x):  # shifted one lane up (high part)
            return jnp.concatenate([zcol, x], axis=-1)

        def step(t, bi):
            prod = a * bi  # full 32-bit products
            t = t + pad_r(prod & MASK) + pad_l(prod >> BITS)
            m = ((t[..., 0:1] & MASK) * n0inv) & MASK
            mp = p_arr * m
            t = t + pad_r(mp & MASK) + pad_l(mp >> BITS)
            # divide by 2^16: drop lane 0 (its low bits are 0 by construction
            # of m) and fold its high bits into the new lane 0
            carry0 = t[..., 0:1] >> BITS
            return jnp.concatenate([t[..., 1:2] + carry0, t[..., 2:], zcol], axis=-1)

        t = jnp.zeros(shape[:-1] + (L + 1,), dtype=jnp.uint32)
        if unroll:
            for i in range(L):
                t = step(t, b[..., i : i + 1])
        else:
            def body(i, t):
                bi = jax.lax.dynamic_slice_in_dim(b, i, 1, axis=-1)
                return step(t, bi)

            t = jax.lax.fori_loop(0, L, body, t)
        # final carry normalization: one folding pass brings lanes (< 2^22)
        # to <= 2^16 + 63, then Kogge-Stone finishes exactly.  CIOS bound:
        # result < 2p (4p < R), so the top lane vanishes.
        t = t[..., :L]
        t = (t & MASK) + self._shift_up(t >> BITS, 1)
        out, _ = self._ks_normalize(t)
        out = self._cond_sub_p(out)
        return self._join(out)

    def sqr(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.mul(a, jnp.broadcast_to(self.r2_arr, a.shape))

    def from_mont(self, a):
        return self.mul(a, jnp.broadcast_to(self.one_arr, a.shape))

    def select(self, cond, a, b):
        """cond: (...,) bool -> elementwise select of limb arrays."""
        return jnp.where(cond[..., None], a, b)

    def pow_const(self, a, e: int, unroll_threshold: int = 8):
        """a^e for a static python-int exponent.  Small exponents unroll at
        trace time; large ones (e.g. Fermat inversion) run as a lax.scan over
        the exponent's bits so the traced body stays one square + one
        conditional multiply."""
        if e == 0:
            return jnp.broadcast_to(self.mont_one_arr, a.shape)
        if e.bit_length() <= unroll_threshold:
            result = None
            base = a
            while e:
                if e & 1:
                    result = base if result is None else self.mul(result, base)
                base = self.mul(base, base)
                e >>= 1
            return result
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=np.uint32)
        )

        def body(carry, bit):
            result, base = carry
            new_result = self.mul(result, base)
            result = jnp.where((bit != 0)[..., None], new_result, result)
            base = self.mul(base, base)
            return (result, base), None

        init = (jnp.broadcast_to(self.mont_one_arr, a.shape), a)
        (result, _), _ = jax.lax.scan(body, init, bits)
        return result

    def inv(self, a):
        """Fermat inverse a^(p-2); fine for single elements / small batches."""
        return self.pow_const(a, self.p - 2)

    def batch_inv(self, a, axis=0):
        """Batch inversion via prefix/suffix product scans + one Fermat
        inverse: inv_i = prefix_{<i} * suffix_{>i} * inv(total).
        All elements must be nonzero."""
        prefix = jax.lax.associative_scan(self.mul, a, axis=axis)
        suffix = jax.lax.associative_scan(self.mul, a, axis=axis, reverse=True)
        idx_last = [slice(None)] * a.ndim
        idx_last[axis] = slice(-1, None)
        total = prefix[tuple(idx_last)]
        total_inv = self.inv(total)
        # exclusive shifts
        one = jnp.broadcast_to(self.mont_one_arr, total.shape)
        ex_prefix = jnp.concatenate(
            [one, jax.lax.slice_in_dim(prefix, 0, a.shape[axis] - 1, axis=axis)], axis=axis
        )
        ex_suffix = jnp.concatenate(
            [jax.lax.slice_in_dim(suffix, 1, a.shape[axis], axis=axis), one], axis=axis
        )
        return self.mul(self.mul(ex_prefix, ex_suffix), jnp.broadcast_to(total_inv, a.shape))


# Shared contexts
from ..constants.bn254 import R_MOD, Q_MOD  # noqa: E402

fr_ctx = MontCtx(R_MOD)
fq_ctx = MontCtx(Q_MOD)
