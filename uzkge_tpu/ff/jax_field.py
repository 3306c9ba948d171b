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

    def _geq_p(self, t):
        """t >= p, computed via borrow chain of t - p."""
        borrow = jnp.zeros_like(t[0])
        for j in range(L):
            d = t[j].astype(jnp.int32) - np.int32(self.p_limbs[j]) - borrow.astype(jnp.int32)
            borrow = (d < 0).astype(jnp.uint32)
        return borrow == 0

    def _cond_sub_p(self, t):
        cond = self._geq_p(t)
        out = []
        borrow = jnp.zeros_like(t[0])
        for j in range(L):
            d = t[j] - np.uint32(self.p_limbs[j]) - borrow
            out.append(d & MASK)
            borrow = (d >> 31)  # underflow wraps: top bit set iff borrow
        return [jnp.where(cond, o, tj) for o, tj in zip(out, t)]

    # ---------------- public ops (jittable on (..., L) uint32) ----------------

    def add(self, a, b):
        al, bl = self._split(a), self._split(b)
        out = []
        carry = jnp.zeros_like(al[0])
        for j in range(L):
            s = al[j] + bl[j] + carry
            out.append(s & MASK)
            carry = s >> BITS
        # p < 2^254 so the sum fits in 256 bits; carry out of limb 15 is 0
        out = self._cond_sub_p(out)
        return self._join(out)

    def sub(self, a, b):
        al, bl = self._split(a), self._split(b)
        diff = []
        borrow = jnp.zeros_like(al[0])
        for j in range(L):
            d = al[j] - bl[j] - borrow
            diff.append(d & MASK)
            borrow = d >> 31
        need_p = borrow != 0
        out = []
        carry = jnp.zeros_like(al[0])
        for j in range(L):
            s = diff[j] + jnp.where(need_p, np.uint32(self.p_limbs[j]), np.uint32(0)) + carry
            out.append(s & MASK)
            carry = s >> BITS
        return self._join(out)

    def neg(self, a):
        """-a mod p (maps 0 to 0)."""
        al = self._split(a)
        is_zero = al[0] == 0
        for j in range(1, L):
            is_zero = is_zero & (al[j] == 0)
        out = []
        borrow = jnp.zeros_like(al[0])
        for j in range(L):
            d = np.uint32(self.p_limbs[j]) - al[j] - borrow
            out.append(d & MASK)
            borrow = d >> 31
        out = [jnp.where(is_zero, jnp.zeros_like(o), o) for o in out]
        return self._join(out)

    def mul(self, a, b):
        """CIOS Montgomery multiplication: returns a*b*R^-1 mod p."""
        al, bl = self._split(a), self._split(b)
        n0inv = np.uint32(self.n0inv)
        zero = jnp.zeros_like(al[0])
        t = [zero] * (L + 1)
        for i in range(L):
            bi = bl[i]
            # t += a * b[i]
            c = zero
            for j in range(L):
                s = t[j] + al[j] * bi + c
                t[j] = s & MASK
                c = s >> BITS
            t[L] = t[L] + c  # t[L] < 2^17 bounded; kept full in uint32
            # m = t[0] * n0inv mod 2^16 ; t += m * p ; t >>= 16
            m = (t[0] * n0inv) & MASK
            s = t[0] + m * np.uint32(self.p_limbs[0])
            c = s >> BITS
            for j in range(1, L):
                s = t[j] + m * np.uint32(self.p_limbs[j]) + c
                t[j - 1] = s & MASK
                c = s >> BITS
            s = t[L] + c
            t[L - 1] = s & MASK
            t[L] = s >> BITS
        # CIOS bound: result < 2p (since 4p < R), so t[L] == 0 here
        out = self._cond_sub_p(t[:L])
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
