"""Radix-2 NTT over BN254 Fr on TPU.

Matches ark-poly `Radix2EvaluationDomain` semantics (natural-order
evaluations at [w^0 .. w^{n-1}], root derived from the field's 2-adic root —
reference uzkge/src/poly_commit/field_polynomial.rs:552-607), implemented
TPU-first:

  * the butterfly core is the gather-free Stockham autosort kernel
    (ntt/stockham.py): log2(n) unrolled stages of one whole-array Montgomery
    mul + add/sub in the vertical limb layout (ff.vfield) — no index
    gathers, so the VPU lanes stay full and the graph compiles in seconds;
  * the external API keeps the horizontal (n, L) Montgomery layout of
    ff.jax_field, converted at the kernel boundary (one transpose each way);
  * coset FFTs scale coefficients by k^j (precomputed power ladders), which
    is how the reference does `coset_fft_with_domain` via `mul_var`
    (field_polynomial.rs:589-607).

The quotient-domain work uses a *radix-2 8n domain* rather than the
reference's mixed-radix 6n domain: the interpolated quotient polynomial is
identical (deg t < 6n <= 8n), so nothing transcript-visible changes, and the
NTT stays pure radix-2 (see SURVEY.md section 7 step 2).
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import GroupNotFound
from ..ff.field import Fr
from ..ff.jax_field import MontCtx, fr_ctx, L

# Smallest domain routed to the Pallas/fourstep paths.  Module-level so the
# interpret-mode suite can exercise the production Pallas NTT at a small n
# (full-size interpret graphs take too long to compile on XLA:CPU).
PALLAS_MIN_N = 4096


class NTTDomain:
    """A size-n radix-2 evaluation domain with device-resident tables."""

    def __init__(self, n: int, ctx: MontCtx = fr_ctx):
        if n <= 0 or n & (n - 1) or n.bit_length() - 1 > Fr.two_adicity:
            raise GroupNotFound(n)
        self.n = n
        self.ctx = ctx
        self.log_n = max(n.bit_length() - 1, 1)
        p = ctx.p
        self.omega = Fr.root_of_unity(n) if n > 1 else 1
        self.omega_inv = pow(self.omega, p - 2, p)
        self.n_inv = pow(n, p - 2, p)

        # master power table: omega^j for j in [0, n)
        pows = [1]
        for _ in range(n - 1):
            pows.append(pows[-1] * self.omega % p)
        self._pows_int = pows
        self.master = ctx.to_mont_limbs(pows).reshape(n, L)

        # butterfly tables: four-step factorization for large domains (keeps
        # a >=64-wide axis on the 128 lanes at every stage — the flat radix-2
        # form's early stages pad up to 128x and OOM at the quotient domain),
        # flat Stockham stage twiddles for small ones.
        from .stockham import fourstep_plan, stage_twiddles
        from ..ff.pallas_field import use_pallas

        self._fourstep = n >= 4096
        # Pallas VMEM-resident path (TPU / interpret): all butterflies in
        # fused kernels, coset/n_inv scales ride as pre/post ladders.
        self._pallas = use_pallas() and n >= PALLAS_MIN_N
        if self._pallas:
            from .pallas_ntt import build_plan, pallas_fft

            self._pplan_fwd = build_plan(self.master, n, n, 1, inverse=False)
            self._pplan_inv = build_plan(self.master, n, n, 1, inverse=True)
            n_inv_mont = self.n_inv * (1 << 256) % p
            one_mont = (1 << 256) % p

            # constant ladders: device-resident (numpy jit args would be
            # re-uploaded on every call — ~8 MB per ladder per NTT)
            def _const_ladder(v):
                return jnp.asarray(
                    np.ascontiguousarray(
                        np.broadcast_to(
                            np.array(
                                [(v >> (16 * i)) & 0xFFFF for i in range(L)],
                                np.uint32,
                            )[:, None],
                            (L, n),
                        )
                    )
                )

            self._ones_ladder = _const_ladder(one_mont)
            self._ninv_ladder = _const_ladder(n_inv_mont)

            def _pj(plan, x, pre, post):
                xv = jnp.moveaxis(x, -1, 0)
                out = pallas_fft(xv, plan, pre, post)
                return jnp.moveaxis(out, 0, -1)

            # pre/post ladders are ARGUMENTS (None skips the in-kernel mul;
            # each present/absent combo traces its own executable).  The
            # interpret-mode suite keeps n tiny (tests patch PALLAS_MIN_N /
            # SMAX) so the unrolled-kernel XLA:CPU compile stays small.
            self._pj_fwd = jax.jit(partial(_pj, self._pplan_fwd))
            self._pj_inv = jax.jit(partial(_pj, self._pplan_inv))
            self._post_ladder_cache = {}
        if n > 1 and self._fourstep and not self._pallas:
            self._plan_fwd = fourstep_plan(self.master, n, inverse=False)
            self._plan_inv = fourstep_plan(self.master, n, inverse=True)
        elif n > 1 and not self._pallas:
            self._tws_fwd = stage_twiddles(self.master, n, inverse=False)
            self._tws_inv = stage_twiddles(self.master, n, inverse=True)
        self.n_inv_arr = ctx.to_mont_limbs(self.n_inv)

        self._fft_jit = jax.jit(partial(self._core, inverse=False))
        self._ifft_jit = jax.jit(partial(self._core, inverse=True))
        self._fft_batch_jit = jax.jit(jax.vmap(partial(self._core, inverse=False)))
        self._ifft_batch_jit = jax.jit(jax.vmap(partial(self._core, inverse=True)))

    # All device inputs/outputs: (n, L) uint32 Montgomery limb arrays.

    def _core(self, x, inverse: bool):
        ctx = self.ctx
        if self.n == 1:
            return x
        from .stockham import fourstep_fft_v, stockham_fft_v

        xv = jnp.moveaxis(x, -1, 0)  # (L, n) vertical
        if self._fourstep:
            out = fourstep_fft_v(xv, self._plan_inv if inverse else self._plan_fwd)
        else:
            out = stockham_fft_v(xv, self._tws_inv if inverse else self._tws_fwd)
        x = jnp.moveaxis(out, 0, -1)
        if inverse:
            x = ctx.mul(x, jnp.broadcast_to(self.n_inv_arr, x.shape))
        return x

    def _pad(self, coeffs):
        m = coeffs.shape[0]
        if m < self.n:
            coeffs = jnp.concatenate(
                [coeffs, jnp.zeros((self.n - m, L), dtype=jnp.uint32)], axis=0
            )
        assert coeffs.shape[0] == self.n
        return coeffs

    def fft(self, coeffs):
        """coeffs (m<=n, L) -> evaluations (n, L) at [w^0..w^{n-1}]."""
        if self._pallas:
            return self._pj_fwd(self._pad(coeffs)[None], None, None)[0]
        return self._fft_jit(self._pad(coeffs))

    def ifft(self, evals):
        """evaluations (n, L) -> coefficients (n, L)."""
        if self._pallas:
            return self._pj_inv(evals[None], None, self._ninv_ladder)[0]
        return self._ifft_jit(evals)

    @staticmethod
    def _bucket_batch(b: int) -> int:
        """Round batch sizes up to power-of-two buckets so each domain
        compiles at most ~6 batched-NTT variants (XLA recompiles per shape)."""
        return 1 << max(b - 1, 0).bit_length()

    def _pad_batch(self, x):
        b = x.shape[0]
        bb = self._bucket_batch(b)
        pads = []
        if x.shape[1] < self.n:
            pads.append(((0, 0), (0, self.n - x.shape[1]), (0, 0)))
        if bb > b or pads:
            x = jnp.pad(x, ((0, bb - b), (0, self.n - x.shape[1]), (0, 0)))
        return x, b

    def fft_batch(self, coeffs):
        """(B, m<=n, L) -> (B, n, L)."""
        x, b = self._pad_batch(coeffs)
        if self._pallas:
            return self._pj_fwd(x, None, None)[:b]
        return self._fft_batch_jit(x)[:b]

    def ifft_batch(self, evals):
        x, b = self._pad_batch(evals)
        if self._pallas:
            return self._pj_inv(x, None, self._ninv_ladder)[:b]
        return self._ifft_batch_jit(x)[:b]

    def coset_fft_batch(self, coeffs, k: int):
        x, b = self._pad_batch(coeffs)
        powers = self.power_ladder(k)
        if self._pallas:
            return self._pj_fwd(x, jnp.moveaxis(powers, -1, 0), None)[:b]
        return self._fft_batch_jit(self.ctx.mul(x, powers[None]))[:b]

    def coset_scale(self, coeffs, k: int):
        """p(X) -> p(kX): scale coefficient j by k^j."""
        coeffs = self._pad(coeffs)
        powers = self.power_ladder(k)
        return self.ctx.mul(coeffs, powers)

    @lru_cache(maxsize=32)
    def _ladder_cached(self, k: int):
        p = self.ctx.p
        out = [1]
        for _ in range(self.n - 1):
            out.append(out[-1] * k % p)
        return self.ctx.to_mont_limbs(out)

    def power_ladder(self, k: int):
        return self._ladder_cached(k % self.ctx.p)

    def coset_fft(self, coeffs, k: int):
        if self._pallas:
            return self.coset_fft_batch(self._pad(coeffs)[None], k)[0]
        return self.fft(self.coset_scale(coeffs, k))

    def _coset_post_ladder(self, k: int):
        """(L, n) ladder of n_inv * k^-j (the fused coset_ifft post scale)."""
        key = k % self.ctx.p
        got = self._post_ladder_cache.get(key)
        if got is None:
            k_inv = pow(key, self.ctx.p - 2, self.ctx.p)
            lad = self.ctx.mul(
                self.power_ladder(k_inv),
                jnp.broadcast_to(self.n_inv_arr, (self.n, L)),
            )
            got = jnp.moveaxis(lad, -1, 0)
            self._post_ladder_cache[key] = got
        return got

    def coset_ifft(self, evals, k: int):
        """Inverse of coset_fft: ifft then scale by k^-j."""
        if self._pallas:
            return self._pj_inv(evals[None], None,
                                self._coset_post_ladder(k))[0]
        coeffs = self.ifft(evals)
        k_inv = pow(k, self.ctx.p - 2, self.ctx.p)
        return self.coset_scale(coeffs, k_inv)

    def elements(self):
        """Host-side domain elements [1, w, w^2, ...] as python ints."""
        return list(self._pows_int)


@lru_cache(maxsize=16)
def get_domain(n: int) -> NTTDomain:
    return NTTDomain(n)
