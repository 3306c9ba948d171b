"""KZG polynomial commitment scheme over BN254.

Commit = MSM on TPU (uzkge_tpu.msm); open/verify = host-side group ops and
pairings (tiny).  Every production commit is over a FIXED base set (the
Lagrange SRS basis — the path the prover always takes,
kzg_poly_commitment.rs:290), so commits ride the signed-window fixed-base
table kernels (msm.fixed_base, VMEM-resident Pallas on TPU); the
variable-base Pippenger (msm.msm) remains only as the coefficient-basis
fallback for tiny dev SRS prefixes.  Mirrors the reference's scheme
semantics exactly:
  - coefficient-basis commit over SRS powers (kzg_poly_commitment.rs:278-293);
  - Lagrange-basis commit + `apply_blind_factors` over the vanishing part
    (kzg_poly_commitment.rs:299-313), the path the prover always takes;
  - `batch_prove` alpha-combination at one point with the transcript protocol
    of pcs.rs:107-168 (domain separator, field size, max_degree, point);
  - `batch_verify_diff_points` single multi-pairing (kzg:373-423).
"""

import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..constants.bn254 import R_MOD, Q_MOD
from ..errors import DegreeError
from ..ff.field import Fr
from ..ff.jax_field import fr_ctx, L
from ..curve.bn254 import g1_add, g1_mul, g1_neg, G2_GEN, g2_mul
from ..msm.msm import MSMBases, msm
from ..ntt.ntt import get_domain
from ..utils.transcript import Transcript
from .pairing import multi_pairing_is_one


def _fb_enabled(n: int) -> bool:
    """Route Lagrange commits through the fixed-base table kernels.

    Default: always on TPU (the production path); on CPU only for small test
    domains (n <= 512) where the lax.scan table build is cheap — larger CPU
    runs keep the variable-base Pippenger.  UZKGE_FB=0/1 overrides."""
    env = os.environ.get("UZKGE_FB")
    if env is not None:
        return env not in ("0", "false", "no")
    from ..ff.pallas_field import use_pallas

    return use_pallas() or n <= 512


def _fb_window(n: int) -> int:
    """Window width c for the fixed-base table: biggest c whose table
    (2^(c-1) * ceil(254/c) * n rows of 64 B) fits a ~4.5 GB HBM budget —
    c = 8 through n = 16384 (4.3 GB on a 16 GB v5e).  Halving the window
    count is the right trade here: the batch-affine reduction is VPU-bound
    at ~6 muls per folded leaf, while the extra table stream is only ~5 ms
    at HBM bandwidth."""
    from ..ff.pallas_field import use_pallas

    if not use_pallas():
        return 4  # CPU scan build: favor the 8x smaller/faster table
    for c in (8, 4):
        rows = (1 << (c - 1)) * ((254 + c - 1) // c) * n
        if rows * 64 <= 4.5e9:
            return c
    return 4


class KZG:
    """SRS container + commitment operations."""

    def __init__(self, g1_powers: List, g2_powers: List, lagrange_bases: Optional[List] = None):
        self.g1_powers = g1_powers  # affine points; entries may be None (SRS padding gaps)
        self.g2_powers = g2_powers  # [G2, s*G2]
        # contiguous prefix usable for coefficient commits
        contig = 0
        while contig < len(g1_powers) and g1_powers[contig] is not None:
            contig += 1
        self.max_contig = contig
        self._coef_bases = None
        self._lagrange = None
        if lagrange_bases is not None:
            self.set_lagrange(lagrange_bases)

    @staticmethod
    def setup_insecure(max_degree: int, tau: int, domain_n: Optional[int] = None) -> "KZG":
        """Dev/test SRS with a known tau (reference `KZGCommitmentScheme::new`
        with a random tau, kzg:183-204).  Optionally with Lagrange bases over
        a size-n domain."""
        g1 = [g1_mul((1, 2), pow(tau, i, R_MOD)) for i in range(max_degree + 1)]
        g2 = [G2_GEN, g2_mul(G2_GEN, tau)]
        lagrange = None
        if domain_n:
            # L_i(tau) * G = (w^i/n) * (tau^n - 1)/(tau - w^i) * G
            n = domain_n
            w = Fr.root_of_unity(n)
            n_inv = pow(n, R_MOD - 2, R_MOD)
            zt = (pow(tau, n, R_MOD) - 1) % R_MOD
            lagrange = []
            wi = 1
            for _ in range(n):
                li = wi * n_inv % R_MOD * zt % R_MOD * pow((tau - wi) % R_MOD, R_MOD - 2, R_MOD) % R_MOD
                lagrange.append(g1_mul((1, 2), li))
                wi = wi * w % R_MOD
        return KZG(g1, g2, lagrange)

    def set_lagrange(self, lagrange_bases: List):
        self._lagrange_points = lagrange_bases
        self._lagrange_n = len(lagrange_bases)
        self._lagrange = True  # device structures built lazily on first commit
        self._lagrange_vb = None  # variable-base Pippenger bases
        self._lagrange_fb = None  # fixed-base signed-window table

    @property
    def lagrange_n(self):
        return self._lagrange_n if self._lagrange is not None else 0

    def lagrange_fb_table(self):
        """Fixed-base table over the Lagrange basis (built once, reused for
        every commit of every proof — kzg_poly_commitment.rs:290)."""
        if self._lagrange_fb is None:
            from ..msm.fixed_base import FixedBaseTable

            self._lagrange_fb = FixedBaseTable(
                self._lagrange_points, c=_fb_window(self._lagrange_n)
            )
        return self._lagrange_fb

    def _coef_msm_bases(self):
        if self._coef_bases is None:
            self._coef_bases = MSMBases(self.g1_powers[: self.max_contig])
        return self._coef_bases

    # ------------------------------------------------------------- committing

    def commit_coefs(self, coefs: List[int]):
        """Coefficient-basis commit (host scalars)."""
        if len(coefs) > self.max_contig:
            raise DegreeError(
                f"degree {len(coefs) - 1} exceeds contiguous SRS prefix {self.max_contig - 1}"
            )
        bases = self._coef_msm_bases()
        padded = list(coefs) + [0] * (bases.n - len(coefs))
        return msm(bases, padded)

    def _lagrange_sharded_bases(self):
        """(L, n) vertical affine limb arrays of the Lagrange basis for the
        mesh MSM path (cached)."""
        if getattr(self, "_lag_sh", None) is None:
            from ..ff.jax_field import fq_ctx

            n = self._lagrange_n
            xs = fq_ctx.to_mont_limbs([p[0] for p in self._lagrange_points]).reshape(n, L)
            ys = fq_ctx.to_mont_limbs([p[1] for p in self._lagrange_points]).reshape(n, L)
            self._lag_sh = (jnp.moveaxis(xs, -1, 0), jnp.moveaxis(ys, -1, 0))
        return self._lag_sh

    def commit_evals_batch(self, evals_dev):
        """Lagrange-basis commit of a batch: evals_dev (P, n, L) Montgomery
        limbs on device -> list of host affine points.  With UZKGE_MESH=1
        and >1 device, commits ride the sharded mesh MSM (proof axis when
        it divides the mesh, point axis otherwise)."""
        assert self._lagrange is not None
        batch = evals_dev if evals_dev.ndim == 3 else evals_dev[None]
        from ..parallel import mesh_enabled

        if mesh_enabled():
            from ..parallel import get_mesh
            from ..parallel.sharded import (
                sharded_msm_batch,
                sharded_msm_device_sums,
            )
            from ..msm.fixed_base import _extract_host

            mesh = get_mesh()
            ndev = mesh.devices.size
            x_v, y_v = self._lagrange_sharded_bases()
            P = batch.shape[0]
            if P % ndev == 0:
                S3 = sharded_msm_batch(mesh, x_v, y_v, batch)
            else:
                S3 = sharded_msm_device_sums(mesh, x_v, y_v, batch)
            return _extract_host(S3[0], S3[1], S3[2], P)
        if _fb_enabled(self._lagrange_n):
            return self.lagrange_fb_table().msm_mont(batch)
        if self._lagrange_vb is None:
            self._lagrange_vb = MSMBases(self._lagrange_points)
        return msm(self._lagrange_vb, batch)

    def commit_evals(self, evals_dev):
        return self.commit_evals_batch(evals_dev[None] if evals_dev.ndim == 2 else evals_dev)[0]

    def apply_blind_factors(self, cm, blinds: List[int], zeroing_degree: int):
        """cm + sum_i b_i * (G_i - G_{zeroing+i}) (kzg:299-313)."""
        out = cm
        for i, b in enumerate(blinds):
            if b % R_MOD == 0:
                continue
            out = g1_add(out, g1_mul(self.g1_powers[i], b))
            out = g1_add(out, g1_mul(self.g1_powers[zeroing_degree + i], (-b) % R_MOD))
        return out

    # ---------------------------------------------------------------- opening

    @staticmethod
    def _transcript_append_params(transcript: Transcript, max_degree: int, point: int):
        transcript.append_message(b"New PCS-Batch-Eval Protocol")
        transcript.append_message(Fr.p.to_bytes(32, "big"))
        transcript.append_u64(max_degree)
        transcript.append_field_elem(point)

    def _prepare_open(self, transcript: Transcript, poly_blobs, point: int,
                      max_degree: int, use_lagrange: bool = True):
        """Host phase of batch_prove: transcript interaction + quotient
        division.  Returns ("lagrange", head_bytes, blinds, max_pow2) or
        ("coefs", coef_list)."""
        from .. import native_host as nh

        self._transcript_append_params(transcript, max_degree, point)
        alpha = transcript.get_challenge(R_MOD)

        maxlen = max(len(b) // 32 for b in poly_blobs)
        h_blob, _evals = nh.alpha_combine_bytes(poly_blobs, alpha, point, maxlen)
        q_blob, rem = nh.synthetic_div_bytes(h_blob, point)
        assert rem == 0, "batch_prove: nonzero remainder"
        # trim trailing zero coefficients
        nq = len(q_blob) // 32
        while nq > 1 and q_blob[(nq - 1) * 32 : nq * 32] == b"\x00" * 32:
            nq -= 1
        q_blob = q_blob[: nq * 32]

        degree = nq - 1
        max_pow2 = degree
        for i in range(degree, -1, -1):
            if i & (i - 1) == 0:
                max_pow2 = i
                break
        if use_lagrange and self._lagrange is not None and max_pow2 == self._lagrange_n:
            # commit the low part via Lagrange basis, shift the high
            # coefficients up with blind factors (reference pcs.rs:138-164)
            blinds = [
                (-int.from_bytes(q_blob[i * 32 : (i + 1) * 32], "little")) % R_MOD
                for i in range(max_pow2, nq)
            ]
            head = bytearray(q_blob[: max_pow2 * 32])
            for i, v in enumerate(blinds):
                c = (int.from_bytes(head[i * 32 : (i + 1) * 32], "little") - v) % R_MOD
                head[i * 32 : (i + 1) * 32] = c.to_bytes(32, "little")
            return ("lagrange", bytes(head), blinds, max_pow2)
        coefs = [int.from_bytes(q_blob[i * 32 : (i + 1) * 32], "little") for i in range(nq)]
        return ("coefs", coefs)

    def _commit_prepared(self, prepared):
        """Commit a list of _prepare_open results; Lagrange-path entries
        share one batched MSM."""
        out = [None] * len(prepared)
        lag = [(i, p) for i, p in enumerate(prepared) if p[0] == "lagrange"]
        if lag:
            mp = lag[0][1][3]
            assert all(p[3] == mp for _, p in lag)
            heads = jnp.stack(
                [fr_ctx.to_mont_limbs_from_bytes(p[1]) for _, p in lag]
            )
            evals = get_domain(mp).fft_batch(heads)
            cms = self.commit_evals_batch(evals)
            for (i, p), cm in zip(lag, cms):
                out[i] = self.apply_blind_factors(cm, p[2], p[3])
        for i, p in enumerate(prepared):
            if p[0] == "coefs":
                out[i] = self.commit_coefs(p[1])
        return out

    def batch_prove(self, transcript: Transcript, poly_blobs, point: int,
                    max_degree: int, use_lagrange: bool = True):
        """Open several polynomials at one point (pcs.rs:107-168).
        `poly_blobs`: list of packed 32-byte-LE coefficient blobs (native
        host-math format)."""
        prep = self._prepare_open(transcript, poly_blobs, point, max_degree, use_lagrange)
        return self._commit_prepared([prep])[0]

    def batch_prove_multi(self, transcript: Transcript, opens, max_degree: int):
        """Several batch_prove calls whose quotient commitments ride one
        batched MSM.  `opens`: list of (poly_blobs, point).  Transcript
        interaction is sequential (identical bytes to separate calls —
        opening commitments are never appended inside batch_prove)."""
        prepared = [
            self._prepare_open(transcript, blobs, point, max_degree)
            for blobs, point in opens
        ]
        return self._commit_prepared(prepared)

    @staticmethod
    def batch_combine(transcript: Transcript, commitments: List, max_degree: int, point: int,
                      evals: List[int]):
        """Verifier-side alpha-combination (pcs.rs:171-191)."""
        KZG._transcript_append_params(transcript, max_degree, point)
        alpha = transcript.get_challenge(R_MOD)
        mult = 1
        cm_comb = None
        ev_comb = 0
        for ev, cm in zip(evals, commitments):
            cm_comb = g1_add(cm_comb, g1_mul(cm, mult))
            ev_comb = (ev_comb + ev * mult) % R_MOD
            mult = mult * alpha % R_MOD
        return cm_comb, ev_comb

    def batch_verify_diff_points(self, cm_vec, point_vec, eval_vec, proofs, challenge: int) -> bool:
        """u-combined two-point check with one multi-pairing (kzg:373-423)."""
        g1_0 = self.g1_powers[0]
        g2_0, g2_1 = self.g2_powers[0], self.g2_powers[1]
        left_first = proofs[0]
        right_first = g1_mul(proofs[0], point_vec[0])
        right_val = eval_vec[0]
        right_comm = cm_vec[0]
        cur = challenge
        for i in range(1, len(proofs)):
            new_comm = g1_mul(proofs[i], cur)
            left_first = g1_add(left_first, new_comm)
            right_first = g1_add(right_first, g1_mul(new_comm, point_vec[i]))
            right_val = (right_val + eval_vec[i] * cur) % R_MOD
            right_comm = g1_add(right_comm, g1_mul(cm_vec[i], cur))
            cur = cur * challenge % R_MOD
        right_first = g1_add(right_first, g1_neg(g1_mul(g1_0, right_val)))
        right_first = g1_add(right_first, right_comm)
        return multi_pairing_is_one([(left_first, g2_1), (g1_neg(right_first), g2_0)])

    def verify(self, cm, point: int, value: int, proof) -> bool:
        """Single-point check e(cm - v*G, G2) == e(proof, (s - z)*G2)."""
        from ..curve.bn254 import g2_add, g2_neg

        g2_0, g2_1 = self.g2_powers[0], self.g2_powers[1]
        lhs = g1_add(cm, g1_neg(g1_mul(self.g1_powers[0], value)))
        x_minus = g2_add(g2_1, g2_neg(g2_mul(g2_0, point)))
        return multi_pairing_is_one([(lhs, g2_0), (g1_neg(proof), x_minus)])
