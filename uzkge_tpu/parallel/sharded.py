"""Multi-chip sharding for the proving pipeline (jax.sharding Mesh +
shard_map; collectives ride ICI).

The reference is single-host rayon (SURVEY.md section 2.5) — these axes are
new, TPU-native design:

  * MSM: the point/scalar arrays are sharded across the mesh ('pts' axis);
    each chip runs the fixed-base chain MSM (msm/fixed_base.msm_chain —
    signed windows over an on-the-fly doubling chain, scan-reduction leaves)
    on its slice; the per-device projective sums are all_gather'd and folded
    with a log-tree of complete additions (point addition is not a psum —
    it needs the curve group law).  Every kernel compiles as a handful of
    one-group-add scans, so the path is cheap to build on any backend;
  * NTT: classic four-step decomposition n = n1*n2 over n1 = mesh devices:
    local size-n2 DFTs on strided rows, twiddle scale, one all_to_all
    (the only cross-device traffic: n/ndev elements per device), local
    size-n1 DFTs as an unrolled matrix combine.  Forward, inverse and coset
    variants — the same surface as ntt.NTTDomain;
  * proof batches: the scalar batch axis P rides through every kernel, so
    many proofs' commitments shard together (BASELINE config 5).
"""

from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as Pspec
from jax.experimental.shard_map import shard_map

from ..constants.bn254 import R_MOD
from ..ff.field import Fr
from ..ff.jax_field import fr_ctx, fq_ctx, L
from ..ff.vfield import vfq_c as vfq  # compact muls: compile-bound path
from ..msm.fixed_base import msm_chain, padd_g, _extract_host
from ..ntt.ntt import get_domain


def make_mesh(n_devices: int = None, axis: str = "pts") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# ------------------------------------------------------------- sharded MSM


def _fold_device_sums(stacked):
    """(ndev, 3, L, P) projective partial sums -> (3, L, P) via a log tree
    of complete projective additions."""
    X = jnp.moveaxis(stacked[:, 0], 0, 1)  # (L, ndev, P)
    Y = jnp.moveaxis(stacked[:, 1], 0, 1)
    Z = jnp.moveaxis(stacked[:, 2], 0, 1)
    k = X.shape[1]
    while k > 1:
        h = k // 2
        X2, Y2, Z2 = padd_g(
            vfq,
            (X[:, 0:h], Y[:, 0:h], Z[:, 0:h]),
            (X[:, h : 2 * h], Y[:, h : 2 * h], Z[:, h : 2 * h]),
        )
        if k % 2:
            X = jnp.concatenate([X2, X[:, 2 * h :]], axis=1)
            Y = jnp.concatenate([Y2, Y[:, 2 * h :]], axis=1)
            Z = jnp.concatenate([Z2, Z[:, 2 * h :]], axis=1)
            k = h + 1
        else:
            X, Y, Z = X2, Y2, Z2
            k = h
    return jnp.stack([X[:, 0], Y[:, 0], Z[:, 0]])


def sharded_msm_device_sums(mesh: Mesh, x_v, y_v, scalars_mont):
    """x_v, y_v: (L, n) affine Fq Montgomery; scalars_mont: (P, n, L).
    Points sharded over 'pts'; returns (3, L, P) projective sums
    (replicated)."""

    def local(x_s, y_s, sc_s):
        X, Y, Z = msm_chain(x_s, y_s, sc_s)  # (L, P) each
        allp = jax.lax.all_gather(jnp.stack([X, Y, Z]), "pts")  # (ndev, 3, L, P)
        return _fold_device_sums(allp)

    f = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(Pspec(None, "pts"), Pspec(None, "pts"), Pspec(None, "pts", None)),
            out_specs=Pspec(),
            check_rep=False,
        )
    )
    return f(x_v, y_v, scalars_mont)


def sharded_msm(mesh: Mesh, points: List, scalars: List[List[int]]):
    """Full sharded MSM returning host affine points (one per scalar row).
    len(points) must be divisible by the mesh size with a power-of-two
    per-device slice."""
    rows = scalars if scalars and isinstance(scalars[0], (list, tuple)) else [scalars]
    n = len(points)
    flat = [s % R_MOD for row in rows for s in row]
    sc = fr_ctx.to_mont_limbs(flat).reshape(len(rows), n, L)
    x_v = jnp.moveaxis(fq_ctx.to_mont_limbs([p[0] for p in points]).reshape(n, L), -1, 0)
    y_v = jnp.moveaxis(fq_ctx.to_mont_limbs([p[1] for p in points]).reshape(n, L), -1, 0)
    S3 = sharded_msm_device_sums(mesh, x_v, y_v, sc)
    pts = _extract_host(S3[0], S3[1], S3[2], len(rows))
    return pts if len(rows) > 1 else pts[0]


# ------------------------------------------------------------- sharded NTT


class ShardedNTT:
    """Four-step NTT of size n = n1 * n2 (n1 = mesh size) with one
    all_to_all as the only cross-device exchange:

      X[k2 + n2*k1] = sum_{j1<n1} w^{j1 k2} W1^{j1 k1}
                         [ sum_{j2<n2} x[j1 + n1*j2] W2^{j2 k2} ]

    (W1 = w^{n2} the size-n1 root, W2 = w^{n1} the size-n2 root).  Each
    device j1 holds the strided row x[j1::n1]: local size-n2 DFT, twiddle by
    w^{j1 k2}, all_to_all redistributes k2-chunks, then the size-n1 column
    DFT is an unrolled n1 x n1 matrix combine (n1 = #devices is small).
    The inverse transform runs the same data flow over w^-1 with 1/n2
    folded into the local DFT and 1/n1 into the combine matrix."""

    def __init__(self, n: int, mesh: Mesh):
        self.n = n
        self.mesh = mesh
        self.ndev = mesh.devices.size
        self.n1 = self.ndev
        assert n % self.n1 == 0 and (n // self.n1) % self.n1 == 0, \
            "need n2 divisible by the mesh size for the all_to_all chunking"
        self.n2 = n // self.n1
        self.dom2 = get_domain(self.n2)
        p = R_MOD
        w = Fr.root_of_unity(n)
        w_inv = pow(w, p - 2, p)
        n1_inv = pow(self.n1, p - 2, p)

        def twiddle(base):
            tw = []
            for j1 in range(self.n1):
                row_base = pow(base, j1, p)
                cur = 1
                for _ in range(self.n2):
                    tw.append(cur)
                    cur = cur * row_base % p
            return fr_ctx.to_mont_limbs(tw).reshape(self.n1, self.n2, L)

        self.tw_fwd = twiddle(w)
        self.tw_inv = twiddle(w_inv)

        def combine(base, scale):
            m = [
                pow(base, (j1 * k1) % n, p) * scale % p
                for j1 in range(self.n1)
                for k1 in range(self.n1)
            ]
            return fr_ctx.to_mont_limbs(m).reshape(self.n1, self.n1, L)

        self.W1_fwd = combine(pow(w, self.n2, p), 1)
        self.W1_inv = combine(pow(w_inv, self.n2, p), n1_inv)

        self._fwd = self._build(inverse=False)
        self._inv = self._build(inverse=True)

    def _build(self, inverse: bool):
        n1, n2, ndev = self.n1, self.n2, self.ndev
        dom2 = self.dom2

        def local(rows, tw_rows, W1):
            a = dom2._core(rows[0], inverse)  # (n2, L)
            a = fr_ctx.mul(a, tw_rows[0])
            a = a.reshape(ndev, n2 // ndev, L)
            a = jax.lax.all_to_all(a, "pts", split_axis=0, concat_axis=0)
            # size-n1 column DFT: out[k1] = sum_j1 W1[j1,k1] * a[j1]
            prod = fr_ctx.mul(W1[:, :, None, :], a[:, None, :, :])  # (j1, k1, m, L)
            k = n1
            while k > 1:
                h = k // 2
                prod = fr_ctx.add(prod[0:h], prod[h : 2 * h]) if k % 2 == 0 else \
                    jnp.concatenate(
                        [fr_ctx.add(prod[0:h], prod[h : 2 * h]), prod[2 * h :]], axis=0
                    )
                k = (k + 1) // 2
            return prod[0]  # (k1, m, L)

        return jax.jit(
            shard_map(
                local,
                mesh=self.mesh,
                in_specs=(Pspec("pts"), Pspec("pts"), Pspec()),
                out_specs=Pspec(None, "pts"),
                check_rep=False,
            )
        )

    def _run(self, data, inverse: bool):
        n1, n2 = self.n1, self.n2
        xmat = data.reshape(n2, n1, L).transpose(1, 0, 2)  # [j1, j2] = x[j1 + n1*j2]
        tw = self.tw_inv if inverse else self.tw_fwd
        W1 = self.W1_inv if inverse else self.W1_fwd
        out = (self._inv if inverse else self._fwd)(xmat, tw, W1)  # (k1, k2, L)
        return out.reshape(self.n, L)  # index k2 + n2*k1 ... = row-major (k1, k2)

    def fft(self, coeffs):
        """coeffs (n, L) Montgomery -> evaluations (n, L)."""
        return self._run(coeffs, inverse=False)

    def ifft(self, evals):
        """evaluations (n, L) -> coefficients (n, L)."""
        return self._run(evals, inverse=True)

    def coset_fft(self, coeffs, k: int):
        dom = get_domain(self.n)
        return self.fft(fr_ctx.mul(coeffs, dom.power_ladder(k)))

    def coset_ifft(self, evals, k: int):
        dom = get_domain(self.n)
        coeffs = self.ifft(evals)
        k_inv = pow(k, R_MOD - 2, R_MOD)
        return fr_ctx.mul(coeffs, dom.power_ladder(k_inv))


# ------------------------------------------------- proof-batch data parallel
#
# BASELINE config 5: many independent proofs at once.  The proof axis is
# embarrassingly parallel, so the dp sharding needs no collective at all —
# each device runs the full kernel on its slice of the proof batch and the
# out_specs gather reassembles the batch.  This composes with the 'pts'
# sharding above (a 2D ('dp','pts') mesh shards both axes).


def sharded_msm_batch(mesh: Mesh, x_v, y_v, scalars_mont, axis: str = "pts"):
    """Proof-batch-sharded MSM: scalars (P, n, L) sharded on the proof axis,
    points replicated; returns (3, L, P) projective sums.  P must divide by
    the mesh size."""

    def local(sc_s):
        X, Y, Z = msm_chain(x_v, y_v, sc_s)  # (L, P/ndev) each
        return jnp.stack([X, Y, Z])

    f = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(Pspec(axis, None, None),),
            out_specs=Pspec(None, None, axis),
            check_rep=False,
        )
    )
    return f(scalars_mont)


def sharded_commit_batch(mesh: Mesh, points: List, scalars_rows: List[List[int]],
                         axis: str = "pts"):
    """Host-level convenience: commit a batch of evaluation rows with the
    proof axis sharded across the mesh; returns host affine points."""
    P = len(scalars_rows)
    n = len(points)
    flat = [s % R_MOD for row in scalars_rows for s in row]
    sc = fr_ctx.to_mont_limbs(flat).reshape(P, n, L)
    x_v = jnp.moveaxis(fq_ctx.to_mont_limbs([p[0] for p in points]).reshape(n, L), -1, 0)
    y_v = jnp.moveaxis(fq_ctx.to_mont_limbs([p[1] for p in points]).reshape(n, L), -1, 0)
    S3 = sharded_msm_batch(mesh, x_v, y_v, sc, axis)
    return _extract_host(S3[0], S3[1], S3[2], P)


def sharded_ntt_batch(mesh: Mesh, data, inverse: bool = False,
                      coset_k: int = None, axis: str = "pts"):
    """Batch-axis-sharded NTT: data (P, n, L), each device transforms its
    share of the P polynomials with the single-device radix-2 core (the
    right parallelism when P >= ndev; ShardedNTT's four-step all_to_all is
    for the P < ndev, huge-n regime)."""
    n = data.shape[1]
    dom = get_domain(n)

    k_inv = pow(coset_k, R_MOD - 2, R_MOD) if (coset_k is not None and inverse) else None

    def local(rows):
        if coset_k is not None and not inverse:
            return dom.coset_fft_batch(rows, coset_k)
        if coset_k is not None:
            return dom.coset_scale(dom.ifft_batch(rows), k_inv)
        return dom.ifft_batch(rows) if inverse else dom.fft_batch(rows)

    f = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(Pspec(axis, None, None),),
            out_specs=Pspec(axis, None, None),
            check_rep=False,
        )
    )
    return f(data)


# --------------------------------------------------------------- dry run


def dryrun_multichip(n_devices: int):
    """Compile + execute the sharded proving kernels on an n_devices mesh
    with tiny shapes: the fixed-base-chain sharded MSM (point axis + proof
    batch axis) and the four-step all_to_all NTT (forward, inverse, coset),
    cross-checked against host math."""
    import random

    from ..curve.bn254 import G1_GEN, g1_mul, g1_msm

    mesh = make_mesh(n_devices)
    rng = random.Random(1234)

    # ---- sharded MSM over a batch of scalar vectors (dp x pts)
    n_pts = 8 * n_devices
    pts = [g1_mul(G1_GEN, rng.randrange(1, R_MOD)) for _ in range(n_pts)]
    rows = [[rng.randrange(R_MOD) for _ in range(n_pts)] for _ in range(2)]
    got = sharded_msm(mesh, pts, rows)
    for row, g in zip(rows, got):
        assert g == g1_msm(pts, row), "sharded MSM mismatch"

    # ---- sharded four-step NTT: forward, inverse roundtrip, coset
    n = max(16 * n_devices, n_devices * n_devices)
    n = 1 << (n - 1).bit_length()
    sntt = ShardedNTT(n, mesh)
    dom = get_domain(n)
    coefs = [rng.randrange(R_MOD) for _ in range(n)]
    dev = fr_ctx.to_mont_limbs(coefs)
    ev = sntt.fft(dev)
    assert fr_ctx.from_mont_limbs(ev) == fr_ctx.from_mont_limbs(dom.fft(dev)), \
        "sharded NTT mismatch"
    back = sntt.ifft(ev)
    assert fr_ctx.from_mont_limbs(back) == coefs, "sharded iNTT roundtrip mismatch"
    cev = sntt.coset_fft(dev, 7)
    assert fr_ctx.from_mont_limbs(cev) == fr_ctx.from_mont_limbs(dom.coset_fft(dev, 7)), \
        "sharded coset NTT mismatch"

    # ---- proof-batch (dp) data parallelism: sharded commits + batch NTT
    rows_dp = [[rng.randrange(R_MOD) for _ in range(n_pts)] for _ in range(n_devices)]
    got_dp = sharded_commit_batch(mesh, pts, rows_dp)
    for row, g in zip(rows_dp, got_dp):
        assert g == g1_msm(pts, row), "dp-sharded commit mismatch"
    batch = fr_ctx.to_mont_limbs(
        [rng.randrange(R_MOD) for _ in range(n_devices * n)]
    ).reshape(n_devices, n, L)
    ev_dp = sharded_ntt_batch(mesh, batch)
    ref = dom.fft_batch(batch)
    assert fr_ctx.from_mont_limbs(ev_dp.reshape(-1, L)) == \
        fr_ctx.from_mont_limbs(ref.reshape(-1, L)), "dp-sharded batch NTT mismatch"

    # ---- the ACTUAL prover on the mesh: a 1-card shuffle proof with
    # UZKGE_MESH=1, so every commit round rides the sharded MSM and the
    # batched (i)NTTs ride sharded_ntt_batch.  OPT-IN (UZKGE_DRYRUN_PROVE=1):
    # the cold with_shuffle XLA:CPU compile takes 300-550 s, which blew the
    # driver's dryrun budget in round 4 (MULTICHIP_r04 rc=124); the same
    # mesh-prove coverage lives in the gated test
    # tests/test_sharded.py::test_mesh_routed_prove.
    import os

    if os.environ.get("UZKGE_DRYRUN_PROVE", "0") == "1":
        prev = os.environ.get("UZKGE_MESH")
        os.environ["UZKGE_MESH"] = "1"
        try:
            _dryrun_prove_on_mesh(rng)
        finally:
            if prev is None:
                os.environ.pop("UZKGE_MESH", None)
            else:
                os.environ["UZKGE_MESH"] = prev
    return True


def _dryrun_prove_on_mesh(rng):
    """Tiny (1-card) shuffle proof through prove_shuffle with the mesh
    routes active; verified with the same verifier as production."""
    from ..curve import babyjubjub as bjj
    from ..pcs.kzg import KZG
    from ..plonk.indexer import indexer, refresh_prover_params_public_key
    from ..shuffle import app
    from ..shuffle.sdk import index_to_point

    kp = app.Keypair(rng.randrange(1, bjj.ORDER))
    apk = kp.public
    from ..shuffle.primitives import Ciphertext

    cards = [Ciphertext.rand(rng) for _ in range(1)]
    cs, _ = app.build_cs(rng, apk, cards)
    kzg = KZG.setup_insecure(cs.size + 8, 123456789, domain_n=cs.size)
    pp = indexer(cs, kzg, with_shuffle=True)
    refresh_prover_params_public_key(pp, cs, kzg, apk)
    deck = [app.mask(rng, apk, index_to_point(0), rng.randrange(1, bjj.ORDER))[0]]
    proof, outputs = app.prove_shuffle(rng, apk, deck, pp, kzg)
    assert app.verify_shuffle(pp.verifier_params, kzg, deck, outputs, proof), \
        "mesh-routed shuffle proof failed verification"
