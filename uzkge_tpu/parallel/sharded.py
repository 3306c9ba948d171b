"""Multi-chip sharding for the proving pipeline (jax.sharding Mesh +
shard_map; collectives ride ICI).

The reference is single-host rayon (SURVEY.md section 2.5) — these axes are
new, TPU-native design:

  * MSM: points are sharded across the mesh ('pts' axis); each chip runs the
    full Pippenger bucket pipeline on its slice, then the per-window
    projective sums are all_gather'd and folded with complete additions
    (point addition is not a psum — it needs the curve group law);
  * NTT: classic four-step decomposition n = n1*n2 — local column FFTs,
    twiddle scaling, all_to_all transpose across the mesh, local row FFTs;
  * proof batches: vmap/pjit over a 'dp' axis (many proofs at once).
"""

from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..constants.bn254 import R_MOD
from ..ff.field import Fr
from ..ff.jax_field import fr_ctx, fq_ctx, L
from ..msm import msm as msm_mod
from ..ntt.ntt import get_domain


def make_mesh(n_devices: int = None, axis: str = "pts") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# ------------------------------------------------------------- sharded MSM


def sharded_msm_window_sums(mesh: Mesh, px, py, scalars_mont, chunks_per_dev: int):
    """Shard the point/scalar arrays over the mesh 'pts' axis; each device
    accumulates its Pippenger buckets; gather + fold window sums.

    px, py: (n, L); scalars_mont: (Pb, n, L).  Returns (Pb, W, 3, L) projective
    window sums (replicated)."""
    ndev = mesh.devices.size

    def local(px_s, py_s, sc_s):
        wsums = msm_mod._msm_device(px_s, py_s, sc_s, chunks_per_dev)  # (Pb, W, 3, L)
        all_w = jax.lax.all_gather(wsums, "pts")  # (ndev, Pb, W, 3, L)
        # fold over the device axis with complete projective additions
        k = all_w.shape[0]
        X, Y, Z = all_w[:, :, :, 0], all_w[:, :, :, 1], all_w[:, :, :, 2]
        while k > 1:
            h = k // 2
            X2, Y2, Z2 = msm_mod._padd(
                fq_ctx, X[:h], Y[:h], Z[:h], X[h : 2 * h], Y[h : 2 * h], Z[h : 2 * h]
            )
            if k % 2:
                X = jnp.concatenate([X2, X[2 * h :]], axis=0)
                Y = jnp.concatenate([Y2, Y[2 * h :]], axis=0)
                Z = jnp.concatenate([Z2, Z[2 * h :]], axis=0)
                k = h + 1
            else:
                X, Y, Z = X2, Y2, Z2
                k = h
        return jnp.stack([X[0], Y[0], Z[0]], axis=2)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("pts"), P("pts"), P(None, "pts")),
        out_specs=P(),
        check_rep=False,
    )
    return f(px, py, scalars_mont)


def sharded_msm(mesh: Mesh, bases: msm_mod.MSMBases, scalars: List[List[int]]):
    """Full sharded MSM returning host affine points (one per scalar row)."""
    rows = scalars if scalars and isinstance(scalars[0], (list, tuple)) else [scalars]
    flat = [s for row in rows for s in row]
    sc = fr_ctx.to_mont_limbs(flat).reshape(len(rows), bases.n, L)
    ndev = mesh.devices.size
    local_n = bases.n // ndev
    chunks_per_dev = max(1, min(local_n // 64, 32))
    while local_n % chunks_per_dev:
        chunks_per_dev -= 1
    wsums = sharded_msm_window_sums(mesh, bases.x, bases.y, sc, chunks_per_dev)
    pts = msm_mod._window_sums_to_points(np.asarray(jax.device_get(wsums)))
    return pts if len(rows) > 1 else pts[0]


# ------------------------------------------------------------- sharded NTT


class ShardedNTT:
    """Four-step NTT of size n = n1 * n2 over a mesh axis of n1-way
    parallelism: evals = DFT_n(x) computed as
      1. view x as (n1, n2) with x[i1, i2] = coeff[i2 * n1 + i1]
      2. column DFTs (size n1 -> here: local after transpose sharding)
      3. twiddle w_n^{i1 * i2}
      4. row DFTs (size n2)
    Output element (i1, i2) = X[i1 * n2 + i2].
    """

    def __init__(self, n: int, mesh: Mesh):
        self.n = n
        self.mesh = mesh
        self.ndev = mesh.devices.size
        self.n1 = self.ndev
        assert n % self.n1 == 0
        self.n2 = n // self.n1
        self.dom1 = get_domain(self.n1)
        self.dom2 = get_domain(self.n2)
        w = Fr.root_of_unity(n)
        # twiddle matrix w^(i1*i2), shape (n1, n2)
        tw = np.empty((self.n1, self.n2), dtype=object)
        for i1 in range(self.n1):
            base = pow(w, i1, R_MOD)
            cur = 1
            for i2 in range(self.n2):
                tw[i1, i2] = cur
                cur = cur * base % R_MOD
        self.tw = fr_ctx.to_mont_limbs([int(v) for v in tw.reshape(-1)]).reshape(
            self.n1, self.n2, L
        )

    def fft(self, coeffs):
        """coeffs (n, L) -> evals (n, L), sharded over the mesh."""
        n1, n2 = self.n1, self.n2

        # step 1: columns-major view: rows i1 hold coeffs i2*n1 + i1
        x = coeffs.reshape(n2, n1, L).transpose(1, 0, 2)  # (n1, n2, L)

        def local(rows, tw_rows):
            # rows: (1, n2, L) on each device — this device's i1 slice is
            # produced by the size-n1 column DFTs, which need cross-device
            # data: do them via all_gather (n1 is small = #devices).
            gathered = jax.lax.all_gather(rows, "pts")  # (n1, 1, n2, L)
            cols = gathered[:, 0]  # (n1, n2, L)
            # column DFT (size n1) for every i2 — vmapped over n2
            col_out = jax.vmap(self.dom1._core, in_axes=(1, None), out_axes=1)(cols, False)
            i1 = jax.lax.axis_index("pts")
            mine = jax.lax.dynamic_slice_in_dim(col_out, i1, 1, axis=0)  # (1, n2, L)
            # twiddle + row DFT (size n2)
            mine = fr_ctx.mul(mine[0], tw_rows[0])
            out = self.dom2._core(mine, False)
            return out[None]

        f = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P("pts"), P("pts")),
            out_specs=P("pts"),
            check_rep=False,
        )
        out = f(x, self.tw)  # (n1, n2, L): out[i1, i2] = X[i1*n2 + i2]
        return out.reshape(self.n, L)


# --------------------------------------------------------------- dry run


def dryrun_multichip(n_devices: int):
    """Compile + execute the sharded proving kernels on an n_devices mesh
    with tiny shapes: sharded Pippenger MSM (points axis + batch axis) and a
    four-step sharded NTT, cross-checked against host math."""
    import random

    from ..curve.bn254 import G1_GEN, g1_mul, g1_msm

    mesh = make_mesh(n_devices)
    rng = random.Random(1234)

    # ---- sharded MSM over a batch of scalar vectors (dp x pts)
    n_pts = 8 * n_devices
    pts = [g1_mul(G1_GEN, rng.randrange(1, R_MOD)) for _ in range(n_pts)]
    bases = msm_mod.MSMBases(pts)
    rows = [[rng.randrange(R_MOD) for _ in range(n_pts)] for _ in range(2)]
    got = sharded_msm(mesh, bases, rows)
    for row, g in zip(rows, got):
        assert g == g1_msm(pts, row), "sharded MSM mismatch"

    # ---- sharded four-step NTT
    n = 16 * n_devices if (16 * n_devices) & (16 * n_devices - 1) == 0 else 16 * n_devices
    # round n up to a power of two multiple of n_devices
    n = 1 << (n - 1).bit_length()
    sntt = ShardedNTT(n, mesh)
    coefs = [rng.randrange(R_MOD) for _ in range(n)]
    ev = sntt.fft(fr_ctx.to_mont_limbs(coefs))
    ref = get_domain(n).fft(fr_ctx.to_mont_limbs(coefs))
    assert fr_ctx.from_mont_limbs(ev) == fr_ctx.from_mont_limbs(ref), "sharded NTT mismatch"
    return True
