"""Quick real-TPU smoke for the _fold8 Pallas kernel (the round-4 Mosaic
'Broadcast in both sublanes and lanes' failure): compiles + runs the 8-to-1
projective fold at the production block shape and checks against host math.

Run on the chip:  python tools/smoke_fold8.py
"""

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from uzkge_tpu.constants.bn254 import Q_MOD, R_MOD
from uzkge_tpu.curve.bn254 import G1_GEN, g1_add, g1_mul
from uzkge_tpu.ff.jax_field import L, fq_ctx
from uzkge_tpu.msm.fixed_base import _fold8


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = random.Random(42)
    P, Kc = 8, 2048  # production-shaped: G = 256 blocks, (L, 8, 8, 256)
    base = [g1_mul(G1_GEN, rng.randrange(1, R_MOD)) for _ in range(64)]
    pts = [base[i % 64] for i in range(P * Kc)]
    xs = fq_ctx.to_mont_limbs([p[0] for p in pts]).reshape(P, Kc, L)
    ys = fq_ctx.to_mont_limbs([p[1] for p in pts]).reshape(P, Kc, L)
    X = jnp.moveaxis(xs, -1, 0)
    Y = jnp.moveaxis(ys, -1, 0)
    one = fq_ctx.to_mont_limbs(1)
    Z = jnp.broadcast_to(jnp.asarray(np.asarray(one, np.uint32))[:, None, None], X.shape)

    t0 = time.time()
    fold = jax.jit(_fold8)
    Xo, Yo, Zo = jax.block_until_ready(fold(X, Y, Z))
    print(f"fold8 compile+run: {time.time() - t0:.1f}s; out shape {Xo.shape}")

    # host oracle: each output (p, g) is the sum of 8 leaves
    N = P * (Kc // 8)

    def host_ints(A):
        return fq_ctx.from_mont_limbs(jnp.moveaxis(A.reshape(L, N), 0, -1))

    Xi_all, Yi_all, Zi_all = host_ints(Xo), host_ints(Yo), host_ints(Zo)
    ok = True
    for probe in (0, 1, N - 1):
        p_idx, g_idx = divmod(probe, Kc // 8)
        Xi, Yi, Zi = Xi_all[probe], Yi_all[probe], Zi_all[probe]
        zi = pow(Zi, Q_MOD - 2, Q_MOD)
        got = (Xi * zi % Q_MOD, Yi * zi % Q_MOD)
        exp = None
        for j in range(8):
            exp = g1_add(exp, pts[p_idx * Kc + g_idx * 8 + j])
        if got != exp:
            ok = False
            print(f"MISMATCH at probe {probe}")
    print("oracle:", "ok" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
