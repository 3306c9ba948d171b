"""Proof-level data parallelism: many independent proofs across the mesh.

The proof axis is embarrassingly parallel (BASELINE config 5), so the
TPU-native design places each proof's device work on its own chip and lets
XLA's async dispatch overlap them: proof i's kernels run on device
i % ndev while the host drives the other proofs' transcript/witness phases.
One thread per device keeps every chip's queue fed (the host-side phases —
Keccak transcripts, native-C polynomial division — release the GIL, so
threads overlap for real).

The heavy in-proof kernels (batched commits, batched NTTs) are already
batched over the polynomial axis inside each proof; for cross-proof batched
commits over a SHARED base set, see sharded.sharded_msm_batch, which shards
the proof axis of one MSM call instead.

Scaling expectations (why this shape): per-proof device work is identical
and independent, so throughput scales with chips until the HOST becomes the
bottleneck (transcript hashing + witness generation are serial per proof).
tools/bench_scaling.py measures both regimes; SCALING.md records the table.
"""

import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import replace as dc_replace
from typing import List, Optional

import jax


def _replicate_pp(pp, dev):
    """Per-device copy of the prover params' device arrays (the proving key
    is read-only; each chip needs its own HBM copy for independent proofs)."""
    updates = {}
    for name, val in vars(pp).items():
        if isinstance(val, jax.Array):
            updates[name] = jax.device_put(val, dev)
    return dc_replace(pp, **updates)


# Per-device replicas live ON the params object (not a module-level dict
# keyed by id(pp): ids alias after GC, which could silently serve a stale
# proving key, and a global dict would pin every replica's HBM forever).
_PP_LOCK = threading.Lock()


def _pp_for_device(pp, dev):
    with _PP_LOCK:
        cache = getattr(pp, "_device_replicas", None)
        if cache is None:
            cache = {}
            object.__setattr__(pp, "_device_replicas", cache)
        key = repr(dev)
        got = cache.get(key)
        if got is None:
            got = _replicate_pp(pp, dev)
            cache[key] = got
    return got


def prove_shuffle_batch(
    rngs: List,
    aggregate_public_key,
    decks: List[List],
    pp,
    kzg,
    devices: Optional[List] = None,
):
    """Prove many shuffles concurrently, one device per in-flight proof.

    rngs: one RNG per proof (independent Fiat-Shamir blinding);
    decks: list of input-card lists.  Returns [(proof, outputs), ...] in
    input order."""
    from ..shuffle.app import prove_shuffle

    devs = devices or jax.devices()
    ndev = max(1, len(devs))

    def one(i):
        dev = devs[i % ndev]
        with jax.default_device(dev):
            pp_dev = _pp_for_device(pp, dev) if ndev > 1 else pp
            return prove_shuffle(rngs[i], aggregate_public_key, decks[i], pp_dev, kzg)

    if ndev == 1 or len(decks) == 1:
        return [one(i) for i in range(len(decks))]
    with ThreadPoolExecutor(max_workers=ndev) as ex:
        return list(ex.map(one, range(len(decks))))
