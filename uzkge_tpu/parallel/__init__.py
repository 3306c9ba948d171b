"""Mesh routing for the prover's device work (SURVEY section 2.5).

`mesh_enabled()` turns the in-prover multi-chip path on: commit rounds ride
`sharded.sharded_msm_batch` / `sharded_msm_device_sums` and the prover's
batched NTTs ride `sharded.sharded_ntt_batch`.  Opt-in via UZKGE_MESH=1
(with >1 visible device): the single-chip TPU path stays default because
the CPU test mesh (8 virtual devices) must not silently change every
test's execution path.
"""

import os

import jax

_MESH = None


def mesh_enabled() -> bool:
    return os.environ.get("UZKGE_MESH", "") in ("1", "true", "yes") and len(jax.devices()) > 1


def get_mesh():
    """Process-wide default mesh over all visible devices."""
    global _MESH
    if _MESH is None:
        from .sharded import make_mesh

        _MESH = make_mesh()
    return _MESH
