"""On-disk prover-params persistence (SURVEY section 5: params persistence).

Building the 52-card prover params is expensive (indexer + per-public-key
refresh are several minutes of host FFT work), while the result is a
deterministic function of (n_cards, aggregate public key, embedded SRS).
Production deployments persist the refreshed proving key exactly like the
reference persists its params artifacts (shuffle/src/gen_params); this
module does the same for our device-resident `ProverParams`:

    save_pp(path, pp)   — jnp arrays -> numpy in an .npz + pickled host part
    load_pp(path)       — restore, arrays land on the default device

The cache lives under UZKGE_PARAMS_CACHE (default: <repo>/.params-cache)
keyed by content, and is an optimization only — callers always fall back to
a fresh build.
"""

import os
import pickle
from dataclasses import fields, is_dataclass

import numpy as np
import jax
import jax.numpy as jnp


def cache_dir() -> str:
    d = os.environ.get(
        "UZKGE_PARAMS_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".params-cache"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def save_pp(path: str, pp) -> None:
    arrays = {}
    host = {}
    for f in fields(pp):
        v = getattr(pp, f.name)
        if isinstance(v, jax.Array):
            arrays[f.name] = np.asarray(v)
        else:
            host[f.name] = v
    with open(path + ".host", "wb") as fh:
        pickle.dump(host, fh)
    np.savez(path, **arrays)


def load_pp(path: str, cls):
    if not (os.path.exists(path + ".npz") and os.path.exists(path + ".host")):
        return None
    try:
        with open(path + ".host", "rb") as fh:
            host = pickle.load(fh)
        arrs = np.load(path + ".npz")
        kw = dict(host)
        for name in arrs.files:
            kw[name] = jnp.asarray(arrs[name])
        return cls(**kw)
    except Exception:
        return None


# Bumped whenever ProverParams' field layout changes, so stale cache files
# miss by filename instead of failing through load_pp's broad except.
SCHEMA_VERSION = "v2"


def shuffle_pp_cache_path(n_cards: int, apk) -> str:
    import hashlib

    # hash the FULL point: apk and -apk share x, and loading the wrong
    # refreshed params would prove against the wrong joint key
    h = hashlib.sha256(f"{apk[0]:064x}{apk[1]:064x}{SCHEMA_VERSION}".encode())
    return os.path.join(cache_dir(), f"shuffle-pp-{n_cards}-{h.hexdigest()[:16]}")
