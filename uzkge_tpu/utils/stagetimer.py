"""Lightweight stage timing for the prover hot path.

The reference has no profiler (SURVEY.md section 5); this is the TPU build's
minimal observability layer: named wall-clock stages collected into a global
dict, cheap enough to leave on in production.  `bench.py` publishes the
collected breakdown as `stage_breakdown` in its JSON line; anything else can
read `snapshot()`.

Usage:
    from ..utils.stagetimer import stage
    with stage("r3_t_kernel", block=t_evals):
        ...

`block` (optional) is an array/pytree passed to jax.block_until_ready on
exit so async-dispatched device work is charged to the stage that issued it
rather than the next host sync.
"""

import time
from collections import defaultdict
from contextlib import contextmanager

_acc = defaultdict(float)
_counts = defaultdict(int)


def reset():
    _acc.clear()
    _counts.clear()


def snapshot(round_to: int = 4):
    return {k: round(v, round_to) for k, v in sorted(_acc.items(), key=lambda kv: -kv[1])}


def total():
    return sum(_acc.values())


@contextmanager
def stage(name: str, block=None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block is not None:
            import jax

            jax.block_until_ready(block)
        dt = time.perf_counter() - t0
        _acc[name] += dt
        _counts[name] += 1
