"""Reliable device timing.

block_until_ready is not trustworthy on the experimental axon PJRT plugin
(it sometimes returns before execution completes).  `sync_time` forces a
device→host copy of a small dependent value, which is a true barrier.
"""

from __future__ import annotations

import time

import numpy as np


def force(out):
    """Materialize a small dependent value on the host (true sync)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    acc = 0
    for leaf in leaves:
        acc += int(np.asarray(leaf.ravel()[0])) if hasattr(leaf, "ravel") else 0
    return acc


def sync_time(fn, *args, reps: int = 5, warmup: int = 1):
    """Median wall seconds of fn(*args) with forced host sync."""
    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
