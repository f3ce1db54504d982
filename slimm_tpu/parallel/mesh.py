"""Device mesh construction.

The profiling workload is data-parallel over READS (every record of a read
stays on one shard, so per-read dedup/uniqueness/LCA are shard-local and the
merged quantities are integer histograms — psum is exact and shard count is
invisible in the results).  The reference has no parallelism at all
(SURVEY.md §2.4); this is the TPU-native scale-out axis.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(num_shards: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the `data` axis (reads)."""
    devs = list(devices if devices is not None else jax.devices())
    n = num_shards or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} shards but only {len(devs)} devices")
    return Mesh(np.asarray(devs[:n]), ("data",))
