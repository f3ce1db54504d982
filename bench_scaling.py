#!/usr/bin/env python
"""Scaling harness: fused-profile records/s vs data-shard count.

BASELINE.md's scaling target (>=80% efficiency at >=2 hosts) needs a
records/s-vs-shards trend line.  Real multi-chip hardware is not reachable
from this environment (one tunneled v5e chip), so this measures the
shard_map data-parallel path on a virtual CPU mesh
(--xla_force_host_platform_device_count): the COMMUNICATION/merge structure
is identical to the multi-chip program (integer psums over the data axis);
absolute numbers are CPU-bound and the virtual devices oversubscribe the
physical cores, so treat efficiency as a lower bound on ICI scaling.

Writes SCALING.json and prints one JSON line.

Env knobs: SLIMM_SCALE_RECORDS (default 2M), SLIMM_SCALE_CONTIGS (50),
SLIMM_SCALE_SHARDS (default "1,2,4,8").
"""

import json
import os
import time

import numpy as np


def main():
    shard_list = [int(s) for s in os.environ.get(
        "SLIMM_SCALE_SHARDS", "1,2,4,8").split(",")]
    n_records = int(os.environ.get("SLIMM_SCALE_RECORDS", 2_000_000))
    n_contigs = int(os.environ.get("SLIMM_SCALE_CONTIGS", 50))

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={max(shard_list)}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import make_workload
    from slimm_tpu.engine.pipeline import _bucket, seg_plan
    from slimm_tpu.parallel import ShardedRunner

    w = make_workload(n_records, n_contigs)
    n = len(w["read_id"])
    bin_width = np.int32(w["avg_read_len"])
    nbins = w["lengths"] // np.uint32(bin_width) + 1
    bin_offset = np.concatenate([[0], np.cumsum(nbins)[:-1]]).astype(np.int32)
    bin_ends = (bin_offset + nbins).astype(np.int32)
    total_bins_pad = -(-int(nbins.sum()) // 1024) * 1024
    _, k_steps, window = seg_plan(w["read_id"])
    kw = dict(n_contigs=n_contigs, total_bins_pad=total_bins_pad,
              n_dense=w["n_dense"], n_codes=w["n_codes"],
              dedup_window=max(1, window), k_steps=k_steps, window=window)

    results = {}
    for s in shard_list:
        runner = ShardedRunner(num_shards=s)
        args = (w["read_id"], w["rid"], w["pos"], w["lengths"],
                bin_offset, bin_ends, np.int32(w["avg_read_len"] // 2),
                bin_width, w["lineage"], w["sk_code"], np.float32(0.95))

        def run():
            out = runner.fused(*args, **kw)
            return np.asarray(out["packed"])[:1]

        run()  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        secs = min(ts)
        results[s] = n / secs
        print(f"# shards={s}: {n / secs / 1e6:.2f}M records/s "
              f"({secs * 1e3:.0f} ms)", flush=True)

    base = results[shard_list[0]]
    eff = {s: round(results[s] / (base * s / shard_list[0]), 3)
           for s in shard_list}
    out = {
        "metric": "data-parallel scaling (virtual CPU mesh)",
        "records": n,
        "records_per_s": {str(s): round(v) for s, v in results.items()},
        "efficiency_vs_linear": {str(s): eff[s] for s in shard_list},
        "note": ("virtual devices oversubscribe 2 physical cores; "
                 "communication structure matches the multi-chip program"),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
