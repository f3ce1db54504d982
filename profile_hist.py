#!/usr/bin/env python
"""Profile the >1M-bin histogram path (the large-DB config's ceiling).

The 1k-genome config (10M records, ~12.6M bins) runs past the Pallas MXU
crossover, so pass A pays two XLA scatter-adds (cov + uniq_cov) over the
full bin domain.  This script measures, on the live backend, whether any
of the candidate reformulations beats the two-scatter baseline:

  * fused2x  — ONE scatter over a doubled domain (indices idx and idx+B
    concatenated): same 2N scattered elements, one op.
  * packed   — ONE scatter of N elements with the two counts packed into
    one int32 value (w1 + (w2 << 16)), split after.  Halves the scattered
    element count; only valid while every bin's count stays < 2^16 —
    usable as a guarded fast path, measured here for the ceiling.
  * presence — int8 .at[].max(1) occupancy + per-contig count matmul
    (what the -ro/-co-off profile actually needs from the bin domain is
    occupancy, not counts... except uniq_cov2 mass rides the same path).

Run: python profile_hist.py [n_records] [n_bins_millions] [variants...]
Prints one JSON line with the timings; wraps everything in jit.

MEASURED (TPU v5e via axon, 2026-08-21, 9.2M records x 12.6M bins —
the 1k-genome large-DB config's pass-A geometry):

  one_scatter    0.123 s   (75M elem/s — matches the documented rate)
  two_scatters   0.222 s   (the current pass A: 83M combined elem/s)
  presence       0.214 s   (int8 .at[].max: NO win — the scatter is
                            element-bound, not accumulator-width-bound —
                            and it loses the counts -ro/-co and
                            reads_count need)
  packed         compile >9 min, twice (DISQUALIFIED: the engine
                            compiles per bin-geometry at runtime)
  fused2x        same scatter family as packed; untimed after packed's
                            pathological compile

CONCLUSION: the cov+uniq_cov scatter pair is at the XLA scatter roofline
on this chip.  The large-DB config's 0.558 s device time = 0.222 s
irreducible scatter pair + ~0.34 s of dedup/segment/LCA machinery over
10M records.  Do NOT replace the two plain scatters; alternatives either
tie or do not compile in usable time.
"""

import json
import sys
import time

import numpy as np


def _force(out):
    # tiny device-side slice -> 8-element fetch: waits for the whole
    # computation WITHOUT pulling the 50 MB histogram over the ~40 MB/s
    # tunnel inside the timed region
    x = out[0] if isinstance(out, tuple) else out
    return np.asarray(x[:8])


def timeit(fn, *args, reps=5):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 9_200_000
    bm = float(sys.argv[2]) if len(sys.argv) > 2 else 12.6
    B = int(bm * 1e6) // 1024 * 1024
    n = -(-n // 2048) * 2048
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, B, n).astype(np.int32))
    w1 = jnp.asarray(rng.random(n) < 0.95)
    w2 = jnp.asarray(rng.random(n) < 0.80)

    @jax.jit
    def two_scatters(idx, w1, w2):
        i1 = jnp.where(w1, idx, B)
        i2 = jnp.where(w2, idx, B)
        h1 = jnp.zeros(B, jnp.int32).at[i1].add(w1.astype(jnp.int32),
                                                mode="drop")
        h2 = jnp.zeros(B, jnp.int32).at[i2].add(w2.astype(jnp.int32),
                                                mode="drop")
        return h1, h2

    @jax.jit
    def fused2x(idx, w1, w2):
        i = jnp.concatenate([jnp.where(w1, idx, 2 * B),
                             jnp.where(w2, idx + B, 2 * B)])
        h = jnp.zeros(2 * B, jnp.int32).at[i].add(1, mode="drop")
        return h[:B], h[B:]

    @jax.jit
    def packed(idx, w1, w2):
        i = jnp.where(w1 | w2, idx, B)
        v = w1.astype(jnp.int32) + (w2.astype(jnp.int32) << 16)
        h = jnp.zeros(B, jnp.int32).at[i].add(v, mode="drop")
        return h & 0xFFFF, h >> 16

    @jax.jit
    def presence(idx, w1, w2):
        i1 = jnp.where(w1, idx, B)
        h1 = jnp.zeros(B, jnp.int8).at[i1].max(jnp.int8(1), mode="drop")
        i2 = jnp.where(w2, idx, B)
        h2 = jnp.zeros(B, jnp.int8).at[i2].max(jnp.int8(1), mode="drop")
        return h1, h2

    @jax.jit
    def one_scatter(idx, w1):
        i1 = jnp.where(w1, idx, B)
        return jnp.zeros(B, jnp.int32).at[i1].add(w1.astype(jnp.int32),
                                                  mode="drop")

    variants = {"one_scatter": (one_scatter, (idx, w1)),
                "two_scatters": (two_scatters, (idx, w1, w2)),
                "fused2x": (fused2x, (idx, w1, w2)),
                "packed": (packed, (idx, w1, w2)),
                "presence": (presence, (idx, w1, w2))}
    only = [a for a in sys.argv[3:] if a in variants]
    r = {"records": n, "bins": B, "backend": jax.default_backend()}
    for name in (only or list(variants)):
        fn, args = variants[name]
        r[f"{name}_secs"] = round(timeit(fn, *args), 4)
        print(json.dumps({name: r[f"{name}_secs"]}), flush=True)
    if not only or set(only) >= {"two_scatters", "fused2x", "packed"}:
        a = two_scatters(idx, w1, w2)
        for name, fn in (("fused2x", fused2x), ("packed", packed)):
            b = fn(idx, w1, w2)
            assert np.array_equal(np.asarray(a[0]), np.asarray(b[0])), name
            assert np.array_equal(np.asarray(a[1]), np.asarray(b[1])), name
    print(json.dumps(r))


if __name__ == "__main__":
    main()
