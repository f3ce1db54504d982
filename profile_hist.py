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
  two_scatters   0.223 s   (plain pair: 83M combined elem/s)
  packed         0.1225 s  (ONE uint32 scatter, lo/hi 16-bit count
                            fields — as fast as a single scatter: the
                            op is ELEMENT-bound)
  fused2x        0.234 s   (doubled domain, 2N elements: no win)
  presence       0.213 s   (int8 .at[].max ties the pair and loses the
                            counts -ro/-co and reads_count need)
  gath           0.173 s   (lengths[rid] + bin_offset[rid] computed-
                            index gathers at 10M records, 1000 contigs)
  gathmm         0.036 s   (both columns via ONE one-hot f32 matmul,
                            u32 split into exact 16-bit halves — 4.8x)
  passa/full     0.395 / 0.711 s (pre-optimization ablation)

NOTE on compile times: packed twice took >9 min to compile early in the
session and later compiled in ~2 min like every other variant — axon
compile walltime varies wildly run-to-run; never disqualify a program on
one compile sample.

OUTCOME (landed in engine/pipeline.py): _hist2's scatter path uses the
packed uint32 scatter with an exact total-mass overflow guard (lax.cond
falls back to the plain pair for >=2^16-deep bins), and pass A's raw
binning path gathers both per-contig columns with the one-hot matmul
when n_contigs <= 4096.  Large-DB config: 0.556 -> 0.316 s device
(17.9 -> 31.6M rec/s, 4.18x the single-core C++ baseline).
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

    if any(a in ("passa", "full", "gath", "gathmm") for a in sys.argv[3:]):
        # ablation at the REAL large-config geometry: pass A alone vs the
        # whole fused profile (attributes the non-scatter time)
        import os

        import bench
        from slimm_tpu.engine.pipeline import (_bucket, _pass_a_local,
                                               fused_profile, seg_plan)
        n_contigs = int(os.environ.get("SLIMM_PH_CONTIGS", 1000))
        wl = bench.make_workload(
            int(os.environ.get("SLIMM_PH_RECORDS", 10_000_000)),
            n_contigs, seed=2)
        bw = np.int32(wl["avg_read_len"])
        nb = wl["lengths"] // np.uint32(bw) + 1
        boff = np.concatenate([[0], np.cumsum(nb)[:-1]]).astype(np.int32)
        bends = (boff + nb).astype(np.int32)
        tbp = -(-int(nb.sum()) // 1024) * 1024
        _, k_steps, window = seg_plan(wl["read_id"])
        npd = _bucket(len(wl["read_id"]))
        rd = np.full(npd, -1, np.int32); rd[:len(wl["read_id"])] = wl["read_id"]
        ri = np.zeros(npd, np.int32); ri[:len(wl["rid"])] = wl["rid"]
        po = np.zeros(npd, np.int32); po[:len(wl["pos"])] = wl["pos"]
        drd, dri, dpo = jnp.asarray(rd), jnp.asarray(ri), jnp.asarray(po)
        dlen = jnp.asarray(wl["lengths"]); dof = jnp.asarray(boff)
        den = jnp.asarray(bends); dlin = jnp.asarray(wl["lineage"])
        dsk = jnp.asarray(wl["sk_code"])
        half = np.int32(wl["avg_read_len"] // 2)
        kw = dict(n_contigs=n_contigs, total_bins_pad=tbp,
                  dedup_window=max(1, window), k_steps=k_steps,
                  window=window)

        pa = jax.jit(partial(_pass_a_local, **kw))

        def passa(a, b, c):
            return pa(a, b, c, dlen, dof, half, bw)["cov"]

        def full(a, b, c):
            return fused_profile(
                a, b, c, dlen, dof, den, half, bw, dlin, dsk,
                np.float32(0.95), n_dense=wl["n_dense"],
                n_codes=wl["n_codes"], emit_coverage=False, **kw)["packed"]

        variants["passa"] = (passa, (drd, dri, dpo))
        variants["full"] = (full, (drd, dri, dpo))

        # the two per-record table gathers of pass A's raw path, plain
        # gather vs one-hot f32 matmul (hi/lo 16-bit split keeps u32
        # table values exact in f32)
        @jax.jit
        def gath(rid):
            rc = jnp.clip(rid, 0, n_contigs - 1)
            return dlen[rc], dof[rc]

        tbl = jnp.stack([
            (wl["lengths"] >> 16).astype(np.float32),
            (wl["lengths"] & 0xFFFF).astype(np.float32),
            (boff >> 16).astype(np.float32),
            (boff & 0xFFFF).astype(np.float32)], axis=1)

        @jax.jit
        def gathmm(rid):
            rc = jnp.clip(rid, 0, n_contigs - 1)
            oh = (rc[:, None] == jnp.arange(n_contigs, dtype=jnp.int32)
                  [None, :]).astype(jnp.float32)
            g = oh @ tbl
            hi = g[:, ::2].astype(jnp.int32) << 16
            lo = g[:, 1::2].astype(jnp.int32)
            return ((hi[:, 0] | lo[:, 0]).astype(jnp.uint32),
                    hi[:, 1] | lo[:, 1])

        variants["gath"] = (gath, (dri,))
        variants["gathmm"] = (gathmm, (dri,))
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
