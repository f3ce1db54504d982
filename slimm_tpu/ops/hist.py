"""MXU one-hot histogram kernels (Pallas TPU).

XLA's scatter-add runs at ~130M elem/s on TPU v5e — it is the profiler's
single hottest op (three histograms per file: cov, uniq_cov, and the fused
uniq_cov2+LCA scatter, reference slimm.hpp:219-256, 383-390, 552-556).

The kernel reformulates `hist[idx] += w` as int8 one-hot matmuls on the
MXU: split each bin index into (hi, lo) = (idx // 512, idx % 512); for a
chunk of R records build one-hots At[h, r] = (hi[r] == h) and
Bt[l, r] = (lo[r] == l) & w[r] and accumulate
  acc[h, l] += At @ Bt^T   (contract over the record axis)
in VMEM across sequential grid steps (TPU grids execute in order, so the
running accumulator is race-free).  Both one-hots are built directly in
(bin, record) layout — the record axis stays on lanes, so no vector
transposes are needed.  Cost is N·n_bins int8 MACs — at v5e's ~400 TOPS
int8 that clears the 2M-record × 400k-bin bench workload in a few ms vs
~17 ms for the XLA scatter.

Weights are 0/1 (histogram counts), so int8 products are exact and int32
accumulation never overflows below 2^31 records per bin.

`mxu_hist2` computes TWO histograms over the SAME index vector (cov +
uniq_cov share the bin index; only the mask differs), reusing the At
one-hot for both dots.

Applicability: n_bins_pad and the record count must be multiples of the
tile sizes (the engine pads both), and the accumulator (+ one-hots) must
fit VMEM — n_bins_pad <= HIST_MAX_BINS.  Callers fall back to the XLA
scatter otherwise (slimm_tpu.engine.pipeline).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 512          # low-radix (lane) width of the 2-D accumulator
CHUNK = 2048      # records per grid step
# MXU-vs-scatter crossover measured on TPU v5e (8.4M records):
#   256k bins: 53ms mxu / 147ms scatter;  1M: 130 / 144;  2M: 260 / 153.
# Brute-force one-hot cost is N*n_bins, so past ~1M bins the XLA scatter
# (~115M elem/s, flat in domain size up to ~2M, ~75M at 20M+) wins.
HIST_MAX_BINS = 1024 * 1024


def pallas_ok(n_bins_pad: int, n_records: int) -> bool:
    """Kernel applicability on the current default backend."""
    if jax.default_backend() == "cpu":
        return False
    return (n_bins_pad % 1024 == 0 and n_bins_pad <= HIST_MAX_BINS
            and n_records % CHUNK == 0)


def _onehots(idx_row, h_pad):
    """(1, R) int32 bin indices → transposed one-hots At (H, R), lo_hot
    (LO, R), both int8-ready bools."""
    R = idx_row.shape[-1]
    hi = idx_row // LO                      # (1, R)
    lo = idx_row - hi * LO
    at = hi == jax.lax.broadcasted_iota(jnp.int32, (h_pad, R), 0)
    lo_hot = lo == jax.lax.broadcasted_iota(jnp.int32, (LO, R), 0)
    return at, lo_hot


_DN = (((1,), (1,)), ((), ()))              # contract over the record axis


def _hist_kernel2(idx_ref, w1_ref, w2_ref, acc1_ref, acc2_ref, *, h_pad):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc1_ref[:, :] = jnp.zeros_like(acc1_ref)
        acc2_ref[:, :] = jnp.zeros_like(acc2_ref)

    at, lo_hot = _onehots(idx_ref[0], h_pad)
    a = at.astype(jnp.int8)
    b1 = (lo_hot & (w1_ref[0] != 0)).astype(jnp.int8)
    b2 = (lo_hot & (w2_ref[0] != 0)).astype(jnp.int8)
    acc1_ref[:, :] += jax.lax.dot_general(
        a, b1, dimension_numbers=_DN, preferred_element_type=jnp.int32)
    acc2_ref[:, :] += jax.lax.dot_general(
        a, b2, dimension_numbers=_DN, preferred_element_type=jnp.int32)


def _hist_kernel1(idx_ref, w1_ref, acc1_ref, *, h_pad):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc1_ref[:, :] = jnp.zeros_like(acc1_ref)

    at, lo_hot = _onehots(idx_ref[0], h_pad)
    a = at.astype(jnp.int8)
    b1 = (lo_hot & (w1_ref[0] != 0)).astype(jnp.int8)
    acc1_ref[:, :] += jax.lax.dot_general(
        a, b1, dimension_numbers=_DN, preferred_element_type=jnp.int32)


def _grid_shapes(idx, n_bins_pad):
    n = idx.shape[0]
    assert n % CHUNK == 0, n
    g = n // CHUNK
    h = n_bins_pad // LO
    h_pad = -(-h // 32) * 32             # int8 sublane multiple
    return g, h_pad


def _blocked(x, g):
    return x.reshape(g, 1, CHUNK)


_REC_SPEC = pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("n_bins_pad", "interpret"))
def mxu_hist2(idx, w1, w2, *, n_bins_pad: int, interpret: bool = False):
    """Two int32[n_bins_pad] histograms of idx weighted by boolean w1/w2.

    Out-of-histogram records must carry BOTH weights false (the engine
    routes drops to a garbage slot inside the padded region instead)."""
    g, h_pad = _grid_shapes(idx, n_bins_pad)
    acc1, acc2 = pl.pallas_call(
        partial(_hist_kernel2, h_pad=h_pad),
        grid=(g,),
        in_specs=[_REC_SPEC] * 3,
        out_specs=[pl.BlockSpec((h_pad, LO), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((h_pad, LO), jnp.int32)] * 2,
        interpret=interpret,
    )(_blocked(idx, g), _blocked(w1.astype(jnp.int8), g),
      _blocked(w2.astype(jnp.int8), g))
    return (acc1.reshape(-1)[:n_bins_pad], acc2.reshape(-1)[:n_bins_pad])


@partial(jax.jit, static_argnames=("n_bins_pad", "interpret"))
def mxu_hist(idx, w, *, n_bins_pad: int, interpret: bool = False):
    """One int32[n_bins_pad] histogram of idx weighted by boolean w."""
    g, h_pad = _grid_shapes(idx, n_bins_pad)
    acc = pl.pallas_call(
        partial(_hist_kernel1, h_pad=h_pad),
        grid=(g,),
        in_specs=[_REC_SPEC] * 2,
        out_specs=pl.BlockSpec((h_pad, LO), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, LO), jnp.int32),
        interpret=interpret,
    )(_blocked(idx, g), _blocked(w.astype(jnp.int8), g))
    return acc.reshape(-1)[:n_bins_pad]


def _reference_hist(idx, w, n_bins_pad):
    """XLA scatter reference (for parity tests)."""
    idxs = jnp.where(w, idx, n_bins_pad)
    return jnp.zeros(n_bins_pad, jnp.int32).at[idxs].add(
        w.astype(jnp.int32), mode="drop")


def self_test() -> str:
    """Kernel-vs-scatter parity on the CURRENT default backend; returns the
    backend name.  Run via `python -m slimm_tpu.ops.hist` (manual) or the
    gated tests/test_tpu_live.py (pytest, skipped off-TPU)."""
    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    n, bp = 8192, 4096
    idx = jnp.asarray(rng.integers(0, bp, n).astype(np.int32))
    w1 = jnp.asarray(rng.random(n) < 0.9)
    w2 = jnp.asarray(rng.random(n) < 0.3)
    interp = backend == "cpu"   # Mosaic needs a real TPU
    h1, h2 = mxu_hist2(idx, w1, w2, n_bins_pad=bp, interpret=interp)
    r1 = _reference_hist(idx, w1, bp)
    r2 = _reference_hist(idx, w2, bp)
    assert np.array_equal(np.asarray(h1), np.asarray(r1)), "h1 mismatch"
    assert np.array_equal(np.asarray(h2), np.asarray(r2)), "h2 mismatch"
    h = mxu_hist(idx, w1, n_bins_pad=bp, interpret=interp)
    assert np.array_equal(np.asarray(h), np.asarray(r1)), "h mismatch"
    return backend


if __name__ == "__main__":   # quick self-test on the live backend
    backend = self_test()
    print(f"backend={backend}")
    print("mxu_hist parity ok")
