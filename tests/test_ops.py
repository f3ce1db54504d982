"""Pallas histogram kernel parity vs the XLA scatter (interpret mode on
CPU; the same kernel runs compiled on TPU — see the on-chip self-test in
slimm_tpu/ops/hist.py __main__)."""

import numpy as np
import pytest

import jax.numpy as jnp

from slimm_tpu.ops.hist import (CHUNK, _reference_hist, mxu_hist, mxu_hist2)


@pytest.mark.parametrize("seed,density", [(0, 0.9), (1, 0.0), (2, 1.0)])
def test_mxu_hist2_parity_interpret(seed, density):
    rng = np.random.default_rng(seed)
    n, bp = 4 * CHUNK, 2048
    idx = jnp.asarray(rng.integers(0, bp, n).astype(np.int32))
    w1 = jnp.asarray(rng.random(n) < density)
    w2 = jnp.asarray(rng.random(n) < 0.5)
    h1, h2 = mxu_hist2(idx, w1, w2, n_bins_pad=bp, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1),
                                  np.asarray(_reference_hist(idx, w1, bp)))
    np.testing.assert_array_equal(np.asarray(h2),
                                  np.asarray(_reference_hist(idx, w2, bp)))


def test_mxu_hist_parity_interpret():
    rng = np.random.default_rng(3)
    n, bp = 2 * CHUNK, 1024
    idx = jnp.asarray(rng.integers(0, bp, n).astype(np.int32))
    w = jnp.asarray(rng.random(n) < 0.7)
    h = mxu_hist(idx, w, n_bins_pad=bp, interpret=True)
    np.testing.assert_array_equal(np.asarray(h),
                                  np.asarray(_reference_hist(idx, w, bp)))


def test_hist2_packed_scatter_overflow_fallback():
    # engine _hist2 scatter path: both counts ride one uint32 scatter
    # (lo/hi 16-bit fields).  A bin reaching 2^16 w1-hits overflows the
    # low field; the total-mass guard must detect it and the lax.cond
    # fall back to the exact two-scatter branch.
    from slimm_tpu.engine.pipeline import _hist2

    bp = 1024
    # 70_000 > 2^16 records all in bin 3 (plus a scattered tail)
    rng = np.random.default_rng(4)
    n = 80_000
    idx = np.full(n, 3, np.int32)
    idx[70_000:] = rng.integers(0, bp, n - 70_000)
    idx = jnp.asarray(idx)
    w1 = jnp.asarray(np.ones(n, bool))
    w2 = jnp.asarray(rng.random(n) < 0.4)
    h1, h2 = _hist2(idx, w1, w2, bp, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(h1),
                                  np.asarray(_reference_hist(idx, w1, bp)))
    np.testing.assert_array_equal(np.asarray(h2),
                                  np.asarray(_reference_hist(idx, w2, bp)))
    assert int(h1[3]) == 70_000 + int(np.asarray(idx[70_000:] == 3).sum())
    # and the packed fast path itself (no overflow) stays exact
    idx_s = jnp.asarray(rng.integers(0, bp, n).astype(np.int32))
    h1, h2 = _hist2(idx_s, w1, w2, bp, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(h1),
                                  np.asarray(_reference_hist(idx_s, w1, bp)))
    np.testing.assert_array_equal(np.asarray(h2),
                                  np.asarray(_reference_hist(idx_s, w2, bp)))


def test_pass_a_matmul_gather_chromosome_scale():
    # pass A's one-hot matmul table gather splits u32 values into 16-bit
    # halves; chromosome-scale contigs (lengths and bin offsets > 2^24,
    # where plain f32 would LOSE bits) must bin exactly.  Compared against
    # a numpy recompute of center/bin/global-bin.
    import jax

    from slimm_tpu.engine.pipeline import _pass_a_local

    rng = np.random.default_rng(5)
    n_contigs = 5
    lengths = np.array([700_000_000, 650_000_001, 700_000_000,
                        700_000_000, 120_000_000], np.uint32)
    bw = np.int32(150)
    nbins = lengths // np.uint32(bw) + 1
    boff = np.concatenate([[0], np.cumsum(nbins)[:-1]]).astype(np.int32)
    assert int(lengths.max()) > (1 << 24) and int(boff.max()) > (1 << 24)
    n = 4096
    read_id = np.arange(n, dtype=np.int32)
    rid = rng.integers(0, n_contigs, n).astype(np.int32)
    pos = (rng.random(n) * (lengths[rid] - 150)).astype(np.int64).astype(
        np.int32)
    half = np.int32(75)
    total_bins_pad = -(-int(nbins.sum()) // 1024) * 1024
    out = jax.jit(lambda a, b, c: _pass_a_local(
        a, b, c, jnp.asarray(lengths), jnp.asarray(boff), half, bw,
        n_contigs=n_contigs, total_bins_pad=total_bins_pad,
        dedup_window=0, k_steps=1, window=1))(read_id, rid, pos)
    center = np.minimum(pos.astype(np.uint32) + 75, lengths[rid])
    expect = boff[rid] + (center // np.uint32(150)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out["t_gbin"]), expect)
    cov = np.asarray(out["cov"])
    assert int(cov.sum()) == n
    np.testing.assert_array_equal(
        cov, np.bincount(expect, minlength=total_bins_pad))


def test_mxu_hist_heavy_bin_counts():
    # one bin taking >127 hits — int8 products must still accumulate exactly
    n, bp = CHUNK, 1024
    idx = jnp.asarray(np.zeros(n, np.int32))
    w = jnp.asarray(np.ones(n, bool))
    h = mxu_hist(idx, w, n_bins_pad=bp, interpret=True)
    assert int(h[0]) == n and int(h[1:].sum()) == 0
