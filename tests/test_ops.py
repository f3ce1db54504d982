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


def test_mxu_hist_heavy_bin_counts():
    # one bin taking >127 hits — int8 products must still accumulate exactly
    n, bp = CHUNK, 1024
    idx = jnp.asarray(np.zeros(n, np.int32))
    w = jnp.asarray(np.ones(n, bool))
    h = mxu_hist(idx, w, n_bins_pad=bp, interpret=True)
    assert int(h[0]) == n and int(h[1:].sum()) == 0
