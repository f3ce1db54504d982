"""shard_map data-parallel execution of the profiling passes.

Reads are routed to shards on the host (shard = read_id mod S, local read
id = read_id div S), so each shard holds every target of its reads and the
grouped-by-read device contract is preserved per shard.  Each shard runs the
same pass-A/pass-B cores as the single-device path
(slimm_tpu.engine.pipeline); coverage histograms and per-taxid LCA counts
merge with jax.lax.psum over the `data` axis — integer collectives, hence
bit-identical to a single-shard run (tests/test_parallel.py).  Per-contig
occupancy/counters are derived from the MERGED histograms (occupancy does
not commute with summation).

This is the reference's single `while (!atEnd)` loop (slimm.hpp:194) turned
into the TPU-native DP axis (SURVEY.md §2.4); on a multi-host pod slice the
same psums ride ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.pipeline import (
    _boundary_sums,
    _bucket,
    _contig_stats,
    _pass_a_local,
    _pass_b_local,
)
from .mesh import make_mesh


class ShardedRunner:
    """Drop-in `sharded_runner` for engine.profile_arrays."""

    def __init__(self, mesh: Mesh | None = None, num_shards: int | None = None):
        self.mesh = mesh if mesh is not None else make_mesh(num_shards)
        self.n_shards = self.mesh.devices.size
        self._jit_cache: dict = {}

    # -- host-side read routing ----------------------------------------------

    def _route(self, read_id, rid, pos):
        """Partition targets by read so per-read state is shard-local;
        preserves the grouped-by-read order within each shard."""
        S = self.n_shards
        valid = read_id >= 0
        shard = np.where(valid, read_id % S, -1)
        local_read = np.where(valid, read_id // S, -1).astype(np.int32)
        order = np.argsort(shard, kind="stable")  # target order kept per shard
        shard_sorted = shard[order]
        counts = np.bincount(shard_sorted[shard_sorted >= 0], minlength=S)
        n_s = _bucket(int(counts.max()) if counts.size else 1, 1024)
        out_read = np.full((S, n_s), -1, np.int32)
        out_rid = np.zeros((S, n_s), np.int32)
        out_pos = np.zeros((S, n_s), np.int32)
        start = int((shard_sorted < 0).sum())
        for s in range(S):
            c = int(counts[s])
            sel = order[start:start + c]
            out_read[s, :c] = local_read[sel]
            out_rid[s, :c] = rid[sel]
            out_pos[s, :c] = pos[sel]
            start += c
        return out_read, out_rid, out_pos, n_s

    # -- jitted shard_map builders -------------------------------------------

    def _get_pass_a(self, n_s, n_contigs, total_bins_pad):
        key = ("a", n_s, n_contigs, total_bins_pad)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        mesh = self.mesh

        def shard_fn(read_id, rid, pos, lengths_u32, bin_offset, bin_ends,
                     half, bin_width):
            local = _pass_a_local(read_id[0], rid[0], pos[0], lengths_u32,
                                  bin_offset, half, bin_width,
                                  n_contigs=n_contigs,
                                  total_bins_pad=total_bins_pad)
            # exact integer collective merges
            cov = jax.lax.psum(local["cov"], "data")
            uniq_cov = jax.lax.psum(local["uniq_cov"], "data")
            uniq_matches = jax.lax.psum(local["uniq_matches"], "data")
            stats4 = _contig_stats(cov, uniq_cov, bin_offset,
                                   bin_ends)["stats4"]
            extra = jnp.zeros((1, stats4.shape[1]), jnp.int32).at[0, 0].set(
                uniq_matches)
            stats5 = jnp.concatenate([stats4, extra])
            return (cov, uniq_cov, stats5,
                    local["t_read"][None], local["t_rid"][None],
                    local["t_gbin"][None], local["t_valid"][None])

        mapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", None),) * 3 + (P(),) * 5,
            out_specs=(P(),) * 3 + (P("data", None),) * 4)
        fn = jax.jit(mapped)
        self._jit_cache[key] = fn
        return fn

    def _get_pass_b(self, n_s, n_contigs, total_bins_pad, n_dense, k_steps):
        key = ("b", n_s, n_contigs, total_bins_pad, n_dense, k_steps)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        mesh = self.mesh

        def shard_fn(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage,
                     bin_offset, bin_ends):
            local = _pass_b_local(t_read[0], t_rid[0], t_gbin[0], t_valid[0],
                                  valid_mask, lineage, n_contigs=n_contigs,
                                  total_bins_pad=total_bins_pad,
                                  n_dense=n_dense, k_steps=k_steps)
            uniq_cov2 = jax.lax.psum(local["uniq_cov2"], "data")
            taxon_counts = jax.lax.psum(local["taxon_counts"], "data")
            uniq_matches2 = jax.lax.psum(local["uniq_matches2"], "data")
            uniq_reads_count2 = _boundary_sums(uniq_cov2, bin_offset, bin_ends)
            return (uniq_reads_count2, uniq_cov2, taxon_counts, uniq_matches2,
                    local["pair_lca"][None], local["pair_rid"][None])

        mapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", None),) * 4 + (P(),) * 4,
            out_specs=(P(),) * 4 + (P("data", None),) * 2)
        fn = jax.jit(mapped)
        self._jit_cache[key] = fn
        return fn

    # -- engine interface ------------------------------------------------------

    def pass_a(self, read_id, rid, pos, lengths_u32, bin_offset, bin_ends,
               half, bin_width, *, n_contigs, total_bins_pad):
        read2d, rid2d, pos2d, n_s = self._route(read_id, rid, pos)
        fn = self._get_pass_a(n_s, n_contigs, total_bins_pad)
        (cov, uniq_cov, stats5, t_read, t_rid, t_gbin, t_valid) = fn(
            read2d, rid2d, pos2d, jnp.asarray(lengths_u32),
            jnp.asarray(bin_offset), jnp.asarray(bin_ends),
            jnp.asarray(half), jnp.asarray(bin_width))
        return dict(cov=cov, uniq_cov=uniq_cov, stats5=stats5,
                    t_read=t_read, t_rid=t_rid, t_gbin=t_gbin,
                    t_valid=t_valid, _n_s=n_s,
                    _bin_offset=np.asarray(bin_offset),
                    _bin_ends=np.asarray(bin_ends))

    def pass_b(self, a, valid_mask, lineage, *, n_contigs, total_bins_pad,
               n_dense, k_steps):
        fn = self._get_pass_b(a["_n_s"], n_contigs, total_bins_pad, n_dense,
                              k_steps)
        (uniq_reads_count2, uniq_cov2, taxon_counts, uniq_matches2,
         pair_lca, pair_rid) = fn(
            a["t_read"], a["t_rid"], a["t_gbin"], a["t_valid"],
            jnp.asarray(valid_mask), jnp.asarray(lineage),
            jnp.asarray(a["_bin_offset"]), jnp.asarray(a["_bin_ends"]))
        return dict(uniq_reads_count2=uniq_reads_count2, uniq_cov2=uniq_cov2,
                    taxon_counts=taxon_counts, uniq_matches2=uniq_matches2,
                    pair_lca=pair_lca, pair_rid=pair_rid)
