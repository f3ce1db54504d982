"""shard_map data-parallel execution of the profiling passes.

Reads are routed to shards on the host (shard = read_id mod S, local read
id = read_id div S), so each shard holds every record of its reads.  Each
shard runs the same pass-A/pass-B cores as the single-device path
(slimm_tpu.engine.pipeline); coverage histograms, per-contig counters, and
per-taxid LCA counts merge with jax.lax.psum over the `data` axis — integer
collectives, hence bit-identical to a single-shard run (tested in
tests/test_parallel.py).

This is the reference's single `while (!atEnd)` loop (slimm.hpp:194) turned
into the TPU-native DP axis (SURVEY.md §2.4); on a multi-host pod slice the
same psums ride ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.pipeline import _bucket, _nz_counts, _pass_a_local, _pass_b_local
from .mesh import make_mesh


class ShardedRunner:
    """Drop-in `sharded_runner` for engine.profile_arrays."""

    def __init__(self, mesh: Mesh | None = None, num_shards: int | None = None):
        self.mesh = mesh if mesh is not None else make_mesh(num_shards)
        self.n_shards = self.mesh.devices.size
        self._jit_cache: dict = {}

    # -- host-side read routing ----------------------------------------------

    def _route(self, read_id, rid, pos):
        """Partition records by read so per-read state is shard-local."""
        S = self.n_shards
        valid = read_id >= 0
        shard = np.where(valid, read_id % S, -1)
        local_read = np.where(valid, read_id // S, -1).astype(np.int32)
        order = np.argsort(shard, kind="stable")  # record order kept per shard
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

    def _get_pass_a(self, n_s, r_pad, n_contigs, total_bins):
        key = ("a", n_s, r_pad, n_contigs, total_bins)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        mesh = self.mesh

        def shard_fn(read_id, rid, pos, lengths_u32, bin_offset,
                     contig_of_bin, half, bin_width):
            local = _pass_a_local(read_id[0], rid[0], pos[0], lengths_u32,
                                  bin_offset, half, bin_width,
                                  n_contigs=n_contigs, total_bins=total_bins,
                                  n_reads_pad=r_pad)
            # exact integer collective merges
            cov = jax.lax.psum(local["cov"], "data")
            uniq_cov = jax.lax.psum(local["uniq_cov"], "data")
            reads_count = jax.lax.psum(local["reads_count"], "data")
            uniq_reads_count = jax.lax.psum(local["uniq_reads_count"], "data")
            uniq_matches = jax.lax.psum(local["uniq_matches"], "data")
            nz_cov = _nz_counts(cov, contig_of_bin, n_contigs)
            nz_uniq = _nz_counts(uniq_cov, contig_of_bin, n_contigs)
            return (cov, uniq_cov, reads_count, uniq_reads_count,
                    uniq_matches, nz_cov, nz_uniq,
                    local["t_read"][None], local["t_rid"][None],
                    local["t_gbin"][None], local["t_valid"][None])

        mapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", None),) * 3 + (P(),) * 5,
            out_specs=(P(),) * 7 + (P("data", None),) * 4)
        fn = jax.jit(mapped)
        self._jit_cache[key] = fn
        return fn

    def _get_pass_b(self, n_s, r_pad, n_contigs, total_bins, n_dense):
        key = ("b", n_s, r_pad, n_contigs, total_bins, n_dense)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        mesh = self.mesh

        def shard_fn(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage):
            local = _pass_b_local(t_read[0], t_rid[0], t_gbin[0], t_valid[0],
                                  valid_mask, lineage, n_contigs=n_contigs,
                                  total_bins=total_bins, n_reads_pad=r_pad,
                                  n_dense=n_dense)
            uniq_reads_count2 = jax.lax.psum(local["uniq_reads_count2"], "data")
            uniq_cov2 = jax.lax.psum(local["uniq_cov2"], "data")
            taxon_counts = jax.lax.psum(local["taxon_counts"], "data")
            uniq_matches2 = jax.lax.psum(local["uniq_matches2"], "data")
            return (uniq_reads_count2, uniq_cov2, taxon_counts, uniq_matches2,
                    local["pair_lca"][None], local["pair_rid"][None])

        mapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data", None),) * 4 + (P(), P()),
            out_specs=(P(),) * 4 + (P("data", None),) * 2)
        fn = jax.jit(mapped)
        self._jit_cache[key] = fn
        return fn

    # -- engine interface ------------------------------------------------------

    def pass_a(self, read_id, rid, pos, lengths_u32, bin_offset, contig_of_bin,
               half, bin_width, *, n_contigs, total_bins, n_reads):
        S = self.n_shards
        read2d, rid2d, pos2d, n_s = self._route(read_id, rid, pos)
        r_pad = _bucket(-(-max(n_reads, 1) // S), 1024)
        fn = self._get_pass_a(n_s, r_pad, n_contigs, total_bins)
        (cov, uniq_cov, reads_count, uniq_reads_count, uniq_matches,
         nz_cov, nz_uniq, t_read, t_rid, t_gbin, t_valid) = fn(
            read2d, rid2d, pos2d, jnp.asarray(lengths_u32),
            jnp.asarray(bin_offset), jnp.asarray(contig_of_bin),
            jnp.asarray(half), jnp.asarray(bin_width))
        return dict(cov=cov, uniq_cov=uniq_cov, reads_count=reads_count,
                    uniq_reads_count=uniq_reads_count,
                    uniq_matches=uniq_matches, nz_cov=nz_cov, nz_uniq=nz_uniq,
                    t_read=t_read, t_rid=t_rid, t_gbin=t_gbin,
                    t_valid=t_valid, _n_s=n_s, _r_pad=r_pad)

    def pass_b(self, a, valid_mask, lineage, *, n_contigs, total_bins, n_dense):
        fn = self._get_pass_b(a["_n_s"], a["_r_pad"], n_contigs, total_bins,
                              n_dense)
        (uniq_reads_count2, uniq_cov2, taxon_counts, uniq_matches2,
         pair_lca, pair_rid) = fn(
            a["t_read"], a["t_rid"], a["t_gbin"], a["t_valid"],
            jnp.asarray(valid_mask), jnp.asarray(lineage))
        return dict(uniq_reads_count2=uniq_reads_count2, uniq_cov2=uniq_cov2,
                    taxon_counts=taxon_counts, uniq_matches2=uniq_matches2,
                    pair_lca=pair_lca, pair_rid=pair_rid)
