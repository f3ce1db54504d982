"""The TPU device pipeline: dense-tensor re-formulation of the profiler.

Division of labor (TPU-first design):
  * The decoder (native C++ or Python fallback, slimm_tpu/io) interns read
    names and applies the first-hit-wins (read, contig) dedup of
    read_stat::add_target (reference read_stat.hpp:116-135) while streaming
    the file — it already owns the read-name hash map, so dedup is a free
    O(1) set probe per record.  It emits dense TARGET arrays
    (read_id, rid, pos): one entry per distinct (read, contig).
  * The device runs everything per-target/per-bin as scatter-adds, segment
    reductions and gathers — no device-side sort anywhere (XLA TPU sorts
    compile catastrophically slowly at millions of elements on current
    toolchains and are unnecessary here).

  pass A  (targets → coverage):
    bin = min(pos + avg_len/2, length[rid]) / bin_width   (slimm.hpp:200-201)
    per-read target counts → uniqueness; per-contig counters; coverage
    histograms over the flat global bin axis (slimm.hpp:219-256)

  pass B  (targets + validity mask → LCA):
    re-mask targets by valid contigs (read_stat::update, slimm.hpp:380-390)
    per-read per-level segment min/max over the dense lineage matrix; the
    first level where min == max is the LCA level, and the value is
    lineage[max_rid][level] — exactly the reference's "last inserted wins"
    (std::set iterates ascending, slimm.hpp:516-531)
    scatter-add LCA counts over the dense taxid axis; (lca, contig) pairs
    out for the children sets

The `_pass_a_local` / `_pass_b_local` cores are shared between the
single-device jits below and the shard_map data-parallel runner
(slimm_tpu.parallel.runner): all merged quantities are integer counts, so
multi-shard psum merges are exact and shard count is invisible.

Static shapes: target and read axes are padded to bucket sizes so jit
caches compilations across files/batches.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EngineOptions, ProfileOptions
from ..database import DenseTaxonomy, SlimmDatabase, tensorize
from ..state import ProfileState
from ..utils.timer import PhaseTimer


def _bucket(n: int, quantum: int = 8192) -> int:
    """Round up to a padding bucket (limits jit recompiles across files)."""
    if n <= quantum:
        return max(quantum, 1)
    b = quantum
    while b < n:
        b *= 2
    return b


# ---------------------------------------------------------------------------
# shared cores (used by both the single-device jits and shard_map shards)
# ---------------------------------------------------------------------------


def _pass_a_local(t_read, t_rid, t_pos, lengths_u32, bin_offset,
                  half, bin_width, *, n_contigs, total_bins, n_reads_pad):
    """Dedup'd targets → per-read/per-contig counters + coverage histograms.

    t_read/t_rid/t_pos are int32[N_pad] target arrays padded with
    t_read == -1; one entry per distinct (read, contig), first hit's pos.
    """
    valid = t_read >= 0
    rid_c = jnp.clip(t_rid, 0, n_contigs - 1)
    # center-position binning with uint32 wrap semantics (slimm.hpp:200-201)
    center = jnp.minimum(t_pos.astype(jnp.uint32) + half.astype(jnp.uint32),
                         lengths_u32[rid_c])
    local_bin = (center // bin_width.astype(jnp.uint32)).astype(jnp.int32)
    t_gbin = bin_offset[rid_c] + local_bin

    # per-read target counts; padding goes to segment n_reads_pad
    seg = jnp.where(valid, t_read, n_reads_pad)
    n_targets = jax.ops.segment_sum(valid.astype(jnp.int32), seg,
                                    num_segments=n_reads_pad + 1)[:-1]
    read_is_uniq = n_targets == 1
    t_uniq = valid & read_is_uniq[jnp.clip(t_read, 0, n_reads_pad - 1)]

    # per-contig counters (slimm.hpp:219-256)
    seg_rid = jnp.where(valid, t_rid, n_contigs)
    reads_count = jax.ops.segment_sum(valid.astype(jnp.int32), seg_rid,
                                      num_segments=n_contigs + 1)[:-1]
    uniq_reads_count = jax.ops.segment_sum(t_uniq.astype(jnp.int32), seg_rid,
                                           num_segments=n_contigs + 1)[:-1]

    # coverage histograms over the flat global bin axis
    hist_idx = jnp.where(valid, t_gbin, total_bins)
    cov = jnp.zeros(total_bins, jnp.int32).at[hist_idx].add(
        valid.astype(jnp.int32), mode="drop")
    uniq_cov = jnp.zeros(total_bins, jnp.int32).at[hist_idx].add(
        t_uniq.astype(jnp.int32), mode="drop")

    uniq_matches = jnp.sum(read_is_uniq.astype(jnp.int32))
    return dict(t_read=t_read, t_rid=t_rid, t_gbin=t_gbin, t_valid=valid,
                cov=cov, uniq_cov=uniq_cov, reads_count=reads_count,
                uniq_reads_count=uniq_reads_count, uniq_matches=uniq_matches)


def _nz_counts(cov, contig_of_bin, n_contigs):
    """Per-contig nonzero-bin counts (reference_contig.hpp:84-91)."""
    return jax.ops.segment_sum((cov > 0).astype(jnp.int32), contig_of_bin,
                               num_segments=n_contigs)


def _pass_b_local(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage,
                  *, n_contigs, total_bins, n_reads_pad, n_dense):
    """Filtered re-dedup + vectorized LCA (slimm.hpp:351-392, 516-557)."""
    rid_c = jnp.clip(t_rid, 0, n_contigs - 1)
    tmask = t_valid & valid_mask[rid_c]

    seg = jnp.where(tmask, t_read, n_reads_pad)
    n_valid = jax.ops.segment_sum(tmask.astype(jnp.int32), seg,
                                  num_segments=n_reads_pad + 1)[:-1]
    read_u2 = n_valid == 1
    read_multi = n_valid > 1
    tread_c = jnp.clip(t_read, 0, n_reads_pad - 1)
    t_u2 = tmask & read_u2[tread_c]
    t_multi = tmask & read_multi[tread_c]

    # newly-unique reads (slimm.hpp:383-390)
    seg_rid = jnp.where(t_u2, t_rid, n_contigs)
    uniq_reads_count2 = jax.ops.segment_sum(t_u2.astype(jnp.int32), seg_rid,
                                            num_segments=n_contigs + 1)[:-1]
    hist_idx = jnp.where(t_u2, t_gbin, total_bins)
    uniq_cov2 = jnp.zeros(total_bins, jnp.int32).at[hist_idx].add(
        t_u2.astype(jnp.int32), mode="drop")

    # --- vectorized LCA over the dense lineage matrix ---
    lv = lineage[rid_c]                                   # (N, 8)
    big = jnp.int32(n_dense)
    lv_min = jnp.where(t_multi[:, None], lv, big)
    lv_max = jnp.where(t_multi[:, None], lv, -1)
    seg_l = jnp.where(t_multi, t_read, n_reads_pad)
    per_read_min = jax.ops.segment_min(lv_min, seg_l,
                                       num_segments=n_reads_pad + 1)[:-1]
    per_read_max = jax.ops.segment_max(lv_max, seg_l,
                                       num_segments=n_reads_pad + 1)[:-1]
    eq = (per_read_min == per_read_max) & read_multi[:, None]   # (R, 8)
    has_agree = eq.any(axis=1)
    first_level = jnp.where(has_agree, jnp.argmax(eq, axis=1), 7)
    max_rid = jax.ops.segment_max(jnp.where(t_multi, t_rid, -1), seg_l,
                                  num_segments=n_reads_pad + 1)[:-1]
    # lineage[max_rid][first agreeing level (or 7)] — slimm.hpp:516-531
    lca = lineage[jnp.clip(max_rid, 0, n_contigs - 1), first_level]

    taxon_counts = jnp.zeros(n_dense, jnp.int32).at[
        jnp.where(read_multi, lca, n_dense)].add(
            read_multi.astype(jnp.int32), mode="drop")

    # (lca, contig) pairs for children sets; -1 marks padding
    pair_lca = jnp.where(t_multi, lca[tread_c], -1)
    pair_rid = jnp.where(t_multi, t_rid, -1)

    uniq_matches2 = jnp.sum(read_u2.astype(jnp.int32))
    return dict(uniq_reads_count2=uniq_reads_count2, uniq_cov2=uniq_cov2,
                taxon_counts=taxon_counts, pair_lca=pair_lca,
                pair_rid=pair_rid, uniq_matches2=uniq_matches2)


# ---------------------------------------------------------------------------
# single-device jitted entry points
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_contigs", "total_bins", "n_reads_pad"))
def pass_a(t_read, t_rid, t_pos, lengths_u32, bin_offset, contig_of_bin,
           half, bin_width, *, n_contigs, total_bins, n_reads_pad):
    out = _pass_a_local(t_read, t_rid, t_pos, lengths_u32, bin_offset,
                        half, bin_width, n_contigs=n_contigs,
                        total_bins=total_bins, n_reads_pad=n_reads_pad)
    out["nz_cov"] = _nz_counts(out["cov"], contig_of_bin, n_contigs)
    out["nz_uniq"] = _nz_counts(out["uniq_cov"], contig_of_bin, n_contigs)
    return out


@partial(jax.jit,
         static_argnames=("n_contigs", "total_bins", "n_reads_pad", "n_dense"))
def pass_b(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage,
           *, n_contigs, total_bins, n_reads_pad, n_dense):
    return _pass_b_local(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage,
                         n_contigs=n_contigs, total_bins=total_bins,
                         n_reads_pad=n_reads_pad, n_dense=n_dense)


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


@dataclass
class EngineResult:
    state: ProfileState
    dense: DenseTaxonomy


def profile_arrays(options: ProfileOptions, db: SlimmDatabase,
                   contig_names, contig_lengths,
                   read_id, rid, pos, n_reads: int, hits_count: int,
                   avg_read_length: int,
                   engine: EngineOptions | None = None,
                   sharded_runner=None) -> ProfileState:
    """Profile pre-decoded, dedup'd target arrays (the device path).

    read_id/rid/pos: one entry per distinct (read, contig) with the first
    hit's position (decoder contract).  Fills the same ProfileState as the
    scalar oracle; report generation and propagation are shared
    (slimm_tpu.state).  `sharded_runner`, when given, runs pass A/B
    data-parallel over a device mesh (slimm_tpu.parallel) with exact
    integer psum merges.
    """
    engine = engine or EngineOptions()
    timer = PhaseTimer(enabled=engine.phase_log)
    st = ProfileState(options=options, ac__taxid=db.ac__taxid,
                      taxid__name=db.taxid__name)
    st.avg_read_length = avg_read_length
    if options.bin_width == 0:
        options.bin_width = avg_read_length

    timer.start("Intializing coverages for all reference genome ... ")
    st.init_contigs(contig_names, contig_lengths, options.bin_width)
    dense = tensorize(db, contig_names)
    n_contigs = len(st.accessions)
    total_bins = int(st.nbins.sum())
    contig_of_bin = np.repeat(np.arange(n_contigs, dtype=np.int32),
                              st.nbins.astype(np.int64))
    timer.lap()

    st.hits_count = hits_count
    if hits_count == 0:
        print("[WARNING] No mapped reads found in BAM file!", file=sys.stderr)
        return st
    st.matches_count = n_reads

    timer.start("Analysing alignments, reads and references ....... ")
    n_pad = _bucket(len(read_id), engine.batch_pad)
    r_pad = _bucket(n_reads, engine.batch_pad)

    def pad(a, fill):
        out = np.full(n_pad, fill, np.int32)
        out[:len(a)] = a
        return out

    read_id_p = pad(read_id, -1)
    rid_p = pad(rid, 0)
    pos_p = pad(pos, 0)
    lengths_u32 = st.lengths.astype(np.uint32)
    bin_offset = st.bin_offset.astype(np.int32)
    half = np.int32(avg_read_length // 2)
    bw = np.int32(options.bin_width)

    if sharded_runner is not None:
        a = sharded_runner.pass_a(
            read_id_p, rid_p, pos_p, lengths_u32, bin_offset, contig_of_bin,
            half, bw, n_contigs=n_contigs, total_bins=total_bins,
            n_reads=n_reads)
    else:
        a = pass_a(read_id_p, rid_p, pos_p, jnp.asarray(lengths_u32),
                   jnp.asarray(bin_offset), jnp.asarray(contig_of_bin),
                   half, bw, n_contigs=n_contigs, total_bins=total_bins,
                   n_reads_pad=r_pad)

    st.cov = np.asarray(a["cov"]).astype(np.uint32)
    st.uniq_cov = np.asarray(a["uniq_cov"]).astype(np.uint32)
    st.reads_count = np.asarray(a["reads_count"]).astype(np.int64)
    st.uniq_reads_count = np.asarray(a["uniq_reads_count"]).astype(np.int64)
    st.uniq_matches_count = int(a["uniq_matches"])
    st.uniq_hits_count = st.uniq_matches_count  # identical by construction
    st._nz_cache["cov"] = np.asarray(a["nz_cov"]).astype(np.int64)
    st._nz_cache["uniq_cov"] = np.asarray(a["nz_uniq"]).astype(np.int64)
    st.compute_abundances()
    timer.lap()

    if options.min_reads == 0:
        options.min_reads = 1 + (st.matches_count - 1) // 10000

    timer.start("Filtering unlikely sequences ..................... ")
    valid = st.compute_valid_refs()
    timer.lap()

    timer.start("Assigning reads to Least Common Ancestor (LCA) ... ")
    if sharded_runner is not None:
        b = sharded_runner.pass_b(
            a, np.asarray(valid), dense.lineage, n_contigs=n_contigs,
            total_bins=total_bins, n_dense=dense.n_dense)
    else:
        b = pass_b(a["t_read"], a["t_rid"], a["t_gbin"], a["t_valid"],
                   jnp.asarray(valid), jnp.asarray(dense.lineage),
                   n_contigs=n_contigs, total_bins=total_bins,
                   n_reads_pad=r_pad, n_dense=dense.n_dense)

    st.uniq_reads_count2 = np.asarray(b["uniq_reads_count2"]).astype(np.int64)
    st.uniq_cov2 = np.asarray(b["uniq_cov2"]).astype(np.uint32)
    st.uniq_matches_count2 = int(b["uniq_matches2"])

    # dense LCA counts + children pairs → taxid dicts (host finalize)
    counts = np.asarray(b["taxon_counts"])
    for d in np.flatnonzero(counts > 0).tolist():
        tid = int(dense.dense_to_tid[d])
        st.taxon_id__read_count[tid] = (
            st.taxon_id__read_count.get(tid, 0) + int(counts[d]))
    pair_lca = np.asarray(b["pair_lca"]).ravel()
    pair_rid = np.asarray(b["pair_rid"]).ravel()
    keep = pair_lca >= 0
    pairs = np.unique(np.stack([pair_lca[keep], pair_rid[keep]], axis=1), axis=0)
    for d, r in pairs.tolist():
        tid = int(dense.dense_to_tid[d])
        st.taxon_id__children.setdefault(tid, set()).add(int(r))

    st.propagate_counts()
    timer.lap()
    return st


def open_alignment_file(path: str, engine: EngineOptions | None = None):
    """Native C++ decoder when built (slimm_tpu/io/native.py), else the
    pure-Python reference decoder — identical array contract."""
    engine = engine or EngineOptions()
    if engine.use_native:
        from ..io import native
        if native.available():
            return native.NativeAlignmentFile(path)
    from ..io import AlignmentFile
    return AlignmentFile(path)


def profile_file(options: ProfileOptions, db: SlimmDatabase, path: str,
                 engine: EngineOptions | None = None,
                 sharded_runner=None) -> ProfileState:
    """Decode one SAM/BAM file and profile it on device."""
    engine = engine or EngineOptions()
    af = open_alignment_file(path, engine)
    batch = af.load()
    return profile_arrays(
        options, db, af.contig_names, af.contig_lengths,
        batch.read_id.astype(np.int32), batch.rid, batch.pos,
        batch.n_reads, batch.hits_count, batch.avg_read_length,
        engine=engine, sharded_runner=sharded_runner)
