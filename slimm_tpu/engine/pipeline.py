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


def _cumsum_1d(x):
    """Fast 1-D int32 cumsum via 2-D row scans (plain 1-D cumsum lowers to a
    slow serialized scan on TPU).  x length must be a multiple of 1024."""
    m = x.reshape(-1, 1024)
    row = jnp.cumsum(m, axis=1)
    offs = jnp.concatenate([jnp.zeros(1, x.dtype), jnp.cumsum(row[:, -1])[:-1]])
    return (row + offs[:, None]).reshape(-1)


def _boundary_sums(values, starts, ends):
    """Per-contig sums over the flat bin axis: cs[ends] - cs[starts].
    Replaces segment_sum over a sorted contig_of_bin map (which compiles
    pathologically on the current toolchain)."""
    cs = jnp.concatenate([jnp.zeros(1, values.dtype), _cumsum_1d(values)])
    return cs[ends] - cs[starts]


def _pass_a_local(t_read, t_rid, t_pos, lengths_u32, bin_offset,
                  half, bin_width, *, n_contigs, total_bins_pad):
    """Dedup'd targets → per-read/per-contig counters + coverage histograms.

    t_read/t_rid/t_pos are int32[N_pad] target arrays padded with
    t_read == -1; one entry per distinct (read, contig), first hit's pos;
    GROUPED by read id (decoder contract) so per-read uniqueness is a
    neighbor compare.  total_bins_pad is the padded (multiple of 1024)
    global bin count; bin_offset/bin_ends are each contig's [start, end)
    range on that axis.
    """
    valid = t_read >= 0
    rid_c = jnp.clip(t_rid, 0, n_contigs - 1)
    # center-position binning with uint32 wrap semantics (slimm.hpp:200-201)
    center = jnp.minimum(t_pos.astype(jnp.uint32) + half.astype(jnp.uint32),
                         lengths_u32[rid_c])
    local_bin = (center // bin_width.astype(jnp.uint32)).astype(jnp.int32)
    t_gbin = bin_offset[rid_c] + local_bin

    # uniqueness == alone in the read group (targets grouped by read)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), t_read[:-1]])
    nxt = jnp.concatenate([t_read[1:], jnp.full((1,), -1, jnp.int32)])
    t_uniq = valid & (t_read != prev) & (t_read != nxt)
    uniq_matches = jnp.sum(t_uniq.astype(jnp.int32))

    # coverage histograms (two plain 1-D scatters — multi-column window
    # scatters compile pathologically on the current toolchain)
    hist_idx = jnp.where(valid, t_gbin, total_bins_pad)
    cov = jnp.zeros(total_bins_pad, jnp.int32).at[hist_idx].add(
        valid.astype(jnp.int32), mode="drop")
    uniq_cov = jnp.zeros(total_bins_pad, jnp.int32).at[hist_idx].add(
        t_uniq.astype(jnp.int32), mode="drop")

    return dict(t_read=t_read, t_rid=t_rid, t_gbin=t_gbin, t_valid=valid,
                cov=cov, uniq_cov=uniq_cov, uniq_matches=uniq_matches)


def _contig_stats(cov, uniq_cov, bin_offset, bin_ends):
    """Per-contig counters derived from the (merged) histograms
    (slimm.hpp:219-256): reads_count[c] == total targets binned into c's
    range; nz == occupied-bin counts (reference_contig.hpp:84-91).

    Must run on the fully merged histograms in multi-shard mode — occupancy
    does not commute with summation.  Packed into one (4, C) array so the
    host fetches everything in a single ~30ms round trip."""
    stats4 = jnp.stack([
        _boundary_sums(cov, bin_offset, bin_ends),
        _boundary_sums(uniq_cov, bin_offset, bin_ends),
        _boundary_sums((cov > 0).astype(jnp.int32), bin_offset, bin_ends),
        _boundary_sums((uniq_cov > 0).astype(jnp.int32), bin_offset, bin_ends),
    ])
    return dict(stats4=stats4)


def _shift_right(x, d, fill):
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _shift_left(x, d, fill):
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[d:], pad], axis=0)


def _segscan_end(t_read, values, combine, identity, k_steps):
    """Segmented Hillis-Steele inclusive scan along the grouped target axis.

    Segments are runs of equal t_read (the decoder's grouped-by-read
    contract).  After ceil(log2(max_run)) steps the LAST element of each
    segment holds the full-segment reduction.  Pure shifts + elementwise
    selects — replaces segment_min/max/sum scatters, which run at ~7M
    elem/s on TPU vs GB/s for this formulation.
    """
    v = values
    for k in range(k_steps):
        d = 1 << k
        same = t_read == _shift_right(t_read, d, jnp.int32(-2))
        if values.ndim > 1:
            same = same[:, None]
        sv = _shift_right(v, d, identity)
        v = combine(v, jnp.where(same, sv, identity))
    return v


def _backfill_from_ends(t_read, end_values, end_mask, fill, k_steps):
    """Propagate each segment's end value back to every element (doubling)."""
    y = jnp.where(end_mask, end_values, fill)
    for k in range(k_steps):
        d = 1 << k
        same = t_read == _shift_left(t_read, d, jnp.int32(-3))
        ny = _shift_left(y, d, fill)
        y = jnp.where(same, ny, y)
    return y


def _pass_b_local(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage,
                  *, n_contigs, total_bins_pad, n_dense, k_steps):
    """Filtered re-dedup + vectorized LCA (slimm.hpp:351-392, 516-557).

    All per-read reductions use segmented doubling scans over the grouped
    target axis; k_steps must satisfy 2**k_steps >= max targets per read
    (host-computed).  One fused scatter covers both the uniq_cov2 histogram
    and the per-taxid LCA counts.
    """
    rid_c = jnp.clip(t_rid, 0, n_contigs - 1)
    tmask = t_valid & valid_mask[rid_c]
    end_mask = t_valid & (t_read != _shift_left(t_read, 1, jnp.int32(-3)))

    # per-read valid-target count at segment ends
    cnt = _segscan_end(t_read, tmask.astype(jnp.int32), jnp.add,
                       jnp.int32(0), k_steps)
    total = _backfill_from_ends(t_read, cnt, end_mask, jnp.int32(0), k_steps)
    t_u2 = tmask & (total == 1)          # newly-unique (slimm.hpp:383-390)
    multi_end = end_mask & (cnt > 1)

    # --- vectorized LCA over the dense lineage matrix ---
    lv = lineage[rid_c]                                   # (N, 8)
    big = jnp.int32(n_dense)
    lv_min = jnp.where(tmask[:, None], lv, big)
    lv_max = jnp.where(tmask[:, None], lv, -1)
    mn8 = _segscan_end(t_read, lv_min, jnp.minimum, big, k_steps)
    mx8 = _segscan_end(t_read, lv_max, jnp.maximum, jnp.int32(-1), k_steps)
    rid_mx = _segscan_end(t_read, jnp.where(tmask, t_rid, -1), jnp.maximum,
                          jnp.int32(-1), k_steps)
    eq = (mn8 == mx8) & multi_end[:, None]                # (N, 8), ends only
    has_agree = eq.any(axis=1)
    first_level = jnp.where(has_agree, jnp.argmax(eq, axis=1), 7)
    # lineage[max_rid][first agreeing level (or 7)] — slimm.hpp:516-531
    lca_end = lineage[jnp.clip(rid_mx, 0, n_contigs - 1), first_level]

    # ONE fused scatter: [0, Bp) = uniq_cov2 histogram, [Bp, Bp+n_dense) =
    # per-dense-taxid LCA counts; padding index Bp+n_dense drops
    idx = jnp.where(t_u2, t_gbin,
                    jnp.where(multi_end, total_bins_pad + lca_end,
                              total_bins_pad + n_dense))
    combined = jnp.zeros(total_bins_pad + n_dense, jnp.int32).at[idx].add(
        (t_u2 | multi_end).astype(jnp.int32), mode="drop")
    uniq_cov2 = combined[:total_bins_pad]
    taxon_counts = combined[total_bins_pad:]

    # (lca, contig) pairs for children sets; -1 marks padding
    lca_b = _backfill_from_ends(t_read, lca_end, end_mask, jnp.int32(-1),
                                k_steps)
    t_multi = tmask & (total > 1)
    pair_lca = jnp.where(t_multi, lca_b, -1)
    pair_rid = jnp.where(t_multi, t_rid, -1)

    uniq_matches2 = jnp.sum((end_mask & (cnt == 1)).astype(jnp.int32))
    return dict(uniq_cov2=uniq_cov2, taxon_counts=taxon_counts,
                pair_lca=pair_lca, pair_rid=pair_rid,
                uniq_matches2=uniq_matches2)


# ---------------------------------------------------------------------------
# single-device jitted entry points
# ---------------------------------------------------------------------------


@partial(jax.jit,
         static_argnames=("n_contigs", "total_bins_pad"))
def pass_a(t_read, t_rid, t_pos, lengths_u32, bin_offset, bin_ends,
           half, bin_width, *, n_contigs, total_bins_pad):
    out = _pass_a_local(t_read, t_rid, t_pos, lengths_u32, bin_offset,
                        half, bin_width, n_contigs=n_contigs,
                        total_bins_pad=total_bins_pad)
    stats4 = _contig_stats(out["cov"], out["uniq_cov"], bin_offset,
                           bin_ends)["stats4"]
    # row 4, col 0 carries the uniq_matches scalar — single host fetch
    extra = jnp.zeros((1, stats4.shape[1]), jnp.int32).at[0, 0].set(
        out["uniq_matches"])
    out["stats5"] = jnp.concatenate([stats4, extra])
    return out


@partial(jax.jit, static_argnames=("n_contigs", "total_bins_pad",
                                   "n_dense", "k_steps"))
def pass_b(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage,
           bin_offset, bin_ends,
           *, n_contigs, total_bins_pad, n_dense, k_steps):
    out = _pass_b_local(t_read, t_rid, t_gbin, t_valid, valid_mask, lineage,
                        n_contigs=n_contigs, total_bins_pad=total_bins_pad,
                        n_dense=n_dense, k_steps=k_steps)
    out["uniq_reads_count2"] = _boundary_sums(out["uniq_cov2"], bin_offset,
                                              bin_ends)
    return out


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
    total_bins_pad = -(-total_bins // 1024) * 1024  # _cumsum_1d row multiple
    timer.lap()

    st.hits_count = hits_count
    if hits_count == 0:
        print("[WARNING] No mapped reads found in BAM file!", file=sys.stderr)
        return st
    st.matches_count = n_reads

    timer.start("Analysing alignments, reads and references ....... ")
    # device contract: targets grouped by read id (ascending); decoders
    # guarantee this, but arbitrary callers may not
    read_id = np.asarray(read_id)
    if len(read_id) and not np.all(read_id[:-1] <= read_id[1:]):
        order = np.argsort(read_id, kind="stable")
        read_id = read_id[order]
        rid = np.asarray(rid)[order]
        pos = np.asarray(pos)[order]
    n_pad = _bucket(len(read_id), engine.batch_pad)
    # doubling-scan depth: 2**k_steps >= max targets per read; bucketed to
    # even values to limit recompiles
    if len(read_id):
        bnd = np.flatnonzero(np.r_[True, read_id[1:] != read_id[:-1], True])
        max_run = int(np.diff(bnd).max())
    else:
        max_run = 1
    k_steps = max(2, int(np.ceil(np.log2(max(max_run, 2)))))
    k_steps = ((k_steps + 1) // 2) * 2

    def pad(a, fill):
        out = np.full(n_pad, fill, np.int32)
        out[:len(a)] = a
        return out

    read_id_p = pad(read_id, -1)
    rid_p = pad(rid, 0)
    pos_p = pad(pos, 0)
    lengths_u32 = st.lengths.astype(np.uint32)
    bin_offset = st.bin_offset.astype(np.int32)
    bin_ends = (st.bin_offset + st.nbins).astype(np.int32)
    half = np.int32(avg_read_length // 2)
    bw = np.int32(options.bin_width)

    if sharded_runner is not None:
        a = sharded_runner.pass_a(
            read_id_p, rid_p, pos_p, lengths_u32, bin_offset, bin_ends,
            half, bw, n_contigs=n_contigs, total_bins_pad=total_bins_pad)
    else:
        a = pass_a(read_id_p, rid_p, pos_p, jnp.asarray(lengths_u32),
                   jnp.asarray(bin_offset), jnp.asarray(bin_ends),
                   half, bw, n_contigs=n_contigs,
                   total_bins_pad=total_bins_pad)

    stats5 = np.asarray(a["stats5"])      # one host round trip
    st.reads_count = stats5[0].astype(np.int64)
    st.uniq_reads_count = stats5[1].astype(np.int64)
    st._nz_cache["cov"] = stats5[2].astype(np.int64)
    st._nz_cache["uniq_cov"] = stats5[3].astype(np.int64)
    st.uniq_matches_count = int(stats5[4, 0])
    st.uniq_hits_count = st.uniq_matches_count  # identical by construction
    if engine.fetch_coverage:
        st.cov = np.asarray(a["cov"])[:total_bins].astype(np.uint32)
        st.uniq_cov = np.asarray(a["uniq_cov"])[:total_bins].astype(np.uint32)
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
            total_bins_pad=total_bins_pad, n_dense=dense.n_dense,
            k_steps=k_steps)
    else:
        b = pass_b(a["t_read"], a["t_rid"], a["t_gbin"], a["t_valid"],
                   jnp.asarray(valid), jnp.asarray(dense.lineage),
                   jnp.asarray(bin_offset), jnp.asarray(bin_ends),
                   n_contigs=n_contigs, total_bins_pad=total_bins_pad,
                   n_dense=dense.n_dense, k_steps=k_steps)

    st.uniq_reads_count2 = np.asarray(b["uniq_reads_count2"]).astype(np.int64)
    if engine.fetch_coverage:
        st.uniq_cov2 = np.asarray(b["uniq_cov2"])[:total_bins].astype(np.uint32)
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
