#!/usr/bin/env python
"""Scaling evidence: collective-byte accounting + ICI/DCN time model.

BASELINE.md's scaling target (>=80% efficiency at >=2 hosts) cannot be
measured directly here (one tunneled v5e chip; virtual CPU devices
oversubscribe 2 physical cores, so a virtual-mesh "efficiency" says
nothing).  What CAN be established honestly:

1. The exact communication volume of the sharded program.  The fused
   profile is compiled for a data-parallel mesh and every collective op
   (all-reduce / all-gather / reduce-scatter / collective-permute) is
   read out of the compiled HLO with its shape — these are the bytes
   that ride ICI within a slice and DCN across hosts.  All merged
   quantities are integer counts, so the collectives are exact and the
   math below is not an approximation of WHAT is sent, only of how fast
   links move it.

2. A time model against the measured single-chip step time: per-host
   work halves with host count (decode is embarrassingly parallel across
   hosts — each host decodes its own slice; device records are
   data-parallel) while the collective payload is fixed per file, so

     T(H) = T_step / H + ring_allreduce_bytes(H) / link_bw + T_replicated

   with ring all-reduce moving 2*(H-1)/H * payload per link.  Efficiency
   = T(1) / (H * T(H)).  DCN is modeled conservatively at 12.5 GB/s per
   host (100 Gbps NIC); ICI v5e at 45 GB/s per link direction.

3. The virtual-CPU-mesh trend (kept as a lower bound on merge overhead;
   absolute numbers are bound by the 2 oversubscribed cores).

Writes SCALING.json and prints one JSON line.

Env knobs: SLIMM_SCALE_RECORDS (default 2M), SLIMM_SCALE_CONTIGS (50),
SLIMM_SCALE_SHARDS ("1,2,4,8"), SLIMM_SCALE_SKIP_MEASURE=1 (model only).
"""

import glob
import json
import os
import re
import time

import numpy as np

DCN_BYTES_PER_S = 12.5e9   # 100 Gbps NIC per host, conservative
ICI_BYTES_PER_S = 45e9     # TPU v5e ICI per link direction


def collective_bytes_from_hlo(text):
    """Sum payload bytes of every collective op in a compiled HLO module.

    Returns {op_kind: [(dtype_shape, bytes)], ...} plus the total.  Only
    result shapes are counted (a ring all-reduce moves 2*(N-1)/N of the
    payload per link; that factor is applied in the model, not here)."""
    sizes = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2,
             "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
             "f64": 8}
    out = {}
    total = 0
    # e.g.  %all-reduce.12 = s32[417792]{0} all-reduce(...)
    #       %all-reduce.3 = (s32[1024]{0}, s32[1024]{0}) all-reduce(...)
    pat = re.compile(
        r"= ?(\(?[a-z0-9\[\],{}\s]*\)?) (all-reduce|all-gather|"
        r"reduce-scatter|collective-permute|all-to-all)\(")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for m in pat.finditer(text):
        shapes, kind = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_pat.findall(shapes):
            if dt not in sizes:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * sizes[dt]
        out.setdefault(kind, []).append(nbytes)
        total += nbytes
    return out, total


def build_and_count(n_records, n_contigs, shards):
    """Compile the sharded fused profile for `shards` devices and read the
    collective ops out of the optimized HLO."""
    import jax

    from bench import make_workload
    from slimm_tpu.engine.pipeline import _bucket, seg_plan
    from slimm_tpu.parallel import ShardedRunner

    w = make_workload(n_records, n_contigs)
    bin_width = np.int32(w["avg_read_len"])
    nbins = w["lengths"] // np.uint32(bin_width) + 1
    bin_offset = np.concatenate([[0], np.cumsum(nbins)[:-1]]).astype(np.int32)
    bin_ends = (bin_offset + nbins).astype(np.int32)
    total_bins_pad = -(-int(nbins.sum()) // 1024) * 1024
    _, k_steps, window = seg_plan(w["read_id"])
    kw = dict(n_contigs=n_contigs, total_bins_pad=total_bins_pad,
              n_dense=w["n_dense"], n_codes=w["n_codes"],
              dedup_window=max(1, window), k_steps=k_steps, window=window)

    runner = ShardedRunner(num_shards=shards)
    read2d, rid2d, pos2d, n_s = runner._route(w["read_id"], w["rid"],
                                              w["pos"])
    fn = runner._get_fused(n_s, **kw)
    import jax.numpy as jnp
    args = (read2d, rid2d, pos2d, jnp.asarray(w["lengths"]),
            jnp.asarray(bin_offset), jnp.asarray(bin_ends),
            jnp.asarray(np.int32(w["avg_read_len"] // 2)),
            jnp.asarray(bin_width), jnp.asarray(w["lineage"]),
            jnp.asarray(w["sk_code"]), jnp.asarray(np.float32(0.95)))
    compiled = fn.lower(*args).compile()
    text = compiled.as_text()
    per_op, total = collective_bytes_from_hlo(text)
    return w, args, fn, kw, per_op, total


def model_efficiency(step_secs, payload_bytes, hosts, link_bw,
                     replicated_secs):
    """Ring all-reduce over `hosts` links: 2*(H-1)/H * payload per link."""
    t1 = step_secs + replicated_secs
    th = (step_secs / hosts
          + 2 * (hosts - 1) / hosts * payload_bytes / link_bw
          + replicated_secs)
    return t1 / (hosts * th)


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

    # ---- 1. collective-byte accounting from the compiled HLO ----
    D = max(shard_list)
    w, args, fn, kw, per_op, payload = build_and_count(
        n_records, n_contigs, D)
    n = len(w["read_id"])
    per_op_summary = {k: {"count": len(v), "bytes": int(sum(v))}
                      for k, v in per_op.items()}

    # ---- 2. time model against the measured single-chip step ----
    # Per-FILE accounting: the whole-file DP mode runs ONE fused dispatch
    # (hence one merge of `payload` bytes) per input file; the chunked
    # streaming mode accumulates per-shard with NO per-chunk collectives
    # and merges twice per file (cutoffs + finalize), so the per-file
    # payload is the same 2x regardless of file size.  Model the bench's
    # own per-file step (records + device_secs measured on the real chip).
    step_secs = None
    step_records = n
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                       reverse=True):
        try:
            rec = json.load(open(path))
            rec = rec.get("parsed", rec)   # driver wraps the bench line
            step_secs = float(rec["device_secs"])
            step_records = int(rec["records"])
            step_src = os.path.basename(path)
            break
        except Exception:
            continue
    if step_secs is None:
        step_records = 8_000_000
        step_secs = step_records / 150e6   # ~150M records/s measured v5e
        step_src = "default 150M records/s"
    # replicated (non-scaling) tail: the two quantile scans + per-contig
    # sums, measured <10 ms on chip at C=5000 (CLAUDE.md); ~1 ms at C=50
    replicated_secs = 0.001 * max(1, n_contigs / 250)

    model = {}
    for hosts in (2, 4, 8):
        model[str(hosts)] = {
            "dcn": round(model_efficiency(step_secs, payload, hosts,
                                          DCN_BYTES_PER_S,
                                          replicated_secs), 4),
            "ici": round(model_efficiency(step_secs, payload, hosts,
                                          ICI_BYTES_PER_S,
                                          replicated_secs), 4),
        }

    # ---- 3. virtual-mesh trend (lower bound; oversubscribed cores) ----
    measured = {}
    if not os.environ.get("SLIMM_SCALE_SKIP_MEASURE"):
        from slimm_tpu.parallel import ShardedRunner
        from slimm_tpu.engine.pipeline import seg_plan

        for s in shard_list:
            runner = ShardedRunner(num_shards=s)
            kw_s = dict(kw)

            def run():
                out = runner.fused(w["read_id"], w["rid"], w["pos"],
                                   w["lengths"],
                                   np.asarray(args[4]), np.asarray(args[5]),
                                   np.int32(w["avg_read_len"] // 2),
                                   np.int32(w["avg_read_len"]),
                                   w["lineage"], w["sk_code"],
                                   np.float32(0.95), **kw_s)
                return np.asarray(out["packed"])[:1]

            run()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            measured[str(s)] = round(n / min(ts))

    out = {
        "metric": "scaling evidence: exact collective bytes + ICI/DCN model",
        "records_per_dispatch": n,
        "mesh_devices_compiled": D,
        "collective_ops": per_op_summary,
        "collective_payload_bytes": int(payload),
        "payload_note": (
            "bytes are result shapes of every collective in the compiled "
            "HLO of the data-parallel fused profile; a ring all-reduce "
            "moves 2*(H-1)/H of this per link, applied in the model; "
            "payload depends on the bin/taxid tables only, NOT on record "
            "count — bigger files amortize it further, and the streamed "
            "mode pays it twice per FILE (no per-chunk collectives)"),
        "modeled_step_records": step_records,
        "single_chip_step_secs": round(step_secs, 5),
        "step_source": step_src,
        "replicated_tail_secs": replicated_secs,
        "modeled_efficiency": model,
        "model": ("T(H) = step/H + 2*(H-1)/H * payload/link_bw + "
                  f"replicated_tail; DCN {DCN_BYTES_PER_S/1e9:.1f} GB/s, "
                  f"ICI {ICI_BYTES_PER_S/1e9:.0f} GB/s"),
        "decode_note": (
            "host decode shards embarrassingly across hosts (each host "
            "reads its own input slice; read ids are host-local), so the "
            "decode term scales with H and is omitted — including it "
            "raises efficiency further"),
        "virtual_mesh_records_per_s": measured,
        "virtual_mesh_note": (
            "virtual CPU devices oversubscribe 2 physical cores; "
            "communication structure matches the multi-chip program; "
            "treat as a lower bound on merge overhead, not efficiency"),
        "target": "BASELINE.md: >=80% efficiency at >=2 hosts",
        "target_met_by_model": model["2"]["dcn"] >= 0.80,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
