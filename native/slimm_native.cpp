// slimm_tpu native runtime: SAM/BAM/BGZF decoder + single-core baseline.
//
// TPU-native data plane (SURVEY.md §2.4 "Native decode"): decodes alignment
// files into fixed-width int32 arrays (read_id, rid, pos) with the read-name
// dictionary (qname + ".1"/".2" pair suffix, reference slimm.hpp:204-209)
// applied in C++, ready for zero-copy device transfer.  Exposed through a
// plain C ABI consumed via ctypes (slimm_tpu/io/native.py).
//
// Also contains a faithful single-threaded C++ implementation of the
// profiler hot loops (reference slimm.hpp:191-303, 351-392, 516-611
// semantics, re-written from the spec in slimm_tpu/oracle.py) used as the
// single-core baseline that bench.py compares the TPU engine against.
//
// Build: make -C native  (g++ -O3 -march=native, links zlib).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <numeric>
#include <set>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint16_t FLAG_UNMAPPED = 0x4;
constexpr uint16_t FLAG_FIRST = 0x40;
constexpr uint16_t FLAG_LAST = 0x80;
constexpr int LINEAGE_LENGTH = 8;

// ---------------------------------------------------------------------------
// file reading helpers
// ---------------------------------------------------------------------------

bool read_whole_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// Inflate a (possibly multi-member, i.e. BGZF) gzip stream.
bool gunzip_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs{};
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;
  out.clear();
  out.reserve(in.size() * 4);
  std::vector<uint8_t> buf(1 << 20);
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  while (zs.avail_in > 0) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    int rc = inflate(&zs, Z_NO_FLUSH);
    size_t produced = buf.size() - zs.avail_out;
    out.insert(out.end(), buf.data(), buf.data() + produced);
    if (rc == Z_STREAM_END) {
      if (zs.avail_in == 0) break;
      if (inflateReset2(&zs, 15 + 32) != Z_OK) { inflateEnd(&zs); return false; }
    } else if (rc != Z_OK && rc != Z_BUF_ERROR) {
      inflateEnd(&zs);
      return false;
    } else if (produced == 0 && rc == Z_BUF_ERROR) {
      break;  // no progress
    }
  }
  inflateEnd(&zs);
  return true;
}

// ---------------------------------------------------------------------------
// decoded file state
// ---------------------------------------------------------------------------

struct StpuFile {
  std::vector<std::string> ref_names;
  std::vector<int64_t> ref_lens;
  // dedup'd targets: one entry per distinct (read, contig), first hit wins
  // (read_stat::add_target semantics, reference read_stat.hpp:116-135)
  std::vector<int32_t> read_id;
  std::vector<int32_t> rid;
  std::vector<int32_t> pos;
  int64_t n_reads = 0;
  int64_t hits = 0;  // all mapped records, including dropped duplicates
  int64_t avg_read_len = 0;
  std::string error;
};

// open-addressing set of packed (read_id, rid) keys for first-hit dedup
struct PairSet {
  std::vector<uint64_t> slots;
  size_t mask = 0;
  size_t count = 0;

  PairSet() { rehash(1 << 16); }

  explicit PairSet(size_t expected) {
    size_t n = 1 << 16;
    while (n * 7 < expected * 10) n *= 2;  // keep load factor under 0.7
    rehash(n);
  }

  void rehash(size_t n) {
    std::vector<uint64_t> old = std::move(slots);
    slots.assign(n, UINT64_MAX);
    mask = n - 1;
    count = 0;
    for (uint64_t k : old)
      if (k != UINT64_MAX) insert(k);
  }

  // splitmix64 finalizer: a multiplicative hash alone leaves the bucket
  // bits dependent only on the low key half (read ids live in the high
  // half), which collapses the table into per-contig clusters
  static uint64_t mix(uint64_t h) {
    h ^= h >> 33;
    h *= 0xFF51AFD7ED558CCDull;
    h ^= h >> 33;
    h *= 0xC4CEB9FE1A85EC53ull;
    h ^= h >> 33;
    return h;
  }

  // returns true if newly inserted
  bool insert(uint64_t key) {
    if (count * 10 >= slots.size() * 7) rehash(slots.size() * 2);
    size_t i = mix(key) & mask;
    while (true) {
      uint64_t cur = slots[i];
      if (cur == UINT64_MAX) {
        slots[i] = key;
        ++count;
        return true;
      }
      if (cur == key) return false;
      i = (i + 1) & mask;
    }
  }
};

struct ReadKeyHash {
  size_t operator()(const std::string& s) const {
    // FNV-1a
    size_t h = 1469598103934665603ull;
    for (unsigned char c : s) { h ^= c; h *= 1099511628211ull; }
    return h;
  }
};

struct Decoder {
  std::unordered_map<std::string, int32_t, ReadKeyHash> key_to_id;
  PairSet seen;  // (read, contig) first-hit dedup
  int64_t sample_count = 0;
  int64_t sample_total = 0;
  std::string keybuf;

  // first <=100k records with nonempty seq (reference misc.hpp:509-522)
  void sample_len(int64_t seq_len) {
    if (sample_count < 100000 && seq_len > 0) {
      sample_total += seq_len;
      ++sample_count;
    }
  }

  int32_t intern(const char* qname, size_t qlen, uint16_t flag) {
    keybuf.assign(qname, qlen);
    if (flag & FLAG_FIRST) keybuf += ".1";
    else if (flag & FLAG_LAST) keybuf += ".2";
    auto it = key_to_id.find(keybuf);
    if (it != key_to_id.end()) return it->second;
    int32_t id = static_cast<int32_t>(key_to_id.size());
    key_to_id.emplace(keybuf, id);
    return id;
  }

  // add a mapped record: intern the read and emit a target unless the
  // (read, contig) pair was already seen (first hit wins)
  void add_record(StpuFile* f, const char* qname, size_t qlen, uint16_t flag,
                  int32_t rid, int32_t pos) {
    int32_t id = intern(qname, qlen, flag);
    ++f->hits;
    uint64_t key = (static_cast<uint64_t>(static_cast<uint32_t>(id)) << 32) |
                   static_cast<uint32_t>(rid);
    if (seen.insert(key)) {
      f->read_id.push_back(id);
      f->rid.push_back(rid);
      f->pos.push_back(pos);
    }
  }
};

// -- SAM text ---------------------------------------------------------------

bool parse_sam(const std::vector<uint8_t>& data, StpuFile* f) {
  Decoder dec;
  std::unordered_map<std::string, int32_t> rid_of;
  const char* p = reinterpret_cast<const char*>(data.data());
  const char* end = p + data.size();
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* line_end = nl ? nl : end;
    if (*p == '@') {
      if (line_end - p >= 3 && p[1] == 'S' && p[2] == 'Q') {
        std::string sn;
        int64_t ln = 0;
        const char* q = p;
        while (q < line_end) {
          const char* tab = static_cast<const char*>(
              memchr(q, '\t', line_end - q));
          const char* fe = tab ? tab : line_end;
          if (fe - q > 3 && q[2] == ':') {
            if (q[0] == 'S' && q[1] == 'N') sn.assign(q + 3, fe - q - 3);
            else if (q[0] == 'L' && q[1] == 'N') ln = atoll(std::string(q + 3, fe - q - 3).c_str());
          }
          q = fe + 1;
        }
        if (!sn.empty()) {
          rid_of[sn] = static_cast<int32_t>(f->ref_names.size());
          f->ref_names.push_back(sn);
          f->ref_lens.push_back(ln);
        }
      }
    } else if (line_end > p) {
      // fields: qname flag rname pos mapq cigar rnext pnext tlen seq qual
      const char* field[11];
      int nf = 0;
      const char* q = p;
      field[nf++] = q;
      while (nf < 11 && q < line_end) {
        const char* tab = static_cast<const char*>(
            memchr(q, '\t', line_end - q));
        if (!tab) break;
        q = tab + 1;
        field[nf++] = q;
      }
      if (nf >= 11) {
        size_t qlen = (field[1] - 1) - field[0];
        uint16_t flag = static_cast<uint16_t>(atoi(field[1]));
        std::string rname(field[2], (field[3] - 1) - field[2]);
        int64_t pos1 = atoll(field[3]);
        const char* seq = field[9];
        size_t seq_len = (field[10] - 1) - field[9];
        if (seq_len == 1 && seq[0] == '*') seq_len = 0;
        dec.sample_len(static_cast<int64_t>(seq_len));
        int32_t rid = -1;
        auto it = rid_of.find(rname);
        if (it != rid_of.end()) rid = it->second;
        if (!(flag & FLAG_UNMAPPED) && rid >= 0) {
          dec.add_record(f, field[0], qlen, flag, rid,
                         static_cast<int32_t>(pos1 - 1));
        }
      }
    }
    if (!nl) break;
    p = nl + 1;
  }
  f->n_reads = static_cast<int64_t>(dec.key_to_id.size());
  if (dec.sample_count == 0) {
    f->error = "no records with sequences";
    return false;
  }
  f->avg_read_len = dec.sample_total / dec.sample_count;
  return true;
}

// -- BAM binary -------------------------------------------------------------

bool parse_bam(const std::vector<uint8_t>& data, StpuFile* f) {
  Decoder dec;
  if (data.size() < 12 || memcmp(data.data(), "BAM\1", 4) != 0) {
    f->error = "not a BAM stream";
    return false;
  }
  size_t off = 4;
  auto rd_i32 = [&](size_t o) {
    int32_t v;
    memcpy(&v, data.data() + o, 4);
    return v;
  };
  int32_t l_text = rd_i32(off);
  off += 4 + static_cast<size_t>(l_text);
  int32_t n_ref = rd_i32(off);
  off += 4;
  for (int32_t i = 0; i < n_ref; ++i) {
    int32_t l_name = rd_i32(off);
    off += 4;
    f->ref_names.emplace_back(
        reinterpret_cast<const char*>(data.data() + off), l_name - 1);
    off += static_cast<size_t>(l_name);
    f->ref_lens.push_back(rd_i32(off));
    off += 4;
  }
  const size_t n = data.size();
  while (off + 4 <= n) {
    int32_t block_size = rd_i32(off);
    off += 4;
    if (block_size < 32 || off + static_cast<size_t>(block_size) > n) break;
    int32_t ref_id = rd_i32(off);
    int32_t pos = rd_i32(off + 4);
    uint8_t l_read_name = data[off + 8];
    uint16_t flag;
    memcpy(&flag, data.data() + off + 14, 2);
    int32_t l_seq = rd_i32(off + 16);
    const char* qname =
        reinterpret_cast<const char*>(data.data() + off + 32);
    dec.sample_len(l_seq);
    if (!(flag & FLAG_UNMAPPED) && ref_id >= 0) {
      dec.add_record(f, qname, l_read_name - 1, flag, ref_id, pos);
    }
    off += static_cast<size_t>(block_size);
  }
  f->n_reads = static_cast<int64_t>(dec.key_to_id.size());
  if (dec.sample_count == 0) {
    f->error = "no records with sequences";
    return false;
  }
  f->avg_read_len = dec.sample_total / dec.sample_count;
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* stpu_open(const char* path) {
  auto* f = new StpuFile();
  std::vector<uint8_t> raw;
  if (!read_whole_file(path, raw)) {
    f->error = "cannot open file";
    return f;
  }
  bool ok;
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    std::vector<uint8_t> plain;
    if (!gunzip_all(raw, plain)) {
      f->error = "gzip decode failed";
      return f;
    }
    ok = parse_bam(plain, f);
  } else if (raw.size() >= 4 && memcmp(raw.data(), "BAM\1", 4) == 0) {
    ok = parse_bam(raw, f);
  } else {
    ok = parse_sam(raw, f);
  }
  if (ok && f->n_reads > 0) {
    // group targets by read id (stable counting sort) — the device
    // pipeline turns per-read reductions into neighbor compares and
    // segmented scans on contiguous groups
    const size_t n = f->read_id.size();
    std::vector<int64_t> offs(static_cast<size_t>(f->n_reads) + 1, 0);
    for (size_t i = 0; i < n; ++i) ++offs[f->read_id[i] + 1];
    for (size_t r = 1; r < offs.size(); ++r) offs[r] += offs[r - 1];
    std::vector<int32_t> gr(n), gc(n), gp(n);
    for (size_t i = 0; i < n; ++i) {
      int64_t o = offs[f->read_id[i]]++;
      gr[o] = f->read_id[i];
      gc[o] = f->rid[i];
      gp[o] = f->pos[i];
    }
    f->read_id.swap(gr);
    f->rid.swap(gc);
    f->pos.swap(gp);
  }
  return f;
}

const char* stpu_error(void* h) {
  return static_cast<StpuFile*>(h)->error.c_str();
}

int64_t stpu_n_refs(void* h) {
  return static_cast<int64_t>(static_cast<StpuFile*>(h)->ref_names.size());
}

const char* stpu_ref_name(void* h, int64_t i) {
  return static_cast<StpuFile*>(h)->ref_names[i].c_str();
}

int64_t stpu_ref_len(void* h, int64_t i) {
  return static_cast<StpuFile*>(h)->ref_lens[i];
}

int64_t stpu_hits(void* h) { return static_cast<StpuFile*>(h)->hits; }
int64_t stpu_n_targets(void* h) {
  return static_cast<int64_t>(static_cast<StpuFile*>(h)->read_id.size());
}
int64_t stpu_n_reads(void* h) { return static_cast<StpuFile*>(h)->n_reads; }
int64_t stpu_avg_read_len(void* h) {
  return static_cast<StpuFile*>(h)->avg_read_len;
}

void stpu_fill(void* h, int32_t* read_id, int32_t* rid, int32_t* pos) {
  auto* f = static_cast<StpuFile*>(h);
  memcpy(read_id, f->read_id.data(), f->read_id.size() * 4);
  memcpy(rid, f->rid.data(), f->rid.size() * 4);
  memcpy(pos, f->pos.data(), f->pos.size() * 4);
}

void stpu_close(void* h) { delete static_cast<StpuFile*>(h); }

// Timed first-hit dedup of raw (read, contig) records — the host-side stage
// of the TPU pipeline, exposed so benchmarks can charge its cost to the
// end-to-end number.  Fills out arrays (sized >= n_records); returns the
// number of targets kept, with *out_secs set to the wall time.
int64_t stpu_dedup_targets(int64_t n_records, const int32_t* read_id,
                           const int32_t* rid, const int32_t* pos,
                           int32_t* out_read, int32_t* out_rid,
                           int32_t* out_pos, double* out_secs) {
  auto t0 = std::chrono::high_resolution_clock::now();
  PairSet seen(static_cast<size_t>(n_records));
  int64_t kept = 0;
  for (int64_t i = 0; i < n_records; ++i) {
    uint64_t key =
        (static_cast<uint64_t>(static_cast<uint32_t>(read_id[i])) << 32) |
        static_cast<uint32_t>(rid[i]);
    if (seen.insert(key)) {
      out_read[kept] = read_id[i];
      out_rid[kept] = rid[i];
      out_pos[kept] = pos[i];
      ++kept;
    }
  }
  auto t1 = std::chrono::high_resolution_clock::now();
  if (out_secs) *out_secs = std::chrono::duration<double>(t1 - t0).count();
  return kept;
}

// ---------------------------------------------------------------------------
// single-core baseline profiler (bench comparison target)
// ---------------------------------------------------------------------------
//
// Faithful reimplementation of the reference hot-loop semantics on
// pre-decoded arrays: per-read target lists with first-hit-wins dedup,
// coverage histograms, mass-quantile cutoffs, validity filter, re-dedup,
// and per-read LCA over the lineage matrix.  Single thread, like the
// reference binary.  Returns wall seconds; fills out_counters:
//   [0]=hits [1]=matches [2]=uniq_matches [3]=uniq_matches2
//   [4]=n_valid_refs [5]=sum(lca_counts) [6]=cov_mass [7]=uniq_cov2_mass

double stpu_baseline_profile(
    int64_t n_records, const int32_t* read_id, const int32_t* rid,
    const int32_t* pos, int64_t n_reads, int32_t n_contigs,
    const uint32_t* lengths, const int32_t* lineage, uint32_t avg_read_len,
    uint32_t bin_width, float cov_cut_off_q, int64_t* out_counters) {
  auto t0 = std::chrono::high_resolution_clock::now();

  std::vector<uint32_t> nbins(n_contigs);
  std::vector<uint64_t> bin_offset(n_contigs);
  uint64_t total_bins = 0;
  for (int32_t c = 0; c < n_contigs; ++c) {
    nbins[c] = lengths[c] / bin_width + 1;
    bin_offset[c] = total_bins;
    total_bins += nbins[c];
  }
  std::vector<uint32_t> cov(total_bins, 0), uniq_cov(total_bins, 0),
      uniq_cov2(total_bins, 0);

  // per-read target lists (read_stat semantics)
  struct Target { int32_t rid; uint32_t bin; };
  std::vector<std::vector<Target>> reads(n_reads);
  uint32_t half = avg_read_len / 2;
  for (int64_t i = 0; i < n_records; ++i) {
    int32_t r = rid[i];
    uint32_t center = std::min(
        static_cast<uint32_t>(pos[i]) + half, lengths[r]);
    uint32_t bin = center / bin_width;
    auto& tl = reads[read_id[i]];
    bool seen = false;
    for (const auto& t : tl)
      if (t.rid == r) { seen = true; break; }
    if (!seen) tl.push_back({r, bin});
  }

  std::vector<uint32_t> reads_count(n_contigs, 0), uniq_reads_count(n_contigs, 0),
      uniq_reads_count2(n_contigs, 0);
  int64_t uniq_matches = 0;
  for (auto& tl : reads) {
    if (tl.size() == 1) {
      ++uniq_matches;
      reads_count[tl[0].rid] += 1;
      uint64_t g = bin_offset[tl[0].rid] + tl[0].bin;
      ++cov[g];
      ++uniq_cov[g];
      uniq_reads_count[tl[0].rid] += 1;
    } else {
      for (const auto& t : tl) {
        reads_count[t.rid] += 1;
        ++cov[bin_offset[t.rid] + t.bin];
      }
    }
  }

  // mass-quantile cutoffs over cov percents (misc.hpp:197-216 semantics)
  auto quantile = [&](std::vector<float> v) -> float {
    if (v.empty()) return 0.0f;
    float total = std::accumulate(v.begin(), v.end(), 0.0f);
    std::sort(v.begin(), v.end());
    float sub = 0.0f;
    size_t i = v.size() - 1;
    while (i > 0 && (sub / total) < cov_cut_off_q) { sub += v[i]; --i; }
    return v[i];
  };
  std::vector<float> covp(n_contigs), ucovp(n_contigs);
  for (int32_t c = 0; c < n_contigs; ++c) {
    uint32_t nz = 0, nzu = 0;
    for (uint32_t b = 0; b < nbins[c]; ++b) {
      nz += cov[bin_offset[c] + b] != 0;
      nzu += uniq_cov[bin_offset[c] + b] != 0;
    }
    covp[c] = static_cast<float>(nz) / nbins[c];
    ucovp[c] = static_cast<float>(nzu) / nbins[c];
  }
  std::vector<float> qv, qvu;
  for (int32_t c = 0; c < n_contigs; ++c)
    if (uniq_reads_count[c] > 0) { qv.push_back(covp[c]); qvu.push_back(ucovp[c]); }
  float cc = (cov_cut_off_q < 1.0f) ? quantile(qv) : 0.0f;
  float ucc = (cov_cut_off_q < 1.0f) ? quantile(qvu) : 0.0f;

  std::vector<uint8_t> valid(n_contigs, 0);
  int64_t n_valid = 0;
  for (int32_t c = 0; c < n_contigs; ++c) {
    if (reads_count[c] > 0 && covp[c] >= cc && ucovp[c] >= ucc) {
      valid[c] = 1;
      ++n_valid;
    }
  }

  // re-dedup + LCA (slimm.hpp:380-390, 516-557)
  int64_t uniq_matches2 = 0, lca_total = 0;
  std::unordered_map<int32_t, int64_t> lca_counts;
  std::vector<int32_t> kept;
  for (auto& tl : reads) {
    kept.clear();
    const Target* only = nullptr;
    for (const auto& t : tl) {
      if (valid[t.rid]) { kept.push_back(t.rid); only = &t; }
    }
    if (kept.size() == 1) {
      ++uniq_matches2;
      uniq_reads_count2[only->rid] += 1;
      ++uniq_cov2[bin_offset[only->rid] + only->bin];
    } else if (kept.size() > 1) {
      std::sort(kept.begin(), kept.end());
      int32_t taxa = 1;
      for (int lvl = 0; lvl < LINEAGE_LENGTH; ++lvl) {
        std::set<int32_t> s;
        for (int32_t r : kept) {
          taxa = lineage[static_cast<int64_t>(r) * LINEAGE_LENGTH + lvl];
          s.insert(taxa);
        }
        if (s.size() == 1) break;
      }
      ++lca_counts[taxa];
      ++lca_total;
    }
  }

  auto t1 = std::chrono::high_resolution_clock::now();
  uint64_t cov_mass = 0, u2_mass = 0;
  for (uint64_t b = 0; b < total_bins; ++b) { cov_mass += cov[b]; u2_mass += uniq_cov2[b]; }
  if (out_counters) {
    out_counters[0] = n_records;
    out_counters[1] = n_reads;
    out_counters[2] = uniq_matches;
    out_counters[3] = uniq_matches2;
    out_counters[4] = n_valid;
    out_counters[5] = lca_total;
    out_counters[6] = static_cast<int64_t>(cov_mass);
    out_counters[7] = static_cast<int64_t>(u2_mass);
  }
  return std::chrono::duration<double>(t1 - t0).count();
}

}  // extern "C"
