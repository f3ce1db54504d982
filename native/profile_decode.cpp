// Stage profiler for the native SAM decode path (dev tool, not shipped).
// Build: g++ -O3 -march=native -std=c++17 profile_decode.cpp -lz -pthread
// Usage: ./a.out file.sam
#include "slimm_native.cpp"

#include <chrono>
#include <cstdio>

static double now() {
  using namespace std::chrono;
  return duration<double>(steady_clock::now().time_since_epoch()).count();
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s file.sam\n", argv[0]); return 1; }
  const char* path = argv[1];

  // (a) raw source drain
  {
    auto src = open_source(path);
    double t0 = now();
    size_t total = 0, n;
    const uint8_t* p;
    while (src->next_view(&p, &n)) total += n;
    printf("drain        %.4f s  (%.0f MB/s)\n", now() - t0,
           total / 1048576.0 / (now() - t0));
  }

  // (b) tokenize only
  {
    auto src = open_source(path);
    StpuFile f;
    SamParser parser;
    SamBatch b;
    double t0 = now();
    size_t n;
    const uint8_t* p;
    size_t nrec = 0;
    while (src->next_view(&p, &n)) {
      b.clear();
      parser.tokenize(&f, p, n, b);
      nrec += b.recs.size();
    }
    b.clear();
    parser.tokenize_finish(&f, b);
    nrec += b.recs.size();
    printf("tokenize     %.4f s  (%zu recs)\n", now() - t0, nrec);
  }

  // (c) consume only (tokenize pre-done per chunk, time only consume)
  {
    auto src = open_source(path);
    StpuFile f;
    SamParser parser;
    SamBatch b;
    double tc = 0;
    size_t n;
    const uint8_t* p;
    while (src->next_view(&p, &n)) {
      b.clear();
      parser.tokenize(&f, p, n, b);
      double t0 = now();
      parser.consume(&f, b);
      tc += now() - t0;
    }
    b.clear();
    parser.tokenize_finish(&f, b);
    double t0 = now();
    parser.consume(&f, b);
    parser.finish_consume(&f);
    tc += now() - t0;
    printf("consume      %.4f s  (%lld hits, %lld reads)\n", tc,
           (long long)f.hits, (long long)f.n_reads);
  }

  // (d) single-thread end-to-end
  {
    double t0 = now();
    void* h = stpu_open2(path, 2);
    printf("single       %.4f s\n", now() - t0);
    stpu_close(h);
  }

  // (e) pipelined end-to-end
  {
    double t0 = now();
    void* h = stpu_open2(path, 0);
    printf("pipelined    %.4f s\n", now() - t0);
    stpu_close(h);
  }
  return 0;
}
