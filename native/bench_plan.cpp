// Standalone profiling harness for the plan-mode CELT host symbol stage.
// Usage: bench_plan <packets.bin> [n_iter]
// packets.bin: int32 count, then per packet int32 len + bytes
// (same corpus format as bench_host.cpp).
//
// Build (profiling):
//   g++ -O2 -pg -march=native -pthread -I native -o /tmp/bench_plan \
//       native/bench_plan.cpp native/celt_host.cpp
// Build (timing):
//   g++ -O3 -march=native -pthread -I native -o /tmp/bench_plan \
//       native/bench_plan.cpp native/celt_host.cpp
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <chrono>
#include <sys/resource.h>

extern "C" {
#ifdef PLAN_PROF
void celt_host_prof_report();
void celt_host_ec_counts(uint64_t* out6);
#endif
void* celt_host_create();
void celt_host_destroy(void*);
#ifdef EC_RECORD
void celt_host_ec_record_begin(void* vec);
void celt_host_ec_record_end();
uint32_t celt_host_ec_replay(const uint8_t* data, int len, const void* ops,
                             int n_ops);
#endif
int celt_host_decode_plan(void* p, const uint8_t* data, int len,
                          int frame_size, int C, int start, int end,
                          int disable_inv, void** arrs, int S, int s);
}

// Array layout + dtypes mirror mousiki_tpu/celt/host_native.py
// (_PTR_ORDER / _PLANE_DTYPES, 29 pointers; see the layout comment above
// celt_host_decode_plan in celt_host.cpp).
static constexpr int kNB = 21, kFill = 4;
static constexpr int kTier[3] = {224, 48, 16};

struct PlanArrays {
  std::vector<std::vector<uint8_t>> u8;
  std::vector<std::vector<int16_t>> i16;
  std::vector<std::vector<uint16_t>> u16;
  std::vector<std::vector<int32_t>> i32;
  std::vector<std::vector<float>> f32;
  std::vector<std::vector<uint32_t>> u32;
  std::vector<std::vector<double>> f64;
  void* ptrs[29];
};

// Wire format v4 (see celt_host.cpp celt_host_decode_plan layout comment).
static constexpr int kPool = kNB * 2 * kFill;

static void build_arrays(PlanArrays& a, int S, int C, int frame) {
  auto u8p = [&](size_t n) { a.u8.emplace_back(n, 0); return (void*)a.u8.back().data(); };
  auto i16p = [&](size_t n) { a.i16.emplace_back(n, 0); return (void*)a.i16.back().data(); };
  auto u16p = [&](size_t n) { a.u16.emplace_back(n, 0); return (void*)a.u16.back().data(); };
  auto i32p = [&](size_t n) { a.i32.emplace_back(n, 0); return (void*)a.i32.back().data(); };
  auto f32p = [&](size_t n, float v = 0.f) { a.f32.emplace_back(n, v); return (void*)a.f32.back().data(); };
  auto u32p = [&](size_t n) { a.u32.emplace_back(n, 0); return (void*)a.u32.back().data(); };
  auto f64p = [&](size_t n) { a.f64.emplace_back(n, 0.0); return (void*)a.f64.back().data(); };
  const size_t kRec = (size_t)(kTier[0] + kTier[1] + kTier[2]);
  int k = 0;
  a.ptrs[k++] = u8p(S);                                          // 0 direct
  a.ptrs[k++] = u32p((size_t)S * kRec * 3);                      // 1 pvq_rec
  a.ptrs[k++] = u16p(S);                                         // 2 pvq_cnt
  a.ptrs[k++] = u8p((size_t)S * kNB * 2);                        // 3 call_flags
  a.ptrs[k++] = u8p((size_t)S * kNB * 2);                        // 4 call_combo
  a.ptrs[k++] = i16p((size_t)S * kNB * 2);                       // 5 call_lb_src
  a.ptrs[k++] = i16p((size_t)S * kNB * 2);                       // 6 call_blend_upto
  a.ptrs[k++] = i16p((size_t)S * 2 * 4);                         // 7 dup_pool
  a.ptrs[k++] = u8p((size_t)S * kPool);                          // 8 fill_cid
  a.ptrs[k++] = i16p((size_t)S * kPool);                         // 9 fill_off
  a.ptrs[k++] = i16p((size_t)S * kPool);                         // 10 fill_n
  a.ptrs[k++] = f32p((size_t)S * kPool, 1.f);                    // 11 fill_gain
  a.ptrs[k++] = u32p((size_t)S * kPool);                         // 12 fill_seed
  a.ptrs[k++] = u8p((size_t)S * kNB);                            // 13 bm_flags
  a.ptrs[k++] = f32p((size_t)S * kNB);                           // 14 bm_mid
  a.ptrs[k++] = f32p((size_t)S * kNB);                           // 15 bm_side
  a.ptrs[k++] = u8p((size_t)S * kNB * 2);                        // 16 n1_as
  a.ptrs[k++] = u8p(S);                                          // 17 ac_on
  a.ptrs[k++] = u8p((size_t)S * kNB * 2);                        // 18 ac_masks
  a.ptrs[k++] = f32p((size_t)S * 2 * kNB);                       // 19 ac_r
  a.ptrs[k++] = u32p(S);                                         // 20 ac_seed
  a.ptrs[k++] = f32p((size_t)S * C * frame);                     // 21 x_direct
  a.ptrs[k++] = f64p((size_t)S * 2 * kNB);                       // 22 band_log_e
  a.ptrs[k++] = i32p((size_t)S * 4);                             // 23 iflags
  a.ptrs[k++] = f64p(S);                                         // 24 pf_gain
  a.ptrs[k++] = i32p(S);                                         // 25 rcs
  a.ptrs[k++] = f32p((size_t)S * 2 * kNB);                       // 26 ble32
  a.ptrs[k++] = f32p(S);                                         // 27 pf32
  a.ptrs[k++] = u8p(S);                                          // 28 spread8
}

int main(int argc, char** argv) {
  const char* path = argc > 1 ? argv[1] : "/tmp/celt_packets.bin";
  int n_iter = argc > 2 ? atoi(argv[2]) : 20000;
  FILE* f = fopen(path, "rb");
  if (!f) { perror("open"); return 1; }
  int32_t n;
  if (fread(&n, 4, 1, f) != 1) return 1;
  std::vector<std::vector<uint8_t>> pkts(n);
  for (int i = 0; i < n; i++) {
    int32_t len;
    if (fread(&len, 4, 1, f) != 1) return 1;
    pkts[i].resize(len);
    if (fread(pkts[i].data(), 1, len, f) != (size_t)len) return 1;
  }
  fclose(f);

  PlanArrays a;
  build_arrays(a, 1, 2, 960);
  void* st = celt_host_create();
  for (int i = 0; i < n; i++)
    celt_host_decode_plan(st, pkts[i].data(), (int)pkts[i].size(), 960, 2, 0,
                          21, 0, a.ptrs, 1, 0);
  struct rusage ru0, ru1;
  getrusage(RUSAGE_SELF, &ru0);
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < n_iter; it++) {
    auto& p = pkts[it % n];
    celt_host_decode_plan(st, p.data(), (int)p.size(), 960, 2, 0, 21, 0,
                          a.ptrs, 1, 0);
  }
  auto t1 = std::chrono::steady_clock::now();
  getrusage(RUSAGE_SELF, &ru1);
  double us = std::chrono::duration<double, std::micro>(t1 - t0).count() / n_iter;
  double cpu_us = ((ru1.ru_utime.tv_sec - ru0.ru_utime.tv_sec) * 1e6 +
                   (ru1.ru_utime.tv_usec - ru0.ru_utime.tv_usec)) / n_iter;
  printf("%.3f us/frame wall, %.3f us/frame cpu  (%.0fx realtime 20ms)\n",
         us, cpu_us, 1e6 / us * 0.02);
#ifdef PLAN_PROF
  celt_host_prof_report();
  {
    uint64_t c[6];
    celt_host_ec_counts(c);
    const char* nm[6] = {"decode", "decode_bin", "bit_logp", "icdf",
                         "bits", "uint"};
    printf("EC ops/frame:");
    for (int i = 0; i < 6; i++)
      printf("  %s %.1f", nm[i], (double)c[i] / n_iter);
    printf("\n");
  }
#endif
#ifdef EC_RECORD
  // Record each frame's primitive EC op sequence, then time replaying
  // ONLY the entropy ops: the serial range-decode floor of the plan stage.
  {
    struct Op { uint8_t kind; const uint8_t* icdf; uint32_t a, b, c; };
    std::vector<std::vector<Op>> logs(n);
    void* st2 = celt_host_create();
    for (int i = 0; i < n; i++) {
      celt_host_ec_record_begin(&logs[i]);
      celt_host_decode_plan(st2, pkts[i].data(), (int)pkts[i].size(), 960, 2,
                            0, 21, 0, a.ptrs, 1, 0);
      celt_host_ec_record_end();
    }
    celt_host_destroy(st2);
    double n_ops = 0;
    for (auto& l : logs) n_ops += (double)l.size();
    {  // ft histogram for the division-bound ops (kind 0 = ec_decode)
      std::vector<std::pair<uint32_t, int>> hist;
      int pow2 = 0, other = 0;
      for (auto& l : logs)
        for (auto& op : l)
          if (op.kind == 0) {
            if ((op.a & (op.a - 1)) == 0) { pow2++; continue; }
            other++;
            bool found = false;
            for (auto& h : hist)
              if (h.first == op.a) { h.second++; found = true; break; }
            if (!found) hist.push_back({op.a, 1});
          }
      printf("ec_decode ft: pow2 %.1f/frame, other %.1f/frame, "
             "%zu distinct non-pow2\n",
             (double)pow2 / n, (double)other / n, hist.size());
    }
    uint32_t sink = 0;
    for (int i = 0; i < n; i++)  // warm
      sink ^= celt_host_ec_replay(pkts[i].data(), (int)pkts[i].size(),
                                  logs[i].data(), (int)logs[i].size());
    auto r0 = std::chrono::steady_clock::now();
    for (int it = 0; it < n_iter; it++) {
      auto& p = pkts[it % n];
      auto& l = logs[it % n];
      sink ^= celt_host_ec_replay(p.data(), (int)p.size(), l.data(),
                                  (int)l.size());
    }
    auto r1 = std::chrono::steady_clock::now();
    double rus =
        std::chrono::duration<double, std::micro>(r1 - r0).count() / n_iter;
    printf("EC replay: %.3f us/frame (%.1f primitive ops/frame, sink %u)\n",
           rus, n_ops / n, sink);
  }
#endif
  celt_host_destroy(st);
  return 0;
}
