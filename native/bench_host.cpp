// Standalone profiling harness for the native CELT host symbol stage.
// Usage: bench_host <packets.bin> [n_iter]
// packets.bin: int32 count, then per packet int32 len + bytes.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <chrono>

extern "C" {
void* celt_host_create();
void celt_host_destroy(void*);
int celt_host_decode(void* p, const uint8_t* data, int len, int frame_size,
                     int C, int start, int end, int disable_inv, float* x_out,
                     double* band_log_e_out, int32_t* iflags, double* pf_gain);
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

  void* st = celt_host_create();
  std::vector<float> x(2 * 960);
  std::vector<double> ble(2 * 21);
  int32_t iflags[4];
  double pf_gain;
  // warm
  for (int i = 0; i < n; i++)
    celt_host_decode(st, pkts[i].data(), (int)pkts[i].size(), 960, 2, 0, 21, 0,
                     x.data(), ble.data(), iflags, &pf_gain);
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < n_iter; it++) {
    auto& p = pkts[it % n];
    celt_host_decode(st, p.data(), (int)p.size(), 960, 2, 0, 21, 0, x.data(),
                     ble.data(), iflags, &pf_gain);
  }
  auto t1 = std::chrono::steady_clock::now();
  double us = std::chrono::duration<double, std::micro>(t1 - t0).count() / n_iter;
  printf("%.3f us/frame  (%.0f frames/s, %.0fx realtime 20ms)\n", us, 1e6 / us,
         1e6 / us * 0.02);
  celt_host_destroy(st);
  return 0;
}
