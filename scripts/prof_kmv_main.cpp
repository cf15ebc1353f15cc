// gprof driver for the host kmv stage: builds the bench corpus with the
// native encoder, then loops sp_decode_streams_kmv in steady state.
//
//   g++ -O3 -march=native -std=c++17 -pg -pthread \
//       -o /tmp/prof_kmv scripts/prof_kmv_main.cpp \
//       -DSPDEC_SRC='"jsplayer_tpu/native/spdec.cpp"'
//   /tmp/prof_kmv 20 && gprof /tmp/prof_kmv gmon.out | head -30

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include SPDEC_SRC

static const int X = 1920, Y = 1080, T = 64;

int main(int argc, char** argv) {
  int reps = argc > 1 ? atoi(argv[1]) : 10;
  std::mt19937_64 rng(0);
  auto ri = [&](int lo, int hi) {
    return (int)(lo + rng() % (uint64_t)(hi - lo));
  };
  auto pack = [](int r, int g, int b) {
    return (uint32_t)((r << 16) | (g << 8) | b);
  };
  std::vector<uint32_t> f((size_t)X * Y, pack(30, 30, 34));
  for (int i = 0; i < 12; i++) {
    int x0 = ri(0, X - 200), y0 = ri(0, Y - 150);
    uint32_t c = pack(ri(0, 256), ri(0, 256), ri(0, 256));
    for (int y = y0; y < y0 + 140; y++)
      for (int x = x0; x < x0 + 190; x++) f[(size_t)y * X + x] = c;
  }
  void* enc = spenc_create(4, X, Y, 24);
  std::vector<uint8_t> blob;
  std::vector<long> offs, lens;
  auto push = [&](int kind) {
    long n = spenc_encode(enc, f.data(), kind);
    offs.push_back((long)blob.size());
    lens.push_back(n);
    size_t o = blob.size();
    blob.resize(o + n);
    memcpy(blob.data() + o, spenc_data(enc), n);
  };
  push(1);
  for (int t = 0; t < T - 1; t++) {
    if (t % 3 == 0)  // scroll
      memmove(&f[(size_t)8 * X], &f[0], (size_t)(Y - 8) * X * 4);
    if (t % 3 != 2) {  // paint
      int x0 = ri(0, X - 120), y0 = ri(0, Y - 80);
      uint32_t c = pack(ri(0, 256), ri(0, 256), ri(0, 256));
      for (int y = y0; y < y0 + 60; y++)
        for (int x = x0; x < x0 + 100; x++) f[(size_t)y * X + x] = c;
    }
    push(0);
  }
  size_t npix = (size_t)X * Y;
  size_t nb1 = 1 + (size_t)((X + 15) / 16) * ((Y + 15) / 16);
  std::vector<uint32_t> pay(npix * T);
  std::vector<int32_t> mvk((size_t)T * 2 * 2);
  std::vector<uint8_t> chg(T), sig(T);
  std::vector<int32_t> dirty(nb1 * T, -1);
  double best = 1e30;
  for (int r = 0; r < reps; r++) {
    auto t0 = std::chrono::steady_clock::now();
    sp_decode_streams_kmv(1, T, X, Y, 24, blob.data(), offs.data(),
                          lens.data(), 0, 2, pay.data(), mvk.data(),
                          chg.data(), sig.data(), 1, dirty.data());
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();
    if (dt < best) best = dt;
  }
  printf("host kmv: best %.0f fps/core over %d reps\n", T / best, reps);
  return 0;
}
