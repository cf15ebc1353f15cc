// Stage breakdown for the host bc path on a dumped corpus: pure decode
// vs +capture vs +fill, best-of-N, single persistent decoder per pass.
//
//   g++ -O3 -march=native -std=c++17 -pthread -I. \
//       -o /tmp/prof_stages scripts/prof_bc_stages.cpp \
//       -DSPDEC_SRC='"jsplayer_tpu/native/spdec.cpp"'
//   /tmp/prof_stages /tmp/term.blob 8

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include SPDEC_SRC

static double now() {
  return std::chrono::duration<double>(
      std::chrono::steady_clock::now().time_since_epoch()).count();
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: prof_stages blob [reps]\n"); return 2; }
  int reps = argc > 2 ? atoi(argv[2]) : 8;
  FILE* fp = fopen(argv[1], "rb");
  if (!fp) { perror("open"); return 2; }
  int64_t hdr[3];
  if (fread(hdr, 8, 3, fp) != 3) return 2;
  const int T = (int)hdr[0], X = (int)hdr[1], Y = (int)hdr[2];
  std::vector<int64_t> lens64(T);
  if (fread(lens64.data(), 8, T, fp) != (size_t)T) return 2;
  std::vector<long> offs(T), lens(T);
  long total = 0;
  for (int t = 0; t < T; t++) { offs[t] = total; lens[t] = (long)lens64[t]; total += lens[t]; }
  std::vector<uint8_t> blob(total);
  if (fread(blob.data(), 1, total, fp) != (size_t)total) return 2;
  fclose(fp);

  const size_t npix = (size_t)X * Y;
  const size_t nb = (size_t)((X + 15) / 16) * ((Y + 15) / 16);
  const int K = 2;

  // pass 1: pure decode (no capture, no fill)
  double best1 = 1e30;
  for (int r = 0; r < reps; r++) {
    SpDecoder dec(X, Y, 24);
    dec.preinit(0);
    double t0 = now();
    for (int t = 0; t < T; t++) {
      const uint8_t* src = blob.data() + offs[t];
      int sg = 0;
      if (sp_is_key_frame(src, lens[t]))
        dec.decompress_i(src, (size_t)lens[t], nullptr);
      else
        dec.decompress_p(src, (size_t)lens[t], nullptr, &sg, nullptr,
                         nullptr, nullptr);
    }
    double dt = now() - t0;
    if (dt < best1) best1 = dt;
  }

  // pass 2: decode + capture arrays (per-frame scratch like the bc path)
  double best2 = 1e30;
  for (int r = 0; r < reps; r++) {
    SpDecoder dec(X, Y, 24);
    dec.preinit(0);
    double t0 = now();
    for (int t = 0; t < T; t++) {
      const uint8_t* src = blob.data() + offs[t];
      int sg = 0;
      if (sp_is_key_frame(src, lens[t])) {
        dec.decompress_i(src, (size_t)lens[t], nullptr);
      } else {
        std::vector<int32_t> cb(nb), cm(nb * 2), cr(nb * 4);
        dec.decompress_p(src, (size_t)lens[t], nullptr, &sg, cb.data(),
                         cm.data(), cr.data());
      }
    }
    double dt = now() - t0;
    if (dt < best2) best2 = dt;
  }

  // pass 3: full bc transport (persistent buffers across reps)
  std::vector<uint32_t> plane(npix * T);
  std::vector<int32_t> mvk((size_t)T * K * 2);
  std::vector<uint8_t> bcode((size_t)T * nb), rloc((size_t)T * nb * 4);
  std::vector<uint8_t> changed(T), signif(T);
  double best3 = 1e30;
  for (int r = 0; r < reps; r++) {
    double t0 = now();
    sp_decode_streams_bc(1, T, X, Y, 24, blob.data(), offs.data(),
                         lens.data(), 0, K, plane.data(), mvk.data(),
                         bcode.data(), rloc.data(), changed.data(),
                         signif.data(), 1);
    double dt = now() - t0;
    if (dt < best3) best3 = dt;
  }

  printf("pure decode:      %7.1f fps/core (%.1f ms)\n", T / best1, best1 * 1e3);
  printf("decode + capture: %7.1f fps/core (%.1f ms)\n", T / best2, best2 * 1e3);
  printf("full bc:          %7.1f fps/core (%.1f ms)\n", T / best3, best3 * 1e3);
  return 0;
}
