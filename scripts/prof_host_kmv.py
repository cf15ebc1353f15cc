"""Standalone host kmv-stage profile harness (bench corpus, no JAX).

Measures native_sp_decode_streams_kmv steady-state fps/core on the exact
bench.py corpus, reps for gprof resolution.  Build the gprof .so first:

  g++ -O3 -march=native -fPIC -shared -std=c++17 -pg -o libjsptpu.so spdec.cpp
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from jsplayer_tpu import native
from jsplayer_tpu.encode.sp_enc import pack_rgb

Y, X = 1080, 1920
T = 64


def corpus():
    rng = np.random.default_rng(0)
    enc = native.NativeScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(30, 30, 34), dtype=np.uint32)
    for _ in range(12):
        x0, y0 = int(rng.integers(0, X - 200)), int(rng.integers(0, Y - 150))
        f[y0 : y0 + 140, x0 : x0 + 190] = pack_rgb(*rng.integers(0, 256, 3))
    f = f.reshape(-1)
    streams = [enc.encode_i(f)]
    for t in range(T - 1):
        nf = f.copy().reshape(Y, X)
        if t % 3 == 0:
            nf[8:, :] = nf[:-8, :].copy()
        if t % 3 != 2:
            x0, y0 = int(rng.integers(0, X - 120)), int(rng.integers(0, Y - 80))
            nf[y0 : y0 + 60, x0 : x0 + 100] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
    return streams


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    streams = corpus()
    out = native.native_sp_decode_streams_kmv([streams], X, Y, K=2)
    best = float("inf")
    t_all0 = time.perf_counter()
    for _ in range(reps):
        t0 = time.perf_counter()
        out = native.native_sp_decode_streams_kmv([streams], X, Y, K=2,
                                                  out=out)
        best = min(best, time.perf_counter() - t0)
    total = time.perf_counter() - t_all0
    print(f"host kmv stage: best {T / best:,.0f} fps/core "
          f"(avg {reps * T / total:,.0f})")

    out_bc = native.native_sp_decode_streams_bc([streams], X, Y, K=2)
    best = float("inf")
    t_all0 = time.perf_counter()
    for _ in range(reps):
        t0 = time.perf_counter()
        out_bc = native.native_sp_decode_streams_bc([streams], X, Y, K=2,
                                                    out=out_bc)
        best = min(best, time.perf_counter() - t0)
    total = time.perf_counter() - t_all0
    print(f"host bc stage:  best {T / best:,.0f} fps/core "
          f"(avg {reps * T / total:,.0f})")


if __name__ == "__main__":
    main()
