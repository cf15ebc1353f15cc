"""Roofline for the per-frame compose: is the scan HBM-bound?

Measures known-traffic reference scans at the bench shape ([1080,1920]
u32, T=64 lax.scan) to establish achieved HBM bandwidth, then places
the shipped kmv compose (and its traffic model) against it:

  carry1 — out = prev + 1                  (R prev, W out:   16.6 MB/frame)
  xor2   — out = prev ^ plane[t]           (R prev+plane, W: 24.9 MB/frame)
  kmv    — decode_sequence_kmv as shipped  (model: R paycode + R prev x
           (1 + K shifted streams) + W out = 41.5 MB/frame at K=2 if
           nothing fuses away; 24.9 MB absolute floor if shifted reads
           were free)

Run on the real chip; prints one JSON line with achieved GB/s per
variant and the kmv implied traffic (= measured time x achieved BW).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Y, X, T = 1080, 1920, 64
PLANE_MB = Y * X * 4 / 1e6


def main():
    import jax
    import jax.numpy as jnp

    from jsplayer_tpu import native
    from jsplayer_tpu.kernels import sp_recon
    from jsplayer_tpu.utils import corpora

    enc = native.NativeScreenPressorEncoder(4, X, Y)
    streams = corpora.encode_frames(
        corpora.screen_mix(T=T, Y=Y, X=X, stills=1 / 3, seed=3), enc)
    kmv = native.native_sp_decode_streams_kmv([streams], X, Y, K=2)
    args = jax.device_put(
        (jnp.zeros((Y, X), jnp.uint32), jnp.asarray(kmv["paycode"][0]),
         jnp.asarray(kmv["mvk"][0]), jnp.asarray(kmv["changed"][0])))

    def timed(fn, *a, tries=5):
        @jax.jit
        def loop(nrep, *aa):
            def body(i, carry):
                a0 = aa[0] ^ carry
                o = fn(a0, *aa[1:])
                return o.sum(dtype=jnp.uint32) ^ jnp.uint32(i)
            return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

        def t_at(nrep):
            int(loop(jnp.int32(nrep), *a))
            best = float("inf")
            for _ in range(tries):
                t0 = time.perf_counter()
                int(loop(jnp.int32(nrep), *a))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t_at(4), t_at(24)
        return (t2 - t1) / 20 / T  # seconds per frame

    @jax.jit
    def carry1(init, paycode, mvk, changed):
        def step(prev, _):
            o = prev + jnp.uint32(1)
            return o, o
        _, fr = jax.lax.scan(step, init, (changed,))
        return fr

    @jax.jit
    def xor2(init, paycode, mvk, changed):
        def step(prev, inp):
            pc, = inp
            o = prev ^ pc
            return o, o
        _, fr = jax.lax.scan(step, init, (paycode,))
        return fr

    out = {}
    t = timed(carry1, *args)
    out["carry1_us"] = round(t * 1e6, 1)
    out["carry1_gbps"] = round(2 * PLANE_MB / 1e3 / t, 1)
    t = timed(xor2, *args)
    out["xor2_us"] = round(t * 1e6, 1)
    out["xor2_gbps"] = round(3 * PLANE_MB / 1e3 / t, 1)
    bw = out["xor2_gbps"]  # streaming BW with a scanned-in plane

    t = timed(sp_recon.decode_sequence_kmv, *args)
    out["kmv_us"] = round(t * 1e6, 1)
    out["kmv_fps"] = round(1 / t, 1)
    out["kmv_implied_MB"] = round(t * bw * 1e3, 1)
    out["kmv_model_MB"] = round(5 * PLANE_MB, 1)   # pc + 3x prev + out
    out["kmv_floor_MB"] = round(3 * PLANE_MB, 1)   # pc + prev + out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
