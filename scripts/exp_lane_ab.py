"""Round-4 A/B: lane-container raw-unit-bytes vs rANS-lane payload, on chip.

Measures, on the real TPU with the two-point marginal probe (BENCH_NOTES
measurement discipline):
  - device decode fps for the raw and rans payload modes on the 1080p
    bench corpus (T=64, keyframe-led window), and
  - container wire sizes (raw+deflate / raw / rans) on the bench AND
    terminal corpora, vs the source AVI.

VERDICT round-3 item 2's question: what does the rANS lane machinery buy
over raw unit bytes?  (Prediction: nothing — the renorm-aligned layout
ships 2 B/sym for 1-B/sym content.)  Result recorded in BENCH_NOTES.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from jsplayer_tpu import native
    from jsplayer_tpu.codecs import lane_format
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.kernels import lane_recon
    from jsplayer_tpu.transcode import transcode_to_lane
    from jsplayer_tpu.utils import corpora

    Y, X, T = 1080, 1920, 64
    enc = native.NativeScreenPressorEncoder(4, X, Y)
    frames = corpora.screen_mix(T=T, Y=Y, X=X, stills=1 / 3, seed=3)
    streams = corpora.encode_frames(frames, enc)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4",
                  keyflags=[t == 0 for t in range(T)])

    sizes = {"avi": len(avi)}
    t0 = time.perf_counter()
    raw_defl = transcode_to_lane(avi, window=T, K=2)
    sizes["transcode_s"] = round(time.perf_counter() - t0, 2)
    sizes["raw_deflate"] = len(raw_defl)
    sizes["raw"] = len(transcode_to_lane(avi, window=T, K=2, compress=False))
    rans_bytes = transcode_to_lane(avi, window=T, K=2, payload="rans",
                                   compress=False)
    sizes["rans"] = len(rans_bytes)
    sizes["rans_deflate"] = len(transcode_to_lane(avi, window=T, K=2,
                                                  payload="rans"))

    def timed(fn, *args, frames_n=T, tries=5):
        @jax.jit
        def loop(nrep, *a):
            def body(i, carry):
                a0 = a[0] ^ carry
                out = fn(a0, *a[1:])
                return out.sum(dtype=jnp.uint32) ^ jnp.uint32(i)
            return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

        def t_at(nrep):
            int(loop(jnp.int32(nrep), *args))
            best = float("inf")
            for _ in range(tries):
                t0 = time.perf_counter()
                int(loop(jnp.int32(nrep), *args))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t_at(4), t_at(24)
        return frames_n * 20 / max(t2 - t1, 1e-9)

    ncol = lane_format.plane_cols(X) // 128
    out = {"sizes_bench_corpus": sizes}

    c = lane_format.container_from_bytes(raw_defl)
    w = c.windows[0]
    t0 = time.perf_counter()
    c2 = lane_format.container_from_bytes(raw_defl)
    rt_np, ri_np = c2.windows[0].row_index(Y, ncol)
    out["raw_prep_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    raw_args = jax.device_put(
        (jnp.zeros((Y, X), jnp.uint32), jnp.asarray(w.payload),
         jnp.asarray(w.btype), jnp.asarray(w.rect), jnp.asarray(w.mvk),
         jnp.asarray(rt_np), jnp.asarray(ri_np), jnp.asarray(w.changed)))
    out["raw_fps"] = round(timed(lane_recon.decode_window_raw, *raw_args), 1)
    out["raw_units"] = w.n_units

    cr = lane_format.container_from_bytes(rans_bytes)
    w2 = cr.windows[0]
    init2 = (jnp.asarray(w2.init_plane) if w2.init_plane is not None
             else jnp.zeros((Y, X), jnp.uint32))
    rt2, ri2 = w2.row_index(Y, ncol)
    rans_args = jax.device_put(
        (init2, jnp.asarray(w2.refills), jnp.asarray(w2.states),
         jnp.asarray(w2.freq), jnp.asarray(w2.btype), jnp.asarray(w2.rect),
         jnp.asarray(w2.mvk), jnp.asarray(rt2), jnp.asarray(ri2),
         jnp.asarray(w2.changed)))
    out["rans_fps"] = round(timed(
        lambda i, rf, st, fq, bt, rc, mk, rt, ri, ch:
        lane_recon.decode_window_lane(i, rf, st, fq, bt, rc, mk, rt, ri, ch,
                                      U=w2.n_units), *rans_args), 1)
    out["rans_units"] = w2.n_units
    out["rans_steps"] = int(w2.refills.shape[0])

    # terminal corpus sizes (the realistic screencast)
    Tt = 240
    frames_t = corpora.terminal_session(T=Tt, Y=Y, X=X, seed=0)
    enc2 = native.NativeScreenPressorEncoder(4, X, Y)
    streams_t = corpora.encode_frames(frames_t, enc2)
    avi_t = mux_avi(streams_t, X, Y, 24, codec="SPV4",
                    keyflags=[t == 0 for t in range(Tt)])
    st = {"avi": len(avi_t)}
    st["raw_deflate"] = len(transcode_to_lane(avi_t, window=64, K=2))
    st["rans"] = len(transcode_to_lane(avi_t, window=64, K=2,
                                       payload="rans", compress=False))
    out["sizes_terminal_corpus"] = st

    print(json.dumps(out))


if __name__ == "__main__":
    main()
