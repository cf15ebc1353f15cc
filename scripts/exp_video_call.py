"""Measured record: the video_call corpus (dense end of realistic screen
content — an embedded 640x360 playing-video region, every frame changed).

Host rows (2026-08-18, 1-core Xeon, best-of-4):

  SP v4 encode              ~24 fps/core   (offline)
  AVI size                  44.0 MB / 120f = 367 KB/frame (1.6 B/changed-px)
  host pure decode          ~37 fps/core   — ENTROPY-BOUND: mid-entropy
                            content crushes the legacy host stage the way
                            stills crush nothing; cf terminal ~3,000
  host decode + bc          ~35 fps/core
  lane transcode            55 s / 120f; wire 5.96 MB = 50 KB/frame —
                            7.4x SMALLER than the SP AVI (deflated raw
                            byte-plane units beat SP's adaptive coding on
                            smooth gradients) and needs ZERO host entropy

The lane container is the serving answer for this corpus on both axes:
the legacy host stage caps a chip at ~37 fps/core of feed, while the
lane path moves the whole payload at wire-parse speed.  Device fps rows
(kmv vs lane on-chip) print when run with an accelerator attached.

Usage: python scripts/exp_video_call.py [--frames 120]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    # 64 = one bench-shaped GOP window; 120 reproduces the round-5 host
    # table but pushes ~1 GB through the tunnel for the device rows
    ap.add_argument("--frames", type=int, default=64)
    args = ap.parse_args()

    from jsplayer_tpu import native
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.transcode import transcode_to_lane
    from jsplayer_tpu.utils import corpora

    T = args.frames
    frames = corpora.video_call(T=T)
    enc = native.NativeScreenPressorEncoder(4, 1920, 1080)
    t0 = time.perf_counter()
    streams = corpora.encode_frames(frames, enc)
    t_enc = time.perf_counter() - t0
    avi = mux_avi(streams, 1920, 1080, 24, codec="SPV4",
                  keyflags=[t == 0 for t in range(T)])
    rep = {"frames": T, "encode_fps": round(T / t_enc, 1),
           "avi_bytes": len(avi)}
    print(f"[vc] encoded: {rep}", file=sys.stderr, flush=True)
    got = native.native_sp_decode_streams([streams], 1920, 1080)
    bc = native.native_sp_decode_streams_bc([streams], 1920, 1080, K=2)
    best_d = best_bc = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        native.native_sp_decode_streams([streams], 1920, 1080, out=got)
        best_d = max(best_d, T / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        bc = native.native_sp_decode_streams_bc([streams], 1920, 1080,
                                                K=2, out=bc)
        best_bc = max(best_bc, T / (time.perf_counter() - t0))
    rep["host_decode_fps"] = round(best_d, 1)
    rep["host_bc_fps"] = round(best_bc, 1)
    print(f"[vc] host rows: {rep}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    cb = transcode_to_lane(avi, window=T, K=2)
    rep["lane_transcode_s"] = round(time.perf_counter() - t0, 1)
    rep["lane_wire_bytes"] = len(cb)
    print(f"[vc] lane wire: {rep['lane_wire_bytes']} bytes in "
          f"{rep['lane_transcode_s']}s", file=sys.stderr, flush=True)

    import jax

    try:
        if jax.devices()[0].platform != "cpu":
            import jax.numpy as jnp

            from jsplayer_tpu.codecs import lane_format
            from jsplayer_tpu.kernels import lane_recon, sp_recon

            # kmv device row (two-point probe, bench.py discipline; the
            # big arrays ride as jit ARGUMENTS — closures over large
            # device constants serialize into the axon remote-compile
            # POST, which rejects them with HTTP 413 and burned this
            # script's whole timeout on the first run)
            pc, mvk = sp_recon.prepare_kmv(got["bts"][0], got["mv"][0],
                                           got["rect"][0],
                                           got["payload"][0], K=2)
            init = jnp.zeros((1080, 1920), jnp.uint32)
            pcd = jax.device_put(jnp.asarray(pc))
            mvd = jax.device_put(jnp.asarray(mvk))
            chd = jax.device_put(
                jnp.asarray(np.asarray(got["changed"][0], bool)))

            @jax.jit
            def jl(n, ini, p, m, ch):
                def body(i, c):
                    fr = sp_recon.decode_sequence_kmv(
                        ini ^ (c & jnp.uint32(1)), p, m, ch)
                    return c ^ jnp.bitwise_xor.reduce(fr.reshape(-1))
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

            def probe(fn, *a):
                int(fn(jnp.int32(1), *a))
                t1 = time.perf_counter()
                int(fn(jnp.int32(3), *a))
                t2 = time.perf_counter()
                int(fn(jnp.int32(13), *a))
                t3 = time.perf_counter()
                return ((t3 - t2) - (t2 - t1)) / 10

            rep["kmv_device_fps"] = round(
                T / probe(jl, init, pcd, mvd, chd), 1)
            print(f"[vc] kmv device: {rep['kmv_device_fps']} fps",
                  file=sys.stderr, flush=True)

            # lane device row: first window, dense (every frame changes)
            c = lane_format.container_from_bytes(cb)
            w = c.windows[0]
            ncol = lane_format.plane_cols(1920) // 128
            rt, ri = w.row_index(1080, ncol)
            a = jax.device_put(tuple(
                jnp.asarray(x) for x in
                (np.zeros((1080, 1920), np.uint32), w.payload, w.btype,
                 w.rect, w.mvk, rt, ri, w.changed)))

            @jax.jit
            def jl2(n, ini, *rest):
                def body(i, cxor):
                    fr = lane_recon.decode_window_raw(
                        ini ^ (cxor & jnp.uint32(1)), *rest)
                    return cxor ^ jnp.bitwise_xor.reduce(fr.reshape(-1))
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

            rep["lane_device_fps"] = round(w.T / probe(jl2, *a), 1)
    finally:
        # host rows survive even if the device section dies mid-probe
        print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
