"""Lane containers on the realistic terminal corpus (round-4 evidence).

The lane format is the production serving container; its fps record so
far is bench-corpus only.  This transcodes the 240-frame rendered
scrolling-terminal session (utils/corpora.terminal_session — ~45% true
stills, tiny typing/cursor deltas) to a raw+dedup+deflate lane
container (window=64 → 4 windows, first keyframe-led, rest carry) and
measures, per window and aggregated:

  dense    — decode_window_raw over all frames in the window
  elision  — changed frames only (compact semantics; delivered = T)

plus host prep (parse + inflate + row_index, all windows) and wire
size.  Run on the real chip; prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Y, X, T = 1080, 1920, 240
W = 64


def main():
    import jax
    import jax.numpy as jnp

    from jsplayer_tpu import native
    from jsplayer_tpu.codecs import lane_format
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.kernels import lane_recon
    from jsplayer_tpu.transcode import transcode_to_lane
    from jsplayer_tpu.utils import corpora

    enc = native.NativeScreenPressorEncoder(4, X, Y)
    frames = corpora.terminal_session(T=T, Y=Y, X=X, seed=0)
    streams = corpora.encode_frames(frames, enc)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4",
                  keyflags=[t == 0 for t in range(T)])
    cont_bytes = transcode_to_lane(avi, window=W, K=2)
    out = {"wire_bytes": len(cont_bytes), "avi_bytes": len(avi)}

    t0 = time.perf_counter()
    c = lane_format.container_from_bytes(cont_bytes)
    ncol = lane_format.plane_cols(X) // 128
    rowix = [w.row_index(Y, ncol) for w in c.windows]
    out["host_prep_ms_total"] = round((time.perf_counter() - t0) * 1e3, 1)
    out["n_windows"] = len(c.windows)
    out["units"] = [w.n_units for w in c.windows]
    out["Ur"] = [rt.shape[0] for rt, _ in rowix]

    def timed(fn, *a, frames_n, tries=5):
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
        return frames_n * 20 / max(t2 - t1, 1e-9), (t2 - t1) / 20

    dense_fps, el_fps = [], []
    t_dense = t_el = 0.0
    changed_tot = 0
    init = jnp.zeros((Y, X), jnp.uint32)
    for wi, w in enumerate(c.windows):
        rt, ri = rowix[wi]
        Tw = w.changed.shape[0]
        base = jax.device_put(
            (init, jnp.asarray(w.payload), jnp.asarray(w.btype),
             jnp.asarray(w.rect), jnp.asarray(w.mvk), jnp.asarray(rt),
             jnp.asarray(ri), jnp.asarray(w.changed)))
        fps, dt = timed(lane_recon.decode_window_raw, *base, frames_n=Tw)
        dense_fps.append(round(fps, 1))
        t_dense += dt
        sel = np.nonzero(w.changed)[0]
        changed_tot += sel.size
        el = jax.device_put(
            (init, jnp.asarray(w.payload), jnp.asarray(w.btype[sel]),
             jnp.asarray(w.rect[sel]), jnp.asarray(w.mvk[sel]),
             jnp.asarray(rt), jnp.asarray(ri[sel]),
             jnp.ones(sel.size, bool)))
        fps, dt = timed(lane_recon.decode_window_raw, *el, frames_n=Tw,
                        tries=3)
        el_fps.append(round(fps, 1))
        t_el += dt

    out["dense_fps_per_window"] = dense_fps
    out["elision_fps_per_window"] = el_fps
    out["dense_fps"] = round(T / t_dense, 1)
    out["elision_delivered_fps"] = round(T / t_el, 1)
    out["changed_frames"] = changed_tot
    print(json.dumps(out))


if __name__ == "__main__":
    main()
