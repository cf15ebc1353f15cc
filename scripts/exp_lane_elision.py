"""Lane ingest + still-elision on chip: the production lane config analog
of the kmv headline (stills never enter the scan; delivered = T).

The bench lane row scans all T frames (branchless where keeps stills at
full compose traffic); ingest's lane path already supports still_elision
via compact_arrays_batch.  This measures what that elision delivers for
the single-window bench corpus (1/3 stills).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Y, X, T = 1080, 1920, 64


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
    streams = corpora.encode_frames(
        corpora.screen_mix(T=T, Y=Y, X=X, stills=1 / 3, seed=3), enc)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4",
                  keyflags=[t == 0 for t in range(T)])
    c = lane_format.container_from_bytes(transcode_to_lane(avi, window=T))
    w = c.windows[0]
    ncol = lane_format.plane_cols(X) // 128
    row_table, row_idx = w.row_index(Y, ncol)
    ch = w.changed
    # still-elision: keep only changed frames (the ingest path's
    # compact_arrays_batch semantics, single stream, no padding)
    sel = np.nonzero(ch)[0]
    args = jax.device_put(
        (jnp.zeros((Y, X), jnp.uint32), jnp.asarray(w.payload),
         jnp.asarray(w.btype[sel]), jnp.asarray(w.rect[sel]),
         jnp.asarray(w.mvk[sel]), jnp.asarray(row_table),
         jnp.asarray(row_idx[sel]), jnp.ones(sel.size, bool)))
    dense_args = jax.device_put(
        (jnp.zeros((Y, X), jnp.uint32), jnp.asarray(w.payload),
         jnp.asarray(w.btype), jnp.asarray(w.rect),
         jnp.asarray(w.mvk), jnp.asarray(row_table),
         jnp.asarray(row_idx), jnp.asarray(ch)))

    def timed(fn, *a, tries=5):
        @jax.jit
        def loop(nrep, *aa):
            def body(i, carry):
                out = fn(aa[0] ^ carry, *aa[1:])
                return out.sum(dtype=jnp.uint32) ^ jnp.uint32(i)
            return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

        def t_at(n):
            int(loop(jnp.int32(n), *a))
            best = float("inf")
            for _ in range(tries):
                t0 = time.perf_counter()
                int(loop(jnp.int32(n), *a))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t_at(4), t_at(24)
        return T * 20 / max(t2 - t1, 1e-9)

    out = {
        "changed_frames": int(sel.size),
        "lane_raw_dense_fps": round(timed(lane_recon.decode_window_raw,
                                          *dense_args), 1),
        "lane_raw_elision_fps": round(timed(lane_recon.decode_window_raw,
                                            *args), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
