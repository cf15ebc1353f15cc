"""Round-4 ablation: where does the lane decode lose vs the bc scan?

bc scan reads a prebuilt [T,Y,X] plane per frame (~18k fps); the lane
path gathers [R,128] unit rows and reshapes to [Y,X] per frame
(~12.2k).  Hypothesis (memory: tpu-layout-lessons): the per-frame
[R,128]->[Y,X] reshape is a lane-dim-merging RELAYOUT (~2x 8.3 MB extra
traffic each frame).  Variants, all bit-exact vs the baseline:

  base  — the round-3 shipped shape (in-scan slot gather + reshape),
          inlined here since the package kernel moved to rows
  hoist — planes [T,Y,X] built by ONE big gather outside the scan,
          then a bc-shaped scan (isolates the scan cost)
  rows  — ROW-LEVEL gather: dedup each plane row's ncol-unit id tuple
          into row_table [Ur,ncol]; build rows_unique [Ur,Xp] once per
          window (the relayout paid ONCE), per-frame tp =
          take(rows_unique, row_idx[t]) — a pure row gather (~free).
          This is what decode_window_raw ships since round 4.

Measured on chip 2026-08-17 (v5e, 1080p bench window, deduped U=133,
Ur=107): base 12,318 fps / hoist 6,854 / rows 17,353 — the relayout
was the cost; rows adopted (+41% dense).  Run on the real chip;
prints one JSON line.
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
    from jsplayer_tpu.kernels.sp_recon import bc_row_map, row_expand
    from jsplayer_tpu.transcode import transcode_to_lane
    from jsplayer_tpu.utils import corpora

    Y, X, T = 1080, 1920, 64
    enc = native.NativeScreenPressorEncoder(4, X, Y)
    frames = corpora.screen_mix(T=T, Y=Y, X=X, stills=1 / 3, seed=3)
    streams = corpora.encode_frames(frames, enc)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4",
                  keyflags=[t == 0 for t in range(T)])
    cont = transcode_to_lane(avi, window=T, K=2)
    c = lane_format.container_from_bytes(cont)
    w = c.windows[0]
    ncol = lane_format.plane_cols(X) // 128
    R = Y * ncol
    inv = w.inv_index(R)

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

    out = {"U": w.n_units}
    init = jnp.zeros((Y, X), jnp.uint32)
    base_args = jax.device_put(
        (init, jnp.asarray(w.payload), jnp.asarray(w.btype),
         jnp.asarray(w.rect), jnp.asarray(w.mvk), jnp.asarray(inv),
         jnp.asarray(w.changed)))

    # ---- base: round-3 shipped shape (in-scan slot gather + reshape) ----
    @jax.jit
    def decode_base(init, payload, btype, rect, mvk, inv_idx, changed):
        units = lane_recon.units_from_raw(payload)

        def step(prev, inp):
            bt_, r, mk, idx, chg = inp
            Yl, Xl = prev.shape
            nbx, nby = (Xl + 15) // 16, (Yl + 15) // 16
            rows = jnp.take(units, idx, axis=0)          # [R, 128]
            tp = rows.reshape(Yl, -1)[:, :Xl]            # the relayout
            rowv = row_expand(bc_row_map(bt_, r, nby, nbx, Xl), Yl, Xl)
            bt = rowv & 0xFF
            y1 = (rowv >> 8) & 0xFF
            y2 = (rowv >> 16) & 0xFF
            ly = (jax.lax.broadcasted_iota(jnp.uint32, (Yl, Xl), 0)) & 15
            in_y = (ly >= y1) & (ly < y2)
            o = jnp.where((bt == 1) & in_y, tp, prev)
            for k in range(mk.shape[0]):
                sh = jnp.roll(prev, shift=(-mk[k, 1], -mk[k, 0]), axis=(0, 1))
                o = jnp.where((bt == 2 + k) & in_y, sh, o)
            o = jnp.where(chg, o, prev)
            return o, o

        _, fr = jax.lax.scan(step, init, (btype, rect, mvk, inv_idx, changed))
        return fr

    gold = np.asarray(decode_base(*base_args))
    out["base_fps"] = round(timed(decode_base, *base_args), 1)

    # ---- hoist: one big gather -> [T,Y,X] planes, bc-shaped scan ----
    @jax.jit
    def decode_hoist(init, payload, btype, rect, mvk, inv_idx, changed):
        units = lane_recon.units_from_raw(payload)
        planes = jnp.take(units, inv_idx.reshape(-1), axis=0) \
            .reshape(inv_idx.shape[0], Y, -1)[:, :, :X]

        def step(prev, inp):
            tp, bt_, r, mk, chg = inp
            Yl, Xl = prev.shape
            nbx, nby = (Xl + 15) // 16, (Yl + 15) // 16
            rowv = row_expand(bc_row_map(bt_, r, nby, nbx, Xl), Yl, Xl)
            bt = rowv & 0xFF
            y1 = (rowv >> 8) & 0xFF
            y2 = (rowv >> 16) & 0xFF
            ly = (jax.lax.broadcasted_iota(jnp.uint32, (Yl, Xl), 0)) & 15
            in_y = (ly >= y1) & (ly < y2)
            o = jnp.where((bt == 1) & in_y, tp, prev)
            for k in range(mk.shape[0]):
                sh = jnp.roll(prev, shift=(-mk[k, 1], -mk[k, 0]), axis=(0, 1))
                o = jnp.where((bt == 2 + k) & in_y, sh, o)
            o = jnp.where(chg, o, prev)
            return o, o

        _, fr = jax.lax.scan(step, init,
                             (planes, btype, rect, mvk, changed))
        return fr

    got = np.asarray(decode_hoist(*base_args))
    assert (got == gold).all(), "hoist diverges"
    out["hoist_fps"] = round(timed(decode_hoist, *base_args), 1)

    # ---- rows: row-level dedup + per-frame pure row gather (the shipped
    # decode_window_raw since round 4) ----
    row_table, row_idx = w.row_index(Y, ncol)
    out["Ur"] = int(row_table.shape[0])

    rows_args = jax.device_put(
        (init, jnp.asarray(w.payload), jnp.asarray(w.btype),
         jnp.asarray(w.rect), jnp.asarray(w.mvk), jnp.asarray(row_table),
         jnp.asarray(row_idx), jnp.asarray(w.changed)))
    got = np.asarray(lane_recon.decode_window_raw(*rows_args))
    assert (got == gold).all(), "rows diverges"
    out["rows_fps"] = round(timed(lane_recon.decode_window_raw,
                                  *rows_args), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
