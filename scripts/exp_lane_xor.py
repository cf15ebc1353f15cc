"""Prototype: XOR-delta payload units — size estimate before format work.

The measured terminal wire is payload-dominated (~1.82 MB deflated of
2.00 MB; BENCH_NOTES round-4 correction): full 128-px units carry
mostly-unchanged pixels for cursor-sized deltas.  If a unit stored
(recon_t ^ prev_delivered) masked to the painted pixels instead of
absolute values, tiny deltas become mostly-zero units — deflate crushes
zeros and identical XOR patterns (cursor blinks, repeated glyphs) dedup.

This measures, per corpus, WITHOUT touching the wire format:
  units_abs / units_xor    unique payload units (dedup keys)
  pay_defl_abs / _xor      zlib-1 size of the [U,3,128] payload bytes

XOR base rule (matches the carry-independence the gop axis needs):
frame 0 of a RESTART window XORs against ZERO (identity — keyframes are
full-entropy either way); every other frame against the delivered
previous frame (crossing window boundaries for non-restart t==0).

Run on a quiet host; prints one JSON line.
"""

import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(cont_bytes):
    from jsplayer_tpu.codecs import lane_format
    from jsplayer_tpu.codecs.lane_host import compose_window_host

    c = lane_format.container_from_bytes(cont_bytes)
    X, Y = c.X, c.Y
    Xp = lane_format.plane_cols(X)
    nxu = Xp // 128
    nbx = (X + 15) // 16
    yy, xx = np.mgrid[0:Y, 0:X]
    bi_map = (yy >> 4) * nbx + (xx >> 4)
    ly, lx = yy & 15, xx & 15

    stats = {"units_abs": 0, "units_msk": 0, "units_xor": 0,
             "pay_raw_abs": 0, "pay_raw_msk": 0, "pay_raw_xor": 0,
             "pay_defl_abs": 0, "pay_defl_msk": 0, "pay_defl_xor": 0}
    carry = np.zeros((Y, X), dtype=np.uint32)
    for w in c.windows:
        frames = compose_window_host(w, X, Y,
                                     prev=None if w.restart else carry)
        seen_a, seen_m, seen_x = set(), set(), set()
        pay_a, pay_m, pay_x = [], [], []
        prev = np.zeros((Y, X), np.uint32) if w.restart else carry.copy()
        for t in range(w.T):
            if not w.changed[t]:
                prev = frames[t]
                continue
            bt_px = w.btype[t][bi_map]
            r_px = w.rect[t][bi_map]
            is_data = ((bt_px == 1)
                       & (lx >= r_px[..., 0]) & (lx < r_px[..., 2])
                       & (ly >= r_px[..., 1]) & (ly < r_px[..., 3]))
            rows = w.unit_rows[t]
            if rows.size:
                plane_a = np.zeros((Y, Xp), dtype=np.uint32)
                plane_a[:, :X] = frames[t] & 0x00FFFFFF
                plane_m = np.zeros((Y, Xp), dtype=np.uint32)
                plane_m[:, :X] = np.where(is_data,
                                          frames[t] & 0x00FFFFFF, 0)
                plane_x = np.zeros((Y, Xp), dtype=np.uint32)
                plane_x[:, :X] = np.where(
                    is_data, (frames[t] ^ prev) & 0x00FFFFFF, 0)
                ua = plane_a.reshape(Y * nxu, 128)[rows]
                um_ = plane_m.reshape(Y * nxu, 128)[rows]
                ux = plane_x.reshape(Y * nxu, 128)[rows]
                for j in range(rows.size):
                    ka = ua[j].tobytes()
                    if ka not in seen_a:
                        seen_a.add(ka)
                        pay_a.append(ua[j])
                    km = um_[j].tobytes()
                    if km not in seen_m:
                        seen_m.add(km)
                        pay_m.append(um_[j])
                    kx = ux[j].tobytes()
                    if kx not in seen_x:
                        seen_x.add(kx)
                        pay_x.append(ux[j])
            prev = frames[t]
        carry = frames[-1] if w.T else carry

        def blob(units):
            if not units:
                return b""
            u = np.stack(units)
            arr = np.empty((u.shape[0], 3, 128), dtype=np.uint8)
            arr[:, 0] = u & 0xFF
            arr[:, 1] = (u >> 8) & 0xFF
            arr[:, 2] = (u >> 16) & 0xFF
            return arr.tobytes()

        ba, bm, bx = blob(pay_a), blob(pay_m), blob(pay_x)
        stats["units_abs"] += len(pay_a)
        stats["units_msk"] += len(pay_m)
        stats["units_xor"] += len(pay_x)
        stats["pay_raw_abs"] += len(ba)
        stats["pay_raw_msk"] += len(bm)
        stats["pay_raw_xor"] += len(bx)
        stats["pay_defl_abs"] += len(zlib.compress(ba, 1))
        stats["pay_defl_msk"] += len(zlib.compress(bm, 1))
        stats["pay_defl_xor"] += len(zlib.compress(bx, 1))
    return stats


def main():
    from jsplayer_tpu import native
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.transcode import transcode_to_lane
    from jsplayer_tpu.utils import corpora

    out = {}
    for name, mk in (
        ("bench", lambda: corpora.screen_mix(T=64, Y=1080, X=1920, seed=0)),
        ("terminal", lambda: corpora.terminal_session(T=240, Y=1080,
                                                      X=1920, seed=0)),
    ):
        frames = mk()
        T = len(frames)
        Y, X = frames[0].shape[:2] if frames[0].ndim > 1 else (1080, 1920)
        enc = native.NativeScreenPressorEncoder(4, 1920, 1080)
        streams = corpora.encode_frames(frames, enc)
        avi = mux_avi(streams, 1920, 1080, 24, codec="SPV4",
                      keyflags=[t == 0 for t in range(T)])
        cb = transcode_to_lane(avi, window=64, K=2)
        out[name] = measure(cb)
        out[name]["wire_now"] = len(cb)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
