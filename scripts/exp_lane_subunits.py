"""Prototype: finer-than-128px payload units — size estimate before format work.

The terminal wire is payload-dominated (~1.82 MB deflated of 2.00 MB;
BENCH_NOTES round-4 correction), and XOR-delta measured negative
(scripts/exp_lane_xor.py): absolute rows dedup/deflate best.  The
remaining lever is unit granularity: a cursor-sized delta captures whole
128-px plane rows, so most captured pixels repeat across units and
defeat whole-row dedup.  Splitting each 128-px unit row into S-px
sub-units dedups at finer granularity; the wire then stores unique
sub-units + (128/S) sub-ids per row, and HOST prep expands sub-units
back into unique 128-px rows (np fancy indexing) so the device path is
untouched.

Measures, per corpus and sub-unit width S in {128, 64, 32, 16}:
  units        unique sub-units
  pay_defl     zlib-1 of the [Us,3,S] sub-unit payload bytes
  ids_raw      row-table id bytes before deflate (Ur * 128/S * 4)
  ids_defl     zlib-6 of the id arrays (meta section rides level 6)
  total_defl   pay_defl + ids_defl (the wire-relevant sum)

Run on a quiet host; prints one JSON line.
"""

import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(cont_bytes, widths=(128, 64, 32, 16, 8, 4)):
    from jsplayer_tpu.codecs import lane_format

    c = lane_format.container_from_bytes(cont_bytes)
    out = {S: {"units": 0, "pay_defl": 0, "ids_raw": 0, "ids_defl": 0}
           for S in widths}
    for w in c.windows:
        # the wire's deduped unit payload [U, 3, 128] u8 — sub-divide the
        # already-deduped set; existing row tables/meta are unchanged
        pay = w.payload
        for S in widths:
            k = 128 // S
            # [U, 3, 128] -> [U*k, 3*S] byte records (keep the 3 byte
            # planes of each sub-unit together as the dedup key)
            sub = pay.reshape(pay.shape[0], 3, k, S).transpose(
                0, 2, 1, 3).reshape(-1, 3 * S)
            view = np.ascontiguousarray(sub).view(
                [("", np.uint8)] * (3 * S)).reshape(-1)
            uniq, inv = np.unique(view, return_inverse=True)
            blob = uniq.view(np.uint8).reshape(-1, 3 * S)
            ids = inv.astype(np.uint32)
            out[S]["units"] += int(blob.shape[0])
            out[S]["pay_defl"] += len(zlib.compress(blob.tobytes(), 1))
            out[S]["ids_raw"] += 0 if k == 1 else ids.nbytes
            out[S]["ids_defl"] += (0 if k == 1 else
                                   len(zlib.compress(ids.tobytes(), 6)))
    for S in widths:
        out[S]["total_defl"] = out[S]["pay_defl"] + out[S]["ids_defl"]
    return {str(S): v for S, v in out.items()}


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
