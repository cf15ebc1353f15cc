"""Dump an encoded corpus to the flat blob prof_bc_main.cpp consumes.

  python scripts/dump_corpus.py terminal /tmp/term.blob [T]
  python scripts/dump_corpus.py bench /tmp/bench.blob

Blob layout: i64 T | i64 X | i64 Y | i64 lengths[T] | frame bytes...
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    kind, path = sys.argv[1], sys.argv[2]
    from jsplayer_tpu import native
    from jsplayer_tpu.utils import corpora

    Y, X = 1080, 1920
    enc = native.NativeScreenPressorEncoder(4, X, Y)
    if kind == "terminal":
        T = int(sys.argv[3]) if len(sys.argv) > 3 else 240
        frames = corpora.terminal_session(T=T, Y=Y, X=X, seed=0)
    elif kind == "video_call":
        T = int(sys.argv[3]) if len(sys.argv) > 3 else 48
        frames = corpora.video_call(T=T, Y=Y, X=X, seed=0)
    else:
        T = int(sys.argv[3]) if len(sys.argv) > 3 else 64
        frames = corpora.screen_mix(T=T, Y=Y, X=X, stills=1 / 3, seed=3)
    streams = corpora.encode_frames(frames, enc)
    with open(path, "wb") as f:
        f.write(struct.pack("<qqq", len(streams), X, Y))
        f.write(np.array([len(s) for s in streams], dtype="<i8").tobytes())
        for s in streams:
            f.write(s)
    print(f"{kind}: {len(streams)} frames, "
          f"{sum(len(s) for s in streams)} bytes -> {path}")


if __name__ == "__main__":
    main()
