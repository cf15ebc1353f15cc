"""Stream transcoding: legacy ScreenPressor versions → v4 / lane formats.

A product utility the reference never had: decode any supported SP stream
(v2 range-coded included) with the native decoder and re-encode with the
native v4 (rANS) encoder — e.g. to consolidate archives onto the fastest
decode path — or re-chunk payload symbols into the interleaved-lane rANS
format (kernels/rans_lanes.py) for device-side entropy decode.

Frame-level parity is preserved by construction: the transcoder decodes to
pixels and re-encodes losslessly (the encoder round-trip suite guarantees
decode(encode(f)) == f).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .core.chunkbuffer import ChunkBuffer
from .core.riff import AviDemuxer
from .core.types import CodecType, VideoInfo
from .encode.avi_mux import mux_avi


def transcode_sp(avi_bytes: bytes, target_version: int = 4,
                 use_native: Optional[bool] = None) -> bytes:
    """Re-encode an SP AVI to `target_version`; returns the new AVI bytes."""
    from . import native as _native

    if use_native is None:
        use_native = _native.available()

    buf = ChunkBuffer()
    frames: list[bytes] = []
    info: list[VideoInfo] = []
    d = AviDemuxer(buf, on_frame=frames.append, on_video_info=info.append)
    d.start()
    buf.add_chunk(avi_bytes)
    d.pump()
    d.signal_eof()
    d.pump()
    if not info:
        raise ValueError("no video stream found")
    vi = info[0]
    if vi.codec != CodecType.SCREENPRESSOR:
        raise ValueError("transcode_sp handles ScreenPressor inputs only")

    X, Y = vi.width, vi.height
    if use_native:
        dec = _native.NativeScreenPressor(X, Y, vi.bpp)
        dec.preinit(0)
        enc = _native.NativeScreenPressorEncoder(target_version, X, Y, vi.bpp)
    else:
        from .codecs.screenpressor import ScreenPressor
        from .encode.sp_enc import ScreenPressorEncoder

        dec = ScreenPressor(X, Y, vi.bpp)
        dec.preinit(0)
        enc = ScreenPressorEncoder(target_version, X, Y, vi.bpp)

    out_streams: list[bytes] = []
    keyflags: list[bool] = []
    prev_px: Optional[np.ndarray] = None
    for t, src in enumerate(frames):
        if use_native:
            isk = dec.is_key_frame(src)
            view, _sig, _ = dec.decompress(src, isk, copy=False)
            px = np.asarray(view if view is not None else dec.latest_view())
        else:
            dst = np.zeros(X * Y, dtype=np.uint32)
            if dec.is_key_frame(src):
                dec.decompress_i(src, dst)
                px = dst
                isk = True
            else:
                res = dec.decompress_p(src, dst)
                px = np.asarray(res.data)
                isk = False
        if isk:
            data = enc.encode_i(px)
        else:
            data = enc.encode_p(px)
        out_streams.append(data)
        keyflags.append(isk or t == 0)
        prev_px = px

    return mux_avi(out_streams, X, Y, vi.bpp, codec=f"SPV{target_version}",
                   fps=vi.fps, keyflags=keyflags)
