"""Golden pins: fixed-seed streams must decode to fixed frame digests.

Guards against silent semantic drift in the codecs/entropy stack across
refactors (the SURVEY.md §4 'golden tests pin (stream bytes) → (frame hash)'
item).  If an intentional format/semantic change breaks these, regenerate
the digests in the same commit and say why.

The SP v2/v3 and MSV1 frame digests are additionally *cross-implementation*
pins: tests/test_ffmpeg_crossval.py decodes the same fixture streams with the
system FFmpeg (independent scpr/msvideo1 decoders) and asserts the same
digests, so the pins are not just this repo's own opinion of the formats.
SP v4 is beyond FFmpeg's scpr support and remains a self-pinned canary.
"""

import hashlib

import numpy as np

from jsplayer_tpu.codecs.msvideo1 import MSVideo1_16bit, from_rgb15
from jsplayer_tpu.codecs.screenpressor import ScreenPressor
from jsplayer_tpu.encode.msv1_enc import encode_frame_16
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb

X, Y = 48, 32
NPIX = X * Y


def digest(arrs):
    h = hashlib.sha256()
    for a in arrs:
        h.update(np.ascontiguousarray(a, dtype=np.uint32).tobytes())
    return h.hexdigest()[:16]


def build_sp(version):
    rng = np.random.default_rng(1234)
    enc = ScreenPressorEncoder(version, X, Y)
    f = np.full((Y, X), pack_rgb(10, 20, 30), dtype=np.uint32)
    f = f.reshape(-1)
    streams = [enc.encode_i(f)]
    for t in range(5):
        nf = f.copy().reshape(Y, X)
        if t % 2 == 0:
            nf[2:, :] = nf[:-2, :].copy()
        nf[8:12, 8:24] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
    return streams


SP_STREAM_DIGESTS = {
    2: "a481f1e0f6a3b1ec",
    3: "66d1f4d6f8cb6f68",
    4: "4bff570bc6362fcb",
}
SP_FRAME_DIGESTS = {
    2: "2cb75fbf0a8243e4",
    3: "2cb75fbf0a8243e4",  # same pixels, different bytes per version
    4: "2cb75fbf0a8243e4",
}


def test_sp_goldens():
    for version in (2, 3, 4):
        streams = build_sp(version)
        sd = hashlib.sha256(b"".join(streams)).hexdigest()[:16]
        dec = ScreenPressor(X, Y, 24)
        dec.preinit(0)
        frames = []
        for s in streams:
            dst = np.zeros(NPIX, dtype=np.uint32)
            if dec.is_key_frame(s):
                dec.decompress_i(s, dst)
                frames.append(dst)
            else:
                frames.append(dec.decompress_p(s, dst).data.copy())
        fd = digest(frames)
        assert sd == SP_STREAM_DIGESTS[version], (version, sd)
        assert fd == SP_FRAME_DIGESTS[version], (version, fd)


MSV1_DIGESTS = ("da2f09dc54669fc8", "2263d167a520b7d6")


def test_msv1_golden():
    rng = np.random.default_rng(99)
    f = np.full((Y, X), from_rgb15(0x0421), dtype=np.uint32)
    prev = None
    streams, frames = [], []
    for t in range(4):
        f = f.copy()
        x0 = (t * 8) % (X - 4) & ~3
        f[4:8, x0 : x0 + 4] = from_rgb15(int(rng.integers(0, 0x8000)))
        flat = f.reshape(-1)
        streams.append(encode_frame_16(flat, prev, X, Y))
        prev = flat
    sd = hashlib.sha256(b"".join(streams)).hexdigest()[:16]
    dec = MSVideo1_16bit(X, Y)
    dec.preinit(0)
    for s in streams:
        dst = np.zeros(NPIX, dtype=np.uint32)
        frames.append(dec.decompress_p(s, dst).data.copy())
    fd = digest(frames)
    assert (sd, fd) == MSV1_DIGESTS, (sd, fd)
