"""Native C++ SP encoder: byte-identical to the Python encoder and decodes
bit-exact through oracle + native decoders."""

import numpy as np
import pytest

from jsplayer_tpu import native
from jsplayer_tpu.codecs.screenpressor import ScreenPressor
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

X, Y = 64, 48
NPIX = X * Y


def evolve(rng, frames, n):
    f = frames[-1]
    for t in range(n):
        nf = f.copy().reshape(Y, X)
        mode = t % 4
        if mode == 0:
            nf[2:, :] = nf[:-2, :].copy()  # scroll → motion
        elif mode == 1:
            nf[10:14, 40:60] = pack_rgb(*rng.integers(0, 256, 3))  # subrect
        elif mode == 2:
            pass  # no change
        else:
            nf[20:32, 0:24] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        frames.append(f)
    return frames


@pytest.mark.parametrize("version", [2, 3, 4])
def test_byte_identical_to_python_encoder(version):
    rng = np.random.default_rng(300 + version)
    f0 = np.full(NPIX, pack_rgb(7, 7, 7), dtype=np.uint32)
    frames = evolve(rng, [f0], 7)
    pyenc = ScreenPressorEncoder(version, X, Y)
    cenc = native.NativeScreenPressorEncoder(version, X, Y)
    for t, fr in enumerate(frames):
        if t == 0 or t == 4:
            a, b = pyenc.encode_i(fr), cenc.encode_i(fr)
        else:
            a, b = pyenc.encode_p(fr), cenc.encode_p(fr)
        assert a == b, f"frame {t}: {len(a)}B vs {len(b)}B"


@pytest.mark.parametrize("version", [2, 3, 4])
def test_roundtrip_through_decoders(version):
    rng = np.random.default_rng(400 + version)
    f0 = np.full(NPIX, pack_rgb(3, 5, 7), dtype=np.uint32)
    frames = evolve(rng, [f0], 6)
    cenc = native.NativeScreenPressorEncoder(version, X, Y)
    orc = ScreenPressor(X, Y, 24)
    orc.preinit(0)
    ndec = native.NativeScreenPressor(X, Y, 24)
    ndec.preinit(0)
    prev_n = None
    for t, fr in enumerate(frames):
        s = cenc.encode_i(fr) if t == 0 else cenc.encode_p(fr)
        dst = np.zeros(NPIX, dtype=np.uint32)
        if orc.is_key_frame(s):
            orc.decompress_i(s, dst)
            got_o = dst
        else:
            got_o = orc.decompress_p(s, dst).data
        np.testing.assert_array_equal(got_o, fr, err_msg=f"oracle frame {t}")
        fr_n, _, _ = ndec.decompress(s, ndec.is_key_frame(s))
        got_n = fr_n if fr_n is not None else prev_n
        np.testing.assert_array_equal(got_n, fr, err_msg=f"native frame {t}")
        prev_n = np.array(got_n, copy=True)


def test_flat_frames():
    cenc = native.NativeScreenPressorEncoder(4, X, Y)
    pyenc = ScreenPressorEncoder(4, X, Y)
    assert cenc.encode_flat(pack_rgb(1, 2, 3)) == pyenc.encode_flat(pack_rgb(1, 2, 3))
    assert cenc.encode_flat(pack_rgb(4, 5, 6)) == pyenc.encode_flat(pack_rgb(4, 5, 6))
    f = np.asarray(pyenc.prev).copy().reshape(Y, X)
    f[3:7, 3:7] = pack_rgb(9, 9, 9)
    f = f.reshape(-1)
    assert cenc.encode_p(f) == pyenc.encode_p(f)
