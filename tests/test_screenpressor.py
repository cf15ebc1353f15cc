"""ScreenPressor: encoder→oracle round-trips for v2 (RC) and v3/v4 (rANS),
covering flat frames, coded I-frames, and every P-frame block kind."""

import numpy as np
import pytest

from jsplayer_tpu.codecs.screenpressor import ScreenPressor
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb

X, Y = 64, 48
NPIX = X * Y


def screen_frame(rng, ncolors=5):
    """Screen-content-like frame: flat background + rectangles + h/v lines.
    Colors on full 8-bit lattice, packed (b<<16)|(g<<8)|r."""
    pal = [pack_rgb(*rng.integers(0, 256, 3)) for _ in range(ncolors)]
    f = np.full((Y, X), pal[0], dtype=np.uint32)
    for _ in range(6):
        x0, y0 = int(rng.integers(0, X - 8)), int(rng.integers(0, Y - 8))
        w, h = int(rng.integers(2, 20)), int(rng.integers(2, 16))
        f[y0 : min(y0 + h, Y), x0 : min(x0 + w, X)] = pal[rng.integers(0, ncolors)]
    return f.reshape(-1)


def gradient_frame():
    """Per-channel byte-gradient content (exercises ptype 4)."""
    yy, xx = np.mgrid[0:Y, 0:X]
    r = (xx * 3 + yy) & 0xFF
    g = (xx + yy * 2) & 0xFF
    b = (xx + yy) & 0xFF
    return ((b << 16) | (g << 8) | r).astype(np.uint32).reshape(-1)


def decode_stream(version, streams, bpp=24):
    dec = ScreenPressor(X, Y, bpp)
    dec.preinit(0)
    out = []
    sigs = []
    for i, s in enumerate(streams):
        dst = np.zeros(NPIX, dtype=np.uint32)
        if dec.is_key_frame(s):
            st = dec.decompress_i(s, dst)
            assert st.name == "ZERO"
            out.append(dst.copy())
            sigs.append(None)
        else:
            res = dec.decompress_p(s, dst)
            out.append(res.data.copy())
            sigs.append(res.significant_changes)
    return out, sigs


@pytest.mark.parametrize("version", [2, 3, 4])
def test_iframe_roundtrip(version):
    rng = np.random.default_rng(10 + version)
    enc = ScreenPressorEncoder(version, X, Y)
    f = screen_frame(rng)
    data = enc.encode_i(f)
    assert data[0] in (0x12, 0x22, 0x32)
    frames, _ = decode_stream(version, [data])
    np.testing.assert_array_equal(frames[0], f)


@pytest.mark.parametrize("version", [2, 3, 4])
def test_gradient_iframe_roundtrip(version):
    enc = ScreenPressorEncoder(version, X, Y)
    f = gradient_frame()
    data = enc.encode_i(f)
    frames, _ = decode_stream(version, [data])
    np.testing.assert_array_equal(frames[0], f)


@pytest.mark.parametrize("version", [2, 3, 4])
def test_flat_and_p_chain(version):
    rng = np.random.default_rng(20 + version)
    enc = ScreenPressorEncoder(version, X, Y)
    streams = [enc.encode_flat(pack_rgb(10, 20, 30))]
    f0 = np.asarray(enc.prev).copy()
    # P-frame with data blocks
    f1 = f0.copy().reshape(Y, X)
    f1[5:12, 3:30] = pack_rgb(200, 100, 50)
    f1 = f1.reshape(-1)
    streams.append(enc.encode_p(f1))
    # no-change P-frame
    streams.append(enc.encode_p(f1))
    # another change
    f2 = f1.copy().reshape(Y, X)
    f2[20:25, 40:60] = pack_rgb(1, 2, 3)
    f2 = f2.reshape(-1)
    streams.append(enc.encode_p(f2))
    frames, sigs = decode_stream(version, streams)
    np.testing.assert_array_equal(frames[0], f0)
    np.testing.assert_array_equal(frames[1], f1)
    np.testing.assert_array_equal(frames[2], f1)  # unchanged returns prev
    assert sigs[2] is False
    np.testing.assert_array_equal(frames[3], f2)
    assert sigs[3] is True
    assert streams[2] == b"\x00"


@pytest.mark.parametrize("version", [2, 3, 4])
def test_p_chain_with_motion_and_subrect(version):
    rng = np.random.default_rng(30 + version)
    enc = ScreenPressorEncoder(version, X, Y)
    f0 = screen_frame(rng)
    streams = [enc.encode_i(f0)]
    golds = [f0]
    # scroll content down by 4 rows → motion blocks (mv candidates include (0,-4)... (0,4))
    f = f0.copy().reshape(Y, X)
    f[4:, :] = f0.reshape(Y, X)[:-4, :]
    f = f.reshape(-1)
    streams.append(enc.encode_p(f))
    golds.append(f)
    # small isolated change → subrect block
    f2 = f.copy().reshape(Y, X)
    f2[17:19, 17:20] = pack_rgb(9, 9, 9)
    f2 = f2.reshape(-1)
    streams.append(enc.encode_p(f2))
    golds.append(f2)
    # repeated identical scroll → motion with repeat-vector bool (v3/v4)
    f3 = f2.copy().reshape(Y, X)
    f3[4:, :] = f2.reshape(Y, X)[:-4, :]
    f3 = f3.reshape(-1)
    streams.append(enc.encode_p(f3))
    golds.append(f3)
    frames, sigs = decode_stream(version, streams)
    for got, want in zip(frames, golds):
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("version", [2, 3, 4])
def test_long_mixed_sequence(version):
    """I + many P frames with random evolution; includes a mid-sequence
    I-frame (table renew) and random-noise rect (raw-byte escapes in ANS)."""
    rng = np.random.default_rng(40 + version)
    enc = ScreenPressorEncoder(version, X, Y)
    f = screen_frame(rng)
    streams = [enc.encode_i(f)]
    golds = [f]
    for t in range(8):
        f = f.copy().reshape(Y, X)
        for _ in range(3):
            x0, y0 = int(rng.integers(0, X - 6)), int(rng.integers(0, Y - 6))
            w, h = int(rng.integers(1, 10)), int(rng.integers(1, 8))
            if t % 3 == 0:  # noise rect → many distinct colors
                f[y0 : y0 + h, x0 : x0 + w] = rng.integers(
                    0, 1 << 24, (min(h, Y - y0), min(w, X - x0)), dtype=np.uint32
                )
            else:
                f[y0 : y0 + h, x0 : x0 + w] = pack_rgb(*rng.integers(0, 256, 3))
        f = f.reshape(-1)
        if t == 4:
            streams.append(enc.encode_i(f))
        else:
            streams.append(enc.encode_p(f))
        golds.append(f)
    frames, _ = decode_stream(version, streams)
    for i, (got, want) in enumerate(zip(frames, golds)):
        np.testing.assert_array_equal(got, want, err_msg=f"frame {i} v{version}")


def test_v2_16bpp_roundtrip():
    """16bpp v2 uses SC_CXSHIFT=0 and the 0xFF00 context constants."""
    rng = np.random.default_rng(7)
    enc = ScreenPressorEncoder(2, X, Y, bpp=16)
    # 5-bit channel content
    f = np.zeros((Y, X), dtype=np.uint32)
    for _ in range(8):
        x0, y0 = int(rng.integers(0, X - 4)), int(rng.integers(0, Y - 4))
        w, h = int(rng.integers(2, 16)), int(rng.integers(2, 12))
        clr = pack_rgb(*(int(v) for v in rng.integers(0, 32, 3)))
        f[y0 : y0 + h, x0 : x0 + w] = clr
    f = f.reshape(-1)
    streams = [enc.encode_i(f)]
    f2 = f.copy().reshape(Y, X)
    f2[10:14, 10:20] = pack_rgb(31, 15, 7)
    f2 = f2.reshape(-1)
    streams.append(enc.encode_p(f2))
    dec = ScreenPressor(X, Y, 16)
    dec.preinit(0)
    d0 = np.zeros(NPIX, dtype=np.uint32)
    dec.decompress_i(streams[0], d0)
    np.testing.assert_array_equal(d0, f)
    d1 = np.zeros(NPIX, dtype=np.uint32)
    res = dec.decompress_p(streams[1], d1)
    np.testing.assert_array_equal(res.data, f2)


def test_significant_changes_insign_band():
    """Changes only in the insignificant block rows are not significant
    (ScreenPressor.hx:346-352; bottom-up storage, Preinit :86-89)."""
    enc = ScreenPressorEncoder(4, X, Y)
    dec = ScreenPressor(X, Y, 24)
    dec.preinit(20)  # first 2 block rows (32 lines... ceil(20/16)=2) insignificant
    f0 = np.full(NPIX, pack_rgb(5, 5, 5), dtype=np.uint32)
    d = np.zeros(NPIX, dtype=np.uint32)
    dec.decompress_i(enc.encode_i(f0), d)
    # change within block row 0 only
    f1 = f0.copy().reshape(Y, X)
    f1[2:6, 2:8] = pack_rgb(99, 1, 1)
    f1 = f1.reshape(-1)
    res = dec.decompress_p(enc.encode_p(f1), np.zeros(NPIX, dtype=np.uint32))
    assert res.significant_changes is False
    # change in block row 2
    f2 = f1.copy().reshape(Y, X)
    f2[33:36, 2:8] = pack_rgb(1, 99, 1)
    f2 = f2.reshape(-1)
    res = dec.decompress_p(enc.encode_p(f2), np.zeros(NPIX, dtype=np.uint32))
    assert res.significant_changes is True


@pytest.mark.parametrize("version", [3, 4])
def test_v3v4_16bpp_roundtrip(version):
    """16bpp with rANS coders: SC_CXSHIFT forced to 2 and the standard
    0xFC00 context constants (initEntro, ScreenPressor.hx:70-73;
    differentConstantsFor16bbp false, EntroCoders.hx:214)."""
    rng = np.random.default_rng(60 + version)
    enc = ScreenPressorEncoder(version, X, Y, bpp=16)
    f = np.zeros((Y, X), dtype=np.uint32)
    for _ in range(8):
        x0, y0 = int(rng.integers(0, X - 4)), int(rng.integers(0, Y - 4))
        f[y0 : y0 + 8, x0 : x0 + 10] = pack_rgb(*(int(v) for v in rng.integers(0, 32, 3)))
    f = f.reshape(-1)
    streams = [enc.encode_i(f)]
    golds = [f]
    for t in range(3):
        f2 = f.copy().reshape(Y, X)
        f2[10 + t : 14 + t, 10:20] = pack_rgb(*(int(v) for v in rng.integers(0, 32, 3)))
        f = f2.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    dec = ScreenPressor(X, Y, 16)
    dec.preinit(0)
    for s, g in zip(streams, golds):
        dst = np.zeros(NPIX, dtype=np.uint32)
        if dec.is_key_frame(s):
            dec.decompress_i(s, dst)
            np.testing.assert_array_equal(dst, g)
        else:
            res = dec.decompress_p(s, dst)
            np.testing.assert_array_equal(res.data, g)


def test_flat_frame_sequences():
    """Flat frames incl. consecutive flats (renew-skip path,
    ScreenPressor.hx:108-115) followed by coded frames."""
    enc = ScreenPressorEncoder(4, X, Y)
    dec = ScreenPressor(X, Y, 24)
    dec.preinit(0)
    s1 = enc.encode_flat(pack_rgb(1, 2, 3))
    s2 = enc.encode_flat(pack_rgb(4, 5, 6))  # consecutive flat: no renew
    f = np.asarray(enc.prev).copy().reshape(Y, X)
    f[3:7, 3:7] = pack_rgb(9, 9, 9)
    f = f.reshape(-1)
    s3 = enc.encode_p(f)
    for s, want in [(s1, np.full(NPIX, pack_rgb(1, 2, 3), np.uint32)),
                    (s2, np.full(NPIX, pack_rgb(4, 5, 6), np.uint32)),
                    (s3, f)]:
        dst = np.zeros(NPIX, dtype=np.uint32)
        if dec.is_key_frame(s):
            dec.decompress_i(s, dst)
            got = dst
        else:
            got = dec.decompress_p(s, dst).data
        np.testing.assert_array_equal(got, want)
