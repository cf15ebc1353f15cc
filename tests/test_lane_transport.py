"""Lane-entropy-coded tile payloads (kernels/lane_transport)."""

import numpy as np
import pytest

from jsplayer_tpu.kernels import lane_transport as lt


def _tiles(seed, S, ncolors=8):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 1 << 24, ncolors).astype(np.uint32)
    return pal[rng.integers(0, ncolors, (S, 256))]


@pytest.mark.parametrize("layout", ["packed", "aligned"])
@pytest.mark.parametrize("S", [1, 7, 64])
def test_roundtrip(layout, S):
    flat = _tiles(S, S)
    pack = lt.encode_tiles(flat, layout=layout)
    got = np.asarray(lt.decode_tiles_device(pack))
    np.testing.assert_array_equal(got, flat)


@pytest.mark.parametrize("layout", ["packed", "aligned"])
def test_serialization_roundtrip(layout):
    flat = _tiles(3, 19)
    blob = lt.pack_to_bytes(lt.encode_tiles(flat, layout=layout))
    got = np.asarray(lt.decode_tiles_device(lt.pack_from_bytes(blob)))
    np.testing.assert_array_equal(got, flat)


def test_packed_compresses_low_entropy():
    flat = _tiles(5, 40, ncolors=3)
    pack = lt.encode_tiles(flat, layout="packed")
    assert pack.wire_bytes() < flat.size * 4 / 3  # well under raw u32


def test_empty_pack():
    pack = lt.encode_tiles(np.zeros((0, 256), np.uint32))
    assert np.asarray(lt.decode_tiles_device(pack)).shape == (0, 256)


def test_malformed_blobs_raise():
    flat = _tiles(1, 4)
    blob = lt.pack_to_bytes(lt.encode_tiles(flat))
    # wrong magic
    with pytest.raises(ValueError):
        lt.pack_from_bytes(b"XXXX" + blob[4:])
    # truncated header / payload
    with pytest.raises(ValueError):
        lt.pack_from_bytes(blob[:8])
    with pytest.raises(ValueError):
        lt.pack_from_bytes(blob[:-10])
    # implausible sizes must not allocate: patch S to 2^31
    import struct
    bad = bytearray(blob)
    struct.pack_into("<I", bad, 5, 1 << 31)
    with pytest.raises(ValueError):
        lt.pack_from_bytes(bytes(bad))
    # zero lanes
    bad = bytearray(blob)
    struct.pack_into("<I", bad, 9, 0)
    with pytest.raises(ValueError):
        lt.pack_from_bytes(bytes(bad))
