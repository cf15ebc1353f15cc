import numpy as np
import pytest

from jsplayer_tpu.core.chunkbuffer import ChunkBuffer


def test_basic_append_read():
    cb = ChunkBuffer()
    cb.add_chunk(b"hello ")
    cb.add_chunk(b"world")
    assert cb.total_size == 11
    assert cb.bytes_available(0) == 11
    assert cb.bytes_available(6) == 5
    assert cb.read(0, 5) == b"hello"
    assert cb.read(6, 5) == b"world"


def test_straddling_read():
    cb = ChunkBuffer()
    cb.add_chunk(b"abc")
    cb.add_chunk(b"def")
    cb.add_chunk(b"ghi")
    assert cb.read(1, 7) == b"bcdefgh"
    assert cb.read(0, 9) == b"abcdefghi"


def test_read_ints():
    cb = ChunkBuffer()
    cb.add_chunk(bytes([0x78, 0x56]))
    cb.add_chunk(bytes([0x34, 0x12]))
    assert cb.read_u32le(0) == 0x12345678
    assert cb.read_u32be(0) == 0x78563412


def test_out_of_range():
    cb = ChunkBuffer()
    cb.add_chunk(b"abc")
    with pytest.raises(IndexError):
        cb.read(1, 3)


def test_empty_chunk_ignored():
    cb = ChunkBuffer()
    cb.add_chunk(b"")
    cb.add_chunk(b"xy")
    assert cb.read(0, 2) == b"xy"


def test_drop_before():
    cb = ChunkBuffer()
    cb.add_chunk(b"aaaa")
    cb.add_chunk(b"bbbb")
    cb.add_chunk(b"cccc")
    cb.drop_before(5)  # only chunk 0 is fully below 5
    assert cb.read(4, 8) == b"bbbbcccc"
    assert cb.bytes_available(4) == 8
    with pytest.raises(IndexError):
        cb.read(0, 4)
    # appends still line up after dropping
    cb.add_chunk(b"dd")
    assert cb.read(12, 2) == b"dd"


def test_random_fuzz():
    rng = np.random.default_rng(0)
    ref = bytearray()
    cb = ChunkBuffer()
    for _ in range(50):
        n = int(rng.integers(0, 100))
        chunk = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        ref += chunk
        cb.add_chunk(chunk)
    for _ in range(200):
        if len(ref) == 0:
            break
        pos = int(rng.integers(0, len(ref)))
        ln = int(rng.integers(0, len(ref) - pos + 1))
        assert cb.read(pos, ln) == bytes(ref[pos : pos + ln])
