"""AVI demux tests: mux fixtures with encode/avi_mux, demux with core/riff,
including incremental (chunk-at-a-time) delivery and mid-file restart."""

import numpy as np

from jsplayer_tpu.core.chunkbuffer import ChunkBuffer
from jsplayer_tpu.core.riff import AviDemuxer, parse_idx1
from jsplayer_tpu.core.types import CodecType
from jsplayer_tpu.encode.avi_mux import mux_avi, mux_avi_opendml


def _demux_all(data: bytes, chunk_size: int = 997):
    buf = ChunkBuffer()
    frames, sounds, infos, indxs, ixs = [], [], [], [], []
    d = AviDemuxer(
        buf,
        on_frame=frames.append,
        on_video_info=infos.append,
        on_sound=sounds.append,
        on_indx=indxs.append,
        on_ix=lambda p, pos: ixs.append((p, pos)),
    )
    d.start()
    for i in range(0, len(data), chunk_size):
        buf.add_chunk(data[i : i + chunk_size])
        d.pump()
    d.signal_eof()
    d.pump()
    return frames, sounds, infos, indxs, ixs, d


def test_simple_avi_roundtrip():
    payloads = [bytes([i] * (10 + i)) for i in range(7)]
    avi = mux_avi(payloads, 64, 48, 16, codec="CRAM", fps=10.0)
    frames, sounds, infos, indxs, ixs, d = _demux_all(avi)
    assert frames == payloads
    assert len(infos) == 1
    vi = infos[0]
    assert (vi.width, vi.height, vi.bpp) == (64, 48, 16)
    assert vi.codec == CodecType.MSVC16
    assert vi.nframes == 7
    assert abs(vi.fps - 10.0) < 0.01
    assert d.finished


def test_sound_chunks_and_odd_sizes():
    payloads = [b"x" * 11, b"y" * 20]  # odd size exercises padding
    snd = [(0, b"MP3FRAMEDATA!"), (1, b"MOREAUDIO")]
    avi = mux_avi(payloads, 16, 16, 16, codec="CRAM", sound_chunks=snd)
    frames, sounds, infos, *_ = _demux_all(avi, chunk_size=13)
    assert frames == payloads
    assert sounds == [b"MP3FRAMEDATA!", b"MOREAUDIO"]


def test_screenpressor_fourcc():
    avi = mux_avi([b"\x12345"], 32, 32, 24, codec="SPV3")
    _, _, infos, *_ = _demux_all(avi)
    assert infos[0].codec == CodecType.SCREENPRESSOR
    assert infos[0].bpp == 24


def test_palette_8bit():
    pal = bytes(range(256)) * 4  # 1024 bytes of palette
    avi = mux_avi([b"abc"], 16, 16, 8, codec="CRAM", palette=pal)
    _, _, infos, *_ = _demux_all(avi)
    assert infos[0].codec == CodecType.MSVC8
    assert infos[0].palette == pal


def test_idx1_parse():
    payloads = [bytes([i]) * 8 for i in range(5)]
    keys = [True, False, False, True, False]
    avi = mux_avi(payloads, 16, 16, 16, codec="CRAM", keyflags=keys)
    # locate idx1 chunk manually
    pos = avi.find(b"idx1")
    size = int.from_bytes(avi[pos + 4 : pos + 8], "little")
    video, audio, first_off = parse_idx1(avi[pos + 8 : pos + 8 + size])
    assert [e.key for e in video] == keys
    assert audio == []
    # offsets point at chunk headers relative to 'movi' fourcc
    movi_fourcc_pos = avi.find(b"movi")
    for e, payload in zip(video, payloads):
        hdr = avi[movi_fourcc_pos + e.off : movi_fourcc_pos + e.off + 8]
        assert hdr[:4] == b"00dc"
        assert int.from_bytes(hdr[4:8], "little") == len(payload)
        assert e.size == len(payload)


def test_opendml_indx_and_ix():
    payloads = [bytes([i % 251]) * (5 + i % 17) for i in range(23)]
    keys = [i % 5 == 0 for i in range(23)]
    avi = mux_avi_opendml(payloads, 16, 16, 16, codec="CRAM",
                          keyflags=keys, frames_per_ix=7)
    frames, _, infos, indxs, ixs, _ = _demux_all(avi, chunk_size=61)
    assert frames == payloads
    assert len(indxs) == 1
    sup = indxs[0]
    assert sup.super_entries is not None
    assert sum(e.duration for e in sup.super_entries) == 23
    # each super entry points at an ix00 chunk in the file
    for e in sup.super_entries:
        assert avi[e.off : e.off + 4] == b"ix00"
    # inline ix chunks were also surfaced during demux
    assert len(ixs) == len(sup.super_entries)
    # ix payload parses into entries pointing at real frame chunks
    from jsplayer_tpu.core.riff import parse_ix

    covered = 0
    for payload, chunk_pos in ixs:
        ckid, base, entries = parse_ix(payload)
        for ent in entries:
            hdr_pos = base + ent.off
            assert avi[hdr_pos : hdr_pos + 4] == b"00dc"
            assert ent.size == int.from_bytes(avi[hdr_pos + 4 : hdr_pos + 8], "little")
            assert keys[covered] == ent.key
            covered += 1
    assert covered == 23


def test_start_from_middle():
    """Mid-file restart: feed only the movi tail starting at a chunk header
    (avi_part grammar, AVIParser.hx:178,202-207)."""
    payloads = [bytes([i]) * 10 for i in range(6)]
    avi = mux_avi(payloads, 16, 16, 16, codec="CRAM")
    # find the 3rd frame chunk and restart there
    pos = avi.find(b"00dc")
    for _ in range(2):
        pos = avi.find(b"00dc", pos + 1)
    buf = ChunkBuffer()
    frames = []
    d = AviDemuxer(buf, on_frame=frames.append)
    d.start_from_middle()
    tail = avi[pos:]
    for i in range(0, len(tail), 7):
        buf.add_chunk(tail[i : i + 7])
        d.pump()
    d.signal_eof()
    d.pump()
    # gets frames 2..5, then runs into idx1 (skipped) and EOF
    assert frames == payloads[2:]


def test_zero_length_frames_and_truncation():
    """Zero-length 00dc chunks (no-change placeholders) demux as empty
    payloads; a truncated tail finishes quietly with the frames parsed so far
    (the reference's resumable-parser behavior on EOF)."""
    payloads = [b"abc", b"", b"defgh", b"", b"xy"]
    avi = mux_avi(payloads, 16, 16, 16, codec="CRAM")
    frames, _, infos, *_ = _demux_all(avi, chunk_size=7)
    assert frames == payloads
    # truncate mid-movi: demuxer must surface only complete chunks
    cut = avi.find(b"defgh") + 2
    buf = ChunkBuffer()
    got = []
    d = AviDemuxer(buf, on_frame=got.append)
    d.start()
    buf.add_chunk(avi[:cut])
    d.pump()
    d.signal_eof()
    d.pump()
    assert got == payloads[:2]
    assert d.finished


def test_player_skips_zero_length_frames():
    """Zero-length frames decode as 'no change' end-to-end (the loader's
    placeholder-skip path, DataLoaderAVISeq.add_frame:34-39)."""
    import numpy as np
    from jsplayer_tpu.codecs.msvideo1 import from_rgb15
    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.encode.msv1_enc import encode_frame_16
    from jsplayer_tpu.pipeline.manager import FrameResult
    from jsplayer_tpu.player import Player, PlayerConfig

    X2 = Y2 = 32
    f0 = np.full(X2 * Y2, from_rgb15(0x1234), dtype=np.uint32)
    f1 = f0.copy()
    f1[100:110] = from_rgb15(0x4321)
    streams = [encode_frame_16(f0, None, X2, Y2), b"",
               encode_frame_16(f1, f0, X2, Y2)]
    avi = mux_avi(streams, X2, Y2, 16, codec="CRAM",
                  keyflags=[True, False, False])
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    for _ in range(300):
        if p.tick() == FrameResult.DECOMPRESSED and p.first_shown:
            break
    for _ in range(100):
        p.manager.worker()
    fps = p.manager.fps
    # frame 1 (empty) must show frame 0's pixels
    p.seek_time(1 / fps + 0.001)
    for _ in range(200):
        p.tick()
        if p.manager.last_frame_drawn >= 1:
            break
    m = p.manager
    np.testing.assert_array_equal(m.buffers[m._last_filled_buffer], f0)
    p.seek_time(2 / fps + 0.001)
    for _ in range(200):
        p.tick()
        if p.manager.last_frame_drawn == 2:
            break
    np.testing.assert_array_equal(m.buffers[m._last_filled_buffer], f1)


def test_demux_garbage_robustness():
    """Random garbage and hostile chunk sizes must neither hang nor crash the
    demuxer (it may simply find nothing)."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        junk = rng.integers(0, 256, int(rng.integers(10, 4000))).astype("u1").tobytes()
        buf = ChunkBuffer()
        frames = []
        d = AviDemuxer(buf, on_frame=frames.append)
        d.start()
        for i in range(0, len(junk), 113):
            buf.add_chunk(junk[i : i + 113])
            d.pump()
        d.signal_eof()
        d.pump()
        assert d.finished or not d.active
    # a RIFF header with an absurd size field
    evil = b"RIFF" + (0xFFFFFFF0).to_bytes(4, "little") + b"AVI " + b"\x00" * 64
    buf = ChunkBuffer()
    d = AviDemuxer(buf, on_frame=lambda b: None)
    d.start()
    buf.add_chunk(evil)
    for _ in range(10):
        d.pump()
    d.signal_eof()
    d.pump()
    assert d.finished


def test_parse_ix_64bit_base_offset():
    """OpenDML ix## with a >4 GB qwBaseOffset decodes exactly (Int64.hx
    parity: JS needed 53-bit float tricks; Python ints are exact)."""
    import struct
    from jsplayer_tpu.core.riff import parse_ix

    base = 0x1_2345_6789A  # > 4 GB
    body = struct.pack("<HBBII", 2, 0, 0x01, 2, struct.unpack(
        "<I", b"00dc")[0])
    body += struct.pack("<II", base & 0xFFFFFFFF, base >> 32)
    body += b"\x00" * 4
    body += struct.pack("<II", 1000 + 8, 500)                 # keyframe
    body += struct.pack("<II", 2000 + 8, 300 | 0x80000000)    # non-key
    ckid, got_base, got = parse_ix(body)
    assert got_base == base
    assert [(e.off, e.size, e.key) for e in got] == [
        (1000, 500, True), (2000, 300, False)]


def test_parse_ix_truncated_raises_valueerror():
    """Review r5: parse_ix didn't validate nentries against the payload, so
    struct.error escaped the synchronous _load_ix seek path (the demuxer
    path wraps it; the seek path documented failure mode is ValueError)."""
    import struct

    import pytest

    from jsplayer_tpu.core.riff import parse_ix

    with pytest.raises(ValueError):
        parse_ix(b"\x00" * 10)  # shorter than the 24-byte header
    payload = bytearray(24 + 8)  # room for ONE entry
    struct.pack_into("<I", payload, 4, 100)  # claims a hundred
    with pytest.raises(ValueError):
        parse_ix(bytes(payload))
    # a consistent payload still parses
    struct.pack_into("<I", payload, 4, 1)
    struct.pack_into("<II", payload, 24, 108, 40)
    ckid, base, ents = parse_ix(bytes(payload))
    assert len(ents) == 1 and ents[0].off == 100 and ents[0].key


def test_negative_microsec_per_frame_defaults():
    """Review r5: avih is unpacked signed; a corrupt negative
    dwMicroSecPerFrame produced a negative fps that silently broke every
    time↔frame mapping.  It now takes the ==0 default (AVIParser.hx:59)."""
    import struct

    from jsplayer_tpu.core.riff import parse_avih

    payload = struct.pack("<14I", 0xFFFFFFFF, 0, 0, 0x10, 10, 0, 1, 0,
                          32, 32, 0, 0, 0, 0)
    vi = parse_avih(payload, file_size=1000)
    assert vi.fps > 0 and abs(vi.fps - 15.0) < 0.1
