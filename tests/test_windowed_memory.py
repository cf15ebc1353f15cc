"""Windowed-memory loader behavior: eviction outside [keyframe, playhead],
stop/resume, seek re-fetch (DataLoaderAVIIndexed.hx:638-673, 452-470)."""

import numpy as np
import pytest

from jsplayer_tpu.codecs.msvideo1 import from_rgb15, palette_to_u32
from jsplayer_tpu.core.source import MemorySource
from jsplayer_tpu.encode.avi_mux import mux_avi
from jsplayer_tpu.encode.msv1_enc import encode_frame_8, encode_frame_16
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.pipeline.manager import FrameResult
from jsplayer_tpu.player import Player, PlayerConfig

X, Y = 32, 32
NPIX = X * Y


def big_sp_avi(nframes=40, keyevery=5):
    """Frames with noise rects → sizable payloads so a small storage window
    forces eviction."""
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(11)
    frames_px, streams = [], []
    f = np.full((Y, X), pack_rgb(1, 1, 1), dtype=np.uint32)
    for t in range(nframes):
        f = f.copy()
        f[4:28, 4:28] = rng.integers(0, 1 << 24, (24, 24), dtype=np.uint32)
        flat = f.reshape(-1)
        streams.append(enc.encode_i(flat) if t % keyevery == 0
                       else enc.encode_p(flat))
        frames_px.append(flat)
    keys = [i % keyevery == 0 for i in range(nframes)]
    return mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys), frames_px


def drive_until_shown(p, max_ticks=800):
    for _ in range(max_ticks):
        if p.tick() == FrameResult.DECOMPRESSED and p.first_shown:
            return True
    return False


def test_eviction_and_seek_refetch():
    avi, frames_px = big_sp_avi()
    total = len(avi)
    # window smaller than the compressed stream → eviction must kick in
    cfg = PlayerConfig(indexed=True, storage_limit_bytes=total // 4)
    p = Player(cfg)
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    fps = p.manager.fps

    # seek far forward: the loader must evict the head and fetch a new range
    target = 32
    p.seek_time(target / fps + 0.001)
    for _ in range(2000):
        p.tick()
        if p.manager.last_frame_drawn == target:
            break
    assert p.manager.last_frame_drawn == target
    np.testing.assert_array_equal(
        p.manager.buffers[p.manager._last_filled_buffer], frames_px[target])
    loader = p.manager.loader
    # eviction: early frames' compressed data dropped (head outside window)
    assert any(loader.frames[i] is not None and loader.frames[i].data is None
               for i in range(5))

    # seek back: range re-fetch must restore evicted data
    back = 7
    p.seek_time(back / fps + 0.001)
    for _ in range(2000):
        p.tick()
        if p.manager.last_frame_drawn == back:
            break
    assert p.manager.last_frame_drawn == back
    np.testing.assert_array_equal(
        p.manager.buffers[p.manager._last_filled_buffer], frames_px[back])


def test_msv1_8bit_player_end_to_end():
    """8-bit palettized CRAM through the full player path (palette from strf,
    MSVideo1_8bit decode)."""
    rng = np.random.default_rng(12)
    pal_u32 = rng.integers(0, 2 ** 32, 256, dtype=np.uint64).astype(np.uint32)
    pal_bytes = pal_u32.astype("<u4").tobytes()
    idx = np.full((Y, X), 3, dtype=np.uint8)
    frames_idx, streams = [], []
    prev = None
    for t in range(8):
        idx = idx.copy()
        if t % 2 == 1:
            x0 = ((t * 4) % (X - 4)) & ~3
            idx[8:12, x0 : x0 + 4] = int(rng.integers(0, 256))
        flat = idx.reshape(-1)
        streams.append(encode_frame_8(flat, prev, X, Y, terminator=(t % 3 == 0)))
        frames_idx.append(flat)
        prev = flat
    keys = [i == 0 for i in range(8)]
    avi = mux_avi(streams, X, Y, 8, codec="CRAM", keyflags=keys,
                  palette=pal_bytes)
    p = Player(PlayerConfig(indexed=False))
    vi = p.load(MemorySource(avi))
    assert vi.bpp == 8 and vi.palette == pal_bytes
    assert drive_until_shown(p)
    for _ in range(200):
        p.manager.worker()
    fps = p.manager.fps
    p.seek_time(6 / fps + 0.001)
    for _ in range(300):
        p.tick()
        if p.manager.last_frame_drawn == 6:
            break
    np.testing.assert_array_equal(
        p.manager.buffers[p.manager._last_filled_buffer],
        pal_u32[frames_idx[6]])


def test_logging_spans_and_counters():
    from jsplayer_tpu.utils.logging import Log

    log = Log(enabled=True, extra=True)
    with log.span("stage-a"):
        pass
    log.elog("op", t0=0.0)
    log.count("frames", 3)
    log.count("frames")
    assert log.counters["frames"] == 4
    lines = log.flush()
    assert len(lines) == 2 and "stage-a" in lines[0]
    assert log.events == []


def big_sp_avi_with_sound(nframes=140, keyevery=5, mp3_frames=60):
    """big_sp_avi plus an MP3 '01wb' chunk after frame 0."""
    from jsplayer_tpu.encode.mp3_synth import make_frames

    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(11)
    streams = []
    f = np.full((Y, X), pack_rgb(1, 1, 1), dtype=np.uint32)
    for t in range(nframes):
        f = f.copy()
        f[4:28, 4:28] = rng.integers(0, 1 << 24, (24, 24), dtype=np.uint32)
        flat = f.reshape(-1)
        streams.append(enc.encode_i(flat) if t % keyevery == 0
                       else enc.encode_p(flat))
    keys = [i % keyevery == 0 for i in range(nframes)]
    mp3, _, _ = make_frames(mp3_frames)
    return mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys,
                   sound_chunks=[(0, mp3)])


def test_seek_eviction_resets_mp3_parser():
    """Review r5: _clear_memory cleared sound_buffer while Mp3Parser still
    held positional references into it (pending frames + scan position);
    the next finalize read the emptied buffer and raised IndexError out of
    Manager.worker's parse_sound piggyback.  Eviction now resets the
    parser's positional state alongside the buffer.

    The window is a MID-STREAM seek: the parser must hold pending frames
    (a parse ran while data was still arriving) when _initiate_loading
    evicts, and the finalize must come after — so pump by hand instead of
    tick() (whose worker would finalize the audio first)."""
    avi = big_sp_avi_with_sound()
    p = Player(PlayerConfig(indexed=True))
    p.load(MemorySource(avi))
    loader = p.manager.loader
    mp = loader.mp3_parser
    for _ in range(300):
        if loader.is_index_loaded and loader.sound_buffer.bytes_available(0) > 2000:
            break
        loader.pump()
    assert loader.is_index_loaded
    # leave PENDING positional refs: a small budget returns mid-parse
    # before any finalize can drain them
    mp.parse(budget_bytes=420)
    assert mp.frames and not mp.parsing_complete

    # seek ≥100 frames ahead: get_frame's near-window fast path doesn't
    # apply, so _initiate_loading runs _clear_memory with the refs pending
    fps = p.manager.fps
    p.seek_time(130 / fps + 0.001)
    assert loader.reading_start_position > 0  # the eviction path really ran

    # finalizing the audio stream must not read stale positions
    mp.on_data_end()
    loader.parse_sound()  # raised IndexError before the fix
    assert mp.frames == []

    # and playback still reaches the seek target
    for _ in range(2000):
        p.tick()
        if p.manager.last_frame_drawn == 130:
            break
    assert p.manager.last_frame_drawn == 130


def test_corrupt_segment_ix_no_infinite_recursion():
    """Review r5: when _load_ix failed silently (truncated range read or
    corrupt ix payload), _initiate_loading recursed on identical state
    re-issuing the same failing read until RecursionError.  It now retries
    only when a previously-unloaded segment was actually ingested."""
    from jsplayer_tpu.core.loader import DataLoaderAVIIndexed
    from jsplayer_tpu.core.types import CompressedFrame, Index

    class EmptySource:
        def read_range(self, start, end=None):
            return b""  # truncated file: every seek read comes back empty

    ld = DataLoaderAVIIndexed()
    ld.source = EmptySource()
    ld.is_index_loaded = True
    ld.frames = [None] * 20
    seg0 = Index(first_frame=0, last_frame=9, idx_offset=1000,
                 size_in_bytes=64, frames=None)  # never loads (truncated)
    seg1 = Index(first_frame=10, last_frame=19, idx_offset=2000,
                 size_in_bytes=64, frames=[])
    ld.indexes = [seg0, seg1]
    for i in range(10, 20):
        # segment 1 resident but keyless: the keyframe walk descends into
        # segment 0's unloaded territory
        ld.frames[i] = CompressedFrame(key=False, data=None, ix=1)

    ld._initiate_loading(15)  # RecursionError before the fix
    assert ld.requested_frame_num == 15
    # degraded gracefully: target still pending, no stream opened
    assert ld._stream is None


def test_get_frame_changes_negative_index():
    """Review r5: get_frame_changes lacked get_frame's num<0 guard, so -1
    aliased the LAST frame's significance verdict."""
    from jsplayer_tpu.core.loader import DataLoader
    from jsplayer_tpu.core.types import CompressedFrame

    ld = DataLoader()
    ld.frames = [CompressedFrame(key=True, data=b"x", ix=-1)]
    ld.frames[0].significant_changes = True
    assert ld.get_frame_changes(0) is True
    assert ld.get_frame_changes(-1) is None
    assert ld.get_frame_changes(99) is None


def test_ingest_ix_identity_not_equality():
    """Review r5: _ingest_ix recovered the segment number with value
    equality ('in' + '.index'), so ingesting an AUDIO ix whose fields
    mirror an already-loaded video segment ran update_keyframes_info
    against the video segment.  Identity comparison skips it."""
    import struct

    from jsplayer_tpu.core.loader import DataLoader
    from jsplayer_tpu.core.riff import parse_ix
    from jsplayer_tpu.core.types import Index

    def ix_payload(ckid_tag: bytes, n: int) -> bytes:
        b = bytearray(24 + 8 * n)
        struct.pack_into("<I", b, 4, n)
        struct.pack_into("<I", b, 8,
                         int.from_bytes(ckid_tag, "little"))
        struct.pack_into("<II", b, 12, 64, 0)  # base offset
        for i in range(n):
            struct.pack_into("<II", b, 24 + 8 * i, 100 + 50 * i, 40)
        return bytes(b)

    audio_payload = ix_payload(b"01wb", 4)
    _, base, ents = parse_ix(audio_payload)
    ld = DataLoader()
    ld.frames = [None] * 8
    # video segment already loaded with IDENTICAL field values
    vid = Index(first_frame=0, last_frame=3, base_offset=base,
                idx_offset=800, size_in_bytes=0, frames=ents)
    aud = Index(first_frame=0, last_frame=3, base_offset=0,
                idx_offset=800, size_in_bytes=0, frames=None)
    ld.indexes = [vid]
    ld.audio_indexes = [aud]
    assert ld._ingest_ix(audio_payload, 800)
    assert aud.frames is not None  # the audio segment was the one mutated
    # the video keyframe store must be untouched by an audio ingest
    assert all(f is None for f in ld.frames)
