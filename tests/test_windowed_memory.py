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
