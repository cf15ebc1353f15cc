"""End-to-end: mux AVI fixtures → Player (seq + indexed loaders) → play,
seek, frame-step, skip-stills, audio gating."""

import numpy as np
import pytest

from jsplayer_tpu.codecs.msvideo1 import from_rgb15
from jsplayer_tpu.core.source import MemorySource
from jsplayer_tpu.encode.avi_mux import mux_avi, mux_avi_opendml
from jsplayer_tpu.encode.msv1_enc import encode_frame_16
from jsplayer_tpu.encode.mp3_synth import make_frames
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.pipeline.manager import FrameResult
from jsplayer_tpu.player import Player, PlayerConfig

X, Y = 32, 32
NPIX = X * Y


def make_msv1_avi(nframes=12, fps=10.0, with_sound=False):
    rng = np.random.default_rng(0)
    frames_px = []
    streams = []
    prev = None
    f = np.full((Y, X), from_rgb15(0x1111), dtype=np.uint32)
    for t in range(nframes):
        f = f.copy()
        if t % 3 != 2:  # every 3rd frame unchanged (tests skip-stills)
            x0 = (t * 4) % (X - 4) & ~3
            f[4:8, x0 : x0 + 4] = from_rgb15(int(rng.integers(0, 0x8000)))
        flat = f.reshape(-1)
        streams.append(encode_frame_16(flat, prev, X, Y))
        frames_px.append(flat)
        prev = flat
    keys = [i == 0 for i in range(nframes)]
    sound = None
    if with_sound:
        mp3, n, rate = make_frames(300)
        # split across a few 01wb chunks at the start
        sz = len(mp3) // 3
        sound = [(0, mp3[:sz]), (1, mp3[sz : 2 * sz]), (2, mp3[2 * sz :])]
    avi = mux_avi(streams, X, Y, 16, codec="CRAM", fps=fps, keyflags=keys,
                  sound_chunks=sound)
    return avi, frames_px


def make_sp_avi(nframes=12, fps=10.0, version=4, keyevery=4):
    enc = ScreenPressorEncoder(version, X, Y)
    rng = np.random.default_rng(1)
    frames_px, streams = [], []
    f = np.full((Y, X), pack_rgb(9, 9, 9), dtype=np.uint32)
    for t in range(nframes):
        f = f.copy()
        if t % 3 != 2:
            f[(t % 6) * 4 : (t % 6) * 4 + 4, 4:12] = pack_rgb(
                *rng.integers(0, 256, 3))
        flat = f.reshape(-1)
        if t % keyevery == 0:
            streams.append(enc.encode_i(flat))
        else:
            streams.append(enc.encode_p(flat))
        frames_px.append(flat)
    keys = [i % keyevery == 0 for i in range(nframes)]
    avi = mux_avi(streams, X, Y, 24, codec="SPV3", fps=fps, keyflags=keys)
    return avi, frames_px


def drive_until_shown(p, max_ticks=500):
    for _ in range(max_ticks):
        if p.tick() == FrameResult.DECOMPRESSED and p.first_shown:
            return True
    return False


@pytest.mark.parametrize("indexed", [False, True])
def test_load_and_first_frame_msv1(indexed):
    avi, frames_px = make_msv1_avi()
    p = Player(PlayerConfig(indexed=indexed))
    vi = p.load(MemorySource(avi))
    assert (vi.width, vi.height, vi.bpp) == (X, Y, 16)
    assert vi.nframes == len(frames_px)
    assert drive_until_shown(p)
    m = p.manager
    buf = m.buffers[m._last_filled_buffer]
    np.testing.assert_array_equal(buf, frames_px[0])


@pytest.mark.parametrize("indexed", [False, True])
def test_playthrough_sp(indexed):
    avi, frames_px = make_sp_avi()
    p = Player(PlayerConfig(indexed=indexed))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    # present every frame via a fake clock
    fake_t = [0.0]
    p._clock = lambda: fake_t[0]
    p.play()
    fps = p.manager.fps
    shown = {}
    for t in range(len(frames_px)):
        fake_t[0] = t / fps + 0.001
        for _ in range(200):
            res = p.tick()
            if res == FrameResult.DECOMPRESSED:
                break
            # resume if audio gating auto-paused (no audio here but safe)
            if not p.playing:
                p.play()
        m = p.manager
        if m._last_filled_buffer is not None:
            shown[m.last_frame_drawn] = m.buffers[m._last_filled_buffer].copy()
    for i, px in enumerate(frames_px):
        if i in shown:
            np.testing.assert_array_equal(shown[i], px, err_msg=f"frame {i}")
    assert len(shown) >= len(frames_px) - 1  # identical frames may share


@pytest.mark.parametrize("indexed", [False, True])
def test_seek_and_step(indexed):
    avi, frames_px = make_sp_avi(nframes=16, keyevery=4)
    p = Player(PlayerConfig(indexed=indexed))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    # seek to 10th frame
    fps = p.manager.fps
    target = 10
    p.seek_time(target / fps + 0.001)
    for _ in range(300):
        p.tick()
        if p.manager.last_frame_drawn == target:
            break
    assert p.manager.last_frame_drawn == target
    np.testing.assert_array_equal(
        p.manager.buffers[p.manager._last_filled_buffer], frames_px[target])
    # step one frame forward
    p.step_frame(forward=True)
    for _ in range(300):
        p.tick()
        if p.manager.last_frame_drawn == target + 1:
            break
    assert p.manager.last_frame_drawn == target + 1
    # step to previous keyframe
    p.step_key(forward=False)
    for _ in range(300):
        p.tick()
        if p.manager.last_frame_drawn == 8:
            break
    assert p.manager.last_frame_drawn == 8


def test_skip_stills_insignificant_band_quirk():
    """Y=32 < INSIGNIFICANT_LINES=36: every block row is insignificant
    (Manager.hx:61 applies the 36-line band regardless of height), so no
    frame is 'significant' and skip-stills falls through to the last frame."""
    avi, frames_px = make_msv1_avi(nframes=12)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    for _ in range(300):
        p.manager.worker()
    loader = p.manager.loader
    kinds = [loader.get_frame_changes(i) for i in range(len(frames_px))]
    assert kinds[1] is False and kinds[5] is False  # band swallows changes
    p.manager.frame_of_interest = 1
    t = p.manager.skip_stills(first_call=True)
    assert t is not None
    assert int(round(t * p.manager.fps)) == len(frames_px) - 1


def test_skip_stills_finds_significant_change():
    """Tall frames with changes above the 36-line band are significant and
    skip-stills lands on them (SkipStills, Manager.hx:289-317)."""
    Y2 = 64
    rng = np.random.default_rng(3)
    streams, prev = [], None
    changed_at = {4, 9}
    for t in range(12):
        if prev is None:
            f = np.full((Y2, X), from_rgb15(0x0421), dtype=np.uint32)
        else:
            f = prev.reshape(Y2, X).copy()
            if t in changed_at:  # rows 40+ are above the insignificant band
                f[44:48, 8:16] = from_rgb15(int(rng.integers(0, 0x8000)))
        flat = f.reshape(-1)
        streams.append(encode_frame_16(flat, prev, X, Y2))
        prev = flat
    avi = mux_avi(streams, X, Y2, 16, codec="CRAM", fps=10.0,
                  keyflags=[i == 0 for i in range(12)])
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    for _ in range(400):
        p.manager.worker()
    loader = p.manager.loader
    kinds = [loader.get_frame_changes(i) for i in range(12)]
    assert kinds[4] is True and kinds[9] is True
    assert kinds[2] is False
    p.manager.frame_of_interest = 0
    t = p.manager.skip_stills(first_call=True)
    assert t is not None
    assert int(round(t * p.manager.fps)) == 4


def test_audio_gating_pause():
    avi, frames_px = make_msv1_avi(nframes=12, with_sound=True)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    for _ in range(100):
        p.manager.worker()
    p.manager.loader.parse_sound()
    audio_t = p.manager.loaded_audio_time()
    assert audio_t > 0
    # jump the clock past the audio watermark → tick auto-pauses
    fake_t = [0.0]
    p._clock = lambda: fake_t[0]
    p.play()
    fake_t[0] = p.manager.total_time() + 10
    p.tick()
    assert not p.playing
    # end-of-stream pause is NOT an audio-gating pause: the player must
    # stay paused on later ticks, not flap via the auto-resume path
    assert not p._auto_paused
    p.tick()
    assert not p.playing


def test_audio_gating_autoresume():
    """An audio-gated pause resumes automatically once the audio watermark
    passes the paused position (the reference keeps ticking while gated,
    Main.hx:1082-1091) — the resume must happen even though tick() starts
    from the paused state."""
    avi, _fp = make_msv1_avi(nframes=12, with_sound=True)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    m = p.manager
    fake_t = [0.0]
    p._clock = lambda: fake_t[0]
    watermark = [1.0 / m.fps]  # audio loaded only up to one frame
    m.loaded_audio_time = lambda: watermark[0]
    p.play()
    fake_t[0] = 3.0 / m.fps  # inside the video, past the audio watermark
    assert fake_t[0] < m.total_time()
    p.tick()
    assert not p.playing and p._auto_paused
    # still gated: audio hasn't caught up yet
    p.tick()
    assert not p.playing and p._auto_paused
    # audio catches up → the next tick resumes playback by itself
    watermark[0] = m.total_time()
    p.tick()
    assert p.playing and not p._auto_paused


def test_explicit_pause_not_overridden_by_autoresume():
    """A user pause AFTER an audio-gated pause must stick: pause() clears
    the gating flag, so the auto-resume path never restarts playback the
    user explicitly stopped (review finding on the auto-resume fix)."""
    avi, _fp = make_msv1_avi(nframes=12, with_sound=True)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    m = p.manager
    fake_t = [0.0]
    p._clock = lambda: fake_t[0]
    watermark = [1.0 / m.fps]
    m.loaded_audio_time = lambda: watermark[0]
    p.play()
    fake_t[0] = 3.0 / m.fps
    p.tick()
    assert not p.playing and p._auto_paused  # audio-gated
    p.pause()  # the user explicitly pauses while gated
    assert not p._auto_paused
    watermark[0] = m.total_time()  # audio fully loads
    p.tick()
    assert not p.playing  # still paused: no auto-resume after user pause


def test_load_over_live_player_resets_playback_state():
    """spload over a playing/gated player starts the new stream fresh:
    no inherited clock, gating flag, or first-frame latch (Main.js_load
    stops playback before re-opening)."""
    avi_a, _ = make_msv1_avi(nframes=12, with_sound=True)
    avi_b, _ = make_msv1_avi(nframes=8)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi_a))
    assert drive_until_shown(p)
    fake_t = [0.0]
    p._clock = lambda: fake_t[0]
    p.play()
    p._auto_paused = True  # simulate a gated pause state
    p.playing = False
    p.start_pos = 0.37
    p.load(MemorySource(avi_b))
    assert not p.playing and not p._auto_paused
    assert p.start_pos == 0.0 and not p.first_shown
    assert drive_until_shown(p)  # the new stream plays from frame 0


def test_opendml_indexed_load():
    """Indexed loader over an OpenDML file with ix00 segments."""
    avi, frames_px = make_sp_avi(nframes=12, keyevery=4)
    # rebuild as OpenDML layout
    enc_frames = []
    # reuse the same encoded streams by re-demuxing the idx1 file
    from jsplayer_tpu.core.chunkbuffer import ChunkBuffer
    from jsplayer_tpu.core.riff import AviDemuxer

    buf = ChunkBuffer()
    frames = []
    d = AviDemuxer(buf, on_frame=frames.append)
    d.start()
    buf.add_chunk(avi)
    d.pump()
    keys = [i % 4 == 0 for i in range(len(frames))]
    avi2 = mux_avi_opendml(frames, X, Y, 24, codec="SPV3", keyflags=keys,
                           frames_per_ix=5)
    p = Player(PlayerConfig(indexed=True))
    p.load(MemorySource(avi2))
    assert drive_until_shown(p)
    assert p.manager.loader.is_index_loaded
    # all ix segments ingested → keyframe flags present
    loader = p.manager.loader
    got_keys = [loader.frames[i] is not None and loader.frames[i].key
                for i in range(len(frames))]
    assert got_keys == keys


def test_autoskip_jumps_over_stills():
    """autoskip mode: playback jumps past known-unchanged frames
    (auto_skip, Main.hx:1083-1091)."""
    Y2 = 64
    rng = np.random.default_rng(8)
    streams, prev = [], None
    changed_at = {5}
    for t in range(10):
        if prev is None:
            f = np.full((Y2, X), from_rgb15(0x0421), dtype=np.uint32)
        else:
            f = prev.reshape(Y2, X).copy()
            if t in changed_at:
                f[44:48, 8:16] = from_rgb15(int(rng.integers(0, 0x8000)))
        flat = f.reshape(-1)
        streams.append(encode_frame_16(flat, prev, X, Y2))
        prev = flat
    avi = mux_avi(streams, X, Y2, 16, codec="CRAM", fps=10.0,
                  keyflags=[i == 0 for i in range(10)])
    p = Player(PlayerConfig(indexed=False, autoskip=True))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    for _ in range(400):
        p.manager.worker()
    fake_t = [0.0]
    p._clock = lambda: fake_t[0]
    p.play()
    fps = p.manager.fps
    fake_t[0] = 1 / fps + 0.001  # frame 1: unchanged → autoskip fires
    for _ in range(50):
        p.tick()
        if p.manager.last_frame_drawn >= 5:
            break
    assert p.manager.last_frame_drawn >= 5


def test_thumbnail_and_resize():
    """-Dwait thumbnail mode (Main.hx:266-276) + spresize aspect-fit
    (Main.hx:1327-1338)."""
    avi, golds = make_sp_avi(7)
    p = Player(PlayerConfig(indexed=False))
    vi = p.load(MemorySource(avi))
    rgba = np.asarray(p.thumbnail())
    # ABGR-opaque conversion of frame 0 (Manager.fill_bitmap_data parity)
    c = golds[0].astype(np.uint32)
    want = (0xFF000000 | ((c & 0xFF) << 16) | (c & 0xFF00)
            | ((c >> 16) & 0xFF)).astype(np.uint32)
    np.testing.assert_array_equal(rgba, want)
    assert p.resize(vi.width * 3, vi.height * 2) == (vi.width * 2, vi.height * 2)
    assert p.resize(vi.width, vi.height * 9) == (vi.width, vi.height)


def test_logging_spans_and_counters():
    """utils.logging: timed spans, counters, and the capped event log
    (Logging.hx FastLog/TimedMsg parity, SURVEY §5.1/§5.5)."""
    from jsplayer_tpu.utils.logging import LOG, Log

    log = Log()
    with log.span("demux"):
        log.count("frames", 3)
    log.count("frames", 2)
    assert log.counters["frames"] == 5
    assert any(m.msg == "demux" for m in log.events)
    assert all(m.t1 >= m.t0 for m in log.events)
    # cap parity: FastLog auto-disables after 4000 entries (Logging.hx:26-30)
    for i in range(5000):
        log.fast_log(f"e{i}")
    assert len(log.events) <= 4001


@pytest.mark.parametrize("frac", [0.15, 0.5, 0.9])
def test_player_truncated_file(frac):
    """Playback of a truncated AVI: no crash, frames up to the cut decode
    exactly (progressive-streaming parity — the reference plays while
    bytes arrive)."""
    avi, golds = make_sp_avi(12)
    cut = avi[: int(len(avi) * frac)]
    p = Player(PlayerConfig(indexed=False))
    try:
        vi = p.load(MemorySource(cut))
    except Exception:
        return  # header itself truncated: a load error is acceptable
    shown = 0
    for _ in range(2000):
        res = p.tick()
        if res == FrameResult.DECOMPRESSED and p.first_shown:
            shown += 1
            break
    if shown:
        np.testing.assert_array_equal(
            p.manager.buffers[p.manager._last_filled_buffer], golds[0])


def test_loaded_range_and_fractions():
    """Loaded-range bar surfaces (Main.hx:1114-1115 from
    LoadedFractionStart/End)."""
    avi, golds = make_sp_avi(8)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    drive_until_shown(p)
    lo, hi = p.loaded_range()
    assert 0.0 <= lo <= hi <= 1.0
    assert hi > 0.9  # fully loaded memory source


def test_timing_probes():
    """Seek-latency + keyframe-decode-time probes mirror the reference's two
    wall-clock pairs (Main.hx:1213-1226 "seek done in t=…";
    ScreenPressor.hx:127,287-288 DecompressI duration)."""
    from jsplayer_tpu.utils.logging import LOG

    avi, _ = make_sp_avi(nframes=16, keyevery=4)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    assert p.manager.last_iframe_decode_ms is not None  # keyframe 0 decoded
    assert p.manager.last_iframe_decode_ms >= 0.0
    LOG.events.clear()
    p.seek_time(10 / p.manager.fps + 0.001)
    for _ in range(300):
        p.tick()
        if p.manager.last_frame_drawn == 10:
            break
    assert p.manager.last_seek_ms is not None
    assert p.manager._seek_t0 is None  # probe closed exactly once
    assert any(e.msg == "seek done" for e in LOG.events)


@pytest.mark.parametrize("indexed", [False, True])
def test_paused_seek_to_undecoded_region_presents(indexed):
    """A paused seek into a region the loader hasn't demuxed yet must still
    present the target once data arrives: the NOT_READY branch registers
    the deferred fill (the reference re-polls from its always-running
    timers; review-found — the seek was silently dropped and the old frame
    stayed up forever)."""
    avi, frames_px = make_sp_avi(nframes=40, keyevery=8)
    p = Player(PlayerConfig(indexed=indexed))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    before = p.manager.last_seek_ms
    target = 37  # far past the decode-ahead ring
    p.seek_time(target / p.manager.fps + 0.001)
    if p.manager.last_frame_drawn != target:
        # the NOTSOON resolution must not pollute the latency probe with a
        # ~0 ms reading for a seek that never presented (Main.hx:1220-1226)
        assert p.manager.last_seek_ms == before
    for _ in range(5000):
        if p.manager.last_frame_drawn == target:
            break
        p.tick()
    assert p.manager.last_frame_drawn == target
    np.testing.assert_array_equal(
        p.manager.buffers[p.manager._last_filled_buffer], frames_px[target])


def test_hostile_seek_times_clamp():
    """Fuzz-found (seed 271828): seek_time(-1) negative-indexed the
    loader's frame list (IndexError past the head, silent tail aliasing
    within it) and NaN died in int().  Hostile times clamp to the valid
    range instead — the page's /control seek must never 500."""
    avi, frames_px = make_sp_avi(nframes=12, keyevery=4)
    p = Player()
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    fps = p.manager.fps
    for t in (-1.0, -1e18, float("nan")):
        p.seek_time(t)
        for _ in range(200):
            p.tick()
            if p.manager.last_frame_drawn == 0:
                break
        assert p.manager.last_frame_drawn == 0, t
        np.testing.assert_array_equal(
            p.manager.buffers[p.manager._last_filled_buffer], frames_px[0])
    # far past the end clamps to the last frame
    p.seek_time(1e18)
    last = len(frames_px) - 1
    for _ in range(400):
        p.tick()
        if p.manager.last_frame_drawn == last:
            break
    assert p.manager.last_frame_drawn == last
    # loader-level guard independent of the manager clamp
    assert p.manager.loader.get_frame(-3).status.name == "NOT_READY"


def test_long_gop_seek_no_recursion_error():
    """Review r5: worker() ended with _force_work(10) whose worker() calls
    re-entered _force_work — pure linear recursion (~2 stack frames per
    decoded frame), so a seek spanning ~500+ P-frames past its keyframe
    blew the default recursion limit.  The reference guards the burst with
    its `e != null` timer-event check (Manager.hx:545-546); `external`
    mirrors that."""
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(9, 9, 9), dtype=np.uint32).reshape(-1)
    streams = [enc.encode_i(f)] + [enc.encode_p(f) for _ in range(600)]
    keys = [i == 0 for i in range(len(streams))]
    avi = mux_avi(streams, X, Y, 24, codec="SPV4", fps=30.0, keyflags=keys)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    fps = p.manager.fps
    target = 590
    p.seek_time(target / fps + 0.001)  # raised RecursionError here
    for _ in range(400):
        p.tick()
        if p.manager.last_frame_drawn == target:
            break
    assert p.manager.last_frame_drawn == target
    assert p.manager.seek_cb is None  # seek completed


def test_error_keyframe_settles_significance():
    """Review r5: decompress_i ERROR advanced next_frame_to_decode past the
    frame but left significant_changes None — find_possible_change then
    returned ('unknown', k) with k already behind the decode cursor, and
    skip_stills' outer loop spun on it forever.  An undecodable keyframe now
    settles as a significant change (conservative: autoskip stops there)."""
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(5, 5, 5), dtype=np.uint32).reshape(-1)
    f2 = f.copy()
    f2[: 8 * X] = pack_rgb(200, 30, 30)  # frames after the bad key change
    streams = [enc.encode_i(f), enc.encode_p(f), enc.encode_p(f),
               enc.encode_p(f),
               b"\x07garbage-keyframe",  # head&0xF==7: unknown frame type
               enc.encode_p(f2), enc.encode_p(f2)]
    keys = [True, False, False, False, True, False, False]
    avi = mux_avi(streams, X, Y, 24, codec="SPV4", fps=10.0, keyflags=keys)
    # indexed: idx1 keyflags mark frame 4 as a KEY frame (the seq loader
    # would sniff the garbage head as non-key and route it to decompress_p)
    p = Player(PlayerConfig(indexed=True))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)
    m = p.manager
    for _ in range(200):
        m.worker()
        if m.next_frame_to_decode > 4:
            break
    assert m.next_frame_to_decode > 4
    frm = m.loader.frames[4]
    assert frm.significant_changes is True  # settled, not None
    # skip_stills terminates promptly with the change position
    m.frame_of_interest = 0
    t = m.skip_stills(first_call=True)
    assert t is not None and abs(t - 4 / m.fps) < 1e-9


def test_refill_same_frame_tracks_buffer():
    """Review r5: _fill's "already drawn" short-circuit skipped updating
    _last_filled_buffer, so re-presenting the SAME frame number after its
    original buffer had been trashed and reused showed the reused buffer's
    pixels.  The reference's short-circuit is safe only because it draws
    into a persistent shared bitmap (Manager.hx:325-390)."""
    # 40 distinct noise frames, keys at 0 and 20
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(77)
    frames_px, streams = [], []
    for t in range(40):
        f = rng.integers(0, 1 << 24, (Y, X), dtype=np.uint32).reshape(-1)
        streams.append(enc.encode_i(f) if t % 20 == 0 else enc.encode_p(f))
        frames_px.append(f)
    keys = [i % 20 == 0 for i in range(40)]
    avi = mux_avi(streams, X, Y, 24, codec="SPV4", fps=10.0, keyflags=keys)
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    assert drive_until_shown(p)  # frame 0 drawn; last_frame_drawn stays 0
    m = p.manager
    fps = m.fps
    hit_reuse = False
    for T in (33, 34, 35, 36):
        stale = m._last_filled_buffer
        # decode ahead toward frame T WITHOUT presenting it (stop before T
        # decodes so delayed_fill never fires): all ring buffers get reused
        # for frames ≥ 20 while last_frame_drawn remains 0
        if m.get_decompressed_frame(T / fps + 0.001, False) != \
                FrameResult.DECOMPRESSED:
            for _ in range(600):
                if m.next_frame_to_decode >= T:
                    break
                m.worker(external=False)
        # re-present frame 0: redecodes from key 0 into SOME buffer, then
        # the fill hits the "already drawn" short-circuit (foi == lfd == 0)
        m.delayed_fill = None
        m.get_decompressed_frame(0.001, False)
        for _ in range(100):
            if any(not b.trash and b.first <= 0 <= b.last for b in m.bufs):
                break
            m.worker(external=False)
        assert m.get_decompressed_frame(0.001, False) == \
            FrameResult.DECOMPRESSED
        nb = next(i for i, b in enumerate(m.bufs)
                  if not b.trash and b.first <= 0 <= b.last)
        if nb != stale:
            hit_reuse = True  # the cycle that exposes a stale pointer
        np.testing.assert_array_equal(
            m.buffers[m._last_filled_buffer], frames_px[0],
            err_msg=f"stale buffer shown after reuse (T={T})")
    assert hit_reuse  # at least one cycle redecoded into a different slot
