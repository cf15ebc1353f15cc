"""MP3 → PCM audio tensors (av/pcm.py).

The reference decodes audio by handing MP3 sections to WebAudio
(AudioTrack.hx:54-65) and chaining the buffers by start time; av/pcm does
the same through the system codec backend and emits ONE aligned float32
timeline.  These tests assert the PTS model — 1152 samples per MP3 frame
(MP3Parser.hx:206) — end-to-end: per-fragment decode, overlap-collapsing
track assembly, and A/V alignment through VideoIngestPipeline.
"""

import numpy as np
import pytest

from jsplayer_tpu.av import pcm
from jsplayer_tpu.av.audio_track import AudioTrack
from jsplayer_tpu.av.mp3 import Mp3Parser, FRAMES_IN_SECTION
from jsplayer_tpu.core.chunkbuffer import ChunkBuffer
from jsplayer_tpu.encode.mp3_synth import make_silence_frames
from jsplayer_tpu.encode.avi_mux import mux_avi
from jsplayer_tpu.encode.msv1_enc import encode_frame_16
from jsplayer_tpu.codecs.msvideo1 import from_rgb15

pytestmark = pytest.mark.skipif(
    not pcm.available(), reason="system libavcodec not available")


@pytest.mark.parametrize("stereo", [False, True])
def test_silence_fragment_decodes_to_pts_model(stereo):
    data, n, rate = make_silence_frames(10, stereo=stereo)
    samples, sr = pcm.decode_fragment(data)
    assert sr == rate == 44100
    assert samples.shape == (n * 1152, 2 if stereo else 1)
    assert samples.dtype == np.float32
    assert np.abs(samples).max() == 0.0


def test_other_sample_rates():
    data, n, rate = make_silence_frames(4, sampling_idx=1)  # 48 kHz
    samples, sr = pcm.decode_fragment(data)
    assert sr == rate == 48000
    assert samples.shape[0] == n * 1152


def test_track_assembly_collapses_section_overlap():
    """Sections overlap by 4 frames (MP3Parser.hx:203-229); on the aligned
    timeline the overlap must collapse, leaving exactly nframes*1152."""
    nframes = FRAMES_IN_SECTION * 2 + 50  # 3 short sections, 2 overlaps
    data, _, rate = make_silence_frames(nframes)
    buf = ChunkBuffer()
    buf.add_chunk(data)
    p = Mp3Parser(buf)
    p.parse()
    p.on_data_end()
    p.parse()
    assert len(p.sections) >= 3
    track = AudioTrack()
    for s in p.sections:
        track.add_section(s)
    aligned = pcm.decode_track(track)
    assert aligned is not None
    assert aligned.sample_rate == rate
    assert aligned.samples.shape[0] == nframes * 1152
    # watermark and PCM timeline agree
    assert aligned.duration == pytest.approx(track.time_loaded, abs=1e-6)


def test_empty_track_returns_none():
    assert pcm.decode_track(AudioTrack()) is None


def test_av_ingest_alignment():
    """Full A/V AVI → VideoIngestPipeline → video tensors + aligned PCM.
    Audio PTS model: k-th MP3 frame starts at k*1152/sr; video frame t at
    t/fps — slice_for_frames must hand each video window its exact span."""
    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.pipeline.ingest import VideoIngestPipeline, IngestConfig

    W, H, fps = 32, 24, 15.0
    rng = np.random.default_rng(5)
    prev = None
    pkts = []
    for i in range(8):
        f = np.full(W * H, from_rgb15(0x0421), dtype=np.uint32)
        f[: W * (i + 1)] = from_rgb15(int(rng.integers(0, 0x8000)))
        pkts.append(encode_frame_16(f, prev, W, H))
        prev = f
    # 8 video frames @15fps = 0.533 s → 25 MP3 frames @44.1 kHz = 0.653 s
    mp3, n_mp3, rate = make_silence_frames(25)
    half = len(mp3) // 2
    avi = mux_avi(pkts, W, H, 16, codec="CRAM", fps=fps,
                  keyflags=[i == 0 for i in range(8)],
                  sound_chunks=[(0, mp3[:half]), (4, mp3[half:])])

    pipe = VideoIngestPipeline([MemorySource(avi)],
                               IngestConfig(window=4))
    windows = list(pipe)
    assert len(windows) == 2
    aligned = pipe.audio_pcm()
    assert len(aligned) == 1 and aligned[0] is not None
    a = aligned[0]
    assert a.sample_rate == rate
    assert a.samples.shape[0] == n_mp3 * 1152
    # cache: second call returns the same objects
    assert pipe.audio_pcm()[0] is a
    # A/V alignment: the first 4-frame video window spans 4/fps seconds
    sl = a.slice_for_frames(0, 4, fps)
    assert sl.shape[0] == round(4 / fps * rate)
    # second window: full span too (audio outlives the 8 video frames)
    sl2 = a.slice_for_frames(4, 4, fps)
    assert sl2.shape[0] == round(8 / fps * rate) - round(4 / fps * rate)
    # a window past the audio tail clips to empty at the boundary
    assert a.slice_for_frames(40, 4, fps).shape[0] == 0
    # audio outlives video (time_loaded watermark covers the video span)
    assert pipe.audio_tracks[0].time_loaded >= 8 / fps


def test_player_audio_pcm_surface():
    """Player.audio_pcm/audio_slice: the decoded-audio surface next to the
    PlaybackPlan (the WebAudio role, AudioTrack.hx:54-65)."""
    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.player import Player, PlayerConfig

    W, H, fps = 32, 24, 15.0
    prev = None
    pkts = []
    for i in range(6):
        f = np.full(W * H, from_rgb15(0x0421), dtype=np.uint32)
        f[: W * (i + 1)] = from_rgb15(0x7C00)
        pkts.append(encode_frame_16(f, prev, W, H))
        prev = f
    mp3, n_mp3, rate = make_silence_frames(20)
    avi = mux_avi(pkts, W, H, 16, codec="CRAM", fps=fps,
                  keyflags=[i == 0 for i in range(6)],
                  sound_chunks=[(0, mp3)])
    p = Player(PlayerConfig(indexed=False))
    p.load(MemorySource(avi))
    # drive a few ticks so the worker drains the MP3 side
    for _ in range(200):
        p.tick()
    a = p.audio_pcm()
    assert a is not None and a.sample_rate == rate
    assert a.samples.shape[0] == n_mp3 * 1152
    assert p.audio_pcm() is a  # cached per load
    sl = p.audio_slice(0.0, 0.25)
    assert sl.shape[0] == round(0.25 * rate)
    # reload resets the cache
    p.load(MemorySource(avi))
    for _ in range(200):
        p.tick()
    assert p.audio_pcm() is not a
