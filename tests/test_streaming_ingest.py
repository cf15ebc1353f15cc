"""Streaming (windowed-memory) ingest: long-stream mode of SURVEY.md §5.7.

IngestConfig(streaming=True) demuxes on demand and EVICTS consumed
compressed bytes (frame slots nulled, chunk buffers dropped below the
readers' floors) — the batch analogue of the reference's 50 MB window +
clear_memory (DataLoaderAVIIndexed.hx:41, :656-673).  Outputs must be
bit-exact vs the full-residency mode while host residency stays
O(window)."""

import numpy as np

from jsplayer_tpu.core.source import MemorySource
from jsplayer_tpu.encode.avi_mux import mux_avi
from jsplayer_tpu.encode.mp3_synth import make_silence_frames
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.encode.msv1_enc import encode_frame_16
from jsplayer_tpu.codecs.msvideo1 import from_rgb15
from jsplayer_tpu.pipeline.ingest import IngestConfig, VideoIngestPipeline

X, Y = 32, 32


def long_sp_avi(seed, nframes=96, with_sound=False):
    rng = np.random.default_rng(seed)
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(seed, 5, 9), dtype=np.uint32)
    streams = []
    for t in range(nframes):
        f = f.copy()
        if t % 4 == 1:
            f[2:, :] = f[:-2, :].copy()
        if t % 4 != 3:
            f[(t % 6) * 4 : (t % 6) * 4 + 4, 8:24] = pack_rgb(
                *rng.integers(0, 256, 3))
        flat = f.reshape(-1)
        streams.append(enc.encode_i(flat) if t % 16 == 0 else enc.encode_p(flat))
    keys = [t % 16 == 0 for t in range(nframes)]
    sound = None
    if with_sound:
        mp3, n, rate = make_silence_frames(40)
        sound = [(0, mp3)]
    return mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys,
                   sound_chunks=sound)


class SmallChunkSource(MemorySource):
    """Fine-grained network chunks so incremental demux + eviction
    granularity are genuinely exercised (default streaming chunk is 64 KB
    — bigger than these fixtures, which would demux everything on open)."""

    def stream_range(self, start, end=None, chunk_size=1 << 16):
        return super().stream_range(start, end, chunk_size=512)


def _collect(pipe):
    out = []
    for batch in pipe:
        out.append((batch["start_frame"], np.asarray(batch["frames_u32"])))
    return out


def test_streaming_matches_full_residency_sp():
    avis = [long_sp_avi(1), long_sp_avi(2)]
    full = _collect(VideoIngestPipeline(
        [MemorySource(a) for a in avis], IngestConfig(window=8)))
    stream = _collect(VideoIngestPipeline(
        [SmallChunkSource(a) for a in avis],
        IngestConfig(window=8, streaming=True)))
    assert len(full) == len(stream)
    for (s1, f1), (s2, f2) in zip(full, stream):
        assert s1 == s2
        np.testing.assert_array_equal(f1, f2)


def test_streaming_matches_full_residency_msv1():
    rng = np.random.default_rng(3)
    prev = None
    streams = []
    for t in range(40):
        f = np.full(X * Y, from_rgb15(0x0421), dtype=np.uint32)
        f[: X * ((t % 8) + 1)] = from_rgb15(int(rng.integers(0, 0x8000)))
        streams.append(encode_frame_16(f, prev, X, Y))
        prev = f
    avi = mux_avi(streams, X, Y, 16, codec="CRAM",
                  keyflags=[t == 0 for t in range(40)])
    full = _collect(VideoIngestPipeline(
        [MemorySource(avi)], IngestConfig(window=8)))
    stream = _collect(VideoIngestPipeline(
        [SmallChunkSource(avi)], IngestConfig(window=8, streaming=True)))
    for (s1, f1), (s2, f2) in zip(full, stream):
        np.testing.assert_array_equal(f1, f2, err_msg=f"window {s1}")


def test_streaming_residency_stays_bounded():
    """Host residency while iterating stays O(window), far below the
    stream's total compressed size."""
    rng = np.random.default_rng(7)
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(7, 5, 9), dtype=np.uint32)
    streams = []
    for t in range(192):
        f = f.copy()
        # noisy tiles -> each frame carries real compressed mass
        y0, x0 = int(rng.integers(0, Y - 8)), int(rng.integers(0, X - 8))
        f[y0:y0 + 8, x0:x0 + 8] = rng.integers(0, 1 << 24, (8, 8))
        flat = f.reshape(-1)
        streams.append(enc.encode_i(flat) if t % 16 == 0
                       else enc.encode_p(flat))
    avi = mux_avi(streams, X, Y, 24, codec="SPV4",
                  keyflags=[t % 16 == 0 for t in range(192)])
    pipe = VideoIngestPipeline([SmallChunkSource(avi)],
                               IngestConfig(window=8, streaming=True))
    peak = 0
    n_windows = 0
    for batch in pipe:
        peak = max(peak, pipe.readers[0].resident_bytes())
        n_windows += 1
    assert n_windows == 24
    # the stream is ~len(avi) compressed bytes; the window holds a fraction
    assert peak < len(avi) / 4, (peak, len(avi))
    # eviction really ran: early frame slots are nulled
    ld = pipe.readers[0].loader
    assert all(f is None or f.data is None for f in ld.frames[:160])


def test_streaming_audio_pcm_rides_along():
    from jsplayer_tpu.av import pcm as _pcm
    import pytest

    if not _pcm.available():
        pytest.skip("libavcodec unavailable")
    avi = long_sp_avi(5, nframes=48, with_sound=True)
    pipe = VideoIngestPipeline([SmallChunkSource(avi)],
                               IngestConfig(window=8, streaming=True))
    list(pipe)
    a = pipe.audio_pcm()[0]
    assert a is not None
    assert a.samples.shape[0] == 40 * 1152
