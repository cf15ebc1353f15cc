"""Audio path: MP3 frame scan, section grouping/PTS, AudioTrack merge and
time_loaded watermark."""

import numpy as np
import pytest

from jsplayer_tpu.av.audio_track import AudioTrack, Fragment
from jsplayer_tpu.av.mp3 import (
    FRAMES_IN_SECTION,
    Mp3Parser,
    frame_size,
    is_valid_header,
)
from jsplayer_tpu.core.chunkbuffer import ChunkBuffer
from jsplayer_tpu.encode.mp3_synth import make_frames, make_header, with_garbage


def feed(parser, buf, data, chunk=97):
    for i in range(0, len(data), chunk):
        buf.add_chunk(data[i : i + chunk])
        parser.parse()


def test_header_validation():
    assert is_valid_header(make_header())
    assert not is_valid_header(0)
    assert not is_valid_header(make_header(bitrate_idx=15))
    size, rate = frame_size(make_header())
    assert rate == 44100
    assert size == int(144 * 128000 / 44100)


def test_section_grouping_and_pts():
    stream, n, rate = make_frames(FRAMES_IN_SECTION * 2 + 50)
    buf = ChunkBuffer()
    p = Mp3Parser(buf)
    feed(p, buf, stream)
    p.on_data_end()
    p.parse()
    # two short sections at 200 frames each + final short (incl. overlaps)
    shorts = [s for s in p.sections if s.nframes <= FRAMES_IN_SECTION + 8]
    assert len(shorts) >= 2
    fd = 1152 / rate
    assert shorts[0].start_time == 0.0
    # second short starts after 196 processed frames (4-frame overlap)
    assert abs(shorts[1].start_time - fd * (FRAMES_IN_SECTION - 4)) < 1e-9
    # a final "last" long section exists covering everything
    lasts = [s for s in p.sections if s.last]
    assert len(lasts) == 1
    assert abs(lasts[0].start_time + lasts[0].duration - fd * n) < 1e-6


def test_resync_over_garbage():
    stream, n, rate = make_frames(10)
    data = with_garbage(stream)
    buf = ChunkBuffer()
    p = Mp3Parser(buf)
    feed(p, buf, data, chunk=13)
    p.on_data_end()
    p.parse()
    assert sum(1 for _ in p.frames) + p.frames_processed >= 0
    last = [s for s in p.sections if s.last]
    assert last and last[0].nframes == 10


def test_audio_track_merge_and_watermark():
    at = AudioTrack()
    # out-of-order, overlapping fragments (short + long sections)
    at.add_fragment(0.0, b"a", False, duration=5.0)
    assert at.time_loaded == pytest.approx(5.0)
    at.add_fragment(4.9, b"b", False, duration=5.0)
    assert at.time_loaded == pytest.approx(9.9)
    # gap: watermark must not advance past it
    at.add_fragment(20.0, b"c", False, duration=5.0)
    assert at.time_loaded == pytest.approx(9.9)
    # long section covering the first two → fully-dominated fragment dropped.
    # Reference quirk preserved (AudioTrack.hx:121-124): the watermark loop
    # assigns (not maxes) end times, so the kept-but-covered 4.9–9.9 fragment
    # pulls the watermark back to 9.9 even though 0–12 is covered.
    at.add_fragment(0.0, b"L", False, duration=12.0)
    assert at.time_loaded == pytest.approx(9.9)
    assert len(at.sections) == 3
    assert at.sections[0].duration == pytest.approx(12.0)


def test_audio_track_play_plan():
    at = AudioTrack()
    at.add_fragment(0.0, b"x" * 10, False, duration=5.0)
    at.add_fragment(5.0, b"y" * 10, False, duration=5.0)
    plan = at.play(6.2)
    assert plan is not None
    assert plan.fragment.start_time == pytest.approx(5.0)
    assert plan.offset == pytest.approx(1.2)
    assert plan.next_start is None
    plan0 = at.play(0.5)
    assert plan0.next_start == pytest.approx(5.0)
    assert at.play(99.0) is None
    at.clear()
    assert at.sections == [] and at.time_loaded == 0.0


def test_mp3_to_audio_track_integration():
    stream, n, rate = make_frames(FRAMES_IN_SECTION + 30)
    buf = ChunkBuffer()
    at = AudioTrack()
    p = Mp3Parser(buf, section_handler=None)
    feed(p, buf, stream)
    p.on_data_end()
    p.parse()
    for s in p.sections:
        if not s.last:  # mirror reference: last long replaces the tail
            at.add_section(s)
    total = n * 1152 / rate
    # watermark reaches at least through the first short section
    assert at.time_loaded >= (FRAMES_IN_SECTION - 4) * 1152 / rate - 1e-6
    assert at.time_loaded <= total + 1e-6


@pytest.mark.parametrize("bitrate_idx,sampling_idx", [(9, 0), (14, 1), (1, 2)])
def test_frame_size_variants(bitrate_idx, sampling_idx):
    """Bitrate/sampling table coverage (MP3Parser.hx:124-142)."""
    from jsplayer_tpu.encode.mp3_synth import make_frames

    stream, n, rate = make_frames(8, bitrate_idx=bitrate_idx,
                                  sampling_idx=sampling_idx)
    buf = ChunkBuffer()
    p = Mp3Parser(buf)
    buf.add_chunk(stream)
    p.parse()
    p.on_data_end()
    p.parse()
    lasts = [s for s in p.sections if s.last]
    assert lasts and lasts[0].nframes == 8
    assert lasts[0].sample_rate == rate


def test_padding_bit_changes_size():
    from jsplayer_tpu.av.mp3 import frame_size
    from jsplayer_tpu.encode.mp3_synth import make_header

    s0, r0 = frame_size(make_header(padding=0))
    s1, r1 = frame_size(make_header(padding=1))
    assert s1 == s0 + 1 and r0 == r1


def test_mixed_frame_sizes_stream():
    """Frames with different bitrates in one stream parse individually."""
    from jsplayer_tpu.encode.mp3_synth import make_frames

    a, na, ra = make_frames(3, bitrate_idx=9)
    b, nb_, rb = make_frames(3, bitrate_idx=12)
    buf = ChunkBuffer()
    p = Mp3Parser(buf)
    buf.add_chunk(a + b)
    p.parse()
    p.on_data_end()
    p.parse()
    lasts = [s for s in p.sections if s.last]
    assert lasts and lasts[0].nframes == 6
