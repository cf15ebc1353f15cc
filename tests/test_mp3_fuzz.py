"""MP3 demux robustness fuzz: garbage, bit flips, truncation, resync.

The reference's MP3Parser never validates payloads — it scans for sync words
and resyncs byte-by-byte on anything invalid (MP3Parser.hx:86-102), so ANY
byte stream must parse to completion without raising, hanging, or emitting
nonsense sections.  This is the same malformed-input discipline applied to
the video demux (tests/test_malformed.py) — the MP3 scanner was the one
input surface without it.

CI runs a reduced campaign; the full sweep (10k trials, fresh seeds) is run
per round via

    python -m tests.test_mp3_fuzz <trials> <seed0>

Invariants per trial:
  * parse() terminates with no exception (wall-clock guard);
  * scan position never exceeds the stream;
  * every emitted section has >=1 frame, nonempty data sized exactly per
    the PTS frame model, and a sample rate from the MPEG table
    (MP3Parser.hx:35 with the v2/v2.5 halvings, :129-133);
  * sections survive AudioTrack's overlap merge with a monotone gapless
    watermark (AudioTrack.hx:121-124) and play() never raises.
"""

import time

import numpy as np
import pytest

from jsplayer_tpu.av.audio_track import AudioTrack
from jsplayer_tpu.av.mp3 import Mp3Parser
from jsplayer_tpu.core.chunkbuffer import ChunkBuffer
from jsplayer_tpu.encode.mp3_synth import make_frames

_VALID_RATES = {44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000}


def _drive(data: bytes, rng: np.random.Generator) -> None:
    """Feed `data` in random chunk splits with random parse budgets."""
    buf = ChunkBuffer()
    parser = Mp3Parser(buf)
    t0 = time.monotonic()
    pos = 0
    while pos < len(data):
        n = int(rng.integers(1, 4096))
        buf.add_chunk(data[pos:pos + n])
        pos += n
        parser.parse(int(rng.integers(1, 8192))
                     if rng.integers(0, 2) else None)
        assert time.monotonic() - t0 < 30.0, "parse wall-clock blowup"
    parser.on_data_end()
    parser.parse()
    assert parser.parsing_complete
    assert parser.position <= buf.total_size

    track = AudioTrack()
    for s in parser.sections:
        assert s.nframes >= 1
        assert len(s.data) > 0
        assert s.sample_rate in _VALID_RATES
        assert s.duration > 0
        track.add_section(s)
    # watermark is a gapless prefix: <= last section end, never negative
    assert track.time_loaded >= 0.0
    if track.sections:
        assert track.time_loaded <= max(f.end_time for f in track.sections) + 1e-9
        track.play(float(rng.uniform(0, track.time_loaded + 1.0)))


def _make_stream_v(version_bits: int, bitrate_idx: int, sampling_idx: int,
                   n: int) -> bytes:
    """Frame stream for any MPEG version (make_header is MPEG1-only)."""
    import struct

    from jsplayer_tpu.av.mp3 import frame_size, is_valid_header

    h = (0x7FF << 21) | (version_bits << 19) | (1 << 17) | (1 << 16)
    h |= (bitrate_idx << 12) | (sampling_idx << 10)
    assert is_valid_header(h)
    size, _ = frame_size(h)
    frame = struct.pack(">I", h) + b"\xaa" * (size - 4)
    return frame * n


def run_campaign(trials: int, seed0: int, verbose: bool = False) -> int:
    bases = [
        make_frames(400)[0],            # MPEG1 128k/44.1
        _make_stream_v(3, 14, 1, 300),  # MPEG1 320k/48
        _make_stream_v(3, 1, 2, 600),   # MPEG1 32k/32
        _make_stream_v(2, 8, 0, 500),   # MPEG2 64k/22.05
        _make_stream_v(0, 2, 1, 500),   # MPEG2.5 8k/12
    ]
    kinds = 5
    for trial in range(trials):
        rng = np.random.default_rng(seed0 + trial)
        kind = trial % kinds
        valid = bases[(trial // kinds) % len(bases)]
        if kind == 0:  # pure random bytes
            data = rng.integers(0, 256, int(rng.integers(0, 50000)),
                                dtype=np.uint8).tobytes()
        elif kind == 1:  # valid stream with bit flips
            a = np.frombuffer(valid, dtype=np.uint8).copy()
            for _ in range(int(rng.integers(1, 33))):
                a[int(rng.integers(0, a.size))] ^= np.uint8(
                    1 << int(rng.integers(0, 8)))
            data = a.tobytes()
        elif kind == 2:  # truncation
            data = valid[:int(rng.integers(0, len(valid)))]
        elif kind == 3:  # garbage + valid + garbage (resync scan)
            g1 = rng.integers(0, 256, int(rng.integers(0, 3000)),
                              dtype=np.uint8).tobytes()
            g2 = rng.integers(0, 256, int(rng.integers(0, 3000)),
                              dtype=np.uint8).tobytes()
            data = g1 + valid[:int(rng.integers(0, len(valid)))] + g2
        else:  # sync-word-rich adversarial bytes (many near-valid headers)
            n = int(rng.integers(4, 20000))
            a = rng.integers(0, 256, n, dtype=np.uint8)
            a[rng.integers(0, n, n // 3)] = 0xFF
            a[rng.integers(0, n, n // 4)] = 0xFB
            data = a.tobytes()
        _drive(data, rng)
        if verbose and (trial + 1) % 200 == 0:
            print(f"{trial + 1}/{trials} clean", flush=True)
    return trials


@pytest.mark.parametrize("seed0", [1000, 2000])
def test_mp3_fuzz_ci(seed0):
    run_campaign(40, seed0)


def test_mp3_valid_control():
    """Control: the un-mutated stream parses to full coverage."""
    valid, n, rate = make_frames(400)
    rng = np.random.default_rng(0)
    buf = ChunkBuffer()
    parser = Mp3Parser(buf)
    buf.add_chunk(valid)
    parser.on_data_end()
    parser.parse()
    assert sum(s.nframes for s in parser.sections) >= n  # overlap duplicates
    track = AudioTrack()
    for s in parser.sections:
        track.add_section(s)
    assert track.time_loaded == pytest.approx(n * 1152 / rate, abs=1e-6)


if __name__ == "__main__":
    import sys

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    done = run_campaign(trials, seed0, verbose=True)
    print(f"mp3 fuzz campaign clean: {done} trials from seed {seed0}")
