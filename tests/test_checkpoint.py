"""Checkpoint/resume: keyframe-granular stream restart (SURVEY.md §5.4) and
per-stream failure quarantine in the native batch decoder (§5.3)."""

import numpy as np
import pytest

from jsplayer_tpu import native
from jsplayer_tpu.core.source import MemorySource
from jsplayer_tpu.encode.avi_mux import mux_avi
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.pipeline.checkpoint import (
    PipelineCheckpoint,
    StreamCursor,
    checkpoint_from_loader,
    resume_manager,
)
from jsplayer_tpu.pipeline.manager import FrameResult
from jsplayer_tpu.player import Player, PlayerConfig

X, Y = 32, 32


def make_avi(nframes=16, keyevery=4):
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(5)
    frames_px, streams = [], []
    f = np.full((Y, X), pack_rgb(9, 9, 9), dtype=np.uint32)
    for t in range(nframes):
        f = f.copy()
        f[(t % 6) * 4 : (t % 6) * 4 + 4, 4:12] = pack_rgb(*rng.integers(0, 256, 3))
        flat = f.reshape(-1)
        if t % keyevery == 0:
            streams.append(enc.encode_i(flat))
        else:
            streams.append(enc.encode_p(flat))
        frames_px.append(flat)
    keys = [i % keyevery == 0 for i in range(nframes)]
    return mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys), frames_px


def test_checkpoint_roundtrip_json(tmp_path):
    cp = PipelineCheckpoint(
        cursors=[StreamCursor("s0", 10, 8, 12345, gop_index=2),
                 StreamCursor("s1", 3, 0, 0)],
        width=X, height=Y, codec="screenpressor",
    )
    p = tmp_path / "cp.json"
    cp.save(str(p))
    back = PipelineCheckpoint.load(str(p))
    assert back.cursors[0].keyframe == 8
    assert back.cursors[0].byte_offset == 12345
    assert back.cursors[1].stream_id == "s1"
    assert back.width == X and back.codec == "screenpressor"


def test_manager_checkpoint_resume():
    avi, frames_px = make_avi()
    p = Player(PlayerConfig(indexed=True))
    p.load(MemorySource(avi))
    for _ in range(500):
        if p.tick() == FrameResult.DECOMPRESSED and p.first_shown:
            break
    # advance decode into the middle of GOP 2
    fps = p.manager.fps
    p.seek_time(10 / fps + 0.001)
    for _ in range(300):
        p.tick()
        if p.manager.last_frame_drawn == 10:
            break
    assert p.manager.last_frame_drawn == 10

    cur = checkpoint_from_loader("s0", p.manager.loader, p.manager)
    # decode-ahead may have advanced past the playhead; the checkpoint's
    # restart point is the GOP boundary at/below wherever it reached
    assert cur.keyframe % 4 == 0
    assert cur.keyframe <= cur.next_frame
    assert cur.next_frame >= 10

    # fresh player resumes from the checkpoint and reproduces frame 10
    p2 = Player(PlayerConfig(indexed=True))
    p2.load(MemorySource(avi))
    for _ in range(500):
        if p2.tick() == FrameResult.DECOMPRESSED and p2.first_shown:
            break
    resume_manager(p2.manager, cur)
    assert p2.manager.next_frame_to_decode == cur.keyframe
    p2.seek_time(10 / fps + 0.001)
    for _ in range(300):
        p2.tick()
        if p2.manager.last_frame_drawn == 10:
            break
    np.testing.assert_array_equal(
        p2.manager.buffers[p2.manager._last_filled_buffer], frames_px[10])


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_batch_decode_quarantines_bad_stream():
    """A stream with an invalid motion vector is quarantined (frames frozen
    at the last good state); healthy streams are unaffected (SURVEY.md §5.3)."""
    enc = ScreenPressorEncoder(4, X, Y)
    f0 = np.full(X * Y, pack_rgb(1, 2, 3), dtype=np.uint32)
    good = [enc.encode_i(f0)]
    f1 = f0.copy().reshape(Y, X)
    f1[4:8, 4:8] = pack_rgb(9, 9, 9)
    good.append(enc.encode_p(f1.reshape(-1)))
    good.append(good[1])  # no-change (same pixels) → harmless duplicate

    # bad stream: corrupt the P-frame payload so decode errors out
    bad = [good[0], good[1][:1] + b"\xff" * 40, good[1]]
    good3 = [good[0], good[1], good[1]]

    out = native.native_sp_decode_streams([good3, bad], X, Y)
    # stream 0 decoded fine
    assert out["changed"][0, 0] and out["changed"][0, 1]
    # stream 1: either decodes-to-something or is quarantined — but it must
    # never corrupt stream 0 and frames stay well-formed arrays
    np.testing.assert_array_equal(
        out["payload"][0, 1].reshape(-1), f1.reshape(-1))
    assert out["payload"].shape == (2, 3, Y, X)


def test_ingest_resume_via_frame_range():
    """Batch-pipeline resume: a StreamCursor's keyframe restart point maps
    straight onto IngestConfig.frame_range — re-decoding from the cursor
    reproduces the remaining frames bit-exactly (the keyframe is the
    durable boundary, SURVEY.md §5.4)."""
    import numpy as np

    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
    from jsplayer_tpu.pipeline.checkpoint import (PipelineCheckpoint,
                                                  StreamCursor)
    from jsplayer_tpu.pipeline.ingest import IngestConfig, VideoIngestPipeline

    X = Y = 32
    rng = np.random.default_rng(6)
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(6, 6, 6), dtype=np.uint32)
    streams, golds = [], []
    for t in range(14):
        f = f.copy()
        f[(t % 7) * 4 : (t % 7) * 4 + 4, 2:30] = pack_rgb(
            *rng.integers(0, 256, 3))
        flat = f.reshape(-1)
        streams.append(enc.encode_i(flat) if t % 5 == 0 else enc.encode_p(flat))
        golds.append(flat)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4",
                  keyflags=[t % 5 == 0 for t in range(14)])

    # "crash" after frame 7 → cursor at next_frame=8, keyframe 5
    ckpt = PipelineCheckpoint(cursors=[
        StreamCursor(stream_id="s0", next_frame=8, keyframe=5, byte_offset=0)
    ], width=X, height=Y, codec="screenpressor")
    blob = ckpt.to_json()
    restored = PipelineCheckpoint.from_json(blob)
    cur = restored.cursors[0]

    pipe = VideoIngestPipeline(
        [MemorySource(avi)],
        IngestConfig(window=4,
                     frame_range=(cur.next_frame, len(streams))))
    seen = {}
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        for t in range(fr.shape[1]):
            gi = batch["start_frame"] + t
            if gi < len(golds):
                seen[gi] = fr[0, t].reshape(-1)
    assert min(seen) == cur.keyframe  # rewound to the durable boundary
    for gi in range(cur.next_frame, len(streams)):
        np.testing.assert_array_equal(seen[gi], golds[gi],
                                      err_msg=f"frame {gi}")
