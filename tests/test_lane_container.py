"""Lane-container end-to-end: device entropy + recon for re-encoded streams.

BASELINE config 4 (VERDICT round-2 item 1): an SP AVI is transcoded to the
lane-container format (transcode.transcode_to_lane), whose payload rides
interleaved rANS lanes; ingest with sp_device_path='lane' then runs BOTH
entropy decode and reconstruction on device (kernels/lane_recon), and the
decoded frames must be bit-exact against the oracle decode of the original
AVI — single stream, batched, and sharded over the 8-device dp mesh.
"""

import numpy as np
import pytest

from jsplayer_tpu.codecs import lane_format
from jsplayer_tpu.codecs.screenpressor import ScreenPressor
from jsplayer_tpu.core.source import MemorySource
from jsplayer_tpu.encode.avi_mux import mux_avi
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.pipeline.ingest import IngestConfig, VideoIngestPipeline
from jsplayer_tpu.transcode import transcode_to_lane


def make_stream(seed: int, X: int, Y: int, T: int, version: int = 4,
                key_every: int = 0):
    """Encoded frames + golden pixels: I-frame, paints, a scroll (motion),
    stills — the full command mix."""
    rng = np.random.default_rng(seed)
    enc = ScreenPressorEncoder(version, X, Y)
    f = np.full((Y, X), pack_rgb(20 + seed, 40, 60), dtype=np.uint32)
    f[4 : Y // 2, 4 : X // 2] = pack_rgb(*rng.integers(0, 256, 3))
    streams, gold, keys = [], [], []
    for t in range(T):
        isk = t == 0 or (key_every and t % key_every == 0)
        if not isk:
            kind = t % 4
            if kind == 1:  # paint
                y0 = int(rng.integers(0, Y - 8))
                x0 = int(rng.integers(0, X - 12))
                f[y0 : y0 + 7, x0 : x0 + 11] = pack_rgb(
                    *rng.integers(0, 256, 3))
            elif kind == 2:  # scroll → motion blocks
                f[8:, :] = f[:-8, :].copy()
            # kind 0/3: still
        if isk:
            enc = ScreenPressorEncoder(version, X, Y)
            data = enc.encode_i(f.reshape(-1).copy())
        else:
            data = enc.encode_p(f.reshape(-1).copy())
        streams.append(data)
        gold.append(f.reshape(-1).copy())
        keys.append(isk)
    return streams, gold, keys


def make_avi(seed, X, Y, T, **kw):
    streams, gold, keys = make_stream(seed, X, Y, T, **kw)
    return mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys), gold


def collect_frames(pipe, B, nframes, Y, X):
    out = [[] for _ in range(B)]
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        for b in range(B):
            for t in range(fr.shape[1]):
                if batch["start_frame"] + t < nframes:
                    out[b].append(fr[b, t].reshape(-1))
    return out


def test_lane_roundtrip_single_stream():
    X, Y, T = 64, 48, 10
    avi, gold = make_avi(0, X, Y, T)
    cont = transcode_to_lane(avi, window=4, K=2)
    assert lane_format.is_lane_container(cont)
    pipe = VideoIngestPipeline([MemorySource(cont)],
                               IngestConfig(sp_device_path="lane"))
    assert pipe.info.width == X and pipe.info.nframes == T
    got = collect_frames(pipe, 1, T, Y, X)[0]
    assert len(got) == T
    for t in range(T):
        np.testing.assert_array_equal(
            got[t] & 0x00FFFFFF, gold[t] & 0x00FFFFFF, err_msg=f"frame {t}")


def test_lane_roundtrip_batch():
    X, Y, T = 64, 48, 8
    avis, golds = zip(*[make_avi(s, X, Y, T) for s in range(2)])
    conts = [transcode_to_lane(a, window=4, K=2) for a in avis]
    pipe = VideoIngestPipeline([MemorySource(c) for c in conts],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 2, T, Y, X)
    for b in range(2):
        for t in range(T):
            np.testing.assert_array_equal(
                got[b][t] & 0x00FFFFFF, golds[b][t] & 0x00FFFFFF,
                err_msg=f"stream {b} frame {t}")


def test_lane_sharded_mesh():
    from jsplayer_tpu.pipeline.mesh import make_mesh

    X, Y, T = 48, 32, 6
    mesh = make_mesh(dp=8, gop=1)
    avis, golds = zip(*[make_avi(s, X, Y, T, key_every=3) for s in range(8)])
    conts = [transcode_to_lane(a, window=3, K=2) for a in avis]
    pipe = VideoIngestPipeline(
        [MemorySource(c) for c in conts],
        IngestConfig(sp_device_path="lane", mesh=mesh))
    got = collect_frames(pipe, 8, T, Y, X)
    for b in range(8):
        for t in range(T):
            np.testing.assert_array_equal(
                got[b][t] & 0x00FFFFFF, golds[b][t] & 0x00FFFFFF,
                err_msg=f"stream {b} frame {t}")


def test_lane_still_elision():
    """Lane windows with still_elision: stills never enter the device scan;
    the flat-rows + outmap contract reconstructs the exact timeline."""
    X, Y, T = 64, 48, 12
    avis, golds = zip(*[make_avi(s, X, Y, T, key_every=6) for s in range(2)])
    conts = [transcode_to_lane(a, window=6, K=2) for a in avis]
    pipe = VideoIngestPipeline(
        [MemorySource(c) for c in conts],
        IngestConfig(sp_device_path="lane", still_elision=True))
    carry = [np.zeros(Y * X, np.uint32) for _ in range(2)]
    seen = 0
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        outmap = np.asarray(batch["outmap"])
        for b in range(2):
            for t in range(outmap.shape[1]):
                gi = batch["start_frame"] + t
                if gi >= T:
                    break
                if outmap[b, t] >= 0:
                    got = fr[outmap[b, t]].reshape(-1)
                    carry[b] = got
                else:
                    got = carry[b]
                np.testing.assert_array_equal(
                    got, golds[b][gi] & 0x00FFFFFF, err_msg=f"b={b} t={gi}")
                seen += 1
    assert seen == 2 * T


def test_lane_model_input_parity():
    """The fused model epilogue over lane-decoded frames matches the kmv
    pipeline's on the same content."""
    X, Y, T = 64, 48, 6
    avi, gold = make_avi(3, X, Y, T)
    cont = transcode_to_lane(avi, window=6, K=2)
    lane = VideoIngestPipeline(
        [MemorySource(cont)],
        IngestConfig(sp_device_path="lane", emit_model_input=True))
    kmv = VideoIngestPipeline(
        [MemorySource(avi)],
        IngestConfig(window=6, sp_device_path="kmv", emit_model_input=True))
    (lw,) = list(lane)
    (kw,) = list(kmv)
    np.testing.assert_array_equal(
        np.asarray(lw["model_input"], dtype=np.float32),
        np.asarray(kw["model_input"], dtype=np.float32))


def test_lane_container_16bpp():
    X, Y, T = 48, 32, 5
    rng = np.random.default_rng(7)
    enc = ScreenPressorEncoder(4, X, Y, bpp=16)
    f = (rng.integers(0, 32, (Y, X), dtype=np.uint32)
         | (rng.integers(0, 32, (Y, X), dtype=np.uint32) << 8)
         | (rng.integers(0, 32, (Y, X), dtype=np.uint32) << 16))
    streams, gold, keys = [], [], []
    for t in range(T):
        if t:
            f = f.copy()
            f[2 : 2 + t, 3:9] = rng.integers(0, 32) | (
                rng.integers(0, 32) << 8) | (rng.integers(0, 32) << 16)
        streams.append(enc.encode_i(f.reshape(-1).copy()) if t == 0
                       else enc.encode_p(f.reshape(-1).copy()))
        gold.append(f.reshape(-1).copy())
        keys.append(t == 0)
    avi = mux_avi(streams, X, Y, 16, codec="SPV4", keyflags=keys)
    cont = transcode_to_lane(avi, window=5, K=2)
    pipe = VideoIngestPipeline([MemorySource(cont)],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    for t in range(T):
        np.testing.assert_array_equal(got[t] & 0x00FFFFFF,
                                      gold[t] & 0x00FFFFFF)


def test_lane_container_malformed():
    X, Y, T = 48, 32, 4
    avi, _ = make_avi(1, X, Y, T)
    cont = transcode_to_lane(avi, window=4)
    # truncations at every boundary must raise, never crash or over-read
    for cut in [3, 10, len(cont) // 2, len(cont) - 5]:
        with pytest.raises(ValueError):
            lane_format.container_from_bytes(cont[:cut])
    # corrupt header magic
    with pytest.raises(ValueError):
        lane_format.container_from_bytes(b"XXXX" + cont[4:])
    # AVI fed to the lane path
    with pytest.raises(ValueError):
        VideoIngestPipeline([MemorySource(avi)],
                            IngestConfig(sp_device_path="lane"))
    # implausible sizes in a window record must be caught by validation
    import struct

    bad = bytearray(cont)
    hs = struct.calcsize("<4sHHBBHIHII")  # container header
    bad[hs + 4 : hs + 6] = (60000).to_bytes(2, "little")  # T absurd
    with pytest.raises(ValueError):
        lane_format.container_from_bytes(bytes(bad))


def test_lane_frame_range_clip():
    """Lane clip decode: frame_range starts at the latest init-plane
    window ≤ t0 (the container's keyframe-restart unit) and stops once t1
    is covered; decoded frames must match the full pass."""
    X, Y, T = 48, 32, 12
    avi, gold = make_avi(8, X, Y, T, key_every=3)
    cont = transcode_to_lane(avi, window=3, K=2)
    pipe = VideoIngestPipeline(
        [MemorySource(cont)],
        IngestConfig(sp_device_path="lane", frame_range=(7, 11)))
    got = {}
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        for t in range(fr.shape[1]):
            got[batch["start_frame"] + t] = fr[0, t].reshape(-1)
    # the clip must start at the window containing the keyframe ≤ 7
    # (window 2 = frames 6..8) and cover through frame 11
    assert min(got) == 6 and max(got) == 11, (min(got), max(got))
    for t, v in got.items():
        np.testing.assert_array_equal(v & 0x00FFFFFF,
                                      gold[t] & 0x00FFFFFF, err_msg=str(t))


def test_lane_audio_passthrough():
    """transcode_to_lane carries the source AVI's MP3 stream; the lane
    pipeline rebuilds AudioTracks with the same section timeline as the
    AVI pipeline (audio must not be silently dropped by re-encoding)."""
    import test_pcm

    X, Y, T = 64, 48, 6
    streams, gold, keys = make_stream(6, X, Y, T)
    mp3, n_mp3, rate = test_pcm.make_silence_frames(20)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys,
                  sound_chunks=[(0, mp3[: len(mp3) // 2]),
                                (3, mp3[len(mp3) // 2 :])])
    cont = transcode_to_lane(avi, window=3, K=2)
    lane_pipe = VideoIngestPipeline([MemorySource(cont)],
                                    IngestConfig(sp_device_path="lane"))
    avi_pipe = VideoIngestPipeline([MemorySource(avi)],
                                   IngestConfig(window=3))
    (lt,) = lane_pipe.audio_tracks
    (at,) = avi_pipe.audio_tracks
    assert lt is not None
    assert lt.time_loaded == pytest.approx(at.time_loaded, abs=1e-9)
    assert len(lt.sections) == len(at.sections)
    la = lane_pipe.audio_pcm()[0]
    aa = avi_pipe.audio_pcm()[0]
    if aa is not None:  # pcm backend available
        assert la is not None
        np.testing.assert_array_equal(la.samples, aa.samples)
    # containers without audio expose None tracks
    avi2, _ = make_avi(6, X, Y, T)
    cont2 = transcode_to_lane(avi2, window=3, K=2)
    p2 = VideoIngestPipeline([MemorySource(cont2)],
                             IngestConfig(sp_device_path="lane"))
    assert p2.audio_tracks == [None]


def test_lane_container_mutation_fuzz():
    """Random byte corruption of a container must never crash, hang, or
    over-allocate the parser — every trial either parses (decoding garbage
    is fine; adversarial-stream discipline) or raises ValueError."""
    X, Y, T = 48, 32, 6
    avi, _ = make_avi(4, X, Y, T)
    cont = bytearray(transcode_to_lane(avi, window=3))
    rng = np.random.default_rng(0)
    parsed = rejected = 0
    for trial in range(60):
        m = bytearray(cont)
        for _ in range(int(rng.integers(1, 5))):
            m[int(rng.integers(0, len(m)))] ^= int(rng.integers(1, 256))
        try:
            c = lane_format.container_from_bytes(bytes(m))
            # parsed containers must stay structurally sane
            for w in c.windows:
                assert w.btype.shape[1] >= 0
                _ = w.inv_index(c.Y * (lane_format.plane_cols(c.X) // 128))
            # ... and host-decodable without crash or hang: parse-time
            # bounds validation is the host decoder's only shield (numpy
            # scatter has no OOB clamp, unlike the device gather)
            from jsplayer_tpu.codecs import lane_host

            hframes = list(lane_host.iter_frames(c))
            assert len(hframes) == c.n_frames or not c.windows
            parsed += 1
        except ValueError:
            rejected += 1
    assert parsed + rejected == 60 and rejected > 0


def test_lane_mutation_host_device_agree():
    """On mutated-but-valid containers the host (numpy) and device decodes
    must still agree bit-exactly — garbage pixels are fine, divergence is
    not (the differential-fuzz discipline of tests/test_sp_differential,
    applied to the lane stack's two independent decoders)."""
    from jsplayer_tpu.codecs import lane_host

    X, Y, T = 48, 32, 6
    avi, _ = make_avi(7, X, Y, T)
    cont = bytearray(transcode_to_lane(avi, window=3))
    rng = np.random.default_rng(12)
    compared = 0
    trial = 0
    while compared < 6 and trial < 80:
        trial += 1
        m = bytearray(cont)
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(0, len(m)))] ^= int(rng.integers(1, 256))
        try:
            c = lane_format.container_from_bytes(bytes(m))
        except ValueError:
            continue
        if c.X != X or c.Y != Y or c.n_frames != T or len(c.windows) != 2:
            continue  # geometry mutations would just recompile; skip
        host = list(lane_host.iter_frames(c))
        pipe = VideoIngestPipeline([MemorySource(bytes(m))],
                                   IngestConfig(sp_device_path="lane"))
        dev = collect_frames(pipe, 1, T, Y, X)[0]
        for t in range(T):
            np.testing.assert_array_equal(
                host[t].reshape(-1), dev[t],
                err_msg=f"trial {trial} frame {t}")
        compared += 1
    assert compared >= 3, f"only {compared} comparable trials of {trial}"


def test_lane_wire_size_reasonable():
    """The container's payload should sit well below the dense paycode
    plane; raw+deflate (the default) must also undercut the rans wire —
    the round-4 A/B that made raw the default (VERDICT r3 item 2)."""
    X, Y, T = 64, 48, 8
    avi, _ = make_avi(2, X, Y, T)
    cont = transcode_to_lane(avi, window=8)
    dense = T * Y * X * 4
    assert len(cont) < dense, (len(cont), dense)
    rans = transcode_to_lane(avi, window=8, payload="rans", compress=False)
    raw = transcode_to_lane(avi, window=8, compress=False)
    assert len(cont) < len(raw) < len(rans), (len(cont), len(raw), len(rans))


@pytest.mark.parametrize("mode,comp", [("raw", False), ("rans", True),
                                       ("rans", False)])
def test_lane_payload_modes_bit_exact(mode, comp):
    """Every payload-mode x deflate combination decodes bit-exactly (the
    default raw+deflate is covered by every other test in this file)."""
    X, Y, T = 64, 48, 10
    avi, gold = make_avi(5, X, Y, T)
    cont = transcode_to_lane(avi, window=4, K=2, payload=mode, compress=comp)
    c = lane_format.container_from_bytes(cont)
    assert c.windows[0].raw_mode == (mode == "raw")
    assert c.windows[0].restart
    pipe = VideoIngestPipeline([MemorySource(cont)],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    for t in range(T):
        np.testing.assert_array_equal(
            got[t] & 0x00FFFFFF, gold[t] & 0x00FFFFFF,
            err_msg=f"{mode} comp={comp} frame {t}")


def test_lane_gop_axis_grouping():
    """Restart (keyframe-led) windows of the same stream spread across the
    mesh's gop axis: G consecutive windows per dispatch, emitted as one
    G*T-frame window — dense and still-elided (SURVEY §2 GOP row for the
    lane path; round-3's step was dp-only)."""
    from jsplayer_tpu.pipeline.mesh import make_mesh

    X, Y, T = 64, 48, 12
    mesh = make_mesh(dp=4, gop=2)
    avis, golds = zip(*[make_avi(s, X, Y, T, key_every=3) for s in range(4)])
    conts = [transcode_to_lane(a, window=3, K=2) for a in avis]
    pipe = VideoIngestPipeline([MemorySource(c) for c in conts],
                               IngestConfig(sp_device_path="lane",
                                            mesh=mesh))
    n_batches = 0
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        assert fr.shape[1] == 6  # G=2 windows of T=3 emitted as one
        n_batches += 1
        for b in range(4):
            for t in range(fr.shape[1]):
                gi = batch["start_frame"] + t
                if gi < T:
                    np.testing.assert_array_equal(
                        fr[b, t].reshape(-1) & 0x00FFFFFF,
                        golds[b][gi] & 0x00FFFFFF, err_msg=f"b{b} t{gi}")
    assert n_batches == 2  # 4 windows in 2 grouped dispatches

    # still-elision composes with the grouping (outmap spans G*T)
    pipe2 = VideoIngestPipeline([MemorySource(c) for c in conts],
                                IngestConfig(sp_device_path="lane",
                                             mesh=mesh, still_elision=True))
    carry = [np.zeros(Y * X, np.uint32) for _ in range(4)]
    seen = 0
    for batch in pipe2:
        fr = np.asarray(batch["frames_u32"])
        om = np.asarray(batch["outmap"])
        for b in range(4):
            for t in range(om.shape[1]):
                gi = batch["start_frame"] + t
                if gi >= T:
                    break
                if om[b, t] >= 0:
                    got = fr[om[b, t]].reshape(-1)
                    carry[b] = got
                else:
                    got = carry[b]
                np.testing.assert_array_equal(
                    got, golds[b][gi] & 0x00FFFFFF, err_msg=f"b{b} t{gi}")
                seen += 1
    assert seen == 4 * T


def test_lane_gop_grouping_mid_gop_fallback():
    """A non-restart window (mid-GOP continuation) must break the group —
    carry-dependent windows never ride the gop axis."""
    from jsplayer_tpu.pipeline.mesh import make_mesh

    X, Y, T = 64, 48, 12  # ONE keyframe: windows 1.. are carry-dependent
    mesh = make_mesh(dp=4, gop=2)
    avis, golds = zip(*[make_avi(s, X, Y, T) for s in range(4)])
    conts = [transcode_to_lane(a, window=3, K=2) for a in avis]
    pipe = VideoIngestPipeline([MemorySource(c) for c in conts],
                               IngestConfig(sp_device_path="lane",
                                            mesh=mesh))
    starts = []
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        starts.append((batch["start_frame"], fr.shape[1]))
        for b in range(4):
            for t in range(fr.shape[1]):
                gi = batch["start_frame"] + t
                if gi < T:
                    np.testing.assert_array_equal(
                        fr[b, t].reshape(-1) & 0x00FFFFFF,
                        golds[b][gi] & 0x00FFFFFF, err_msg=f"b{b} t{gi}")
    # every window dispatched alone (no grouping possible)
    assert starts == [(0, 3), (3, 3), (6, 3), (9, 3)], starts


def test_lane_deflate_bomb_rejected():
    """A deflated bulk that inflates past its declared size must be
    rejected, not expanded (adversarial-input discipline)."""
    import struct
    import zlib

    X, Y, T = 48, 32, 4
    avi, _ = make_avi(9, X, Y, T)
    cont = transcode_to_lane(avi, window=4)
    c = lane_format.container_from_bytes(cont)
    w = c.windows[0]
    # rebuild the window with an oversized bulk behind the deflate flag:
    # serialize uncompressed, then splice a bomb into the bulk section
    body = lane_format._window_to_bytes(w, c.K, c.n_lanes, compress=False)
    bulk_len = 3 * w.n_units * 128
    meta = body[4 : len(body) - bulk_len]
    bomb = zlib.compress(b"\x00" * (bulk_len + 4096), 9)
    flags_off = struct.calcsize("<HIII")
    meta = bytearray(meta)
    meta[flags_off] |= 4 | 2  # deflate | raw (raw already set)
    rec = bytes(meta) + struct.pack("<I", len(bomb)) + bomb
    blob = (cont[: struct.calcsize("<4sHHBBHIHII")]
            + struct.pack("<I", len(rec)) + rec)
    with pytest.raises(ValueError):
        lane_format.container_from_bytes(blob)


def test_lane_unit_dedup():
    """Identical payload units (a blinking rect) store once and are
    referenced by index (wire flag bit4); decode stays bit-exact and the
    payload count drops below the reference count."""
    X, Y, T = 64, 48, 10
    enc = ScreenPressorEncoder(4, X, Y)
    streams, gold, keys = [], [], []
    f = np.full((Y, X), pack_rgb(10, 10, 10), dtype=np.uint32)
    on = f.copy()
    on[16:32, 16:48] = pack_rgb(200, 50, 50)
    for t in range(T):
        cur = on if t % 2 else f  # blink: two alternating states
        streams.append(enc.encode_i(cur.reshape(-1).copy()) if t == 0
                       else enc.encode_p(cur.reshape(-1).copy()))
        gold.append(cur.reshape(-1).copy())
        keys.append(t == 0)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys)
    cont = lane_format.container_from_bytes(transcode_to_lane(avi, window=T))
    w = cont.windows[0]
    n_refs = sum(r.size for r in w.unit_rows)
    assert w.unit_idx is not None and w.n_units < n_refs, \
        (w.n_units, n_refs)
    pipe = VideoIngestPipeline([MemorySource(
        lane_format.container_to_bytes(cont))],
        IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    for t in range(T):
        np.testing.assert_array_equal(got[t] & 0x00FFFFFF,
                                      gold[t] & 0x00FFFFFF, err_msg=str(t))


def test_lane_meta_deflate_roundtrip_and_flag():
    """Round 4: the block/reference arrays ride a zlib stream (wire flag
    bit5) when compression is on — they dominated the terminal-corpus
    wire once payload was deduped.  Parse must agree field-for-field with
    the legacy (uncompressed) layout and the wire must shrink."""
    import struct

    X, Y, T = 64, 48, 10
    avi, _ = make_avi(5, X, Y, T)
    comp = transcode_to_lane(avi, window=T)
    legacy = transcode_to_lane(avi, window=T, compress=False)
    assert len(comp) < len(legacy)
    # flag bit5 present on the compressed record
    hs = struct.calcsize("<4sHHBBHIHII")
    flags = comp[hs + 4 + struct.calcsize("<HIII")]
    assert flags & 32, f"meta-deflate flag missing (flags={flags:#x})"
    ca = lane_format.container_from_bytes(comp)
    cb = lane_format.container_from_bytes(legacy)
    for wa, wb in zip(ca.windows, cb.windows):
        np.testing.assert_array_equal(wa.btype, wb.btype)
        np.testing.assert_array_equal(wa.rect, wb.rect)
        np.testing.assert_array_equal(wa.payload, wb.payload)
        assert wa.n_units == wb.n_units
        for ra, rb in zip(wa.unit_rows, wb.unit_rows):
            np.testing.assert_array_equal(ra, rb)
        if wa.unit_idx is not None:
            for ia, ib in zip(wa.unit_idx, wb.unit_idx):
                np.testing.assert_array_equal(ia, ib)


def test_lane_empty_bulk_bomb_rejected():
    """zlib max_length=0 means UNBOUNDED: a window whose expected bulk is
    empty (U=0, no payload) must still cap a bomb at 1 byte and reject it
    instead of expanding it in memory."""
    import struct
    import zlib

    X, Y, T = 48, 32, 4
    avi, _ = make_avi(9, X, Y, T)
    cont = transcode_to_lane(avi, window=4)
    c = lane_format.container_from_bytes(cont)
    w = c.windows[0]
    # empty the window: no payload units, no references, all-still frames
    w.unit_rows = [np.zeros(0, dtype=np.int64) for _ in range(w.T)]
    w.unit_idx = None
    w.n_units = 0
    w.payload = np.zeros((0, 3, 128), dtype=np.uint8)
    body = lane_format._window_to_bytes(w, c.K, c.n_lanes, compress=False)
    bulk_len = 0
    meta = bytearray(body[4:])
    flags_off = struct.calcsize("<HIII")
    meta[flags_off] |= 4  # deflate flag, bulk expected EMPTY
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # 64 MB of zeros, ~64 KB
    rec = bytes(meta) + struct.pack("<I", len(bomb)) + bomb
    blob = (cont[: struct.calcsize("<4sHHBBHIHII")]
            + struct.pack("<I", len(rec)) + rec)
    with pytest.raises(ValueError):
        lane_format.container_from_bytes(blob)


def test_row_index_matches_inv_index_tuples():
    """row_index (round-4 row-gather layout) must agree with inv_index:
    for every frame and plane row, the row_table tuple selected by
    row_idx equals that row's ncol unit ids — across keyframe-led and
    mid-GOP windows (explicit unit_idx), empty frames, and both payload
    modes."""
    X, Y, T = 64, 48, 10
    avi, _ = make_avi(0, X, Y, T, key_every=4)
    ncol = lane_format.plane_cols(X) // 128 or 1
    for mode in ("raw", "rans"):
        cont = transcode_to_lane(avi, window=4, K=2, payload=mode)
        c = lane_format.container_from_bytes(cont)
        ncol = lane_format.plane_cols(c.X) // 128
        R = c.Y * ncol
        for w in c.windows:
            rt, ri = w.row_index(c.Y, ncol)
            tup = w.inv_index(R).reshape(len(w.unit_rows), c.Y, ncol)
            assert (rt[ri] == tup).all()
            # untouched rows must resolve to the all-zero tuple
            zero_id = ri[0, 0] if not w.unit_rows[0].size else None
            if zero_id is not None:
                assert not rt[zero_id].any()


def test_row_index_collision_fallback():
    """If the u64 row-tuple hash ever collides, the representative-
    compare guard must reroute through the exact lexicographic path —
    forced here by collapsing the hash to a constant."""
    X, Y, T = 64, 48, 6
    avi, _ = make_avi(1, X, Y, T)
    c = lane_format.container_from_bytes(transcode_to_lane(avi, window=T))
    w = c.windows[0]
    ncol = lane_format.plane_cols(c.X) // 128
    rt, ri = w.row_index(c.Y, ncol)

    import unittest.mock as mock

    real_unique = np.unique
    calls = {"n": 0}

    def degenerate_first_unique(a, **kw):
        calls["n"] += 1
        if calls["n"] == 1 and a.dtype == np.uint64:
            a = np.zeros_like(a)  # every hash collides
        return real_unique(a, **kw)

    with mock.patch.object(lane_format.np, "unique",
                           side_effect=degenerate_first_unique):
        rt2, ri2 = w.row_index(c.Y, ncol)
    assert calls["n"] >= 2  # guard fired and took the exact path
    assert (rt2[ri2] == rt[ri]).all()


def _msv1_16_avi(seed, X, Y, T):
    from jsplayer_tpu.codecs.msvideo1 import from_rgb15
    from jsplayer_tpu.encode.msv1_enc import encode_frame_16

    rng = np.random.default_rng(seed)
    f = np.full((Y, X), from_rgb15(0x2222), dtype=np.uint32)
    streams, gold, prev = [], [], None
    for t in range(T):
        f = f.copy()
        if t % 3 != 2:  # leave true stills in the mix
            x0 = int(rng.integers(0, (X - 8) // 4)) * 4
            y0 = int(rng.integers(0, (Y - 8) // 4)) * 4
            f[y0 : y0 + 8, x0 : x0 + 8] = from_rgb15(
                int(rng.integers(0, 0x8000)))
        flat = f.reshape(-1)
        streams.append(encode_frame_16(flat, prev, X, Y))
        gold.append(flat)
        prev = flat
    return mux_avi(streams, X, Y, 16, codec="CRAM",
                   keyflags=[t == 0 for t in range(T)]), gold


def test_lane_from_msv1_16bit():
    """MSVideo1 (CRAM) AVIs transcode into the lane container via
    synthesized diff commands — the lane format serves BOTH reference
    codecs (MSVideo1.hx:106-209), bit-exact through the device path."""
    X, Y, T = 64, 48, 9
    avi, gold = _msv1_16_avi(0, X, Y, T)
    cont = transcode_to_lane(avi, window=4, K=2)
    assert lane_format.is_lane_container(cont)
    pipe = VideoIngestPipeline([MemorySource(cont)],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    assert len(got) == T
    for t in range(T):
        np.testing.assert_array_equal(
            got[t] & 0x00FFFFFF, gold[t] & 0x00FFFFFF,
            err_msg=f"frame {t}")


def test_lane_from_msv1_8bit():
    from jsplayer_tpu.codecs.msvideo1 import palette_to_u32
    from jsplayer_tpu.encode.msv1_enc import encode_frame_8

    X, Y, T = 64, 48, 7
    rng = np.random.default_rng(1)
    pal = bytes(
        b for i in range(256) for b in (i, (i * 3) & 0xFF, (i * 7) & 0xFF, 0))
    pal_u32 = palette_to_u32(pal)
    idx = np.full(Y * X, 3, dtype=np.uint8)
    streams, gold, prev = [], [], None
    for t in range(T):
        idx = idx.copy()
        x0 = int(rng.integers(0, (X - 4) // 4)) * 4
        idx.reshape(Y, X)[8:12, x0 : x0 + 4] = int(rng.integers(0, 256))
        streams.append(encode_frame_8(idx, prev, X, Y))
        gold.append(pal_u32[idx].astype(np.uint32))
        prev = idx
    avi = mux_avi(streams, X, Y, 8, codec="CRAM", palette=pal,
                  keyflags=[t == 0 for t in range(T)])
    cont = transcode_to_lane(avi, window=3, K=2)
    pipe = VideoIngestPipeline([MemorySource(cont)],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    for t in range(T):
        np.testing.assert_array_equal(
            got[t] & 0x00FFFFFF, gold[t] & 0x00FFFFFF,
            err_msg=f"frame {t}")


@pytest.mark.parametrize("align", ["keyframes", "stride"])
def test_lane_transcode_jobs_byte_identical(align):
    """jobs>1 transcode_to_lane == serial output byte-for-byte: units are
    restart-delimited window runs, and keyframes reset all decode state
    (the same GOP independence the ingest gop axis relies on)."""
    X, Y, T = 64, 48, 24
    avi, _ = make_avi(7, X, Y, T, key_every=5)
    for payload in ("raw", "rans"):
        seq = transcode_to_lane(avi, window=4, K=2, payload=payload,
                                align=align, jobs=1)
        par = transcode_to_lane(avi, window=4, K=2, payload=payload,
                                align=align, jobs=4)
        assert seq == par, (align, payload)
    # jobs=0 = all cores — same contract
    assert transcode_to_lane(avi, window=4, K=2, align=align,
                             jobs=0) == transcode_to_lane(
                                 avi, window=4, K=2, align=align)


def test_lane_transcode_jobs_msv1_byte_identical():
    """The MSV1-sourced lane path parallelizes on its synthesized
    keyframes too (full-frame paints derive as restart windows)."""
    from jsplayer_tpu.codecs.msvideo1 import from_rgb15
    from jsplayer_tpu.encode.msv1_enc import encode_frame_16

    X, Y, T = 64, 48, 18
    rng = np.random.default_rng(11)
    f = np.full((Y, X), from_rgb15(0x1111), dtype=np.uint32)
    streams, prev = [], None
    for t in range(T):
        f = f.copy()
        if t % 3 != 2:
            x0 = int(rng.integers(0, (X - 8) // 4)) * 4
            f[8:16, x0 : x0 + 8] = from_rgb15(int(rng.integers(0, 0x8000)))
        flat = f.reshape(-1)
        if t % 6 == 0:
            prev = None  # force a keyframe every 6 frames
        streams.append(encode_frame_16(flat, prev, X, Y))
        prev = flat
    avi = mux_avi(streams, X, Y, 16, codec="CRAM",
                  keyflags=[t % 6 == 0 for t in range(T)])
    seq = transcode_to_lane(avi, window=4, K=2, jobs=1)
    par = transcode_to_lane(avi, window=4, K=2, jobs=3)
    assert seq == par


def test_lane_host_oracle_parity():
    """Host (numpy) lane decode — the Player/oracle path (codecs/
    lane_host) — is bit-exact vs golden pixels AND vs the device ingest
    path, in both payload modes, across mid-stream restarts."""
    from jsplayer_tpu.codecs import lane_host

    X, Y, T = 64, 48, 12
    avi, gold = make_avi(3, X, Y, T, key_every=5)
    for payload in ("raw", "rans"):
        cont_b = transcode_to_lane(avi, window=4, K=2, payload=payload)
        cont = lane_format.container_from_bytes(cont_b)
        host = list(lane_host.iter_frames(cont))
        assert len(host) == T
        for t in range(T):
            np.testing.assert_array_equal(
                host[t].reshape(-1) & 0xFFFFFF, gold[t] & 0xFFFFFF,
                err_msg=f"{payload} host vs gold frame {t}")
        pipe = VideoIngestPipeline([MemorySource(cont_b)],
                                   IngestConfig(sp_device_path="lane"))
        dev = collect_frames(pipe, 1, T, Y, X)[0]
        for t in range(T):
            np.testing.assert_array_equal(
                host[t].reshape(-1) & 0xFFFFFF, dev[t] & 0xFFFFFF,
                err_msg=f"{payload} host vs device frame {t}")


def test_lane_host_frame_range_seek():
    """frame_range decode starts at the last restart window at or before
    t0 (the Manager.hx:244-249 seek-from-keyframe analog) and yields
    exactly the frames in [t0, t1)."""
    from jsplayer_tpu.codecs import lane_host

    X, Y, T = 64, 48, 16
    avi, gold = make_avi(2, X, Y, T, key_every=6)
    for payload in ("raw", "rans"):
        cont = lane_format.container_from_bytes(
            transcode_to_lane(avi, window=4, K=2, payload=payload))
        for t0, t1 in [(0, 3), (5, 9), (7, 16), (10, 11), (15, 16)]:
            fr = list(lane_host.iter_frames(cont, frame_range=(t0, t1)))
            assert len(fr) == t1 - t0
            for i, t in enumerate(range(t0, t1)):
                np.testing.assert_array_equal(
                    fr[i].reshape(-1) & 0xFFFFFF, gold[t] & 0xFFFFFF,
                    err_msg=f"{payload} seek ({t0},{t1}) frame {t}")


def test_lane_host_msv1_container():
    """lane_host also decodes MSV1-sourced containers (synthesized diff
    commands), and the container records bpp=24 — MSV1 pixels are
    palette/RGB15-resolved at transcode so consumers must not re-apply
    the 16bpp display shift."""
    from jsplayer_tpu.codecs import lane_host

    X, Y, T = 64, 48, 9
    avi, gold = _msv1_16_avi(0, X, Y, T)
    cont = lane_format.container_from_bytes(
        transcode_to_lane(avi, window=4, K=2))
    assert cont.bpp == 24
    host = list(lane_host.iter_frames(cont))
    for t in range(T):
        np.testing.assert_array_equal(
            host[t].reshape(-1) & 0xFFFFFF, gold[t] & 0xFFFFFF,
            err_msg=f"frame {t}")


def _record_flags(wire: bytes) -> int:
    """Flags byte of the FIRST window record (header layout in
    lane_format's module docstring)."""
    import struct

    hs = struct.calcsize("<4sHHBBHIHII")
    return wire[hs + 4 + struct.calcsize("<HIII")]


def test_lane_subunit_wire_flag_and_parity():
    """Sub-unit payload encoding (wire flag bit6, round 4): repetitive
    screen content's 8-px spans dedup (scripts/exp_lane_subunits.py:
    terminal payload 1.81 MB -> ~0.39 MB), the parser expands back to the
    canonical [U, 3, 128], and decode stays bit-exact.  Compressed and
    uncompressed wires must parse to identical payload fields."""
    X, Y, T = 64, 48, 10
    avi, gold = make_avi(5, X, Y, T)
    comp = transcode_to_lane(avi, window=T)
    plain = transcode_to_lane(avi, window=T, compress=False)
    assert _record_flags(comp) & 64, "sub-unit flag missing (compressed)"
    ca = lane_format.container_from_bytes(comp)
    cb = lane_format.container_from_bytes(plain)
    for wa, wb in zip(ca.windows, cb.windows):
        np.testing.assert_array_equal(wa.payload, wb.payload)
        assert wa.n_units == wb.n_units
    pipe = VideoIngestPipeline([MemorySource(comp)],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    for t in range(T):
        np.testing.assert_array_equal(got[t] & 0x00FFFFFF,
                                      gold[t] & 0x00FFFFFF, err_msg=str(t))


def test_lane_subunit_fallback_on_noise():
    """Pick-smaller: white-noise payload has no repeating 8-px spans, so
    the span table + id arrays can only add bytes — the encoder must fall
    back to the plain payload layout (flag bit6 absent) and decode stays
    bit-exact."""
    X, Y, T = 64, 48, 4
    rng = np.random.default_rng(11)
    enc = ScreenPressorEncoder(4, X, Y)
    streams, gold, keys = [], [], []
    for t in range(T):
        f = rng.integers(0, 1 << 24, size=(Y, X)).astype(np.uint32)
        streams.append(enc.encode_i(f.reshape(-1).copy()) if t == 0
                       else enc.encode_p(f.reshape(-1).copy()))
        gold.append(f.reshape(-1).copy())
        keys.append(t == 0)
    avi = mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys)
    wire = transcode_to_lane(avi, window=T)
    assert not (_record_flags(wire) & 64), "noise should fall back to plain"
    pipe = VideoIngestPipeline([MemorySource(wire)],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    for t in range(T):
        np.testing.assert_array_equal(got[t] & 0x00FFFFFF,
                                      gold[t] & 0x00FFFFFF, err_msg=str(t))


def test_lane_subunit_oob_id_rejected():
    """Adversarial input: a sub-unit id past the span table must raise,
    not index out of bounds.  The id array is the tail of the last
    window's (uncompressed) bulk, so corrupting the container tail flips
    an id to 0xFFFF >= Us."""
    X, Y, T = 64, 48, 6
    avi, _ = make_avi(5, X, Y, T)
    wire = bytearray(transcode_to_lane(avi, window=T, compress=False))
    assert _record_flags(bytes(wire)) & 64, "test needs the sub-unit layout"
    wire[-2:] = b"\xff\xff"
    with pytest.raises(ValueError):
        lane_format.container_from_bytes(bytes(wire))


@pytest.mark.parametrize("version", [2, 3])
def test_lane_from_sp_v2_v3(version):
    """Legacy SP versions (v2 range coder, v3 rANS f0=64) transcode into
    lane containers through the same capture path as v4 — the lane format
    is version-agnostic once commands are derived (ScreenPressor.hx:66-79
    initEntro is the only per-version fork)."""
    X, Y, T = 64, 48, 8
    avi, gold = make_avi(7, X, Y, T, version=version)
    cont = transcode_to_lane(avi, window=T, K=2)
    c = lane_format.container_from_bytes(cont)
    assert c.windows[0].restart
    pipe = VideoIngestPipeline([MemorySource(cont)],
                               IngestConfig(sp_device_path="lane"))
    got = collect_frames(pipe, 1, T, Y, X)[0]
    for t in range(T):
        np.testing.assert_array_equal(
            got[t] & 0x00FFFFFF, gold[t] & 0x00FFFFFF,
            err_msg=f"v{version} frame {t}")


def test_lane_truncated_record_header_rejected():
    """Fuzz-found (3000-trial extended run, round 4): a record whose length
    field shrinks below the fixed window header must reject as ValueError,
    not escape as struct.error."""
    import struct

    X, Y, T = 48, 32, 4
    avi, _ = make_avi(9, X, Y, T)
    wire = bytearray(transcode_to_lane(avi, window=4))
    hs = struct.calcsize("<4sHHBBHIHII")
    # shrink the first record to 0 bytes; the (now misaligned) remainder
    # must not crash the parser either way
    wire[hs : hs + 4] = struct.pack("<I", 0)
    with pytest.raises(ValueError):
        lane_format.container_from_bytes(bytes(wire))


def test_lane_ragged_frame_range_clip():
    """frame_range over keyframe-SNAPPED (variable-length) windows: the
    prefix-sum bases must locate the clip start/end windows (fixed-stride
    arithmetic would misplace both)."""
    X, Y, T = 48, 32, 14
    avi, gold = make_avi(9, X, Y, T, key_every=5)  # windows 4,1,4,1,4
    cont = transcode_to_lane(avi, window=4, K=2)
    c = lane_format.container_from_bytes(cont)
    assert sorted(set(w.T for w in c.windows)) == [1, 4]
    pipe = VideoIngestPipeline(
        [MemorySource(cont)],
        IngestConfig(sp_device_path="lane", frame_range=(7, 12)))
    got = {}
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        for t in range(fr.shape[1]):
            got[batch["start_frame"] + t] = fr[0, t].reshape(-1)
    # latest restart window <= 7 leads at frame 5; coverage through 11
    assert min(got) == 5 and max(got) >= 11, (min(got), max(got))
    for t, v in got.items():
        if t < T:
            np.testing.assert_array_equal(v & 0x00FFFFFF,
                                          gold[t] & 0x00FFFFFF,
                                          err_msg=str(t))


def test_lane_batch_mismatched_boundaries_rejected():
    """Streams in one lane batch must share window boundaries (the [B, T]
    batching keeps one timeline); mismatched containers raise."""
    X, Y, T = 48, 32, 12
    avi_a, _ = make_avi(10, X, Y, T, key_every=4)
    avi_b, _ = make_avi(11, X, Y, T, key_every=5)
    ca = transcode_to_lane(avi_a, window=4, K=2)
    cb = transcode_to_lane(avi_b, window=4, K=2)
    pipe = VideoIngestPipeline(
        [MemorySource(ca), MemorySource(cb)],
        IngestConfig(sp_device_path="lane"))
    with pytest.raises(ValueError, match="mismatched window boundaries"):
        for _ in pipe:
            pass


def test_lane_window_tiling_validated():
    """Windows must tile n_frames exactly: a corrupt T field desyncs every
    consumer's frame indexing (fuzz-found once keyframe-aligned scheduling
    made window lengths variable)."""
    X, Y, T = 48, 32, 14
    avi, _ = make_avi(21, X, Y, T, key_every=5)
    cont = bytes(transcode_to_lane(avi, window=4, K=2))
    import struct

    hs = struct.calcsize("<4sHHBBHIHII")
    # duplicate the first window record: each record parses fine but the
    # lengths sum to T+4, which must be rejected
    (rec_len,) = struct.unpack_from("<I", cont, hs)
    dup = cont + cont[hs : hs + 4 + rec_len]
    with pytest.raises(ValueError, match="tile n_frames"):
        lane_format.container_from_bytes(dup)


def test_lane_stride_alignment_keeps_heterogeneous_batch():
    """align='stride' restores batch compatibility for streams with
    different keyframe cadences (keyframe alignment would give them
    mismatched window boundaries, which _iter_lane rejects)."""
    X, Y, T = 48, 32, 12
    avi_a, gold_a = make_avi(10, X, Y, T, key_every=4)
    avi_b, gold_b = make_avi(11, X, Y, T, key_every=5)
    ca = transcode_to_lane(avi_a, window=4, K=2, align="stride")
    cb = transcode_to_lane(avi_b, window=4, K=2, align="stride")
    pipe = VideoIngestPipeline(
        [MemorySource(ca), MemorySource(cb)],
        IngestConfig(sp_device_path="lane"))
    frames = collect_frames(pipe, 2, T, Y, X)
    for b, gold in enumerate((gold_a, gold_b)):
        for t in range(T):
            np.testing.assert_array_equal(
                frames[b][t] & 0x00FFFFFF, gold[t] & 0x00FFFFFF,
                err_msg=f"stream {b} frame {t}")


def test_lane_streaming_flag_rejected():
    """streaming=True is the long-AVI residency mode; the lane path loads
    whole containers and must say so instead of silently ignoring it."""
    X, Y, T = 48, 32, 6
    avi, _ = make_avi(4, X, Y, T)
    cont = transcode_to_lane(avi, window=3, K=2)
    with pytest.raises(ValueError, match="streaming"):
        VideoIngestPipeline([MemorySource(cont)],
                            IngestConfig(sp_device_path="lane",
                                         streaming=True))


def test_lane_ragged_gop_group_on_mesh():
    """Ragged all-restart groups ride the gop axis: keyframes at 0/4/9 with
    window=5 snap to restart windows of T=4,5,5, and a gop=2 mesh groups
    windows of UNEQUAL length into one sharded dispatch — the ragged emit
    (per-window slices concatenated per stream) must stay bit-exact."""
    from jsplayer_tpu.pipeline.mesh import make_mesh

    X, Y, T = 48, 32, 14
    def make(seed):
        streams, gold, keys = [], [], []
        rng = np.random.default_rng(seed)
        enc = ScreenPressorEncoder(4, X, Y)
        f = np.full((Y, X), pack_rgb(9, 9, seed), dtype=np.uint32)
        for t in range(T):
            isk = t in (0, 4, 9)
            if not isk and t % 3 != 2:
                f = f.copy()
                f[(t % 4) * 6 : (t % 4) * 6 + 5, 4:20] = pack_rgb(
                    *rng.integers(0, 256, 3))
            if isk:
                enc = ScreenPressorEncoder(4, X, Y)
                streams.append(enc.encode_i(f.reshape(-1).copy()))
            else:
                streams.append(enc.encode_p(f.reshape(-1).copy()))
            gold.append(f.reshape(-1).copy())
            keys.append(isk)
        return mux_avi(streams, X, Y, 24, codec="SPV4", keyflags=keys), gold

    avis, golds = zip(*[make(s) for s in range(4)])
    conts = [transcode_to_lane(a, window=5, K=2) for a in avis]
    c0 = lane_format.container_from_bytes(conts[0])
    assert [w.T for w in c0.windows] == [4, 5, 5]
    assert all(w.restart for w in c0.windows)

    mesh = make_mesh(dp=4, gop=2)
    pipe = VideoIngestPipeline(
        [MemorySource(c) for c in conts],
        IngestConfig(sp_device_path="lane", mesh=mesh))
    got = collect_frames(pipe, 4, T, Y, X)
    for b in range(4):
        assert len(got[b]) == T
        for t in range(T):
            np.testing.assert_array_equal(
                got[b][t] & 0x00FFFFFF, golds[b][t] & 0x00FFFFFF,
                err_msg=f"stream {b} frame {t}")


def test_lane_ragged_model_input_parity():
    """Fused model tensors over RAGGED (keyframe-snapped) lane windows
    match the kmv pipeline's on the same content — the concat emit path
    must feed _model_tensors exactly the real frames."""
    X, Y, T = 64, 48, 14
    avi, gold = make_avi(12, X, Y, T, key_every=5)
    cont = transcode_to_lane(avi, window=4, K=2)
    c = lane_format.container_from_bytes(cont)
    assert len(set(w.T for w in c.windows)) > 1  # genuinely ragged
    lane = VideoIngestPipeline(
        [MemorySource(cont)],
        IngestConfig(sp_device_path="lane", emit_model_input=True))
    kmv = VideoIngestPipeline(
        [MemorySource(avi)],
        IngestConfig(window=14, sp_device_path="kmv", emit_model_input=True))
    lt = np.concatenate([np.asarray(b["model_input"], dtype=np.float32)[0]
                         for b in lane], axis=0)
    (kw,) = list(kmv)
    kt = np.asarray(kw["model_input"], dtype=np.float32)[0]
    np.testing.assert_array_equal(lt, kt)


def test_lane_inflate_expansion_ratio_bound():
    """A deflated section claiming far more output than zlib's ~1032:1
    max ratio can produce must be rejected BEFORE allocating the claimed
    buffer (advisor r4: a ~25 MB file claiming U near the 2^26 cap drove
    a multi-GiB allocation in _inflate_exact)."""
    import zlib

    comp = zlib.compress(b"\x00" * 1000, 9)  # tiny stream
    with pytest.raises(ValueError, match="implausible expansion"):
        lane_format._inflate_exact(memoryview(comp),
                                   3 * (1 << 26) * 128, "bulk")
    # an honest claim still inflates fine
    out = lane_format._inflate_exact(memoryview(comp), 1000, "bulk")
    assert out == b"\x00" * 1000


def test_lane_implausible_unit_claim_rejected():
    """A window header claiming more payload units than T*R (the most any
    window of this geometry can reference) must reject at header parse,
    before any allocation is sized from it."""
    import struct

    X, Y, T = 48, 32, 4
    avi, _ = make_avi(9, X, Y, T)
    cont = transcode_to_lane(avi, window=4)
    hdr = struct.calcsize("<4sHHBBHIHII")
    (rlen,) = struct.unpack_from("<I", cont, hdr)
    rec = bytearray(cont[hdr + 4 : hdr + 4 + rlen])
    struct.pack_into("<I", rec, 2, (1 << 26) - 1)  # U field
    blob = (cont[:hdr] + struct.pack("<I", len(rec)) + bytes(rec)
            + cont[hdr + 4 + rlen :])
    with pytest.raises(ValueError, match="implausible lane window header"):
        lane_format.container_from_bytes(blob)


def test_lane_msv1_keyframes_become_restart_windows():
    """Every MSV1 GOP lead must derive as a restart window: a keyframe is
    synthesized as a full-frame data paint, not a pixel diff (a diff of a
    repeated screen is even empty).  Without restarts an MSV1-sourced
    container has no clip-seek / gop-shard entry points and Player seek
    decodes from frame 0 (advisor r4, transcode.py)."""
    from jsplayer_tpu.codecs import lane_host
    from jsplayer_tpu.codecs.msvideo1 import from_rgb15
    from jsplayer_tpu.encode.msv1_enc import encode_frame_16

    X, Y, T, key_every = 64, 48, 12, 4
    rng = np.random.default_rng(3)
    f = np.full((Y, X), from_rgb15(0x2222), dtype=np.uint32)
    streams, gold, prev = [], [], None
    for t in range(T):
        f = f.copy()
        if t % 3 != 2:
            x0 = int(rng.integers(0, (X - 8) // 4)) * 4
            y0 = int(rng.integers(0, (Y - 8) // 4)) * 4
            f[y0 : y0 + 8, x0 : x0 + 8] = from_rgb15(
                int(rng.integers(0, 0x8000)))
        flat = f.reshape(-1)
        key = t % key_every == 0
        streams.append(encode_frame_16(flat, None if key else prev, X, Y))
        gold.append(flat)
        prev = flat
    avi = mux_avi(streams, X, Y, 16, codec="CRAM",
                  keyflags=[t % key_every == 0 for t in range(T)])
    cont = lane_format.container_from_bytes(
        transcode_to_lane(avi, window=4, K=2, align="keyframes"))
    assert [w.restart for w in cont.windows] == [True] * len(cont.windows)
    # keyframes are visible to the host codec (seek entry points)
    codec = lane_host.LaneHostCodec(cont)
    keys = [codec.is_key_frame(codec_chunk)
            for codec_chunk in (lane_host.LaneHostCodec.frame_chunk(t)
                                for t in range(T))]
    assert keys == [t % key_every == 0 for t in range(T)]
    # and decode parity still holds through the host path
    host = list(lane_host.iter_frames(cont))
    for t in range(T):
        np.testing.assert_array_equal(
            host[t].reshape(-1) & 0xFFFFFF, gold[t] & 0xFFFFFF,
            err_msg=f"frame {t}")


def test_native_lane_compose_parity():
    """The C compose (native.lane_compose_range — the interactive-seek
    hot path) must be bit-exact against the numpy oracle on every
    container variant: raw/rans payloads, chained carry windows, ragged
    keyframe-snapped windows, and MSV1-sourced containers, stepping
    frame-by-frame and window-at-once."""
    from jsplayer_tpu import native as _nat

    if not _nat.lane_compose_available():
        pytest.skip("native library unavailable")
    from jsplayer_tpu.codecs.lane_host import (compose_window_host,
                                               native_compose_range)

    variants = []
    X, Y, T = 64, 48, 12
    avi, _ = make_avi(3, X, Y, T)
    variants.append(("raw", transcode_to_lane(avi, window=4, K=2)))
    variants.append(("rans", transcode_to_lane(avi, window=4, K=2,
                                               payload="rans",
                                               compress=False)))
    avi2, _ = make_avi(5, X, Y, T, key_every=5)   # ragged snap
    variants.append(("ragged", transcode_to_lane(avi2, window=4, K=2)))
    m_avi, _ = _msv1_16_avi(1, 64, 48, 8)
    variants.append(("msv1", transcode_to_lane(m_avi, window=4, K=2)))

    for name, cb in variants:
        cont = lane_format.container_from_bytes(cb)
        carry = None
        pool = np.zeros(cont.Y * lane_format.plane_cols(cont.X), np.uint32)
        for wi, w in enumerate(cont.windows):
            ref = compose_window_host(w, cont.X, cont.Y,
                                      None if w.restart else carry)
            # frame-by-frame stepping (the codec's _advance_to shape)
            p1 = (np.zeros((cont.Y, cont.X), np.uint32)
                  if (w.restart or carry is None) else carry.copy())
            for t in range(w.T):
                native_compose_range(w, cont.X, cont.Y, p1, pool, t, t + 1)
                np.testing.assert_array_equal(p1, ref[t],
                                              err_msg=f"{name} w{wi} f{t}")
            # whole-window walk (the window_carry shape)
            p2 = (np.zeros((cont.Y, cont.X), np.uint32)
                  if (w.restart or carry is None) else carry.copy())
            native_compose_range(w, cont.X, cont.Y, p2, pool, 0, w.T)
            np.testing.assert_array_equal(p2, ref[-1])
            assert (pool == 0).all(), f"{name} w{wi}: pool invariant"
            carry = ref[-1]


def test_lane_host_codec_native_matches_fallback():
    """LaneHostCodec with the native walk must serve byte-identical
    frames to the pure-numpy generator across a hostile seek order
    (backward scrubs, cold mid-chain entries, window skips)."""
    from jsplayer_tpu import native as _nat

    if not _nat.lane_compose_available():
        pytest.skip("native library unavailable")
    from jsplayer_tpu.codecs.lane_host import LaneHostCodec

    X, Y, T = 64, 48, 16
    avi, _ = make_avi(7, X, Y, T)
    cont = lane_format.container_from_bytes(
        transcode_to_lane(avi, window=4, K=2))
    a = LaneHostCodec(cont)
    b = LaneHostCodec(cont)
    b._use_native = False
    assert a._use_native
    rng = np.random.default_rng(11)
    order = list(rng.integers(0, T, 40)) + [0, T - 1, 1, T - 2]
    for t in order:
        fa = a._frame(*a._locate(LaneHostCodec.frame_chunk(int(t))))
        fb = b._frame(*b._locate(LaneHostCodec.frame_chunk(int(t))))
        np.testing.assert_array_equal(fa, fb, err_msg=f"seek {t}")


def test_restart_flag_must_match_content():
    """Fuzz-found (seed 904619): a single bit flip setting a chained
    window's restart flag diverged host and device decode — the host
    honors restart with a zero entry carry (lane_host.window_entry_carry)
    while the device compose always chains; for genuine containers the
    two are indistinguishable only BECAUSE the flag matches the content.
    The parser now re-derives the predicate and rejects a lying flag."""
    X, Y, T = 48, 32, 12
    avi, _ = make_avi(3, X, Y, T, key_every=5)
    cont = transcode_to_lane(avi, window=4, K=2)
    c = lane_format.container_from_bytes(bytes(cont))
    flags = [w.restart for w in c.windows]
    assert True in flags and False in flags  # need both kinds below

    for wi in range(len(c.windows)):
        # locate window wi's flag byte: serialize with the field flipped
        # and diff — exactly one byte (the flags byte) must change
        good = lane_format.container_to_bytes(c, compress=False)
        c.windows[wi].restart = not flags[wi]
        bad = lane_format.container_to_bytes(c, compress=False)
        c.windows[wi].restart = flags[wi]
        diff = [i for i in range(len(good)) if good[i] != bad[i]]
        assert len(diff) == 1
        mutated = bytearray(good)
        mutated[diff[0]] = bad[diff[0]]
        with pytest.raises(ValueError, match="restart flag"):
            lane_format.container_from_bytes(bytes(mutated))
        # the untouched serialization still round-trips
        rt = lane_format.container_from_bytes(good)
        assert [w.restart for w in rt.windows] == flags
