"""Transcoder (v2→v4 re-encode) and the K-distinct-mv device compose path."""

import numpy as np
import jax.numpy as jnp
import pytest

from jsplayer_tpu.core.chunkbuffer import ChunkBuffer
from jsplayer_tpu.core.riff import AviDemuxer
from jsplayer_tpu.core.source import MemorySource
from jsplayer_tpu.encode.avi_mux import mux_avi
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.kernels.sp_recon import decode_sequence_kmv, prepare_kmv
from jsplayer_tpu.pipeline.batch import stack_sp_commands
from jsplayer_tpu.transcode import transcode_sp

X, Y = 64, 32
NPIX = X * Y


def build_v2_avi(n=6):
    enc = ScreenPressorEncoder(2, X, Y)
    rng = np.random.default_rng(77)
    f = np.full((Y, X), pack_rgb(4, 5, 6), dtype=np.uint32)
    f = f.reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(n - 1):
        nf = f.copy().reshape(Y, X)
        if t % 2 == 0:
            nf[2:, :] = nf[:-2, :].copy()
        else:
            nf[8:12, 20:40] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    keys = [i == 0 for i in range(n)]
    return mux_avi(streams, X, Y, 24, codec="SPV2", keyflags=keys), golds


@pytest.mark.parametrize("use_native", [True, False])
def test_transcode_v2_to_v4_pixel_parity(use_native):
    from jsplayer_tpu import native

    if use_native and not native.available():
        pytest.skip("native unavailable")
    avi, golds = build_v2_avi()
    out = transcode_sp(avi, target_version=4, use_native=use_native)
    # decode the transcoded file and compare pixels
    from jsplayer_tpu.player import Player, PlayerConfig
    from jsplayer_tpu.pipeline.manager import FrameResult

    p = Player(PlayerConfig(indexed=False))
    vi = p.load(MemorySource(out))
    assert vi.nframes == len(golds)
    for _ in range(500):
        if p.tick() == FrameResult.DECOMPRESSED and p.first_shown:
            break
    fps = p.manager.fps
    for t in (0, 2, len(golds) - 1):
        p.seek_time(t / fps + 0.001)
        for _ in range(300):
            p.tick()
            if p.manager.last_frame_drawn == t:
                break
        np.testing.assert_array_equal(
            p.manager.buffers[p.manager._last_filled_buffer], golds[t],
            err_msg=f"frame {t}")
    # transcoded head bytes are v4 ((head>>4)+1 == 4)
    buf = ChunkBuffer()
    frames = []
    d = AviDemuxer(buf, on_frame=frames.append)
    d.start()
    buf.add_chunk(out)
    d.pump()
    assert frames[0][0] in (0x32, 0x31)


def test_kmv_device_path_bit_exact():
    """prepare_kmv + decode_sequence_kmv vs golden frames (scrolls produce a
    shared motion vector; paints produce data/subrect blocks)."""
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(5)
    f = np.full((Y, X), pack_rgb(9, 9, 9), dtype=np.uint32).reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(5):
        nf = f.copy().reshape(Y, X)
        if t % 2 == 0:
            nf[2:, :] = nf[:-2, :].copy()
        else:
            nf[10:14, 20:44] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    cmds = stack_sp_commands([streams], X, Y)
    pc, mvk = prepare_kmv(cmds["bts"][0, 0], cmds["mv"][0, 0],
                          cmds["rect"][0, 0], cmds["payload"][0, 0])
    frames = decode_sequence_kmv(
        jnp.zeros((Y, X), jnp.uint32), jnp.array(pc),
        jnp.array(mvk), jnp.array(cmds["changed"][0, 0]))
    frames = np.asarray(frames)
    for t, g in enumerate(golds):
        np.testing.assert_array_equal(frames[t].reshape(-1), g,
                                      err_msg=f"frame {t}")


@pytest.mark.parametrize("dims", [(40, 24), (33, 17), (48, 18)])
def test_kmv_edge_block_geometry_bit_exact(dims):
    """Non-multiple-of-16 geometries: the capture's block grid is
    ceil-divided (partial edge blocks, ScreenPressor.hx:361), and
    prepare_kmv must index it the same way — floor division silently
    mis-composed every pixel at/below the partial edge band (the whole
    bottom band read the wrong block's commands)."""
    Xd, Yd = dims
    enc = ScreenPressorEncoder(4, Xd, Yd)
    rng = np.random.default_rng(11)
    f = np.full((Yd, Xd), pack_rgb(9, 9, 9), dtype=np.uint32).reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(5):
        nf = f.copy().reshape(Yd, Xd)
        if t % 2 == 0:
            nf[2:, :] = nf[:-2, :].copy()  # scroll: motion into edge blocks
        else:  # paint touching the right/bottom partial blocks
            nf[Yd - 6 : Yd - 2, Xd - 10 : Xd] = pack_rgb(
                *rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    cmds = stack_sp_commands([streams], Xd, Yd)
    pc, mvk = prepare_kmv(cmds["bts"][0, 0], cmds["mv"][0, 0],
                          cmds["rect"][0, 0], cmds["payload"][0, 0])
    frames = np.asarray(decode_sequence_kmv(
        jnp.zeros((Yd, Xd), jnp.uint32), jnp.array(pc),
        jnp.array(mvk), jnp.array(cmds["changed"][0, 0])))
    for t, g in enumerate(golds):
        np.testing.assert_array_equal(frames[t].reshape(-1), g,
                                      err_msg=f"{Xd}x{Yd} frame {t}")


def test_kmv_overflow_demotes_to_payload():
    """More distinct vectors than K slots: overflow blocks must decode via
    payload, still bit-exact."""
    nbx, nby = X // 16, Y // 16
    NB = nbx * nby
    rng = np.random.default_rng(6)
    prev = rng.integers(0, 1 << 24, (Y, X)).astype(np.uint32)
    bts = np.full((1, NB), 3, dtype=np.int32)  # every block full motion
    mv = np.zeros((1, NB, 2), dtype=np.int32)
    # give each block its own vector → way more than K=2
    for bi in range(NB):
        by, bx = divmod(bi, nbx)
        mv[0, bi] = (min(bi % 3, X - 16 - bx * 16), min(bi % 2, Y - 16 - by * 16))
    rect = np.zeros((1, NB, 4), dtype=np.int32)
    for bi in range(NB):
        by, bx = divmod(bi, nbx)
        rect[0, bi] = (bx * 16, by * 16, bx * 16 + 16, by * 16 + 16)
    # payload = the true motion result (what the host decoder would emit)
    want = np.zeros((Y, X), np.uint32)
    for bi in range(NB):
        by, bx = divmod(bi, nbx)
        mx, my = mv[0, bi]
        want[by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16] = \
            prev[by * 16 + my : by * 16 + my + 16, bx * 16 + mx : bx * 16 + mx + 16]
    payload = want[None].astype(np.uint32)
    pc, mvk = prepare_kmv(bts, mv, rect, payload, K=2)
    frames = decode_sequence_kmv(
        jnp.array(prev), jnp.array(pc), jnp.array(mvk),
        jnp.array([True]))
    np.testing.assert_array_equal(np.asarray(frames)[0], want)

def test_kmv_sparse_bit_exact():
    """prepare_kmv_sparse + decode_sequence_kmv_sparse vs golden frames."""
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(5)
    f = np.full((Y, X), pack_rgb(9, 9, 9), dtype=np.uint32).reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(7):
        nf = f.copy().reshape(Y, X)
        if t % 3 == 0:
            nf[2:, :] = nf[:-2, :].copy()
        elif t % 3 == 1:
            nf[10:14, 20:44] = pack_rgb(*rng.integers(0, 256, 3))
        # t%3==2: still frame
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    cmds = stack_sp_commands([streams], X, Y)
    from jsplayer_tpu.kernels.sp_recon import (
        decode_sequence_kmv_sparse, prepare_kmv_sparse)

    bc, mvk, tiles, tyx = prepare_kmv_sparse(
        cmds["bts"][0, 0], cmds["mv"][0, 0], cmds["rect"][0, 0],
        cmds["payload"][0, 0])
    frames = decode_sequence_kmv_sparse(
        jnp.zeros((Y, X), jnp.uint32), jnp.array(bc), jnp.array(mvk),
        jnp.array(tiles), jnp.array(tyx), jnp.array(cmds["changed"][0, 0]))
    frames = np.asarray(frames)
    for t, g in enumerate(golds):
        np.testing.assert_array_equal(frames[t].reshape(-1), g,
                                      err_msg=f"frame {t}")


def test_kmv_sparse_overflow_demotes_to_tiles():
    """More distinct vectors than K slots → overflow blocks become tiles."""
    nbx, nby = X // 16, Y // 16
    NB = nbx * nby
    rng = np.random.default_rng(6)
    prev = rng.integers(0, 1 << 24, (Y, X)).astype(np.uint32)
    bts = np.full((1, NB), 3, dtype=np.int32)
    mv = np.zeros((1, NB, 2), dtype=np.int32)
    for bi in range(NB):
        by, bx = divmod(bi, nbx)
        mv[0, bi] = (min(bi % 3, X - 16 - bx * 16), min(bi % 2, Y - 16 - by * 16))
    rect = np.zeros((1, NB, 4), dtype=np.int32)
    want = np.zeros((Y, X), np.uint32)
    for bi in range(NB):
        by, bx = divmod(bi, nbx)
        mx, my = mv[0, bi]
        want[by * 16:by * 16 + 16, bx * 16:bx * 16 + 16] = \
            prev[by * 16 + my:by * 16 + my + 16, bx * 16 + mx:bx * 16 + mx + 16]
    from jsplayer_tpu.kernels.sp_recon import (
        decode_sequence_kmv_sparse, prepare_kmv_sparse)

    bc, mvk, tiles, tyx = prepare_kmv_sparse(
        bts, mv, rect, want[None].astype(np.uint32), K=2)
    frames = decode_sequence_kmv_sparse(
        jnp.array(prev), jnp.array(bc), jnp.array(mvk), jnp.array(tiles),
        jnp.array(tyx), jnp.array([True]))
    np.testing.assert_array_equal(np.asarray(frames)[0], want & 0xFFFFFF)

def test_kmv_still_elision_parity():
    """compact_changed + decode_sequence_kmv_compact expands to the same
    frames as the dense kmv scan (stills never enter the device scan)."""
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(11)
    f = np.full((Y, X), pack_rgb(1, 2, 3), dtype=np.uint32).reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(8):
        nf = f.copy().reshape(Y, X)
        if t % 3 == 0:
            nf[2:, :] = nf[:-2, :].copy()
        elif t % 3 == 1:
            nf[6:10, 8:30] = pack_rgb(*rng.integers(0, 256, 3))
        # t%3==2: still
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    cmds = stack_sp_commands([streams], X, Y)
    from jsplayer_tpu.kernels.sp_recon import (
        compact_changed, decode_sequence_kmv_compact)

    pc, mvk = prepare_kmv(cmds["bts"][0, 0], cmds["mv"][0, 0],
                          cmds["rect"][0, 0], cmds["payload"][0, 0])
    changed = np.asarray(cmds["changed"][0, 0])
    assert not changed.all()  # the content really has stills
    pcc, mvkc, outmap = compact_changed(pc, mvk, changed)
    assert pcc.shape[0] == changed.sum()
    init = jnp.zeros((Y, X), jnp.uint32)
    dec = np.asarray(decode_sequence_kmv_compact(
        init, jnp.array(pcc), jnp.array(mvkc)))
    for t, g in enumerate(golds):
        got = (np.zeros((Y, X), np.uint32) if outmap[t] < 0
               else dec[outmap[t]])
        np.testing.assert_array_equal(got.reshape(-1), g, err_msg=f"frame {t}")


def test_kmv_16bpp_bit_exact():
    """16bpp SP streams through prepare_kmv + device kmv scan (15-bit pixels
    ride the same 24-bit paycode field)."""
    from jsplayer_tpu import native

    enc = ScreenPressorEncoder(4, X, Y, bpp=16)
    rng = np.random.default_rng(8)
    f = np.full((Y, X), 0x1234, dtype=np.uint32).reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(5):
        nf = f.copy().reshape(Y, X)
        if t % 2 == 0:
            nf[2:, :] = nf[:-2, :].copy()
        else:
            nf[8:12, 6:30] = int(rng.integers(0, 0x8000))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    cmds = stack_sp_commands([streams], X, Y, bpp=16)
    pc, mvk = prepare_kmv(cmds["bts"][0, 0], cmds["mv"][0, 0],
                          cmds["rect"][0, 0], cmds["payload"][0, 0])
    frames = np.asarray(decode_sequence_kmv(
        jnp.zeros((Y, X), jnp.uint32), jnp.array(pc), jnp.array(mvk),
        jnp.array(cmds["changed"][0, 0])))
    for t, g in enumerate(golds):
        np.testing.assert_array_equal(frames[t].reshape(-1), g,
                                      err_msg=f"frame {t}")
    # native kmv transport parity at 16bpp
    if native.available():
        got = native.native_sp_decode_streams_kmv([streams], X, Y, bpp=16, K=4)
        for t in range(len(streams)):
            if got["changed"][0][t]:
                np.testing.assert_array_equal(got["paycode"][0, t], pc[t],
                                              err_msg=f"native pc {t}")


def test_kmv_large_motion_vectors():
    """Synthetic commands with reference-scale motion (up to ±256,
    ScreenPressor msr_x/y) through the kmv roll compose."""
    Xl, Yl = 512, 320
    nbx, nby = Xl // 16, Yl // 16
    NB = nbx * nby
    rng = np.random.default_rng(2)
    prev = rng.integers(0, 1 << 24, (Yl, Xl)).astype(np.uint32)
    bts = np.zeros((1, NB), np.int32)
    mv = np.zeros((1, NB, 2), np.int32)
    rect = np.zeros((1, NB, 4), np.int32)
    want = prev.copy()
    # one shared large vector for many blocks (typical page-jump)
    mxy = (192, -128)
    for bi in range(NB):
        by, bx = divmod(bi, nbx)
        x1, y1 = bx * 16, by * 16
        if 0 <= x1 + mxy[0] <= Xl - 16 and 0 <= y1 + mxy[1] <= Yl - 16:
            bts[0, bi] = 3
            mv[0, bi] = mxy
            rect[0, bi] = (x1, y1, x1 + 16, y1 + 16)
            want[y1:y1+16, x1:x1+16] = prev[y1+mxy[1]:y1+mxy[1]+16,
                                            x1+mxy[0]:x1+mxy[0]+16]
    payload = want[None].astype(np.uint32)
    pc, mvk = prepare_kmv(bts, mv, rect, payload, K=2)
    frames = decode_sequence_kmv(jnp.array(prev), jnp.array(pc),
                                 jnp.array(mvk), jnp.array([True]))
    np.testing.assert_array_equal(np.asarray(frames)[0], want)


def test_transcode_parallel_gops_byte_identical():
    """jobs>1 GOP-parallel transcode == sequential output byte-for-byte
    (entropy state resets at every I-frame, so per-GOP codecs are exact)."""
    from jsplayer_tpu.transcode import transcode_sp

    enc = ScreenPressorEncoder(2, X, Y)
    rng = np.random.default_rng(3)
    streams, keys = [], []
    f = np.full((Y, X), pack_rgb(1, 2, 3), dtype=np.uint32).reshape(-1)
    for t in range(12):
        if t % 4 == 0:
            enc = ScreenPressorEncoder(2, X, Y)
            nf = f.copy().reshape(Y, X)
            nf[:] = pack_rgb(t, 2, 3)
            f = nf.reshape(-1)
            streams.append(enc.encode_i(f))
            keys.append(True)
        else:
            nf = f.copy().reshape(Y, X)
            nf[4:8, 4:30] = pack_rgb(*rng.integers(0, 256, 3))
            f = nf.reshape(-1)
            streams.append(enc.encode_p(f))
            keys.append(False)
    avi = mux_avi(streams, X, Y, 24, codec="SPV2", keyflags=keys)
    seq = transcode_sp(avi, target_version=4, jobs=1)
    par = transcode_sp(avi, target_version=4, jobs=4)
    assert seq == par


def test_kmv_compact_model_matches_expand():
    """Elided fused-model scan == full scan's model tensors at outmap."""
    import jax
    from jsplayer_tpu.kernels.rgb_convert import to_model_input
    from jsplayer_tpu.kernels.sp_recon import (
        compact_changed, decode_sequence_kmv, decode_sequence_kmv_compact_model)

    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(31)
    f = np.full((Y, X), pack_rgb(8, 8, 8), dtype=np.uint32).reshape(-1)
    streams = [enc.encode_i(f)]
    for t in range(7):
        nf = f.copy().reshape(Y, X)
        if t % 3 == 0:
            nf[2:, :] = nf[:-2, :].copy()
        elif t % 3 == 1:
            nf[4:8, 2:30] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
    cmds = stack_sp_commands([streams], X, Y)
    pc, mvk = prepare_kmv(cmds["bts"][0, 0], cmds["mv"][0, 0],
                          cmds["rect"][0, 0], cmds["payload"][0, 0])
    changed = np.asarray(cmds["changed"][0, 0])
    init = jnp.zeros((Y, X), jnp.uint32)
    frames = decode_sequence_kmv(init, jnp.array(pc), jnp.array(mvk),
                                 jnp.array(changed))
    want = np.asarray(to_model_input(frames, downscale=2,
                                     dtype=jnp.float32))
    pcc, mvkc, outmap = compact_changed(pc, mvk, changed)
    _carry, model = decode_sequence_kmv_compact_model(
        init, jnp.array(pcc), jnp.array(mvkc), downscale=2,
        dtype=jnp.float32)
    model = np.asarray(model)
    for t in range(len(changed)):
        if outmap[t] >= 0:
            np.testing.assert_array_equal(model[outmap[t]], want[t],
                                          err_msg=f"frame {t}")


def test_kmv_compact_unrolled_parity():
    """Unrolled compact scan (U composes per scan step, VMEM-resident
    intermediates) is bit-exact vs the 1-frame-per-step scan, including
    zero-paycode pad slots (all-copy planes = exact pass-throughs)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    Y, X, T, K = 32, 64, 8, 2
    init = jnp.array(rng.integers(0, 1 << 24, (Y, X)).astype(np.uint32))
    ptype = rng.choice([0, 1, 2], (T, Y, X), p=[0.5, 0.3, 0.2]).astype(np.uint32)
    kslot = rng.integers(0, K, (T, Y, X)).astype(np.uint32)
    pix = rng.integers(0, 1 << 24, (T, Y, X)).astype(np.uint32)
    pc_np = (np.where(ptype == 1, pix, 0) | (ptype << 24)
             | np.where(ptype == 2, kslot << 26, 0))
    pc_np[5] = 0  # an all-copy (pad-style) plane mid-stream
    pc = jnp.array(pc_np)
    mvk = jnp.array(rng.integers(-4, 5, (T, K, 2)).astype(np.int32))
    a = np.asarray(decode_sequence_kmv(init, pc, mvk, jnp.ones(T, bool)))
    from jsplayer_tpu.kernels.sp_recon import (
        decode_sequence_kmv_compact, decode_sequence_kmv_compact_unrolled)
    b = np.asarray(decode_sequence_kmv_compact(init, pc, mvk))
    np.testing.assert_array_equal(a, b)
    for u in (2, 4):
        c = np.asarray(decode_sequence_kmv_compact_unrolled(init, pc, mvk,
                                                            unroll=u))
        np.testing.assert_array_equal(a, c, err_msg=f"unroll={u}")
