"""Sharded batch-decode pipeline: SP device recon parity + (dp, gop) mesh
decode on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jsplayer_tpu.codecs.screenpressor import ScreenPressor
from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.encode.msv1_enc import encode_frame_16
from jsplayer_tpu.codecs.msvideo1 import MSVideo1_16bit, from_rgb15
from jsplayer_tpu.kernels import sp_recon
from jsplayer_tpu.pipeline.batch import (
    DecodeConfig,
    make_msv1_decode_step,
    make_sp_decode_step,
    stack_msv1_commands,
    stack_sp_commands,
)
from jsplayer_tpu.pipeline.mesh import make_mesh

X, Y = 32, 32
NPIX = X * Y


def sp_stream(rng, nframes, version=4, with_motion=True):
    """Build an SP stream (frame bytes) + golden frames, starting with I."""
    enc = ScreenPressorEncoder(version, X, Y)
    f = np.full((Y, X), pack_rgb(7, 7, 7), dtype=np.uint32)
    for _ in range(4):
        x0, y0 = int(rng.integers(0, X - 8)), int(rng.integers(0, Y - 8))
        f[y0 : y0 + 6, x0 : x0 + 6] = pack_rgb(*rng.integers(0, 256, 3))
    f = f.reshape(-1)
    streams = [enc.encode_i(f)]
    golds = [f]
    for t in range(nframes - 1):
        nf = f.copy().reshape(Y, X)
        if with_motion and t % 3 == 1:
            nf[2:, :] = nf[:-2, :].copy()  # scroll → motion candidate (0,-2)
        else:
            x0, y0 = int(rng.integers(0, X - 6)), int(rng.integers(0, Y - 6))
            nf[y0 : y0 + 4, x0 : x0 + 4] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    return streams, golds


def test_sp_recon_device_parity():
    rng = np.random.default_rng(0)
    streams, golds = sp_stream(rng, 6)
    cmds = stack_sp_commands([streams], X, Y)
    frames, signif = sp_recon.decode_sequence(
        jnp.zeros((Y, X), dtype=jnp.uint32),
        jnp.array(cmds["bts"][0, 0]),
        jnp.array(cmds["mv"][0, 0]),
        jnp.array(cmds["rect"][0, 0]),
        jnp.array(cmds["payload"][0, 0]),
        jnp.array(cmds["changed"][0, 0]),
        jnp.int32(0),
    )
    frames = np.asarray(frames)
    for t, g in enumerate(golds):
        np.testing.assert_array_equal(frames[t].reshape(-1), g,
                                      err_msg=f"frame {t}")


def test_sp_recon_no_change_frames():
    rng = np.random.default_rng(1)
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full(NPIX, pack_rgb(3, 3, 3), dtype=np.uint32)
    streams = [enc.encode_i(f), enc.encode_p(f), enc.encode_p(f)]
    cmds = stack_sp_commands([streams], X, Y)
    frames, signif = sp_recon.decode_sequence(
        jnp.zeros((Y, X), dtype=jnp.uint32),
        jnp.array(cmds["bts"][0, 0]), jnp.array(cmds["mv"][0, 0]),
        jnp.array(cmds["rect"][0, 0]), jnp.array(cmds["payload"][0, 0]),
        jnp.array(cmds["changed"][0, 0]), jnp.int32(0),
    )
    frames = np.asarray(frames)
    for t in range(3):
        np.testing.assert_array_equal(frames[t].reshape(-1), f)
    assert not np.asarray(signif)[1:].any()


def test_sharded_sp_decode_dp_gop_mesh():
    """4 streams × 2 GOPs over a (4, 2) mesh of 8 CPU devices."""
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(2)
    B, G, Tg = 4, 2, 3
    streams, golds = [], []
    for b in range(B):
        s_all, g_all = [], []
        for g in range(G):  # each GOP independent: starts with I
            s, gd = sp_stream(rng, Tg, with_motion=False)
            s_all += s
            g_all += gd
        streams.append(s_all)
        golds.append(g_all)
    cmds = stack_sp_commands(streams, X, Y, gops=G)
    mesh = make_mesh(dp=4, gop=2)
    cfg = DecodeConfig(height=Y, width=X)
    step = make_sp_decode_step(mesh, cfg)
    frames, signif = step(
        jnp.array(cmds["bts"]), jnp.array(cmds["mv"]), jnp.array(cmds["rect"]),
        jnp.array(cmds["payload"]), jnp.array(cmds["changed"]),
    )
    frames = np.asarray(frames)  # [B, G, Tg, Y, X]
    for b in range(B):
        for g in range(G):
            for t in range(Tg):
                np.testing.assert_array_equal(
                    frames[b, g, t].reshape(-1), golds[b][g * Tg + t],
                    err_msg=f"stream {b} gop {g} frame {t}",
                )


def test_sharded_msv1_decode_with_model_epilogue():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(3)
    B, G, Tg = 8, 1, 4
    streams, golds = [], []
    for b in range(B):
        f = np.zeros((Y, X), dtype=np.uint32)
        f[:] = from_rgb15(int(rng.integers(0, 0x8000)))
        frames_px, ss = [], []
        prev = None
        for t in range(Tg):
            f = f.copy()
            x0, y0 = int(rng.integers(0, X - 4)) & ~3, int(rng.integers(0, Y - 4)) & ~3
            f[y0 : y0 + 4, x0 : x0 + 4] = from_rgb15(int(rng.integers(0, 0x8000)))
            flat = f.reshape(-1)
            ss.append(encode_frame_16(flat, prev, X, Y))
            frames_px.append(flat)
            prev = flat
        streams.append(ss)
        golds.append(frames_px)
    cmds = stack_msv1_commands(streams, X, Y, gops=G)
    mesh = make_mesh(dp=8, gop=1)
    cfg = DecodeConfig(height=Y, width=X, emit_model_input=True)
    step = make_msv1_decode_step(mesh, cfg)
    out, signif = step(
        jnp.array(cmds["btype"]), jnp.array(cmds["sel"]),
        jnp.array(cmds["colors"]), jnp.array(cmds["changes"]),
    )
    assert out.shape == (B, G, Tg, Y, X, 3)
    assert out.dtype == jnp.bfloat16
    # verify a pixel against golden: channel 0 is true RED = the u32 HIGH
    # byte (reference canvas swizzle, Manager.hx:377-380)
    out = np.asarray(out.astype(jnp.float32))
    for b in range(B):
        g0 = golds[b][-1].reshape(Y, X)
        px = int(g0[5, 5])
        want_ch0 = ((px >> 16) & 0xFF) / 255.0  # high byte = R
        got = out[b, 0, -1, Y - 1 - 5, 5, 0]  # flipped vertically
        np.testing.assert_allclose(got, want_ch0, atol=1 / 128)


def test_sp_decode_step_kmv_matches_general():
    """Production kmv shard_map step == general shard_map step on the
    (dp, gop) mesh (8 virtual devices)."""
    import numpy as np
    import jax.numpy as jnp
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
    from jsplayer_tpu.kernels import sp_recon
    from jsplayer_tpu.pipeline.batch import (
        DecodeConfig, make_sp_decode_step, make_sp_decode_step_kmv,
        stack_sp_commands)
    from jsplayer_tpu.pipeline.mesh import make_mesh

    X = Y = 32
    B, G, Tg = 4, 2, 3
    rng = np.random.default_rng(0)
    streams = []
    for b in range(B):
        s_all = []
        for g in range(G):
            enc = ScreenPressorEncoder(4, X, Y)
            f = np.full((Y, X), pack_rgb(b, g, 7), dtype=np.uint32).reshape(-1)
            s_all.append(enc.encode_i(f))
            for t in range(Tg - 1):
                f = f.copy().reshape(Y, X)
                if t % 2 == 0:
                    f[2:, :] = f[:-2, :].copy()
                else:
                    f[4:8, 4:20] = pack_rgb(*rng.integers(0, 256, 3))
                f = f.reshape(-1)
                s_all.append(enc.encode_p(f))
        streams.append(s_all)
    cmds = stack_sp_commands(streams, X, Y, gops=G)
    mesh = make_mesh(dp=4, gop=2)
    cfg = DecodeConfig(height=Y, width=X, emit_model_input=True)
    out, _sig = make_sp_decode_step(mesh, cfg)(
        jnp.array(cmds["bts"]), jnp.array(cmds["mv"]), jnp.array(cmds["rect"]),
        jnp.array(cmds["payload"]), jnp.array(cmds["changed"]))
    pcs = np.zeros((B, G, Tg, Y, X), dtype=np.uint32)
    mvks = np.zeros((B, G, Tg, 2, 2), dtype=np.int32)
    for b in range(B):
        for g in range(G):
            pcs[b, g], mvks[b, g] = sp_recon.prepare_kmv(
                cmds["bts"][b, g], cmds["mv"][b, g], cmds["rect"][b, g],
                cmds["payload"][b, g], K=2)
    kout = make_sp_decode_step_kmv(mesh, cfg)(
        jnp.zeros((B, G, Y, X), jnp.uint32), jnp.array(pcs),
        jnp.array(mvks), jnp.array(cmds["changed"]))
    np.testing.assert_array_equal(np.asarray(kout, dtype=np.float32),
                                  np.asarray(out, dtype=np.float32))


def test_ingest_gop_axis_grouped_windows():
    """(dp, gop) mesh through VideoIngestPipeline: G keyframe-led windows
    decode in ONE sharded [B, G, T] dispatch — the sequence-parallel axis
    for long streams (SURVEY §2 SP/CP row).  Bit-exact vs golds, including
    the carry into the next group and stream-end padding."""
    import jax
    from jsplayer_tpu import native as _nat
    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
    from jsplayer_tpu.pipeline.ingest import IngestConfig, VideoIngestPipeline
    from jsplayer_tpu.pipeline.mesh import make_mesh

    if not _nat.available():
        pytest.skip("native decoder unavailable")
    nd = len(jax.devices())
    if nd < 8:
        pytest.skip("needs 8 devices")
    X = Y = 32
    W = 4  # window == keyframe cadence → keyframe-led windows
    mesh = make_mesh(dp=2, gop=4)
    rng = np.random.default_rng(9)

    def build(seed):
        enc = ScreenPressorEncoder(4, X, Y)
        f = np.full((Y, X), pack_rgb(seed, 3, 5), dtype=np.uint32)
        streams, golds = [], []
        for t in range(22):  # 6 windows (last two partial/padded)
            f = f.copy()
            if t % 3 == 1:
                f[2:, :] = f[:-2, :]
            f[(t % 5) * 5 : (t % 5) * 5 + 4, 6:26] = pack_rgb(
                *rng.integers(0, 256, 3))
            flat = f.reshape(-1)
            streams.append(enc.encode_i(flat) if t % W == 0
                           else enc.encode_p(flat))
            golds.append(flat)
        return mux_avi(streams, X, Y, 24, codec="SPV4",
                       keyflags=[t % W == 0 for t in range(22)]), golds

    avis, golds = zip(*(build(s) for s in (1, 2)))
    pipe = VideoIngestPipeline(
        [MemorySource(a) for a in avis],
        IngestConfig(window=W, mesh=mesh))
    n_windows = 0
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        start = batch["start_frame"]
        for b in range(2):
            for t in range(fr.shape[1]):
                gi = min(start + t, len(golds[b]) - 1)
                np.testing.assert_array_equal(
                    fr[b, t].reshape(-1), golds[b][gi],
                    err_msg=f"stream {b} frame {start + t}")
        n_windows += 1
    assert n_windows == 6
