"""Pallas motion-compose kernels (interpret mode on CPU): the DMA-patch path
and the MXU-shuffle path must match the XLA reference compose bit-exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
from jsplayer_tpu.pipeline.batch import stack_sp_commands
from jsplayer_tpu.kernels import sp_recon
from jsplayer_tpu.kernels.sp_motion_pallas import decode_sequence_fused
from jsplayer_tpu.kernels.sp_motion_mxu import compose_frame_mxu_safe

X, Y = 128, 32
NPIX = X * Y


def build_stream(seed=0, n=6):
    rng = np.random.default_rng(seed)
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(7, 7, 7), dtype=np.uint32)
    f[4:9, 4:9] = pack_rgb(1, 2, 3)
    f = f.reshape(-1)
    streams = [enc.encode_i(f)]
    golds = [f]
    for t in range(n - 1):
        nf = f.copy().reshape(Y, X)
        if t % 2 == 0:
            nf[2:, :] = nf[:-2, :].copy()  # scroll → motion blocks
        else:
            nf[10:14, 40:60] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    return streams, golds


def test_dma_patch_kernel_parity():
    streams, golds = build_stream(0)
    cmds = stack_sp_commands([streams], X, Y)
    frames, _ = decode_sequence_fused(
        jnp.zeros((Y, X), jnp.uint32),
        jnp.array(cmds["bts"][0, 0]), jnp.array(cmds["mv"][0, 0]),
        jnp.array(cmds["rect"][0, 0]), jnp.array(cmds["payload"][0, 0]),
        jnp.array(cmds["changed"][0, 0]), jnp.int32(0), interpret=True)
    frames = np.asarray(frames)
    for t, g in enumerate(golds):
        np.testing.assert_array_equal(frames[t].reshape(-1), g,
                                      err_msg=f"frame {t}")


def test_mxu_shuffle_kernel_parity():
    """Frame-by-frame MXU compose vs the XLA reference compose."""
    streams, golds = build_stream(1)
    cmds = stack_sp_commands([streams], X, Y)
    nbx, nby = X // 16, Y // 16
    NB = nbx * nby
    prev = np.zeros((Y, X), np.uint32)
    for t in range(len(streams)):
        bts = cmds["bts"][0, 0, t]
        mv = cmds["mv"][0, 0, t]
        rect = cmds["rect"][0, 0, t]
        payload = cmds["payload"][0, 0, t]
        if not cmds["changed"][0, 0, t]:
            continue
        # reference compose
        want = np.asarray(sp_recon.compose_frame(
            jnp.array(prev), jnp.array(bts), jnp.array(mv), jnp.array(rect),
            jnp.array(payload)))
        # mxu inputs: data code per pixel; full-motion srcs
        yy, xx = np.mgrid[0:Y, 0:X]
        bi = (yy >> 4) * nbx + (xx >> 4)
        b = bts[bi]
        r = rect[bi]
        in_rect = ((xx >= r[..., 0]) & (xx < r[..., 2])
                   & (yy >= r[..., 1]) & (yy < r[..., 3]))
        is_data = (b > 0) & (b != 3) & in_rect
        paycode = (payload & 0xFFFFFF) | (is_data.astype(np.uint32) << 24)
        by = (np.arange(NB) // nbx) * 16
        bx = (np.arange(NB) % nbx) * 16
        src_yx = np.stack([by + mv[:, 1], bx + mv[:, 0]], axis=-1).astype(np.int32)
        is_motion = (bts == 3).astype(np.int32)
        got = np.asarray(compose_frame_mxu_safe(
            jnp.array(prev), jnp.array(paycode), jnp.array(src_yx),
            jnp.array(is_motion), interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"frame {t}")
        prev = want
