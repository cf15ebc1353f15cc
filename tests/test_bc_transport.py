"""Block-command (bc) transport parity: per-block types/rects + pixel-only
plane must reproduce the kmv dense-paycode compose bit-exactly.

The bc transport exists to collapse the host fill cost (no motion fills,
no clears, no dirty tracking — the plane carries only data-rect pixels);
its pixel semantics must equal prepare_kmv/compose_frame_kmv on every
command mix (kernels/sp_recon.compose_frame_bc docstring).
"""

import numpy as np
import jax.numpy as jnp

from jsplayer_tpu.kernels import sp_recon
from jsplayer_tpu.pipeline.batch import stack_sp_commands

import test_lane_container as tlc


def _commands(seed, X, Y, T):
    streams, gold, keys = tlc.make_stream(seed, X, Y, T)
    cmds = stack_sp_commands([streams], X, Y)
    return ({k: v[0, 0] for k, v in cmds.items()}, gold)


def test_bc_matches_kmv():
    X, Y, T = 64, 48, 10
    c, gold = _commands(0, X, Y, T)
    pc, mvk = sp_recon.prepare_kmv(c["bts"], c["mv"], c["rect"],
                                   c["payload"], K=2)
    plane, bcode, rloc, mvk_bc = sp_recon.prepare_bc(
        c["bts"], c["mv"], c["rect"], c["payload"], K=2)
    np.testing.assert_array_equal(mvk, mvk_bc)
    init = jnp.zeros((Y, X), jnp.uint32)
    ref = np.asarray(sp_recon.decode_sequence_kmv(
        init, jnp.array(pc), jnp.array(mvk), jnp.array(c["changed"])))
    got = np.asarray(sp_recon.decode_sequence_bc(
        init, jnp.array(plane), jnp.array(bcode), jnp.array(rloc),
        jnp.array(mvk_bc), jnp.array(c["changed"])))
    np.testing.assert_array_equal(got, ref)
    for t in range(T):
        np.testing.assert_array_equal(
            got[t].reshape(-1), gold[t] & 0x00FFFFFF, err_msg=f"t={t}")


def test_bc_plane_non_data_bytes_ignored():
    """The bc contract: bytes outside data rects are never read — fill the
    plane's non-data areas with garbage and the output must not change."""
    X, Y, T = 64, 48, 8
    c, gold = _commands(1, X, Y, T)
    plane, bcode, rloc, mvk = sp_recon.prepare_bc(
        c["bts"], c["mv"], c["rect"], c["payload"], K=2)
    rng = np.random.default_rng(0)
    garbage = rng.integers(0, 1 << 24, plane.shape).astype(np.uint32)
    # rebuild the data mask per frame; garbage everywhere else
    nbx = (X + 15) // 16
    yy, xx = np.mgrid[0:Y, 0:X]
    bi = (yy >> 4) * nbx + (xx >> 4)
    ly, lx = yy & 15, xx & 15
    dirty_plane = garbage.copy()
    for t in range(T):
        bt = bcode[t][bi]
        r = rloc[t][bi]
        is_data = ((bt == 1) & (lx >= r[..., 0]) & (lx < r[..., 2])
                   & (ly >= r[..., 1]) & (ly < r[..., 3]))
        dirty_plane[t][is_data] = plane[t][is_data]
    init = jnp.zeros((Y, X), jnp.uint32)
    ref = np.asarray(sp_recon.decode_sequence_bc(
        init, jnp.array(plane), jnp.array(bcode), jnp.array(rloc),
        jnp.array(mvk), jnp.array(c["changed"])))
    got = np.asarray(sp_recon.decode_sequence_bc(
        init, jnp.array(dirty_plane), jnp.array(bcode), jnp.array(rloc),
        jnp.array(mvk), jnp.array(c["changed"])))
    np.testing.assert_array_equal(got, ref)


def test_bc_native_matches_numpy():
    """The native bc emission must agree with prepare_bc on block codes,
    rects, mvk, and data-rect plane pixels — and the device compose over
    the native transport must reproduce golden frames."""
    from jsplayer_tpu import native as spnative

    if not spnative.available():
        import pytest

        pytest.skip("native library unavailable")
    X, Y, T = 64, 48, 10
    streams, gold, keys = tlc.make_stream(3, X, Y, T)
    got = spnative.native_sp_decode_streams_bc([streams], X, Y, K=2)
    c, _ = _commands(3, X, Y, T)
    plane_np, bcode_np, rloc_np, mvk_np = sp_recon.prepare_bc(
        c["bts"], c["mv"], c["rect"], c["payload"], K=2)
    np.testing.assert_array_equal(got["bcode"][0], bcode_np)
    np.testing.assert_array_equal(got["mvk"][0], mvk_np)
    # rects must agree wherever the block is non-copy (copy rects unused)
    nz = bcode_np != 0
    np.testing.assert_array_equal(got["rloc"][0][nz], rloc_np[nz])
    # plane: data-rect pixels equal; elsewhere unread
    nbx = (X + 15) // 16
    yy, xx = np.mgrid[0:Y, 0:X]
    bi = (yy >> 4) * nbx + (xx >> 4)
    ly, lx = yy & 15, xx & 15
    for t in range(T):
        bt = bcode_np[t][bi]
        r = rloc_np[t][bi]
        is_data = ((bt == 1) & (lx >= r[..., 0]) & (lx < r[..., 2])
                   & (ly >= r[..., 1]) & (ly < r[..., 3]))
        np.testing.assert_array_equal(got["plane"][0, t][is_data],
                                      plane_np[t][is_data], err_msg=f"t={t}")
    # end-to-end: device compose over the native transport == golden
    init = jnp.zeros((Y, X), jnp.uint32)
    frames = np.asarray(sp_recon.decode_sequence_bc(
        init, jnp.array(got["plane"][0]), jnp.array(got["bcode"][0]),
        jnp.array(got["rloc"][0]), jnp.array(got["mvk"][0]),
        jnp.array(got["changed"][0])))
    for t in range(T):
        np.testing.assert_array_equal(frames[t].reshape(-1),
                                      gold[t] & 0x00FFFFFF, err_msg=f"t={t}")


def _run_pipeline(avis, cfg, B, nframes, Y, X, golds):
    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.pipeline.ingest import VideoIngestPipeline

    pipe = VideoIngestPipeline([MemorySource(a) for a in avis], cfg)
    carry = [np.zeros(Y * X, np.uint32) for _ in range(B)]
    for batch in pipe:
        fr = np.asarray(batch["frames_u32"])
        if "outmap" in batch:
            outmap = np.asarray(batch["outmap"])
            for b in range(B):
                rows = []
                for t in range(outmap.shape[1]):
                    gi = batch["start_frame"] + t
                    if gi >= nframes:
                        break
                    if outmap[b, t] >= 0:
                        rows.append(int(outmap[b, t]))
                        got = fr[outmap[b, t]].reshape(-1)
                    else:
                        got = carry[b]
                    np.testing.assert_array_equal(
                        got, golds[b][gi] & 0x00FFFFFF,
                        err_msg=f"b={b} t={gi}")
                if rows:
                    carry[b] = fr[max(rows)].reshape(-1)
        else:
            for b in range(B):
                for t in range(fr.shape[1]):
                    gi = batch["start_frame"] + t
                    if gi < nframes:
                        np.testing.assert_array_equal(
                            fr[b, t].reshape(-1), golds[b][gi] & 0x00FFFFFF,
                            err_msg=f"b={b} t={gi}")


def test_bc_ingest_pipeline():
    from jsplayer_tpu.pipeline.ingest import IngestConfig

    X, Y, T = 64, 48, 8
    avis, golds = zip(*[tlc.make_avi(s, X, Y, T) for s in range(2)])
    _run_pipeline(avis, IngestConfig(window=4, sp_device_path="bc"),
                  2, T, Y, X, golds)


def test_bc_ingest_elision():
    from jsplayer_tpu.pipeline.ingest import IngestConfig

    X, Y, T = 64, 48, 8
    avis, golds = zip(*[tlc.make_avi(s, X, Y, T, key_every=4)
                        for s in range(2)])
    _run_pipeline(avis,
                  IngestConfig(window=4, sp_device_path="bc",
                               still_elision=True),
                  2, T, Y, X, golds)


def test_bc_ingest_mesh():
    from jsplayer_tpu.pipeline.ingest import IngestConfig
    from jsplayer_tpu.pipeline.mesh import make_mesh

    X, Y, T = 48, 32, 6
    mesh = make_mesh(dp=8, gop=1)
    avis, golds = zip(*[tlc.make_avi(s, X, Y, T) for s in range(8)])
    _run_pipeline(avis,
                  IngestConfig(window=3, sp_device_path="bc", mesh=mesh),
                  8, T, Y, X, golds)


def test_bc_ingest_gop_mesh():
    """bc transport through the GOP-grouped window path: G keyframe-led
    windows per sharded [B, G, T] dispatch on the (dp, gop) mesh."""
    from jsplayer_tpu.pipeline.ingest import IngestConfig
    from jsplayer_tpu.pipeline.mesh import make_mesh

    X, Y, T = 48, 32, 12
    mesh = make_mesh(dp=4, gop=2)
    avis, golds = zip(*[tlc.make_avi(s, X, Y, T, key_every=3)
                        for s in range(4)])
    _run_pipeline(avis,
                  IngestConfig(window=3, sp_device_path="bc", mesh=mesh),
                  4, T, Y, X, golds)


def test_bc_ingest_model_only_matches_kmv():
    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.pipeline.ingest import IngestConfig, VideoIngestPipeline

    X, Y, T = 64, 48, 6
    avi, gold = tlc.make_avi(5, X, Y, T)
    outs = []
    for path in ("kmv", "bc"):
        pipe = VideoIngestPipeline(
            [MemorySource(avi)],
            IngestConfig(window=6, sp_device_path=path, emit_frames=False,
                         emit_model_input=True))
        (w,) = list(pipe)
        outs.append(np.asarray(w["model_input"], dtype=np.float32))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_model_packed_output():
    """model_packed=True emits the packed ds2 plane; a consumer's
    unpack_ds2(flip_vertical=False) must reproduce the unpacked product
    bit-exactly, across the plain, fused, and elided paths."""
    from jsplayer_tpu.core.source import MemorySource
    from jsplayer_tpu.kernels.rgb_convert import unpack_ds2
    from jsplayer_tpu.pipeline.ingest import IngestConfig, VideoIngestPipeline

    X, Y, T = 64, 48, 6
    avi, gold = tlc.make_avi(9, X, Y, T)
    for extra in (dict(), dict(emit_frames=False),
                  dict(still_elision=True)):
        ref_pipe = VideoIngestPipeline(
            [MemorySource(avi)],
            IngestConfig(window=6, model_downscale=2, **extra))
        pk_pipe = VideoIngestPipeline(
            [MemorySource(avi)],
            IngestConfig(window=6, model_downscale=2, model_packed=True,
                         **extra))
        (rw,) = list(ref_pipe)
        (pw,) = list(pk_pipe)
        want = np.asarray(rw["model_input"], dtype=np.float32)
        red = pw["model_input"]
        got = np.asarray(unpack_ds2(red, flip_vertical=False),
                         dtype=np.float32)
        np.testing.assert_array_equal(got, want, err_msg=str(extra))


def test_bc_compact_scan():
    X, Y, T = 48, 32, 8
    c, gold = _commands(2, X, Y, T)
    plane, bcode, rloc, mvk = sp_recon.prepare_bc(
        c["bts"], c["mv"], c["rect"], c["payload"], K=2)
    changed = np.asarray(c["changed"])
    idx = np.nonzero(changed)[0]
    init = jnp.zeros((Y, X), jnp.uint32)
    frames = np.asarray(sp_recon.decode_sequence_bc_compact(
        init, jnp.array(plane[idx]), jnp.array(bcode[idx]),
        jnp.array(rloc[idx]), jnp.array(mvk[idx])))
    outmap = np.cumsum(changed).astype(np.int32) - 1
    for t in range(T):
        want = gold[t] & 0x00FFFFFF
        got = (frames[outmap[t]].reshape(-1) if outmap[t] >= 0
               else np.zeros(Y * X, np.uint32))
        np.testing.assert_array_equal(got, want, err_msg=f"t={t}")
