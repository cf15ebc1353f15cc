"""On-chip validation + benchmarking, run when the TPU is reachable.

Usage: python scripts/tpu_validate.py
Runs: (1) kernel compile checks (pallas patch, MXU shuffle), (2) on-chip
parity vs host-decoded golds, (3) the multi-strategy bench, (4) fused
epilogue bench.  Appends results to TPU_RESULTS.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    results = {}

    # 1. small on-chip parity of all SP motion strategies vs golds
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
    from jsplayer_tpu.pipeline.batch import stack_sp_commands
    from jsplayer_tpu.kernels import sp_recon

    X, Y = 256, 128
    enc = ScreenPressorEncoder(4, X, Y)
    rng = np.random.default_rng(0)
    f = np.full((Y, X), pack_rgb(7, 7, 7), dtype=np.uint32)
    f = f.reshape(-1)
    streams, golds = [enc.encode_i(f)], [f]
    for t in range(6):
        nf = f.copy().reshape(Y, X)
        if t % 2 == 0:
            nf[4:, :] = nf[:-4, :].copy()
        else:
            nf[10:30, 40:200] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
        golds.append(f)
    cmds = stack_sp_commands([streams], X, Y)
    args = (jnp.zeros((Y, X), jnp.uint32),
            jnp.array(cmds["bts"][0, 0]), jnp.array(cmds["mv"][0, 0]),
            jnp.array(cmds["rect"][0, 0]), jnp.array(cmds["payload"][0, 0]),
            jnp.array(cmds["changed"][0, 0]), jnp.int32(0))

    frames, _ = sp_recon.decode_sequence(*args)
    ok = all(np.array_equal(np.asarray(frames[t]).reshape(-1), golds[t])
             for t in range(len(golds)))
    results["xla_parity"] = ok
    print("xla parity:", ok)

    try:
        from jsplayer_tpu.kernels.sp_motion_pallas import decode_sequence_fused
        frames, _ = decode_sequence_fused(*args)
        ok = all(np.array_equal(np.asarray(frames[t]).reshape(-1), golds[t])
                 for t in range(len(golds)))
        results["pallas_patch_parity"] = ok
    except Exception as e:
        results["pallas_patch_parity"] = f"compile-fail: {str(e)[:160]}"
    print("pallas patch:", results["pallas_patch_parity"])

    try:
        from jsplayer_tpu.kernels.sp_motion_mxu import compose_frame_mxu_safe
        from jsplayer_tpu.kernels.sp_recon import block_broadcast
        prev = jnp.array(golds[0].reshape(Y, X))
        bts = jnp.array(cmds["bts"][0, 0, 1])
        mv = jnp.array(cmds["mv"][0, 0, 1])
        rect = jnp.array(cmds["rect"][0, 0, 1])
        payload = jnp.array(cmds["payload"][0, 0, 1])
        nbx = X // 16
        NB = bts.shape[0]
        yy = np.mgrid[0:Y, 0:X][0]; xx = np.mgrid[0:Y, 0:X][1]
        bi = (yy >> 4) * nbx + (xx >> 4)
        b = np.asarray(bts)[bi]; r = np.asarray(rect)[bi]
        in_rect = ((xx >= r[..., 0]) & (xx < r[..., 2])
                   & (yy >= r[..., 1]) & (yy < r[..., 3]))
        is_data = (b > 0) & (b != 3) & in_rect
        paycode = (np.asarray(payload) & 0xFFFFFF) | (is_data.astype(np.uint32) << 24)
        by = (np.arange(NB) // nbx) * 16; bx = (np.arange(NB) % nbx) * 16
        src_yx = np.stack([by + np.asarray(mv)[:, 1], bx + np.asarray(mv)[:, 0]], -1)
        out = compose_frame_mxu_safe(prev, jnp.array(paycode),
                                     jnp.array(src_yx.astype(np.int32)),
                                     jnp.array((np.asarray(bts) == 3).astype(np.int32)))
        want = np.asarray(sp_recon.compose_frame(prev, bts, mv, rect, payload))
        results["mxu_parity"] = bool(np.array_equal(np.asarray(out), want))
    except Exception as e:
        results["mxu_parity"] = f"compile-fail: {str(e)[:160]}"
    print("mxu shuffle:", results["mxu_parity"])

    # 1b. production kmv path (native transport) parity on-chip
    try:
        from jsplayer_tpu import native
        if native.available():
            kmv = native.native_sp_decode_streams_kmv([streams], X, Y, K=2)
            frames = sp_recon.decode_sequence_kmv(
                jnp.zeros((Y, X), jnp.uint32), jnp.array(kmv["paycode"][0]),
                jnp.array(kmv["mvk"][0]), jnp.array(kmv["changed"][0]))
            ok = all(np.array_equal(np.asarray(frames[t]).reshape(-1), golds[t])
                     for t in range(len(golds)))
            results["kmv_native_parity"] = ok
        else:
            results["kmv_native_parity"] = "native unavailable"
    except Exception as e:  # noqa: BLE001
        results["kmv_native_parity"] = f"fail: {str(e)[:160]}"
    print("kmv native transport:", results["kmv_native_parity"])

    # 1c. sparse transport parity on-chip (native emission -> device scan)
    try:
        from jsplayer_tpu import native
        if native.available():
            d = native.NativeScreenPressor(X, Y, 24)
            d.preinit(0)
            nb = d.nbx * d.nby
            T = len(streams)
            bc = np.zeros((T, nb), np.uint8)
            mvkK = np.zeros((T, 2, 2), np.int32)
            tiles = np.zeros((T, nb, 16, 16), np.uint32)
            tyx = np.zeros((T, nb, 2), np.int32)
            chg = np.zeros(T, bool)
            init = None
            for t, st in enumerate(streams):
                c, sg, mu = d.decompress_kmv_sparse(
                    st, d.is_key_frame(st), bc[t], mvkK[t], tiles[t], tyx[t],
                    K=2)
                chg[t] = c
                if t == 0:
                    assert mu <= nb
            frames = sp_recon.decode_batch_kmv_sparse(
                jnp.zeros((1, Y, X), jnp.uint32), jnp.array(bc[None]),
                jnp.array(mvkK[None]), jnp.array(tiles[None]),
                jnp.array(tyx[None]), jnp.array(chg[None]))
            ok = all(np.array_equal(np.asarray(frames[0, t]).reshape(-1),
                                    golds[t]) for t in range(len(golds)))
            results["kmv_sparse_parity"] = ok
        else:
            results["kmv_sparse_parity"] = "native unavailable"
    except Exception as e:  # noqa: BLE001
        results["kmv_sparse_parity"] = f"fail: {str(e)[:160]}"
    print("kmv sparse transport:", results["kmv_sparse_parity"])

    # 1d. bc transport parity on-chip (block-command arrays + pixel plane)
    try:
        from jsplayer_tpu import native
        if native.available():
            bch = native.native_sp_decode_streams_bc([streams], X, Y, K=2)
            frames = sp_recon.decode_sequence_bc(
                jnp.zeros((Y, X), jnp.uint32), jnp.array(bch["plane"][0]),
                jnp.array(bch["bcode"][0]), jnp.array(bch["rloc"][0]),
                jnp.array(bch["mvk"][0]), jnp.array(bch["changed"][0]))
            ok = all(np.array_equal(np.asarray(frames[t]).reshape(-1),
                                    golds[t]) for t in range(len(golds)))
            results["bc_parity"] = ok
        else:
            results["bc_parity"] = "native unavailable"
    except Exception as e:  # noqa: BLE001
        results["bc_parity"] = f"fail: {str(e)[:160]}"
    print("bc transport:", results["bc_parity"])

    # 1e. lane-container parity on-chip, both payload modes (round 4:
    # raw+dedup default and rans) — the full transcode → parse → fused
    # device decode path
    from jsplayer_tpu.codecs import lane_format
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.kernels import lane_recon
    from jsplayer_tpu.transcode import transcode_to_lane

    avi = mux_avi(streams, X, Y, 24, codec="SPV4",
                  keyflags=[t == 0 for t in range(len(streams))])
    ncol = lane_format.plane_cols(X) // 128
    for mode in ("raw", "rans"):
        key = f"lane_{mode}_parity"
        try:
            cont = lane_format.container_from_bytes(transcode_to_lane(
                avi, window=len(streams), K=2, payload=mode))
            w = cont.windows[0]
            rt_np, ri_np = w.row_index(Y, ncol)
            rt, ri = jnp.asarray(rt_np), jnp.asarray(ri_np)
            if mode == "raw":
                frames = lane_recon.decode_window_raw(
                    jnp.zeros((Y, X), jnp.uint32), jnp.asarray(w.payload),
                    jnp.asarray(w.btype), jnp.asarray(w.rect),
                    jnp.asarray(w.mvk), rt, ri, jnp.asarray(w.changed))
            else:
                init0 = (jnp.asarray(w.init_plane)
                         if w.init_plane is not None
                         else jnp.zeros((Y, X), jnp.uint32))
                frames = lane_recon.decode_window_lane(
                    init0, jnp.asarray(w.refills), jnp.asarray(w.states),
                    jnp.asarray(w.freq), jnp.asarray(w.btype),
                    jnp.asarray(w.rect), jnp.asarray(w.mvk), rt, ri,
                    jnp.asarray(w.changed), U=w.n_units)
            ok = all(np.array_equal(
                np.asarray(frames[t]).reshape(-1) & 0x00FFFFFF,
                golds[t] & 0x00FFFFFF) for t in range(len(golds)))
            if mode == "raw":
                ok = bool(ok and w.unit_idx is not None)  # dedup engaged
            results[key] = ok
        except Exception as e:  # noqa: BLE001
            results[key] = f"fail: {str(e)[:160]}"
        print(key + ":", results[key])

    # 1f. ragged (keyframe-snapped) lane windows through the FULL pipeline
    # on-chip (round 4 late: transcode aligns window boundaries to source
    # keyframes → variable window lengths, prefix-sum frame bases, Tpad
    # pow2 bucketing in _iter_lane)
    try:
        from jsplayer_tpu.core.source import MemorySource
        from jsplayer_tpu.pipeline.ingest import (IngestConfig,
                                                  VideoIngestPipeline)

        enc_r = ScreenPressorEncoder(4, X, Y)
        fr = np.full((Y, X), pack_rgb(5, 6, 7), dtype=np.uint32)
        streams_r, golds_r, keys_r = [], [], []
        for t in range(14):
            fr = fr.copy()
            if t % 3 != 2:
                fr[(t % 5) * 8 : (t % 5) * 8 + 8, 8:40] = pack_rgb(
                    *rng.integers(0, 256, 3))
            isk = t % 5 == 0
            if isk:
                enc_r = ScreenPressorEncoder(4, X, Y)
            flat = fr.reshape(-1).copy()
            streams_r.append(enc_r.encode_i(flat) if isk
                             else enc_r.encode_p(flat))
            golds_r.append(flat)
            keys_r.append(isk)
        avi_r = mux_avi(streams_r, X, Y, 24, codec="SPV4", keyflags=keys_r)
        cont_r = transcode_to_lane(avi_r, window=4, K=2)
        cr = lane_format.container_from_bytes(cont_r)
        ragged = sorted(set(w.T for w in cr.windows))
        pipe = VideoIngestPipeline([MemorySource(cont_r)],
                                   IngestConfig(sp_device_path="lane"))
        got = {}
        for batch in pipe:
            arr = np.asarray(batch["frames_u32"])
            for t in range(arr.shape[1]):
                got[batch["start_frame"] + t] = arr[0, t].reshape(-1)
        ok = (len(ragged) > 1 and len(got) == len(golds_r)
              and all(np.array_equal(got[t] & 0x00FFFFFF,
                                     golds_r[t] & 0x00FFFFFF)
                      for t in range(len(golds_r))))
        results["lane_ragged_parity"] = bool(ok)
    except Exception as e:  # noqa: BLE001
        results["lane_ragged_parity"] = f"fail: {str(e)[:160]}"
    print("lane_ragged_parity:", results["lane_ragged_parity"])

    # 2. bench (skippable: --parity-only re-checks the decode paths after a
    # kernel change without paying the ~20 min multi-strategy bench)
    if "--parity-only" not in sys.argv:
        import bench
        print("running bench...")
        bench.main()
    else:
        print(json.dumps(results, indent=2))

    with open("TPU_RESULTS.md", "a") as fh:
        fh.write(f"\n## tpu_validate @ {time.ctime()}\n{json.dumps(results, indent=2)}\n")


if __name__ == "__main__":
    main()
