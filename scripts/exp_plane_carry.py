"""Experiment: u8 BYTE-PLANE scan carry for the fused model path.

The packed-ds2 model scan's per-frame HBM traffic is paycode read (8.3
MB) + u32 prev read (8.3) + u32 carry write (8.3) + packed emit (2.1) ≈
27 MB.  Pixels are 24-bit, so carrying the frame as THREE u8 planes
(r,g,b — 6.2 MB total) cuts the carry read+write by 2/8 each → ~22.8
MB/frame, a ~16% traffic ceiling.  Only the model path can bank it: the
bit-exact path must hand consumers u32 frames, and repacking planes →
u32 per frame would give the traffic right back (the final carry repacks
ONCE per window for chaining).

Risks this measures: XLA u8 relayouts, 3x the select/roll op count, and
whether the ds2 pack survives per-plane (Pallas u8 loads are unbisected
— the XLA reduce_window fallback is A/B'd in BOTH arms for a fair
traffic-only comparison).

CPU run verifies bit-exactness (packed output + recombined carry equal
the shipped path); chip run prints the two-point A/B.

Usage: python scripts/exp_plane_carry.py [--check-only]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(X, Y, T, seed=0, corpus=None):
    from jsplayer_tpu import native
    from jsplayer_tpu.codecs.screenpressor import ScreenPressor
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
    from jsplayer_tpu.kernels import sp_recon
    from jsplayer_tpu.utils import corpora

    if corpus == "bench1080":
        frames = corpora.screen_mix(T=T, Y=Y, X=X, seed=seed)
        enc = native.NativeScreenPressorEncoder(4, X, Y)
        streams = corpora.encode_frames(frames, enc)
        got = native.native_sp_decode_streams([streams], X, Y)
        return sp_recon.prepare_kmv(got["bts"][0], got["mv"][0],
                                    got["rect"][0], got["payload"][0],
                                    K=2) + (np.asarray(got["changed"][0],
                                                       bool),)
    rng = np.random.default_rng(seed)
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(9, 9, 9), dtype=np.uint32)
    streams = [enc.encode_i(f.reshape(-1).copy())]
    for t in range(T - 1):
        if t % 3 == 0:
            f[8:, :] = f[:-8, :].copy()
        y0, x0 = int(rng.integers(0, Y - 8)), int(rng.integers(0, X - 8))
        f[y0:y0 + 7, x0:x0 + 7] = pack_rgb(*rng.integers(0, 256, 3))
        streams.append(enc.encode_p(f.reshape(-1).copy()))
    dec = ScreenPressor(X, Y, 24)
    dec.preinit(0)
    nb = ((Y + 15) // 16) * ((X + 15) // 16)
    bts = np.zeros((T, nb), np.int32)
    mv = np.zeros((T, nb, 2), np.int32)
    rect = np.zeros((T, nb, 4), np.int32)
    payload = np.zeros((T, Y, X), np.uint32)
    for t, src in enumerate(streams):
        cap = {}
        dec.capture = cap
        dst = np.zeros(X * Y, np.uint32)
        (dec.decompress_i if dec.is_key_frame(src)
         else dec.decompress_p)(src, dst)
        payload[t] = dec.previous_frame().reshape(Y, X)
        bts[t], mv[t], rect[t] = cap["bts"], cap["mv"], cap["rect"]
    pc, mvk = sp_recon.prepare_kmv(bts, mv, rect, payload, K=2)
    return pc, mvk, np.ones(T, bool)


def plane_scan(init_planes, pc, mvk, pack):
    """Plane-carry model scan: carry = (b, g, r) u8 planes."""
    import jax
    import jax.numpy as jnp

    K = mvk.shape[1]

    def step(prev, inp):
        p, mk = inp
        ptype = (p >> 24) & 3
        kslot = (p >> 26) & 7
        is_data = ptype == 1
        is_motion = ptype == 2
        outs = []
        for i, shift in enumerate((0, 8, 16)):
            pay = ((p >> shift) & 0xFF).astype(jnp.uint8)
            o = jnp.where(is_data, pay, prev[i])
            for k in range(K):
                sh = jnp.roll(prev[i], shift=(-mk[k, 1], -mk[k, 0]),
                              axis=(0, 1))
                o = jnp.where(is_motion & (kslot == k), sh, o)
            outs.append(o)
        outs = tuple(outs)
        return outs, pack(outs)

    last, model = jax.lax.scan(step, init_planes, (pc, mvk))
    return last, model


def pack_planes_xla(planes):
    """reduce_window field-sum pack from u8 planes (== ds2_pack_ref)."""
    import jax
    import jax.numpy as jnp

    b, g, r = planes
    f = (b.astype(jnp.int32) | (g.astype(jnp.int32) << 10)
         | (r.astype(jnp.int32) << 20))
    return jax.lax.reduce_window(f, 0, jax.lax.add, (2, 2), (2, 2), "VALID")


def pack_u32_xla(out):
    from jsplayer_tpu.kernels.rgb_convert import ds2_pack_ref

    return ds2_pack_ref(out)


def split_planes(frame_u32):
    import jax.numpy as jnp

    return tuple(((frame_u32 >> s) & 0xFF).astype(jnp.uint8)
                 for s in (0, 8, 16))


def join_planes(planes):
    import jax.numpy as jnp

    b, g, r = (p.astype(jnp.uint32) for p in planes)
    return b | (g << 8) | (r << 16)


def cpu_check():
    import jax
    import jax.numpy as jnp

    from jsplayer_tpu.kernels import sp_recon

    X, Y, T = 64, 64, 10
    pc, mvk, changed = build(X, Y, T, seed=1)
    idx = np.nonzero(changed)[0]
    pc, mvk = pc[idx], mvk[idx]
    init = jnp.zeros((Y, X), jnp.uint32)

    def shipped(ini, p, m):
        def step(prev, inp):
            out = sp_recon.compose_frame_kmv(prev, inp[0], inp[1])
            return out, pack_u32_xla(out)
        return jax.lax.scan(step, ini, (p, m))

    last_a, model_a = jax.jit(shipped)(init, jnp.asarray(pc),
                                       jnp.asarray(mvk))
    last_b, model_b = jax.jit(
        lambda ini, p, m: plane_scan(ini, p, m, pack_planes_xla))(
        split_planes(init), jnp.asarray(pc), jnp.asarray(mvk))
    np.testing.assert_array_equal(np.asarray(model_a), np.asarray(model_b))
    np.testing.assert_array_equal(
        np.asarray(last_a) & 0x00FFFFFF,
        np.asarray(jax.jit(join_planes)(last_b)))
    print(f"plane-carry bit-exact vs shipped ({len(idx)} changed frames)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()
    cpu_check()
    if args.check_only:
        return
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("no accelerator; stopping after CPU check", file=sys.stderr)
        return
    from jsplayer_tpu.kernels.rgb_convert import ds2_pack
    from jsplayer_tpu.kernels.sp_recon import compose_frame_kmv

    X, Y, T = 1920, 1080, 64
    pc, mvk, changed = build(X, Y, T, corpus="bench1080")
    idx = np.nonzero(changed)[0]
    pcd = jax.device_put(jnp.asarray(pc[idx]))
    mvd = jax.device_put(jnp.asarray(mvk[idx]))
    init = jnp.zeros((Y, X), jnp.uint32)
    report = {"changed_frames": int(len(idx)), "window": T}

    def timed(loop_fn):
        # pcd/mvd ride as jit ARGUMENTS: closures over large device
        # constants serialize into the axon remote-compile POST, which
        # rejects them with HTTP 413 (and serializing them burns minutes)
        jl = jax.jit(loop_fn)
        _ = int(np.asarray(jl(jnp.int32(1), pcd, mvd)).reshape(-1)[0])
        t1 = time.perf_counter()
        _ = int(np.asarray(jl(jnp.int32(3), pcd, mvd)).reshape(-1)[0])
        t2 = time.perf_counter()
        _ = int(np.asarray(jl(jnp.int32(13), pcd, mvd)).reshape(-1)[0])
        t3 = time.perf_counter()
        return T / (((t3 - t2) - (t2 - t1)) / 10)

    try:
        for name, pack_a, pack_b in (("xla_pack", pack_u32_xla,
                                      pack_planes_xla),
                                     ("pallas_vs_xla", ds2_pack,
                                      pack_planes_xla)):
            def loop_u32(n, p, m, pack=pack_a):
                def body(i, c):
                    ini = init ^ (c & jnp.uint32(1))
                    def step(prev, inp):
                        out = compose_frame_kmv(prev, inp[0], inp[1])
                        return out, pack(out)
                    _, model = jax.lax.scan(step, ini, (p, m))
                    return c ^ jnp.bitwise_xor.reduce(
                        model.reshape(-1).astype(jnp.uint32))
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

            def loop_planes(n, p, m, pack=pack_b):
                def body(i, c):
                    ini = tuple(pl ^ (c & jnp.uint8(1)).astype(jnp.uint8)
                                for pl in split_planes(init))
                    _, model = plane_scan(ini, p, m, pack)
                    return c ^ jnp.bitwise_xor.reduce(
                        model.reshape(-1).astype(jnp.uint32))
                return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

            report[name] = {"u32_carry_fps": round(timed(loop_u32), 1),
                            "plane_carry_fps": round(timed(loop_planes), 1)}
            print(name, report[name], file=sys.stderr, flush=True)
    finally:
        # rows measured so far survive a mid-run tunnel death
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
