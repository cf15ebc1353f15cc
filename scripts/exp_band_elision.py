"""Experiment: PER-BAND still-elision — sub-frame traffic scaling.

Whole-frame still-elision (compact_changed) skips frames where NOTHING
moved, but terminal-style content usually changes a cursor-sized region:
the frame is "changed" and the compose streams the full 8.3 MB plane for
a 200-byte delta.  Row-sliced composes measured negative (cond-gated
scan carries copy, scripts/exp_row_slice.py) — but splitting the plane
into H row BANDS and running H independent compacted scans needs no
conditionals: each band scans only the frames in which IT changed.
Composed traffic then scales with sum_b(changed_b x band_bytes) instead
of changed x frame_bytes.

Band independence is bought at command-derivation time (the host already
knows everything): motion blocks whose SOURCE rows leave their dest band
are demoted to data blocks (the existing K-slot-overflow demotion
machinery — payload carries the final content).  Bands align to 16-px
block rows so a block's dest rows never straddle a boundary.

Run on CPU it verifies bit-exactness (banded assembly == full scan);
on the chip it measures delivered fps vs the whole-frame-elision
baseline at several band counts.

Usage: python scripts/exp_band_elision.py [--bands 1,2,4,8] [--corpus terminal]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def band_slices(Y: int, n_bands: int):
    """Row ranges aligned to 16-px block rows, last band takes the tail."""
    nby = (Y + 15) // 16
    per = max(1, nby // n_bands)
    outs = []
    b0 = 0
    while b0 < nby:
        b1 = min(b0 + per, nby)
        if len(outs) == n_bands - 1:
            b1 = nby
        outs.append((b0 * 16, min(b1 * 16, Y)))
        b0 = b1
        if len(outs) == n_bands:
            break
    return outs


def demote_band_crossers(bts, rect, mvk, group, demoted, bands):
    """Extra demotion: motion whose source rows leave the dest band.
    dst[y,x] = prev[y+mvy, x+mvx] (compose_frame_kmv's roll(-mvy)), so a
    block with dest rows [gy1, gy2) reads rows [gy1+mvy, gy2+mvy)."""
    T, NB = bts.shape
    starts = np.array([y0 for y0, _ in bands])
    ends = np.array([y1 for _, y1 in bands])

    def band_of(y):
        return np.searchsorted(ends, y, side="right")

    n_extra = 0
    for t in range(T):
        mot = np.nonzero(group[t] >= 0)[0]
        if mot.size == 0:
            continue
        gy1 = rect[t, mot, 1]
        gy2 = rect[t, mot, 3]
        mvy = mvk[t, group[t, mot], 1]
        dst_b = band_of(gy1)
        bad = ((band_of(gy1 + mvy) != dst_b)
               | (band_of(gy2 - 1 + mvy) != dst_b)
               | (gy1 + mvy < 0) | (gy2 + mvy > ends[-1]))
        idx = mot[bad]
        group[t, idx] = -1
        demoted[t, idx] = True
        n_extra += int(bad.sum())
    return n_extra


def prepare_banded(bts, mv, rect, payload, K, bands):
    """prepare_kmv with band-crossing motion demoted (monkeypatched
    derivation so the pixel-packing semantics stay byte-identical)."""
    from jsplayer_tpu.kernels import sp_recon

    orig = sp_recon.derive_kmv_commands
    extra = [0]

    def banded(bts_, mv_, rect_, K_=4):
        mvk, group, demoted = orig(bts_, mv_, rect_, K_)
        extra[0] = demote_band_crossers(bts_, rect_, mvk, group, demoted,
                                        bands)
        return mvk, group, demoted

    sp_recon.derive_kmv_commands = banded
    try:
        pc, mvk = sp_recon.prepare_kmv(bts, mv, rect, payload, K)
    finally:
        sp_recon.derive_kmv_commands = orig
    return pc, mvk, extra[0]


def band_changed_flags(pc, bands):
    """[n_bands, T] bool: band b changed at t iff any non-copy pixel."""
    act = (pc >> 24) != 0  # [T, Y, X]
    return np.stack([act[:, y0:y1].any(axis=(1, 2)) for y0, y1 in bands])


def decode_banded(init, pc, mvk, bands, chg):
    """Per-band compacted scans; returns per-band (frames, outmap)."""
    import jax

    from jsplayer_tpu.kernels import sp_recon

    outs = []
    for bi, (y0, y1) in enumerate(bands):
        pcb, mvkb, outmap = sp_recon.compact_changed(
            pc[:, y0:y1], mvk, chg[bi])
        if pcb.shape[0]:
            fr = jax.jit(sp_recon.decode_sequence_kmv_compact)(
                init[y0:y1], jax.device_put(pcb), jax.device_put(mvkb))
            fr = np.asarray(fr)
        else:
            fr = np.zeros((0, y1 - y0, pc.shape[2]), np.uint32)
        outs.append((fr, outmap))
    return outs


def assemble(init, bands, band_outs, T):
    Y = init.shape[0]
    frames = np.empty((T, Y, init.shape[1]), np.uint32)
    for (y0, y1), (fr, outmap) in zip(bands, band_outs):
        for t in range(T):
            frames[t, y0:y1] = init[y0:y1] if outmap[t] < 0 else fr[outmap[t]]
    return frames


def make_corpus(name, T=None):
    from jsplayer_tpu import native
    from jsplayer_tpu.utils import corpora

    if name == "terminal":
        frames = corpora.terminal_session(T=T or 120, Y=1080, X=1920, seed=0)
    elif name == "bench":
        frames = corpora.screen_mix(T=T or 64, Y=1080, X=1920, seed=0)
    else:
        raise SystemExit(f"unknown corpus {name}")
    Y, X = 1080, 1920
    enc = native.NativeScreenPressorEncoder(4, X, Y)
    streams = corpora.encode_frames(frames, enc)
    got = native.native_sp_decode_streams([streams], X, Y)
    return (got["bts"][0], got["mv"][0], got["rect"][0],
            got["payload"][0], got["changed"][0], X, Y)


def cpu_check():
    """Small-geometry bit-exactness: banded assembly == full scan."""
    import jax

    from jsplayer_tpu.codecs.screenpressor import ScreenPressor
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb
    from jsplayer_tpu.kernels import sp_recon

    X, Y, T = 64, 64, 12
    rng = np.random.default_rng(3)
    enc = ScreenPressorEncoder(4, X, Y)
    f = np.full((Y, X), pack_rgb(9, 9, 9), dtype=np.uint32)
    streams = [enc.encode_i(f.reshape(-1).copy())]
    golds = [f.copy()]
    for t in range(T - 1):
        if t % 3 == 0:
            f[8:, :] = f[:-8, :].copy()  # vertical scroll crosses bands
        if t % 3 != 2:
            y0, x0 = int(rng.integers(0, Y - 8)), int(rng.integers(0, X - 8))
            f[y0:y0 + 7, x0:x0 + 7] = pack_rgb(*rng.integers(0, 256, 3))
        streams.append(enc.encode_p(f.reshape(-1).copy()))
        golds.append(f.copy())
    dec = ScreenPressor(X, Y, 24)
    dec.preinit(0)
    nb = (Y // 16) * (X // 16)
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
    changed = np.ones(T, bool)
    init = np.zeros((Y, X), np.uint32)
    for n_bands in (1, 2, 4):
        bands = band_slices(Y, n_bands)
        pc, mvk, extra = prepare_banded(bts, mv, rect, payload, 2, bands)
        chg = band_changed_flags(pc, bands)
        outs = decode_banded(init, pc, mvk, bands, chg)
        got = assemble(init, bands, outs, T)
        for t in range(T):
            np.testing.assert_array_equal(
                got[t] & 0x00FFFFFF, golds[t] & 0x00FFFFFF,
                err_msg=f"bands={n_bands} frame {t}")
        print(f"bands={n_bands}: bit-exact, extra demotions={extra}, "
              f"band changed rates="
              f"{[int(c.sum()) for c in chg]}/{T}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", default="1,2,4,8")
    ap.add_argument("--corpus", default="terminal")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()
    cpu_check()
    if args.check_only:
        return
    import jax

    if jax.devices()[0].platform == "cpu":
        print("no accelerator; stopping after CPU check", file=sys.stderr)
        return
    bts, mv, rect, payload, changed, X, Y = make_corpus(args.corpus,
                                                        args.frames)
    print(f"[band] corpus {args.corpus} ready: T={bts.shape[0]}",
          file=sys.stderr, flush=True)
    init = np.zeros((Y, X), np.uint32)
    report = {}
    try:
        run_bands(args, bts, mv, rect, payload, init, X, Y, report)
    finally:
        # bands measured so far survive a mid-run tunnel death
        print(json.dumps({"corpus": args.corpus, "bands": report}),
              flush=True)


def run_bands(args, bts, mv, rect, payload, init, X, Y, report):
    import jax

    from jsplayer_tpu.kernels import sp_recon

    T = bts.shape[0]
    for n_bands in (int(s) for s in args.bands.split(",")):
        bands = band_slices(Y, n_bands)
        pc, mvk, extra = prepare_banded(bts, mv, rect, payload, 2, bands)
        chg = band_changed_flags(pc, bands)
        # one jit program runs every band's compacted scan; the timing
        # probe XORs a carry into the first input and fully reduces every
        # band's output (the bench.py anti-DCE/hoist discipline)
        comp = [sp_recon.compact_changed(pc[:, y0:y1], mvk, chg[bi])
                for bi, (y0, y1) in enumerate(bands)]
        args_dev = []
        for (pcb, mvkb, _), (y0, y1) in zip(comp, bands):
            args_dev.append((jax.device_put(jax.numpy.asarray(init[y0:y1])),
                             jax.device_put(jax.numpy.asarray(pcb)),
                             jax.device_put(jax.numpy.asarray(mvkb))))

        import jax.numpy as jnp

        def all_bands(carry, *flat):
            tot = jnp.uint32(0)
            for i in range(0, len(flat), 3):
                ini, pcb, mvkb = flat[i], flat[i + 1], flat[i + 2]
                ini = ini ^ (carry & jnp.uint32(1))
                fr = sp_recon.decode_sequence_kmv_compact(ini, pcb, mvkb)
                tot ^= (jnp.bitwise_xor.reduce(fr.reshape(-1))
                        if fr.size else jnp.uint32(0))
            return tot

        # the band arrays ride as jit ARGUMENTS: closures over large
        # device constants serialize into the axon remote-compile POST,
        # which rejected the dense-corpus run with HTTP 413
        flat = [a for tup in args_dev for a in tup]

        @jax.jit
        def jl(n, *fl):
            def body(i, c):
                return all_bands(c, *fl) ^ c
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

        _ = int(jl(jnp.int32(1), *flat))  # compile+warm
        t1 = time.perf_counter()
        _ = int(jl(jnp.int32(4), *flat))
        t2 = time.perf_counter()
        _ = int(jl(jnp.int32(24), *flat))
        t3 = time.perf_counter()
        per = ((t3 - t2) - (t2 - t1)) / 20.0
        fps = T / per
        report[n_bands] = {
            "delivered_fps": round(fps, 1),
            "extra_demotions": extra,
            "scanned_rows": int(sum((y1 - y0) * c.shape[0]
                                    for (y0, y1), (c, _, _) in
                                    zip(bands, comp))),
        }
        print(n_bands, report[n_bands], file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
