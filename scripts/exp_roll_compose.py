"""Round-4 ablation: can the kmv compose shed its K full-plane rolls?

compose_frame_kmv pays K=2 two-axis jnp.rolls of prev per frame (each a
pair of materialized concat-slices).  Screen-content motion is mostly
vertical scroll (dx == 0), and row gathers are the one cheap gather on
TPU (memory: tpu-layout-lessons) — so decomposing roll(dy, dx) into a
row gather (y) + a lane roll (x) should let the common dx == 0 case
skip the expensive axis entirely.  Variants, all bit-exact vs shipped:

  v0    — decode_sequence_kmv as shipped (2-axis jnp.roll per slot)
  vrow  — y via row gather prev[(iota+dy) % Y], x via jnp.roll(axis=1)
  vcond — vrow, but the x roll sits under lax.cond(dx != 0) per slot
  vskip — vcond + lax.cond skipping a slot entirely when no block in
          the frame maps to it (host-derived uses[T, K] flag)

Measured on chip 2026-08-17 (v5e, 1080p bench corpus): v0 20,829 fps /
vrow 15,923 / vcond 9,270 / vskip 4,990.  NEGATIVE across the board:
the 2-axis jnp.roll is already XLA's best expression of the compose —
a row gather whose index vector is DYNAMIC (depends on the scanned-in
dy) loses the cheap-gather property (tpu-layout-lessons applies to
static indices), and lax.cond inside the scan body costs far more than
the roll it skips (confirming sp_recon.py's skip-stills note).  Not
adopted; kept as the measured record.  Run on the real chip; prints
one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Y, X, T, K = 1080, 1920, 64, 2


def main():
    import jax
    import jax.numpy as jnp

    from jsplayer_tpu import native
    from jsplayer_tpu.kernels import sp_recon
    from jsplayer_tpu.utils import corpora

    enc = native.NativeScreenPressorEncoder(4, X, Y)
    streams = corpora.encode_frames(
        corpora.screen_mix(T=T, Y=Y, X=X, stills=1 / 3, seed=3), enc)
    kmv = native.native_sp_decode_streams_kmv([streams], X, Y, K=K)
    pc, mvk = kmv["paycode"][0], kmv["mvk"][0]
    changed = kmv["changed"][0]

    # host flag: does frame t use motion slot k at all?
    uses = np.zeros((T, K), dtype=bool)
    for t in range(T):
        mot = (pc[t] >> 24) & 3 == 2
        if mot.any():
            ks = (pc[t][mot] >> 26) & 7
            for k in range(K):
                uses[t, k] = bool((ks == k).any())

    args = jax.device_put(
        (jnp.zeros((Y, X), jnp.uint32), jnp.asarray(pc), jnp.asarray(mvk),
         jnp.asarray(changed)))
    uses_dev = jax.device_put(jnp.asarray(uses))

    def timed(fn, *a, tries=5):
        @jax.jit
        def loop(nrep, *aa):
            def body(i, carry):
                a0 = aa[0] ^ carry
                out = fn(a0, *aa[1:])
                return out.sum(dtype=jnp.uint32) ^ jnp.uint32(i)
            return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

        def t_at(nrep):
            int(loop(jnp.int32(nrep), *a))
            best = float("inf")
            for _ in range(tries):
                t0 = time.perf_counter()
                int(loop(jnp.int32(nrep), *a))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t_at(4), t_at(24)
        return T * 20 / max(t2 - t1, 1e-9)

    out = {}
    gold = np.asarray(sp_recon.decode_sequence_kmv(*args))
    out["v0_fps"] = round(timed(sp_recon.decode_sequence_kmv, *args), 1)

    ys = jnp.arange(Y, dtype=jnp.int32)

    def compose_rows(prev, paycode, mvk, mode):
        ptype = (paycode >> 24) & 3
        payload = paycode & jnp.uint32(0x00FFFFFF)
        o = jnp.where(ptype == 1, payload, prev)
        kslot = (paycode >> 26) & 7
        is_motion = ptype == 2
        for k in range(K):
            dy, dx = mvk[k, 1], mvk[k, 0]
            rows = jnp.take(prev, (ys + dy) % Y, axis=0)
            if mode == "row":
                sh = jnp.roll(rows, -dx, axis=1)
            else:  # cond modes: pay the lane roll only when dx != 0
                sh = jax.lax.cond(dx != 0,
                                  lambda r, d=dx: jnp.roll(r, -d, axis=1),
                                  lambda r: r, rows)
            o = jnp.where(is_motion & (kslot == k), sh, o)
        return o

    def mk_scan(mode):
        @jax.jit
        def run(init, paycode, mvk, changed):
            def step(prev, inp):
                pcT, mkT, chg = inp
                o = jnp.where(chg, compose_rows(prev, pcT, mkT, mode), prev)
                return o, o
            _, fr = jax.lax.scan(step, init, (paycode, mvk, changed))
            return fr
        return run

    for mode, name in (("row", "vrow"), ("cond", "vcond")):
        fn = mk_scan(mode)
        got = np.asarray(fn(*args))
        assert (got == gold).all(), f"{name} diverges"
        out[f"{name}_fps"] = round(timed(fn, *args), 1)

    @jax.jit
    def run_skip(init, paycode, mvk, changed, uses):
        def step(prev, inp):
            pcT, mkT, chg, useT = inp
            ptype = (pcT >> 24) & 3
            payload = pcT & jnp.uint32(0x00FFFFFF)
            o = jnp.where(ptype == 1, payload, prev)
            kslot = (pcT >> 26) & 7
            is_motion = ptype == 2
            for k in range(K):
                dy, dx = mkT[k, 1], mkT[k, 0]

                def slot(oo, dy=dy, dx=dx, k=k):
                    rows = jnp.take(prev, (ys + dy) % Y, axis=0)
                    sh = jax.lax.cond(
                        dx != 0,
                        lambda r, d=dx: jnp.roll(r, -d, axis=1),
                        lambda r: r, rows)
                    return jnp.where(is_motion & (kslot == k), sh, oo)

                o = jax.lax.cond(useT[k], slot, lambda oo: oo, o)
            o = jnp.where(chg, o, prev)
            return o, o
        _, fr = jax.lax.scan(step, init,
                             (paycode, mvk, changed, uses))
        return fr

    got = np.asarray(run_skip(*args, uses_dev))
    assert (got == gold).all(), "vskip diverges"
    out["vskip_fps"] = round(timed(
        lambda i, p, m, c: run_skip(i, p, m, c, uses_dev), *args), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
