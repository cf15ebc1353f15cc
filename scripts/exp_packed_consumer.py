"""Round-4 packed-ds2 consumer A/B on chip (VERDICT r3 item 7).

Delivered fps INCLUDING the consuming model step (8x8x3->128 patch-embed
conv): packed emit + in-consumer fused unpack vs unfused bf16 emit + the
same conv.  Two-point probe; bench corpus, elided scan.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Y, X, T = 1080, 1920, 64


def main():
    import jax
    import jax.numpy as jnp

    from jsplayer_tpu import native
    from jsplayer_tpu.kernels import rgb_convert, sp_recon
    from jsplayer_tpu.utils import corpora

    enc = native.NativeScreenPressorEncoder(4, X, Y)
    frames = corpora.screen_mix(T=T, Y=Y, X=X, stills=1 / 3, seed=3)
    streams = corpora.encode_frames(frames, enc)
    k = native.native_sp_decode_streams_kmv([streams], X, Y, K=2)
    pcc, mvkc, _ = sp_recon.compact_changed(
        k["paycode"][0], k["mvk"][0], np.asarray(k["changed"][0]))
    cdev = jax.device_put((jnp.zeros((Y, X), jnp.uint32), pcc, mvkc))
    wconv = jnp.array(np.random.default_rng(7).normal(0, 0.05, (8, 8, 3, 128)),
                      jnp.bfloat16)

    def timed(fn, *args, tries=5):
        @jax.jit
        def loop(nrep, *a):
            def body(i, carry):
                a0 = a[0] ^ carry
                out = fn(a0, *a[1:])
                out = jax.lax.bitcast_convert_type(
                    out.astype(jnp.float32), jnp.uint32)
                return out.sum(dtype=jnp.uint32) ^ jnp.uint32(i)
            return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

        def t_at(nrep):
            int(loop(jnp.int32(nrep), *args))
            best = float("inf")
            for _ in range(tries):
                t0 = time.perf_counter()
                int(loop(jnp.int32(nrep), *args))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t_at(4), t_at(24)
        return T * 20 / max(t2 - t1, 1e-9)

    def packed_then_consume(i, p, m):
        red = sp_recon.decode_sequence_kmv_compact_model(
            i, p, m, downscale=2, packed=True)[1]
        return rgb_convert.packed_consumer_step(red, wconv)

    def unpacked_then_consume(i, p, m):
        x = sp_recon.decode_sequence_kmv_compact_model(
            i, p, m, downscale=2)[1]
        return jax.lax.conv_general_dilated(
            x, wconv.astype(x.dtype), window_strides=(8, 8),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = {
        "packed_emit_only": round(timed(
            lambda i, p, m: sp_recon.decode_sequence_kmv_compact_model(
                i, p, m, downscale=2, packed=True)[1], *cdev), 1),
        "packed_plus_consumer": round(timed(packed_then_consume, *cdev), 1),
        "unpacked_plus_consumer": round(timed(unpacked_then_consume,
                                              *cdev), 1),
        "unpacked_emit_only": round(timed(
            lambda i, p, m: sp_recon.decode_sequence_kmv_compact_model(
                i, p, m, downscale=2)[1], *cdev), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
