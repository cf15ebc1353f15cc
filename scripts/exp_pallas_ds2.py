"""Isolate Pallas downsample cost: read-bound, VPU-bound, or transpose-bound?

  passthru : read block, write a static slice (pure memory cost)
  pack_h   : pack fields + H reshape-sum, write [64,1920] (no W stage)
  tpose16_notr : tpose16 compute minus the transposes (wrong values, same
                 op count otherwise) — isolates transpose cost
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Y, X = 1080, 1920
T = 64
BH = 128


def pack_fields(c):
    return ((c & 0xFF) | (((c >> 8) & 0xFF) << 10)
            | (((c >> 16) & 0xFF) << 20)).astype(jnp.int32)


def k_passthru(x_ref, o_ref):
    o_ref[0] = x_ref[0][: BH // 2, : X // 2].astype(jnp.int32)


def k_pack_h(x_ref, o_ref):
    f = pack_fields(x_ref[0])
    h = f.reshape(BH // 2, 2, X).sum(axis=1)        # [64, 1920]
    o_ref[0] = h[:, : X // 2]


def k_tpose16_notr(x_ref, o_ref):
    c = x_ref[0]
    outs = []
    for shift in (0, 8, 16):
        x16 = ((c >> shift) & 0xFF).astype(jnp.uint16)
        v = pltpu.bitcast(x16, jnp.uint32)
        h = (v & 0xFFFF) + (v >> 16)
        v2 = pltpu.bitcast(h.astype(jnp.uint16), jnp.uint32)  # [32, 1920]
        w = ((v2 & 0xFFFF) + (v2 >> 16)).astype(jnp.int32)
        outs.append(w[:, : X // 2])                 # [32, 960] (wrong vals)
    o_ref[0] = (outs[0] | (outs[1] << 10) | (outs[2] << 20))[
        : BH // 2, : X // 2]


CASES = {
    "passthru": (k_passthru, (BH // 2, X // 2)),
    "pack_h": (k_pack_h, (BH // 2, X // 2)),
    "tpose16_notr": (k_tpose16_notr, (BH // 4, X // 2)),
}


def timed(fn, *args):
    @jax.jit
    def loop(nrep, *a):
        def body(i, carry):
            a0 = a[0] ^ carry
            out = fn(a0)
            return out.astype(jnp.uint32).sum(dtype=jnp.uint32) ^ jnp.uint32(i)
        return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

    def t_at(nrep, tries=5):
        int(loop(jnp.int32(nrep), *args))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            int(loop(jnp.int32(nrep), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_at(4), t_at(24)
    return T * (24 - 4) / max(t2 - t1, 1e-9)


def main():
    rng = np.random.default_rng(0)
    f = jax.device_put(rng.integers(0, 1 << 24, (T, Y, X)).astype(np.uint32))
    for name, (kern, oshape) in CASES.items():
        nrows = -(-Y // BH)

        def call(x, kern=kern, oshape=oshape):
            return pl.pallas_call(
                kern,
                grid=(T, nrows),
                in_specs=[pl.BlockSpec((1, BH, X), lambda t, i: (t, i, 0))],
                out_specs=pl.BlockSpec((1,) + oshape, lambda t, i: (t, i, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (T, oshape[0] * nrows, oshape[1]), jnp.int32),
            )(x)

        try:
            fps = timed(call, f)
            print(f"{name}: {fps:,.0f} fps ({1e6 / fps:.1f} us/frame)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED — {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
