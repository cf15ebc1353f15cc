"""Bisect which in-kernel op breaks Mosaic: sublane slice / bitcast / reshape."""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Y, X = 1080, 1920
T = 4
BH = 128


def k_sub_slice(x_ref, o_ref):
    f = x_ref[0].astype(jnp.int32)
    o_ref[0] = f[0::2, :] + f[1::2, :]


def k_sub_reshape(x_ref, o_ref):
    f = x_ref[0].astype(jnp.int32)
    o_ref[0] = f.reshape(BH // 2, 2, X).sum(axis=1)


def k_sub_roll(x_ref, o_ref):
    f = x_ref[0].astype(jnp.int32)
    s = f + pltpu.roll(f, BH - 1, 0)
    o_ref[0] = s[0::2, :]


def k_bitcast(x_ref, o_ref):
    c = x_ref[0]
    x16 = (c & 0xFF).astype(jnp.uint16)
    v = pltpu.bitcast(x16, jnp.uint32)
    o_ref[0] = ((v & 0xFFFF) + (v >> 16)).astype(jnp.int32)


def k_bitcast_h(x_ref, o_ref):
    # u16→u32 bitcast merges SUBLANE pairs (16-bit tiling is (16,128), two
    # values per 32-bit word vertically): H-pair sums without slicing
    c = x_ref[0]
    x16 = (c & 0xFF).astype(jnp.uint16)        # [BH, X]
    v = pltpu.bitcast(x16, jnp.uint32)         # [BH/2, X]
    o_ref[0] = ((v & 0xFFFF) + (v >> 16)).astype(jnp.int32)


def k_minor_reshape(x_ref, o_ref):
    f = x_ref[0].astype(jnp.int32)
    o_ref[0] = f.reshape(BH, X // 2, 2).sum(axis=-1)


def k_lane_gather_same(x_ref, o_ref):
    f = x_ref[0].astype(jnp.int32)
    s = f + pltpu.roll(f, X - 1, 1)            # even lanes hold pair sums
    idx = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (BH, X), 1) * 2, X - 1)
    g = jnp.take_along_axis(s, idx, axis=1)    # same-shape lane gather
    o_ref[0] = g[:, : X // 2]


def k_transpose(x_ref, o_ref):
    f = x_ref[0].astype(jnp.int32)
    o_ref[0] = f.T


CASES = {
    "sub_slice": (k_sub_slice, (BH // 2, X)),
    "sub_reshape": (k_sub_reshape, (BH // 2, X)),
    "sub_roll": (k_sub_roll, (BH // 2, X)),
    "bitcast_h": (k_bitcast_h, (BH // 2, X)),
    "minor_reshape": (k_minor_reshape, (BH, X // 2)),
    "lane_gather_same": (k_lane_gather_same, (BH, X // 2)),
    "transpose": (k_transpose, (X, BH)),
}


def run(name):
    kern, oshape = CASES[name]
    f = jnp.zeros((T, Y, X), jnp.uint32)
    nrows = -(-Y // BH)
    out = pl.pallas_call(
        kern,
        grid=(T, nrows),
        in_specs=[pl.BlockSpec((1, BH, X), lambda t, i: (t, i, 0))],
        out_specs=pl.BlockSpec((1,) + oshape, lambda t, i: (t, i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (T, oshape[0] * nrows, oshape[1]), jnp.int32),
    )(f)
    out.block_until_ready()
    return out


if __name__ == "__main__":
    for name in CASES:
        try:
            run(name)
            print(f"{name}: OK")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED — {str(e).splitlines()[0][:140]}")
