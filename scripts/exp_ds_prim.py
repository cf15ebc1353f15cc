"""Microbench: which 2x2 box-downsample primitive is HBM-bound on v5e?

exp_model_fusion showed the model epilogue costs ~40-80 us/frame where the
pure traffic bound is ~13 us (8.3 MB read + ~2 MB write at 819 GB/s) — the
reduce_window itself is suspect.  Variants over a static [T, Y, X] u32
stack, all producing the packed [T, Y/2, X/2] field-sum plane:

  rw22    one reduce_window, window (2,2)
  rw_hw   two chained reduce_windows, (2,1) then (1,2)
  slice   strided slices: f[0::2]+f[1::2] on H, then on W
  reshapeH  reshape H->(H/2,2), sum axis; then W via slices
  matmul  W-downsample as an MXU matmul with a banded 0/1 f32 matrix
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

Y, X = 1080, 1920
T = 64


def pack_fields(c):
    return ((c & 0xFF) | (((c >> 8) & 0xFF) << 10)
            | (((c >> 16) & 0xFF) << 20)).astype(jnp.int32)


def timed(fn, *args):
    @jax.jit
    def loop(nrep, *a):
        def body(i, carry):
            a0 = a[0] ^ carry
            out = fn(a0, *a[1:])
            if out.dtype != jnp.uint32:
                out = out.astype(jnp.uint32)
            return out.sum(dtype=jnp.uint32) ^ jnp.uint32(i)
        return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

    def t_at(nrep, tries=6):
        int(loop(jnp.int32(nrep), *args))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            int(loop(jnp.int32(nrep), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_at(4), t_at(24)
    return T * (24 - 4) / max(t2 - t1, 1e-9)


def rw22(f):
    return jax.lax.reduce_window(pack_fields(f), 0, jax.lax.add,
                                 (1, 2, 2), (1, 2, 2), "VALID")


def rw_hw(f):
    p = pack_fields(f)
    p = jax.lax.reduce_window(p, 0, jax.lax.add, (1, 2, 1), (1, 2, 1), "VALID")
    return jax.lax.reduce_window(p, 0, jax.lax.add, (1, 1, 2), (1, 1, 2),
                                 "VALID")


def slice_v(f):
    p = pack_fields(f)
    p = p[:, 0::2, :] + p[:, 1::2, :]
    return p[:, :, 0::2] + p[:, :, 1::2]


def reshape_h(f):
    p = pack_fields(f)
    p = p.reshape(T, Y // 2, 2, X).sum(axis=2)
    return p[:, :, 0::2] + p[:, :, 1::2]


def matmul_w(f):
    p = pack_fields(f)
    p = p[:, 0::2, :] + p[:, 1::2, :]          # H via slices
    m = np.zeros((X, X // 2), np.float32)
    m[np.arange(X), np.arange(X) // 2] = 1.0
    md = jnp.asarray(m)
    q = jax.lax.dot_general(p.astype(jnp.float32), md,
                            (((2,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    return q.astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    f = jax.device_put(rng.integers(0, 1 << 24, (T, Y, X)).astype(np.uint32))

    ref = np.asarray(jax.jit(rw22)(f))
    for name, fn in [("rw_hw", rw_hw), ("slice", slice_v),
                     ("reshapeH", reshape_h)]:
        got = np.asarray(jax.jit(fn)(f))
        np.testing.assert_array_equal(got, ref, err_msg=name)
    print("parity ok (matmul excluded: packed fields exceed f32 exact range)")

    for name, fn in [("rw22", rw22), ("rw_hw", rw_hw), ("slice", slice_v),
                     ("reshapeH", reshape_h), ("matmul", matmul_w)]:
        fps = timed(jax.jit(fn), f)
        print(f"{name}: {fps:,.0f} fps  ({1e6 / fps:.1f} us/frame)")


if __name__ == "__main__":
    main()
