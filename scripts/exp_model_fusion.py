"""Experiment: close the model-epilogue gap (VERDICT round-2 item 2).

BENCH_r02: decode-only compact scan ~31k delivered fps; the fused ds2 model
path only 13.9k.  Hypothesis: `to_model_input` inside the scan materializes
TWO full-res int32 field planes (p0 = r|b<<16, p1 = g) before the
reduce_window, roughly doubling per-frame HBM traffic.  Variants measured
here (all bit-equivalent outputs):

  A  current: full to_model_input inside the scan step
  B  scan emits ONE packed ds2 u32 plane (r/g/b as 10-bit fields — 2x2 u8
     sums stay <1024); unpack+normalize+flip+NHWC outside on the small stack
  C  plain compact scan emits frames; a second pass over the [T,Y,X] stack
     computes the packed reduce + epilogue (no scan-carried model work)
  D  like B but emitting the two 16-bit-field planes (p0/p1) reduced, i.e.
     only the normalize moves out of the scan

Run on the real chip: `python scripts/exp_model_fusion.py`.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from jsplayer_tpu.kernels import sp_recon

Y, X = bench.Y, bench.X
T = bench.T


def timed(fn, *args, scale=1):
    @jax.jit
    def loop(nrep, *a):
        def body(i, carry):
            a0 = a[0] ^ carry
            out = fn(a0, *a[1:])
            if out.dtype != jnp.uint32:
                out = jax.lax.bitcast_convert_type(
                    out.astype(jnp.float32), jnp.uint32)
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

    t_lo = t_at(1, tries=2)
    n_lo, n_hi = (1, 3) if t_lo > 0.5 else (4, 24)
    t1, t2 = t_at(n_lo), t_at(n_hi)
    return scale * T * (n_hi - n_lo) / max(t2 - t1, 1e-9)


def pack_fields(c):
    """u32 pixel → one u32 of three 10-bit channel fields (ds2-safe sums)."""
    return ((c & 0xFF) | (((c >> 8) & 0xFF) << 10)
            | (((c >> 16) & 0xFF) << 20)).astype(jnp.uint32)


def reduce2(f):
    """2x2 box sum, VALID, on [..., H, W]."""
    nd = f.ndim
    win = [1] * nd
    win[-2] = win[-1] = 2
    return jax.lax.reduce_window(f.astype(jnp.int32), 0, jax.lax.add,
                                 tuple(win), tuple(win), "VALID")


def unpack_small(red, dtype=jnp.bfloat16):
    """[..., H/2, W/2] packed 10-bit field sums → normalized NHWC tensor."""
    r = (red >> 20) & 1023
    g = (red >> 10) & 1023
    b = red & 1023
    x = jnp.stack([r, g, b], axis=-3)
    x = jnp.flip(x, axis=-2)
    x = (x.astype(jnp.float32) * (1.0 / (255.0 * 4.0))).astype(dtype)
    return jnp.moveaxis(x, -3, -1)


@jax.jit
def variant_A(init, pc, mvk):
    _, model = sp_recon.decode_sequence_kmv_compact_model(
        init, pc, mvk, downscale=2)
    return model


@jax.jit
def variant_B(init, pc, mvk):
    def step(prev, inp):
        p, m = inp
        out = sp_recon.compose_frame_kmv(prev, p, m)
        return out, reduce2(pack_fields(out))
    _, red = jax.lax.scan(step, init, (pc, mvk))
    return unpack_small(red)


@jax.jit
def variant_C(init, pc, mvk):
    frames = sp_recon.decode_sequence_kmv_compact(init, pc, mvk)
    return unpack_small(reduce2(pack_fields(frames)))


@jax.jit
def variant_D(init, pc, mvk):
    def step(prev, inp):
        p, m = inp
        out = sp_recon.compose_frame_kmv(prev, p, m)
        p0 = (out & jnp.uint32(0x00FF00FF)).astype(jnp.int32)
        p1 = ((out >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
        return out, (reduce2(p0), reduce2(p1))
    _, (q0, q1) = jax.lax.scan(step, init, (pc, mvk))
    x = jnp.stack([q0 >> 16, q1, q0 & 0xFFFF], axis=-3)
    x = jnp.flip(x, axis=-2)
    x = (x.astype(jnp.float32) * (1.0 / (255.0 * 4.0))).astype(jnp.bfloat16)
    return jnp.moveaxis(x, -3, -1)


def main():
    real = bench.real_stream_commands()
    assert real is not None, "needs the native library"
    got, kmv_host, _ = real
    pc, mvk = kmv_host["paycode"][0], kmv_host["mvk"][0]
    changed = got["changed"][0]
    pcc, mvkc, _ = sp_recon.compact_changed(pc, mvk, np.asarray(changed))
    init = jnp.zeros((Y, X), jnp.uint32)
    dev = jax.device_put((init, pcc, mvkc))

    # parity first: all variants must agree with A bit-for-bit
    ref = np.asarray(variant_A(*dev), dtype=np.float32)
    for name, fn in [("B", variant_B), ("C", variant_C), ("D", variant_D)]:
        got_v = np.asarray(fn(*dev), dtype=np.float32)
        assert got_v.shape == ref.shape, (name, got_v.shape, ref.shape)
        np.testing.assert_array_equal(got_v, ref, err_msg=name)
    print("parity: A == B == C == D (bit-exact)")

    for name, fn in [("A_current_in_scan", variant_A),
                     ("B_packed_in_scan", variant_B),
                     ("C_two_pass", variant_C),
                     ("D_two_plane_in_scan", variant_D)]:
        fps = timed(fn, *dev)
        print(f"{name}: {fps:,.0f} delivered fps")

    # decode-only reference bound
    fps = timed(sp_recon.decode_sequence_kmv_compact, *dev)
    print(f"decode_only_bound: {fps:,.0f} fps")


if __name__ == "__main__":
    main()
