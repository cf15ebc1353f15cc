"""Bisect the packed→NHWC-bf16 unpack cost on the SMALL [C,540,960] stack.

E1_packed (scan + pallas ds2, packed i32 out) hits 31k fps; adding the
unpack drops to ~11.8k — ~50 us/frame for what should be ~5 us of traffic.
Which component?
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

C, H, W = 43, 540, 960
T = 64  # report per-delivered-frame like the pipeline (C changed of T)


def timed(fn, *args):
    @jax.jit
    def loop(nrep, *a):
        def body(i, carry):
            a0 = a[0] ^ carry
            out = fn(a0)
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

    t1, t2 = t_at(4), t_at(24)
    us = (t2 - t1) / (24 - 4) / T * 1e6
    return us


def u0_sum(red):
    return red


def u1_stack(red):
    return jnp.stack([(red >> 20) & 1023, (red >> 10) & 1023, red & 1023],
                     axis=-3)


def u2_norm(red):
    x = u1_stack(red)
    return (x.astype(jnp.float32) * (1 / 1020.0)).astype(jnp.bfloat16)


def u3_flip(red):
    x = u1_stack(red)
    x = jnp.flip(x, axis=-2)
    return (x.astype(jnp.float32) * (1 / 1020.0)).astype(jnp.bfloat16)


def u4_nhwc(red):
    return jnp.moveaxis(u3_flip(red), -3, -1)


def u5_flip_packed(red):
    x = u1_stack(jnp.flip(red, axis=-2))
    return (x.astype(jnp.float32) * (1 / 1020.0)).astype(jnp.bfloat16)


def u6_nhwc_direct(red):
    # NHWC via stacking on the LAST axis directly (one relayout, no moveaxis)
    r = (red >> 20) & 1023
    g = (red >> 10) & 1023
    b = red & 1023
    x = jnp.stack([r, g, b], axis=-1)
    x = jnp.flip(x, axis=-3)
    return (x.astype(jnp.float32) * (1 / 1020.0)).astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    red = jax.device_put(
        rng.integers(0, 1 << 30, (C, H, W)).astype(np.int32))
    for name, fn in [("u0_sum_only", u0_sum), ("u1_stack_i32", u1_stack),
                     ("u2_+norm_bf16", u2_norm), ("u3_+flip", u3_flip),
                     ("u4_+nhwc_moveaxis", u4_nhwc),
                     ("u5_flip_packed_first", u5_flip_packed),
                     ("u6_nhwc_direct", u6_nhwc_direct)]:
        try:
            us = timed(jax.jit(fn), red)
            print(f"{name}: {us:.1f} us/frame")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: failed {str(e).splitlines()[0][:100]}")


if __name__ == "__main__" and "--u7" not in sys.argv:
    main()


def u7_take_reverse(red):
    # flip via row GATHER (row gathers are ~free; lax.rev measures 44 us)
    idx = jnp.arange(red.shape[-2] - 1, -1, -1)
    rf = jnp.take(red, idx, axis=-2)
    r = (rf >> 20) & 1023
    g = (rf >> 10) & 1023
    b = rf & 1023
    x = jnp.stack([r, g, b], axis=-3)
    return jnp.moveaxis(
        (x.astype(jnp.float32) * (1 / 1020.0)).astype(jnp.bfloat16), -3, -1)


def u8_take_reverse_nchw(red):
    idx = jnp.arange(red.shape[-2] - 1, -1, -1)
    rf = jnp.take(red, idx, axis=-2)
    x = jnp.stack([(rf >> 20) & 1023, (rf >> 10) & 1023, rf & 1023], axis=-3)
    return (x.astype(jnp.float32) * (1 / 1020.0)).astype(jnp.bfloat16)


def main7():
    rng = np.random.default_rng(0)
    red = jax.device_put(
        rng.integers(0, 1 << 30, (C, H, W)).astype(np.int32))
    for name, fn in [("u7_take_reverse_nhwc", u7_take_reverse),
                     ("u8_take_reverse_nchw", u8_take_reverse_nchw)]:
        us = timed(jax.jit(fn), red)
        print(f"{name}: {us:.1f} us/frame")


if __name__ == "__main__" and "--u7" in sys.argv:
    main7()
