"""Benchmark: 1080p ScreenPressor device decode throughput (frames/sec/chip).

North-star metric (BASELINE.json): ≥10,000 1080p ScreenPressor frames/sec/chip
with bit-exact frame parity.  Parity is enforced by the test suite (oracle ↔
device, encode → decode identity); this harness measures the steady-state
device pipeline: P-frame recon (copy/motion/data compose over the
scan-carried previous frame).

Command tensors model realistic screen content: ~70% untouched blocks, ~15%
motion, ~15% data — the block mix the reference's skip-stills machinery
exploits (SURVEY.md §3.5).  All inputs are generated ON DEVICE (iota/PRNG)
so the measurement isn't polluted by host→device transfer of synthetic data;
timing loops run inside a single dispatched program to exclude tunnel RTT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jsplayer_tpu.kernels import sp_recon

    Y, X = 1088, 1920  # 1080p padded to the 16-row block grid
    T = 16
    nby, nbx = Y // 16, X // 16
    NB = nby * nbx
    REPS = 8

    def make_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        r = jax.random.uniform(k1, (T, NB))
        bts = jnp.where(r < 0.70, 0, jnp.where(r < 0.85, 3, 1)).astype(jnp.int32)
        by = (jnp.arange(NB) // nbx) * 16
        bx = (jnp.arange(NB) % nbx) * 16
        mvx = jax.random.randint(k2, (T, NB), -8, 9)
        mvy = jax.random.randint(k3, (T, NB), -8, 9)
        mvx = jnp.clip(mvx, -bx[None, :], X - 16 - bx[None, :])
        mvy = jnp.clip(mvy, -by[None, :], Y - 16 - by[None, :])
        mv = jnp.stack([mvx, mvy], axis=-1).astype(jnp.int32)
        rect = jnp.stack([bx, by, bx + 16, by + 16], axis=-1).astype(jnp.int32)
        rect = jnp.broadcast_to(rect[None], (T, NB, 4))
        payload = jax.random.randint(
            k4, (T, Y, X), 0, 1 << 24, dtype=jnp.uint32
        )
        changed = jnp.ones(T, bool)
        init = jnp.zeros((Y, X), jnp.uint32)
        return init, bts, mv, rect, payload, changed

    @jax.jit
    def bench_once(key):
        args = make_inputs(key)

        def body(i, carry):
            frames, signif = sp_recon.decode_sequence(*args, jnp.int32(0))
            return carry ^ frames[-1, 0, 0] ^ jnp.uint32(i)

        return jax.lax.fori_loop(0, REPS, body, jnp.uint32(0))

    key = jax.random.PRNGKey(0)
    int(bench_once(key))  # compile + warm up (forces completion via readback)
    t0 = time.perf_counter()
    int(bench_once(key))
    dt = time.perf_counter() - t0

    frames_per_sec = T * REPS / dt
    baseline = 10_000.0  # north-star target (BASELINE.md)
    print(json.dumps({
        "metric": "sp_1080p_device_decode_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
