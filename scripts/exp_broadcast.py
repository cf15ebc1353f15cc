"""Isolate block_broadcast cost at 1080p and test a rows-only expansion.

block_broadcast([NB] -> [Y,X]) splits the LANE dim (nbx,16) — suspected
expensive.  The alternative: host pre-expands per-block values along X
into [nby, X] rows; the device only expands ROWS ([nby,1,X] -> [nby,16,X]
-> [Y,X]), which merges contiguous sublanes and never touches lanes.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from jsplayer_tpu.kernels.sp_recon import block_broadcast

Y, X = 1080, 1920
T = 64
nbx, nby = (X + 15) // 16, (Y + 15) // 16
NB = nbx * nby


def rowexpand(rows, Y=Y, X=X):
    """[nby, X] -> [Y, X] by repeating each row 16x (sublane-friendly)."""
    nby_ = rows.shape[0]
    v = jnp.broadcast_to(rows[:, None, :], (nby_, 16, X))
    return v.reshape(nby_ * 16, X)[:Y]


def timed(fn, *args):
    @jax.jit
    def loop(nrep, *a):
        def body(i, carry):
            a0 = a[0] ^ carry
            out = fn(a0, *a[1:])
            return out.astype(jnp.uint32).sum(dtype=jnp.uint32) ^ jnp.uint32(i)
        return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

    def t_at(n, tries=5):
        int(loop(jnp.int32(n), *args))
        best = 1e30
        for _ in range(tries):
            t0 = time.perf_counter()
            int(loop(jnp.int32(n), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t_at(4), t_at(24)
    return T * 20 / max(t2 - t1, 1e-9)


def main():
    rng = np.random.default_rng(0)
    # [T, NB] u32 per-block values (u32 so the probe's xor works)
    bvals = jax.device_put(
        rng.integers(0, 5, (T, NB)).astype(np.uint32))
    rows = jax.device_put(
        rng.integers(0, 5, (T, nby, X)).astype(np.uint32))
    frame = jax.device_put(
        rng.integers(0, 1 << 24, (Y, X)).astype(np.uint32))

    def scan_blockbcast(bv, fr):
        def step(prev, b):
            m = block_broadcast(b.astype(jnp.int32), nby, nbx, Y, X)
            out = jnp.where(m == 1, prev ^ 1, prev)
            return out, ()
        last, _ = jax.lax.scan(step, fr, bv)
        return last

    def scan_rowexpand(rw, fr):
        def step(prev, r):
            m = rowexpand(r.astype(jnp.int32))
            out = jnp.where(m == 1, prev ^ 1, prev)
            return out, ()
        last, _ = jax.lax.scan(step, fr, rw)
        return last

    def scan_baseline(bv, fr):
        def step(prev, b):
            out = jnp.where(prev == 1, prev ^ b[0].astype(jnp.uint32), prev)
            return out, ()
        last, _ = jax.lax.scan(step, fr, bv)
        return last

    print(f"baseline (no broadcast): {timed(scan_baseline, bvals, frame):,.0f} fps-eq")
    print(f"block_broadcast:         {timed(scan_blockbcast, bvals, frame):,.0f} fps-eq")
    print(f"rowexpand:               {timed(scan_rowexpand, rows, frame):,.0f} fps-eq")


if __name__ == "__main__":
    main()
