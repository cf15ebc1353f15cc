"""rANS decode: U symbols per lane per scan step (step-overhead amortization).

At N=4096 the 2-level search runs ~2 us/step; if part of that is scan/step
overhead, decoding 2 or 4 symbols per step (refills reshaped to
[steps/U, N, 2*U]) should amortize it.  Parity + speed vs U=1.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from jsplayer_tpu.kernels import rans_lanes

PROB_BITS = rans_lanes.PROB_BITS
PROB_SCALE = rans_lanes.PROB_SCALE
RANS_L = rans_lanes.RANS_L


@functools.partial(jax.jit, static_argnames=("U",))
def decode_unrolled(refills, init_states, freq, U=2):
    """refills [steps, N, 2] → grouped [steps/U, N, U, 2]; U dependent
    decode rounds per scan step.  Output [steps/U, N, U] u8 — transpose of
    the interleave: symbol (s, lane, u) is global step s*U+u, lane j."""
    cumfreq = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(freq)])[:256]
    cf_rows = cumfreq.reshape(16, 16).astype(jnp.float32)
    fr_rows = freq.reshape(16, 16).astype(jnp.float32)
    cb = cumfreq[::16]

    steps, N, _ = refills.shape
    assert steps % U == 0
    grouped = refills.reshape(steps // U, U, N, 2)

    def one(x, inp):
        sf = (x & (PROB_SCALE - 1)).astype(jnp.int32)
        le1 = cb[None, :] <= sf[:, None]
        b = le1.sum(axis=1) - 1
        oh_b = (le1 ^ jnp.pad(le1[:, 1:], ((0, 0), (0, 1)))
                ).astype(jnp.float32)
        rows_c = jax.lax.dot(oh_b, cf_rows,
                             precision=jax.lax.Precision.HIGHEST
                             ).astype(jnp.int32)
        rows_f = jax.lax.dot(oh_b, fr_rows,
                             precision=jax.lax.Precision.HIGHEST
                             ).astype(jnp.int32)
        le2 = rows_c <= sf[:, None]
        i = le2.sum(axis=1) - 1
        oh2 = le2 ^ jnp.pad(le2[:, 1:], ((0, 0), (0, 1)))
        c = (rows_c * oh2).sum(axis=1).astype(jnp.uint32)
        f = (rows_f * oh2).sum(axis=1).astype(jnp.uint32)
        sym = (b * 16 + i).astype(jnp.uint8)
        x = f * (x >> PROB_BITS) + (x & (PROB_SCALE - 1)) - c
        r0 = inp[:, 0].astype(jnp.uint32)
        r1 = inp[:, 1].astype(jnp.uint32)
        x = jnp.where(x < RANS_L, (x << 8) | r0, x)
        x = jnp.where(x < RANS_L, (x << 8) | r1, x)
        return x, sym

    def step(x, inp):  # inp [U, N, 2]
        syms = []
        for u in range(U):
            x, s = one(x, inp[u])
            syms.append(s)
        return x, jnp.stack(syms, axis=1)  # [N, U]

    _, out = jax.lax.scan(step, init_states, grouped)
    return out  # [steps/U, N, U]


def main():
    rng = np.random.default_rng(0)
    n_lanes = 4096
    n_syms = 4_000_000
    syms = rng.integers(0, 256, n_syms).astype(np.uint8)
    syms = (syms.astype(np.int32) ** 2 // 256).astype(np.uint8)
    freq = rans_lanes.build_freq_table(syms)
    lane_bytes, states, ns = rans_lanes.encode_lanes(syms, freq, n_lanes)
    n_steps = -(-ns // n_lanes)
    n_steps = -(-n_steps // 4) * 4  # divisible by max U
    refills = rans_lanes.layout_refills(lane_bytes, states, freq, n_steps)
    dev = (jnp.asarray(refills), jnp.asarray(states), jnp.asarray(freq))

    ref = np.asarray(rans_lanes.decode_lanes_aligned(*dev))  # [steps, N]
    for U in (2, 4):
        got = np.asarray(decode_unrolled(*dev, U=U))  # [steps/U, N, U]
        flat = got.transpose(0, 2, 1).reshape(-1, ref.shape[1])
        np.testing.assert_array_equal(flat, ref, err_msg=f"U={U}")
    print("parity ok (U=2, U=4)")

    def timed(fn):
        @jax.jit
        def loop(nrep, rf, st, fq):
            def body(i, carry):
                st2 = st ^ (carry & 1)
                out = fn(rf, st2, fq)
                return (out.astype(jnp.uint32).sum(dtype=jnp.uint32)
                        ^ jnp.uint32(i))
            return jax.lax.fori_loop(0, nrep, body, jnp.uint32(0))

        def t_at(n, tries=5):
            int(loop(jnp.int32(n), *dev))
            best = 1e30
            for _ in range(tries):
                t0 = time.perf_counter()
                int(loop(jnp.int32(n), *dev))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = t_at(2), t_at(8)
        return n_syms * 6 / max(t2 - t1, 1e-9) / 1e6

    print(f"U=1: {timed(rans_lanes.decode_lanes_aligned):,.0f} Msym/s")
    for U in (2, 4):
        print(f"U={U}: {timed(functools.partial(decode_unrolled, U=U)):,.0f} Msym/s")


if __name__ == "__main__":
    main()
