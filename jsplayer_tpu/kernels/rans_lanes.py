"""Interleaved multi-lane rANS — device entropy decode for re-chunked streams.

The reference's entropy stage is inherently serial: every symbol's context
depends on all prior symbols (ANS.hx adaptive models; SURVEY.md §7 "hard
parts").  For *legacy* streams the framework therefore decodes entropy on the
host (native/spdec.cpp).  This module is the lane-parallel alternative for
streams we re-encode ourselves: symbols are distributed round-robin over N
independent rANS lanes with a *static* (per-chunk) frequency table, so all N
states advance in lockstep on the VPU — the SURVEY §2 "Ulysses-style lane
parallelism" build target (the reference's analog is the B=131072-symbol
stream reinit, ANS.hx:10, which already marks entropy-state boundaries).

Decode math matches the byte-wise rANS of the reference (12-bit
probabilities, L=2^23 renorm, ANS.hx:33-48); the lane layout and the static
table are the re-encode's freedom — parity is defined on decoded symbols.

Engineering note (measured on v5e): TPU has no efficient per-lane byte
gather, so each lockstep step pays two take_along_axis gathers; throughput
is ~26 Msym/s and FLAT in the lane count (512/2048/8192 all ~80 us/step —
scan-step latency bound, not compute bound).  A Pallas variant can't fix
this: Mosaic has no cross-lane dynamic-address load either.  Device lane
decode is therefore a capability/offload path (frees host cores; data
never leaves HBM), not a raw-speed win over the native host decoder
(~6,200 fps/core) — the default pipeline keeps entropy on host and
reconstruction on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 23


def build_freq_table(symbols: np.ndarray, nsym: int = 256) -> np.ndarray:
    """Static per-chunk frequency table summing to PROB_SCALE, every symbol
    given at least 1 slot (so any byte remains decodable)."""
    hist = np.bincount(symbols, minlength=nsym).astype(np.float64)
    freq = np.maximum(1, np.round(hist / max(1, hist.sum()) * (PROB_SCALE - nsym))
                      ).astype(np.int64)
    # exact normalization: trim/boost the most frequent symbols
    while freq.sum() > PROB_SCALE:
        i = int(np.argmax(freq))
        freq[i] -= min(freq[i] - 1, freq.sum() - PROB_SCALE)
    freq[int(np.argmax(freq))] += PROB_SCALE - freq.sum()
    assert freq.sum() == PROB_SCALE and (freq > 0).all()
    return freq.astype(np.int32)


def encode_lanes(symbols: np.ndarray, freq: np.ndarray, n_lanes: int
                 ) -> tuple[np.ndarray, np.ndarray, int]:
    """Encode symbols round-robin over n_lanes reverse-order rANS encoders.

    → (lane_bytes u8 [N, L] zero-padded, init_states u32 [N], n_symbols).
    Lane j owns symbols j, j+N, j+2N, ... (interleaved layout: adjacent
    symbols decode in the same lockstep step across lanes)."""
    cum = np.zeros(len(freq) + 1, dtype=np.int64)
    cum[1:] = np.cumsum(freq)
    n = len(symbols)
    lanes_out: list[bytearray] = [bytearray() for _ in range(n_lanes)]
    states = np.zeros(n_lanes, dtype=np.uint64)
    for j in range(n_lanes):
        x = RANS_L
        out = lanes_out[j]
        for idx in range(((n - 1 - j) // n_lanes) * n_lanes + j, -1, -n_lanes):
            s = int(symbols[idx])
            f = int(freq[s])
            x_max = ((RANS_L >> PROB_BITS) << 8) * f
            while x >= x_max:
                out.append(x & 0xFF)
                x >>= 8
            x = ((x // f) << PROB_BITS) + (x % f) + int(cum[s])
        out.reverse()
        states[j] = x
    L = max((len(o) for o in lanes_out), default=0)
    lane_bytes = np.zeros((n_lanes, L), dtype=np.uint8)
    for j, o in enumerate(lanes_out):
        lane_bytes[j, : len(o)] = np.frombuffer(bytes(o), dtype=np.uint8)
    return lane_bytes, states.astype(np.uint32), n


@functools.partial(jax.jit, static_argnames=("n_steps",))
def decode_lanes(
    lane_bytes: jax.Array,  # [N, L] uint8
    init_states: jax.Array,  # [N] uint32
    freq: jax.Array,  # [256] int32 (static table, sums to 4096)
    n_steps: int,  # ceil(n_symbols / N)
) -> jax.Array:
    """Lockstep decode: → symbols [n_steps, N] uint8 (interleaved layout;
    flatten + trim to recover the original order)."""
    cumfreq = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(freq)])[:256]  # [256]

    def step(carry, _):
        x, pos = carry  # [N] u32, [N] i32
        sf = (x & (PROB_SCALE - 1)).astype(jnp.int32)  # [N]
        # symbol = searchsorted(cumfreq, sf, 'right') - 1 via compare+sum
        sym = (cumfreq[None, :] <= sf[:, None]).sum(axis=1) - 1  # [N]
        f = freq[sym].astype(jnp.uint32)
        c = cumfreq[sym].astype(jnp.uint32)
        x = f * (x >> PROB_BITS) + (x & (PROB_SCALE - 1)) - c
        # ≤2 byte refills for 12-bit probabilities (x ≥ 2^11 post-update)
        for _ in range(2):
            need = x < RANS_L
            b = jnp.take_along_axis(lane_bytes, pos[:, None], axis=1)[:, 0]
            x = jnp.where(need, (x << 8) | b.astype(jnp.uint32), x)
            pos = jnp.where(need, pos + 1, pos)
        return (x, pos), sym.astype(jnp.uint8)

    n = lane_bytes.shape[0]
    (x, pos), syms = jax.lax.scan(
        step, (init_states, jnp.zeros(n, jnp.int32)), None, length=n_steps
    )
    return syms


def roundtrip_decode(lane_bytes, init_states, freq, n_symbols, n_lanes):
    """Host helper: device decode + trim to the original order.  Position
    (step s, lane j) holds symbol s*N + j, so the row-major flatten of the
    [steps, N] lockstep output IS the original order."""
    n_steps = -(-n_symbols // n_lanes)
    syms = np.asarray(decode_lanes(jnp.array(lane_bytes),
                                   jnp.array(init_states),
                                   jnp.array(freq), n_steps))
    return syms.reshape(-1)[:n_symbols]
