"""Interleaved multi-lane rANS: encode (host) → lockstep device decode."""

import numpy as np
import pytest

from jsplayer_tpu.kernels.rans_lanes import (
    PROB_SCALE,
    build_freq_table,
    encode_lanes,
    roundtrip_decode,
)


@pytest.mark.parametrize("n_lanes", [1, 8, 64, 128])
@pytest.mark.parametrize("dist", ["uniform", "skewed", "peaked"])
def test_roundtrip(n_lanes, dist):
    rng = np.random.default_rng(hash((n_lanes, dist)) % (2**32))
    n = 5000
    if dist == "uniform":
        syms = rng.integers(0, 256, n).astype(np.uint8)
    elif dist == "skewed":
        syms = (rng.gamma(1.0, 20.0, n).astype(np.int64) % 256).astype(np.uint8)
    else:
        syms = rng.choice([0, 0, 0, 0, 7, 7, 255], n).astype(np.uint8)
    freq = build_freq_table(syms)
    assert freq.sum() == PROB_SCALE
    lane_bytes, states, ns = encode_lanes(syms, freq, n_lanes)
    got = roundtrip_decode(lane_bytes, states, freq, ns, n_lanes)
    np.testing.assert_array_equal(got, syms)


def test_compression_ratio_sane():
    """Peaked data should compress well below 1 byte/symbol."""
    rng = np.random.default_rng(0)
    syms = rng.choice([3] * 90 + list(range(10)), 20000).astype(np.uint8)
    freq = build_freq_table(syms)
    lane_bytes, states, ns = encode_lanes(syms, freq, 128)
    total_bytes = lane_bytes.shape[0] * lane_bytes.shape[1] + 4 * 128
    assert total_bytes < ns * 0.6
    got = roundtrip_decode(lane_bytes, states, freq, ns, 128)
    np.testing.assert_array_equal(got, syms)


def test_short_input_edge_cases():
    rng = np.random.default_rng(1)
    for n in [1, 2, 127, 128, 129]:
        syms = rng.integers(0, 256, n).astype(np.uint8)
        freq = build_freq_table(syms)
        lane_bytes, states, ns = encode_lanes(syms, freq, 128)
        got = roundtrip_decode(lane_bytes, states, freq, ns, 128)
        np.testing.assert_array_equal(got, syms)


@pytest.mark.parametrize("n_lanes", [1, 8, 128])
@pytest.mark.parametrize("dist", ["uniform", "skewed", "peaked"])
def test_roundtrip_aligned(n_lanes, dist):
    """Renorm-aligned layout (refill schedule as scan inputs, gather-free
    decode) must reproduce the exact symbol stream."""
    from jsplayer_tpu.kernels.rans_lanes import roundtrip_decode_aligned

    rng = np.random.default_rng(hash((n_lanes, dist, 1)) % (2**32))
    n = 5000
    if dist == "uniform":
        syms = rng.integers(0, 256, n).astype(np.uint8)
    elif dist == "skewed":
        syms = (rng.gamma(1.0, 20.0, n).astype(np.int64) % 256).astype(np.uint8)
    else:
        syms = rng.choice([0, 0, 0, 0, 7, 7, 255], n).astype(np.uint8)
    freq = build_freq_table(syms)
    lane_bytes, states, ns = encode_lanes(syms, freq, n_lanes)
    got = roundtrip_decode_aligned(lane_bytes, states, freq, ns, n_lanes)
    np.testing.assert_array_equal(got, syms)


def test_aligned_refill_schedule_consistency():
    """The refill schedule consumes exactly the bytes the packed decode
    would: both layouts decode the same stream."""
    from jsplayer_tpu.kernels.rans_lanes import (layout_refills,
                                                 roundtrip_decode_aligned)

    rng = np.random.default_rng(7)
    syms = rng.integers(0, 64, 9000).astype(np.uint8)
    freq = build_freq_table(syms)
    lane_bytes, states, ns = encode_lanes(syms, freq, 64)
    a = roundtrip_decode(lane_bytes, states, freq, ns, 64)
    b = roundtrip_decode_aligned(lane_bytes, states, freq, ns, 64)
    np.testing.assert_array_equal(a, b)
    # schedule ships every real byte exactly once (zeros only in pad slots)
    refills = layout_refills(lane_bytes, states, freq, -(-ns // 64))
    used = int((refills > 0).sum())
    real = int((lane_bytes > 0).sum())
    assert used <= real  # zero bytes are indistinguishable from pad
