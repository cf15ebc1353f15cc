"""Entropy-coder round-trips: encode a random symbol workload through the
encoder facades, decode with the decoder facades, require identity — across
I-frame renews (adaptive table persistence) and the raw-byte escape /
context-escalation paths of the ANS coder."""

import numpy as np
import pytest

from jsplayer_tpu.codecs.entropy import (
    EntroCoderANS,
    EntroCoderRC,
    EntroEncoderANS,
    EntroEncoderRC,
    MSR_X,
    MSR_Y,
)


def _workload(rng, n_ops, peaked=False):
    """Random mixed op sequence mirroring SP's symbol mix."""
    ops = []
    for _ in range(n_ops):
        kind = rng.choice(["clr", "n", "p", "x", "bt", "bn", "sxy", "mx", "my"],
                          p=[0.5, 0.15, 0.1, 0.05, 0.05, 0.05, 0.04, 0.03, 0.03])
        if kind == "clr":
            cxi = int(rng.integers(0, 3 * 4096))
            if peaked:  # skewed symbols exercise context escalation
                c = int(rng.choice([3, 3, 3, 7, 7, 250, int(rng.integers(0, 256))]))
            else:
                c = int(rng.integers(0, 256))
            ops.append(("clr", cxi, c))
        elif kind == "n":
            ops.append(("n", int(rng.integers(0, 6)), int(rng.integers(0, 256))))
        elif kind == "p":
            ops.append(("p", int(rng.integers(0, 6)), int(rng.integers(0, 6))))
        elif kind == "x":
            ops.append(("x", None, int(rng.integers(0, 256))))
        elif kind == "bt":
            ops.append(("bt", None, int(rng.integers(0, 5))))
        elif kind == "bn":
            ops.append(("bn", None, int(rng.integers(0, 256))))
        elif kind == "sxy":
            ops.append(("sxy", int(rng.integers(0, 4)), int(rng.integers(0, 16))))
        elif kind == "mx":
            ops.append(("mx", None, int(rng.integers(0, MSR_X * 2))))
        else:
            ops.append(("my", None, int(rng.integers(0, MSR_Y * 2))))
    return ops


def _encode(enc, ops):
    for kind, arg, c in ops:
        if kind == "clr":
            enc.encode_clr(arg, c)
        elif kind == "n":
            enc.encode_n(arg, c)
        elif kind == "p":
            enc.encode_p(arg, c)
        elif kind == "x":
            enc.encode_x(c)
        elif kind == "bt":
            enc.encode_bt(c)
        elif kind == "bn":
            enc.encode_bn(c)
        elif kind == "sxy":
            enc.encode_sxy(arg, c)
        elif kind == "mx":
            enc.encode_mx(c)
        elif kind == "my":
            enc.encode_my(c)
        elif kind == "bool":
            enc.encode_bool(c)


def _decode(dec, ops):
    out = []
    for kind, arg, _c in ops:
        if kind == "clr":
            out.append(dec.decode_clr(arg))
        elif kind == "n":
            out.append(dec.decode_n(arg))
        elif kind == "p":
            out.append(dec.decode_p(arg))
        elif kind == "x":
            out.append(dec.decode_x())
        elif kind == "bt":
            out.append(dec.decode_bt())
        elif kind == "bn":
            out.append(dec.decode_bn())
        elif kind == "sxy":
            out.append(dec.decode_sxy(arg))
        elif kind == "mx":
            out.append(dec.decode_mx())
        elif kind == "my":
            out.append(dec.decode_my())
        elif kind == "bool":
            out.append(dec.decode_bool())
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_rc_roundtrip(seed):
    rng = np.random.default_rng(seed)
    ops = _workload(rng, 800)
    enc = EntroCoderRC()  # placeholder to get table twin sizes identical
    enc = EntroEncoderRC()
    enc.preinit()
    enc.renew_i()
    enc.begin_frame()
    _encode(enc, ops)
    data = b"\x00" + enc.end_frame()  # 1 head byte as in SP frames

    dec = EntroCoderRC()
    dec.preinit()
    dec.renew_i()
    dec.decode_begin(data, 1)
    got = _decode(dec, ops)
    assert got == [c for _, _, c in ops]


def test_rc_multiframe_tables_persist():
    rng = np.random.default_rng(2)
    frames = [_workload(rng, 300), _workload(rng, 300), _workload(rng, 300)]
    enc = EntroEncoderRC()
    enc.preinit()
    enc.renew_i()
    payloads = []
    for ops in frames:
        enc.begin_frame()
        _encode(enc, ops)
        payloads.append(b"\x00" + enc.end_frame())
    dec = EntroCoderRC()
    dec.preinit()
    dec.renew_i()
    for ops, data in zip(frames, payloads):
        dec.decode_begin(data, 1)
        assert _decode(dec, ops) == [c for _, _, c in ops]
    # encoder/decoder table state must agree exactly after all frames
    np.testing.assert_array_equal(enc.t.cntab, dec.t.cntab)
    np.testing.assert_array_equal(enc.t.ntab, dec.t.ntab)


@pytest.mark.parametrize("f0", [32, 64])
@pytest.mark.parametrize("seed", [0, 1])
def test_ans_roundtrip(f0, seed):
    rng = np.random.default_rng(seed)
    ops = _workload(rng, 1500, peaked=True)
    # sprinkle bools (v3/v4 motion-repeat flag)
    for i in range(0, len(ops), 37):
        ops[i] = ("bool", None, bool(rng.integers(0, 2)))
    enc = EntroEncoderANS(f0)
    enc.renew_i()
    enc.begin_frame()
    _encode(enc, ops)
    data = b"\x00" + enc.end_frame()

    dec = EntroCoderANS(f0)
    dec.renew_i()
    dec.decode_begin(data, 1)
    got = _decode(dec, ops)
    want = [c for _, _, c in ops]
    assert got == want


def test_ans_context_escalation_roundtrip():
    """Drive single contexts through every escalation stage: Cx1→Cx4/Cx5→Cx6
    →Cx7, Cx1→Cx2→Cx6, and Cx1→Cx2→Cx3→Cx7."""
    rng = np.random.default_rng(3)
    ops = []
    # ctx 0: few distinct symbols repeated → Cx4/Cx5/Cx6 path
    syms_small = [5, 9, 9, 5, 5, 9, 17, 17, 5, 9] * 30
    ops += [("clr", 0, s) for s in syms_small]
    # ctx 2: medium diversity with repeats → Cx6 growth + rescale + upgrade
    med = [int(rng.integers(0, 60)) for _ in range(3000)]
    ops += [("clr", 2, s) for s in med]
    # ctx 3: ~30 distinct then a repeat → Cx2 Found → Cx6.createFrom2
    ops += [("clr", 3, s) for s in list(range(40, 70)) + [55, 55, 60, 41]] * 3
    rng.shuffle(ops)
    # ctx 1: 256 distinct *in order* (→Cx1→Cx2→Cx3), then repeats → Cx7.
    # Must not interleave repeats while Cx2 holds 60+ distinct: with v3's
    # f0=64 that builds a >PROB_SCALE Cx6 layout (see UnencodableSymbolError).
    distinct = list(rng.permutation(256))
    ops += [("clr", 1, int(s)) for s in distinct]
    ops += [("clr", 1, int(s)) for s in distinct[:50]]

    for f0 in (32, 64):
        enc = EntroEncoderANS(f0)
        enc.renew_i()
        enc.begin_frame()
        _encode(enc, ops)
        data = b"\x00" + enc.end_frame()
        dec = EntroCoderANS(f0)
        dec.renew_i()
        dec.decode_begin(data, 1)
        assert _decode(dec, ops) == [c for _, _, c in ops]
        # spot-check final context kinds agree
        for cxi in (0, 1, 2, 3):
            assert enc.t.cntab[cxi].kind == dec.t.cntab[cxi].kind


def test_ans_v3_unencodable_overshoot_detected():
    """v3 (f0=64) quirk: a Cx6 built from a 60+-distinct Cx2 has interval
    space > PROB_SCALE; symbols mapping above 4095 must raise."""
    from jsplayer_tpu.codecs.entropy import UnencodableSymbolError

    enc = EntroEncoderANS(64)
    enc.renew_i()
    enc.begin_frame()
    for s in range(63):  # Cx1 fills (14), then Cx2 grows to 63 distinct
        enc.encode_clr(0, s)
    enc.encode_clr(0, 62)  # repeat → Cx6.createFrom2 with oldd=63 (overshoot)
    with pytest.raises(UnencodableSymbolError):
        for s in range(200, 256):  # push into the unreachable top region
            enc.encode_clr(0, s)


def test_ans_multiframe_and_renew():
    rng = np.random.default_rng(4)
    enc = EntroEncoderANS(32)
    dec = EntroCoderANS(32)
    for frame in range(4):
        if frame % 2 == 0:  # I-frame: renew tables
            enc.renew_i()
        ops = _workload(rng, 400, peaked=True)
        enc.begin_frame()
        _encode(enc, ops)
        data = b"\x00" + enc.end_frame()
        if frame % 2 == 0:
            dec.renew_i()
        dec.decode_begin(data, 1)
        assert _decode(dec, ops) == [c for _, _, c in ops]
