"""CLI surface (python -m jsplayer_tpu …): the JS ExternalInterface analog
(Main.hx:1025-1034) as a command-line API."""

import numpy as np
import pytest

from jsplayer_tpu.__main__ import main


@pytest.fixture(scope="module")
def avi_path(tmp_path_factory):
    from jsplayer_tpu.encode.avi_mux import mux_avi
    from jsplayer_tpu.encode.sp_enc import ScreenPressorEncoder, pack_rgb

    X = Y = 32
    enc = ScreenPressorEncoder(2, X, Y)
    rng = np.random.default_rng(4)
    f = np.full((Y, X), pack_rgb(3, 3, 3), dtype=np.uint32).reshape(-1)
    streams = [enc.encode_i(f)]
    for t in range(5):
        nf = f.copy().reshape(Y, X)
        nf[4:8, 2:20] = pack_rgb(*rng.integers(0, 256, 3))
        f = nf.reshape(-1)
        streams.append(enc.encode_p(f))
    avi = mux_avi(streams, X, Y, 24, codec="SPV2",
                  keyflags=[t == 0 for t in range(6)])
    p = tmp_path_factory.mktemp("cli") / "v.avi"
    p.write_bytes(avi)
    return str(p)


def test_cli_info(avi_path, capsys):
    assert main(["info", avi_path]) == 0
    out = capsys.readouterr().out
    assert "32" in out and ("SCREENPRESSOR" in out or "codec" in out.lower())


def test_cli_play(avi_path, capsys):
    assert main(["play", avi_path]) == 0
    out = capsys.readouterr().out
    assert "frames_presented" in out


def test_cli_transcode(avi_path, tmp_path, capsys):
    out = str(tmp_path / "v4.avi")
    assert main(["transcode", avi_path, out, "--version", "4"]) == 0
    data = open(out, "rb").read()
    assert data[:4] == b"RIFF"


def test_cli_ingest(avi_path, capsys):
    assert main(["ingest", avi_path, "--window", "3"]) == 0
    out = capsys.readouterr().out
    assert "frames" in out.lower() or "window" in out.lower()


def test_cli_ingest_sparse_elide(avi_path, capsys):
    assert main(["ingest", avi_path, "--window", "3", "--path", "kmv_sparse",
                 "--downscale", "1"]) == 0
    assert main(["ingest", avi_path, "--window", "3", "--elide"]) == 0
